"""Device-resident per-KF preintegration chain (ops/imu.py PreintStore)
and the identity-accumulator invariants the fused stereo-inertial step
relies on (reference mpImuPreintegratedFromLastKF snapshot semantics,
src/Tracking.cc:3599)."""

import jax
import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.ops import imu as imu_ops
from pli_slam_tpu.utils.config import ImuConfig


def _random_preint(rng, cfg, n=8, bg=None, ba=None):
    g = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(n, 3)) * 2.0 + np.array([0, 0, 9.81]), jnp.float32)
    dts = jnp.full(n, 0.005)
    mask = jnp.ones(n, bool)
    bg = jnp.zeros(3) if bg is None else bg
    ba = jnp.zeros(3) if ba is None else ba
    return imu_ops.preintegrate(g, a, dts, mask, bg, ba, cfg)


def test_compose_identity_with_bias_is_noop(rng):
    """compose(identity_with_bias(bg, ba), p) == p when p was integrated
    at the same biases — the fused step's accumulator reset relies on
    this exactness."""
    cfg = ImuConfig()
    bg = jnp.asarray([0.01, -0.02, 0.005])
    ba = jnp.asarray([0.1, 0.05, -0.2])
    p = _random_preint(rng, cfg, bg=bg, ba=ba)
    ident = imu_ops.identity_with_bias(bg, ba)
    c = imu_ops.compose(ident, p)
    for f in ("dt", "dR", "dV", "dP", "cov", "JRg", "JVg", "JVa", "JPg", "JPa"):
        np.testing.assert_allclose(
            np.asarray(getattr(c, f)), np.asarray(getattr(p, f)),
            atol=1e-5, err_msg=f
        )


def test_preint_store_set_gather_roundtrip(rng):
    cfg = ImuConfig()
    store = imu_ops.PreintStore.empty(8)
    p1 = _random_preint(rng, cfg)
    p2 = _random_preint(rng, cfg)
    store = store.set(2, p1)
    store = store.set(5, p2)
    assert np.asarray(store.valid).tolist() == [
        False, False, True, False, False, True, False, False]
    got = store.gather(jnp.asarray([2, 5]))
    np.testing.assert_allclose(np.asarray(got.dP[0]), np.asarray(p1.dP), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.dR[1]), np.asarray(p2.dR), atol=1e-7)


def test_preint_store_traced_set(rng):
    """set() must work under jit with a traced slot and traced validity
    (the fused step writes the chain factor inside the KF branch)."""
    cfg = ImuConfig()
    p = _random_preint(rng, cfg)
    store = imu_ops.PreintStore.empty(8)

    @jax.jit
    def write(store, k, p):
        return store.set(k, p, valid=(k > 0) & (p.dt > 1e-6))

    store = write(store, jnp.asarray(3), p)
    assert bool(store.valid[3])
    store = write(store, jnp.asarray(0), p)
    assert not bool(store.valid[0])


def test_preint_store_remap_adjacency(rng):
    """Merge remap: a chain factor survives only if both endpoint KFs
    stayed adjacent (reference MergeInertialBA, src/Optimizer.cc:6858)."""
    cfg = ImuConfig()
    store = imu_ops.PreintStore.empty(8)
    ps = [_random_preint(rng, cfg) for _ in range(4)]
    for k, p in zip([1, 2, 3, 4], ps):
        store = store.set(k, p)
    # src KFs 0..4 land at dst slots 3,4,5,7,-1: factors 1 (3->4) and
    # 2 (4->5) survive; 3 breaks adjacency (5 -> 7); 4 is dropped
    kf_slots = np.array([3, 4, 5, 7, -1] + [-1] * 3)
    out = store.remap(kf_slots)
    v = np.asarray(out.valid)
    assert v[4] and v[5], v
    assert not v[7] and not v[3], v
    np.testing.assert_allclose(np.asarray(out.gather(jnp.asarray(4)).dP),
                               np.asarray(ps[0].dP), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.gather(jnp.asarray(5)).dV),
                               np.asarray(ps[1].dV), atol=1e-7)
