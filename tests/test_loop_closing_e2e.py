"""Loop-closing correction test with a manufactured drifted map."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend import loop_closing
from pli_slam_tpu.ops import lie
from pli_slam_tpu.utils.config import SlamConfig
from pli_slam_tpu.worldmap import stores as st


def test_apply_loop_correction_removes_drift(rng):
    """K keyframes along a line; the last half drifted by a known offset.

    After the loop edge (measured true relative pose) + correction, poses
    and landmarks re-anchor near truth.
    """
    cfg = SlamConfig.tiny_test()
    K = 12
    S, Sl = 8, 4
    kstore = st.KeyFrameStore.empty(cfg.map.max_keyframes, S, Sl)
    pstore = st.PointStore.empty(256)
    lstore = st.LineStore.empty(64)

    # ground truth: camera walks +x and returns to start
    t_gt = []
    for k in range(K):
        p = np.array([0.5 * min(k, K - 1 - k), 0.0, 0.0], np.float32)  # out and back
        t_gt.append(-p)  # T_cw with R=I: t = -p
    drift = np.array([0.4, 0.25, -0.3], np.float32)

    # consistent drift: the whole local frame (camera centers AND the
    # landmarks they triangulate) shifts by -frac*drift; for T_cw that
    # means t_est = t_gt + frac*drift
    R_est = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t_est = np.stack(t_gt)
    for k in range(K // 2, K):
        frac = (k - K // 2 + 1) / (K - K // 2)
        t_est[k] = t_gt[k] + frac * drift

    kstore = dataclasses.replace(
        kstore,
        R=kstore.R.at[:K].set(jnp.asarray(R_est)),
        t=kstore.t.at[:K].set(jnp.asarray(t_est)),
        valid=kstore.valid.at[:K].set(True),
    )
    # landmarks anchored at the last KF (drifted) and at KF 0 (clean)
    n_lm = 32
    x_true = np.stack(
        [rng.uniform(-2, 2, n_lm), rng.uniform(-2, 2, n_lm), rng.uniform(3, 6, n_lm)], -1
    ).astype(np.float32)
    x_drifted = x_true - drift  # same drift as their ref KF (K-1)
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:n_lm].set(jnp.asarray(x_drifted)),
        valid=pstore.valid.at[:n_lm].set(True),
        last_kf=pstore.last_kf.at[:n_lm].set(K - 1),
    )

    # verified relative transform: current-region world -> loop-region world
    # x_loop = x_cur + drift  => R=I, t=drift
    kstore2, pstore2, lstore2 = loop_closing.apply_loop_correction(
        kstore, pstore, lstore, K, K - 1, 0,
        jnp.eye(3), jnp.asarray(drift), cfg,
    )
    # corrected last pose should be near ground truth
    t_err_before = np.linalg.norm(t_est[K - 1] - t_gt[K - 1])
    t_err_after = np.linalg.norm(np.asarray(kstore2.t[K - 1]) - t_gt[K - 1])
    assert t_err_after < 0.35 * t_err_before, (t_err_before, t_err_after)
    # landmarks moved with their reference keyframe toward truth
    lm_err_before = np.linalg.norm(x_drifted - x_true, axis=1).mean()
    lm_err_after = np.linalg.norm(np.asarray(pstore2.x[:n_lm]) - x_true, axis=1).mean()
    assert lm_err_after < 0.5 * lm_err_before, (lm_err_before, lm_err_after)


def test_match_kf_landmarks(rng):
    cfg = SlamConfig.tiny_test()
    S = 16
    kstore = st.KeyFrameStore.empty(8, S, 4)
    pstore = st.PointStore.empty(64)
    # two KFs observing the same 10 landmarks with identical descriptors
    descs = jnp.asarray(rng.choice([-1, 1], size=(10, 256)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:10].set(x),
        valid=pstore.valid.at[:10].set(True),
    )
    obs_a = jnp.full(S, -1, jnp.int32).at[:10].set(jnp.arange(10))
    perm = rng.permutation(10)
    obs_b = jnp.full(S, -1, jnp.int32).at[:10].set(jnp.asarray(perm))
    kstore = dataclasses.replace(
        kstore,
        obs_pt=kstore.obs_pt.at[0].set(obs_a).at[1].set(obs_b),
        valid=kstore.valid.at[:2].set(True),
    )
    # landmark descriptors live in the point store (no per-KF copy)
    pstore = dataclasses.replace(pstore, desc=pstore.desc.at[:10].set(descs))
    xa, xb, ok = loop_closing.match_kf_landmarks(kstore, pstore, 0, 1)
    assert int(ok.sum()) == 10
    np.testing.assert_allclose(np.asarray(xa)[np.asarray(ok)], np.asarray(xb)[np.asarray(ok)], atol=1e-6)


def test_decoy_candidate_rejected_true_one_verified(rng):
    """Multi-candidate verification (reference verifies the 3 best BoW
    candidates, src/LoopClosing.cc:395-476): a perceptually-aliased decoy
    candidate that fails geometric verification must not block the true
    loop from closing.
    """
    from pli_slam_tpu.frontend.loop_closing import LoopCloser
    from pli_slam_tpu.frontend.tracker import Tracker
    from pli_slam_tpu.ops.camera import Camera

    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_kf_gap=2, consistency_kfs=2)
    )
    K = 12
    S = 64
    kstore = st.KeyFrameStore.empty(cfg.map.max_keyframes, S, 8)
    pstore = st.PointStore.empty(512)

    # landmarks: cluster A (seen by KF0 and KF11 = true loop), decoy KF 5
    # observes DIFFERENT landmarks that share descriptors with A
    # (perceptual aliasing) but sit elsewhere in space.
    nA = 40
    xA = np.stack([rng.uniform(-2, 2, nA), rng.uniform(-2, 2, nA), rng.uniform(3, 6, nA)], -1).astype(np.float32)
    descA = np.sign(rng.normal(size=(nA, 256))).astype(np.int8)
    xD = xA + np.asarray([5.0, 0.5, 1.0], np.float32) + rng.normal(size=(nA, 3)).astype(np.float32) * 1.3
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:nA].set(jnp.asarray(xA)).at[nA:2 * nA].set(jnp.asarray(xD)),
        desc=pstore.desc.at[:nA].set(jnp.asarray(descA)).at[nA:2 * nA].set(jnp.asarray(descA)),
        valid=pstore.valid.at[:2 * nA].set(True),
    )
    obs = jnp.full((K, S), -1, jnp.int32)
    ids = jnp.arange(nA, dtype=jnp.int32)
    obs = obs.at[0, :nA].set(ids)          # KF0 sees cluster A
    obs = obs.at[11, :nA].set(ids)         # KF11 sees cluster A (true loop)
    obs = obs.at[5, :nA].set(ids + nA)     # decoy KF5 sees the aliased cluster
    kstore = dataclasses.replace(
        kstore,
        valid=kstore.valid.at[:K].set(True),
        obs_pt=obs,
    )

    class FakeTracker:
        pass

    tr = FakeTracker()
    tr.kstore = kstore
    tr.pstore = pstore
    tr.lstore = st.LineStore.empty(64)
    tr.n_kf = K
    tr.cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2)
    tr.cfg = cfg
    tr.R = jnp.eye(3)
    tr.t = jnp.zeros(3)
    tr._reset_motion = lambda: None
    tr._full_inertial_ba = lambda: None
    tr.imu_ready = False

    lc = LoopCloser(cfg)
    # decoy first in the candidate list (higher BoW score), truth second
    cands = [(5, 0.9), (0, 0.5)]
    lc._consistency = cfg.loop.consistency_kfs  # pre-satisfied
    lc._consistent_with = 5
    closed = lc.on_keyframe(tr, 11, cands)
    assert closed, "true candidate was not verified behind the decoy"
    assert lc.n_loops_closed == 1
