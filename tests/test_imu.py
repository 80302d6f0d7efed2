"""IMU preintegration tests against closed-form motions."""

import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.ops import imu, lie
from pli_slam_tpu.utils.config import ImuConfig

CFG = ImuConfig()
G = 9.81


def _integrate(gyro, acc, dt, bg=None, ba=None):
    T = gyro.shape[0]
    bg = jnp.zeros(3) if bg is None else bg
    ba = jnp.zeros(3) if ba is None else ba
    return imu.preintegrate(
        jnp.asarray(gyro, jnp.float32),
        jnp.asarray(acc, jnp.float32),
        jnp.full((T,), dt, jnp.float32),
        jnp.ones((T,), bool),
        bg, ba, CFG,
    )


def test_static_body_measures_gravity():
    """Body at rest: accelerometer reads +g in body z; dV = g*t upward."""
    T, dt = 100, 0.005
    gyro = np.zeros((T, 3))
    acc = np.tile([0.0, 0.0, G], (T, 1))
    p = _integrate(gyro, acc, dt)
    np.testing.assert_allclose(p.dt, 0.5, atol=1e-6)
    np.testing.assert_allclose(p.dR, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(p.dV, [0, 0, G * 0.5], atol=1e-3)
    np.testing.assert_allclose(p.dP, [0, 0, 0.5 * G * 0.25], atol=1e-3)


def test_predict_state_static_stays_put():
    T, dt = 100, 0.005
    p = _integrate(np.zeros((T, 3)), np.tile([0.0, 0.0, G], (T, 1)), dt)
    R1, v1, p1 = imu.predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3), p, jnp.zeros(3), jnp.zeros(3), G)
    np.testing.assert_allclose(R1, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(v1, 0.0, atol=1e-3)
    np.testing.assert_allclose(p1, 0.0, atol=1e-3)


def test_constant_rotation():
    """Pure z-rotation at 1 rad/s for 1s -> dR = Rz(1)."""
    T, dt = 200, 0.005
    gyro = np.tile([0.0, 0.0, 1.0], (T, 1))
    acc = np.zeros((T, 3))
    p = _integrate(gyro, acc, dt)
    expected = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(p.dR, expected, atol=1e-4)


def test_constant_acceleration():
    """1 m/s^2 along x for 1s: dV = 1, dP = 0.5."""
    T, dt = 200, 0.005
    p = _integrate(np.zeros((T, 3)), np.tile([1.0, 0.0, 0.0], (T, 1)), dt)
    np.testing.assert_allclose(p.dV, [1.0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(p.dP, [0.5, 0, 0], atol=2e-3)


def test_mask_padding_noop():
    T, dt = 64, 0.005
    gyro = np.random.default_rng(0).normal(size=(T, 3))
    acc = np.random.default_rng(1).normal(size=(T, 3))
    mask = np.zeros(T, bool)
    mask[:32] = True
    p_full = imu.preintegrate(
        jnp.asarray(gyro[:32], jnp.float32), jnp.asarray(acc[:32], jnp.float32),
        jnp.full((32,), dt, jnp.float32), jnp.ones(32, bool), jnp.zeros(3), jnp.zeros(3), CFG)
    p_masked = imu.preintegrate(
        jnp.asarray(gyro, jnp.float32), jnp.asarray(acc, jnp.float32),
        jnp.full((T,), dt, jnp.float32), jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), CFG)
    np.testing.assert_allclose(p_masked.dR, p_full.dR, atol=1e-5)
    np.testing.assert_allclose(p_masked.dV, p_full.dV, atol=1e-4)
    np.testing.assert_allclose(p_masked.dt, p_full.dt, atol=1e-6)


def test_bias_jacobian_first_order():
    """GetDeltaRotation(bg+db) should track reintegration with shifted bias."""
    T, dt = 100, 0.005
    rng = np.random.default_rng(3)
    gyro = rng.normal(0, 0.5, size=(T, 3))
    acc = rng.normal(0, 1.0, size=(T, 3)) + [0, 0, G]
    p0 = _integrate(gyro, acc, dt)
    db = jnp.asarray([0.01, -0.02, 0.015])
    # reintegrate with true bias db
    p1 = _integrate(gyro, acc, dt, bg=db)
    corrected = imu.delta_rotation(p0, db)
    err = np.asarray(lie.so3_log(jnp.asarray(p1.dR).T @ corrected))
    assert np.abs(err).max() < 5e-4, err
    v_corr = imu.delta_velocity(p0, db, jnp.zeros(3))
    np.testing.assert_allclose(v_corr, p1.dV, atol=2e-3)
    p_corr = imu.delta_position(p0, db, jnp.zeros(3))
    np.testing.assert_allclose(p_corr, p1.dP, atol=2e-3)


def test_covariance_grows_and_psd():
    T, dt = 200, 0.005
    p = _integrate(np.zeros((T, 3)), np.tile([0.0, 0.0, G], (T, 1)), dt)
    cov = np.asarray(p.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > -1e-12
    assert eig.max() > 0


def test_midpoint_samples_cover_interval():
    stamps = jnp.asarray(np.arange(10) * 0.005, jnp.float32)
    gyro = jnp.ones((10, 3))
    acc = jnp.ones((10, 3))
    mask = jnp.ones(10, bool)
    g, a, dts, m = imu.midpoint_samples(gyro, acc, stamps, jnp.float32(0.0), jnp.float32(0.045), mask)
    np.testing.assert_allclose(float(dts.sum()), 0.045, atol=1e-6)
    assert bool(m.all())


def test_compose_matches_full_integration():
    """compose(first half, second half) == integrating the whole stream."""
    rng = np.random.default_rng(3)
    T, dt = 60, 0.005
    gyro = rng.normal(0, 0.8, (T, 3))
    acc = rng.normal(0, 2.0, (T, 3)) + np.array([0.0, 0.0, G])
    full = _integrate(gyro, acc, dt)
    a = _integrate(gyro[:30], acc[:30], dt)
    b = _integrate(gyro[30:], acc[30:], dt)
    c = imu.compose(a, b)
    np.testing.assert_allclose(c.dt, full.dt, atol=1e-6)
    np.testing.assert_allclose(c.dR, full.dR, atol=1e-5)
    np.testing.assert_allclose(c.dV, full.dV, atol=1e-4)
    np.testing.assert_allclose(c.dP, full.dP, atol=1e-4)
    for f in ("JRg", "JVg", "JVa", "JPg", "JPa"):
        np.testing.assert_allclose(
            getattr(c, f), getattr(full, f), atol=2e-4, err_msg=f
        )
    np.testing.assert_allclose(c.cov, full.cov, atol=1e-8, rtol=1e-2)


def test_compose_corrects_second_segment_bias():
    """b integrated at a different bias is first-order corrected to a's."""
    rng = np.random.default_rng(5)
    T, dt = 40, 0.005
    gyro = rng.normal(0, 0.5, (T, 3))
    acc = rng.normal(0, 1.0, (T, 3)) + np.array([0.0, 0.0, G])
    bg = jnp.asarray([0.002, -0.001, 0.003])
    ba = jnp.asarray([0.01, 0.02, -0.015])
    a = _integrate(gyro[:20], acc[:20], dt, bg=bg, ba=ba)
    b_off = _integrate(gyro[20:], acc[20:], dt)  # zero-bias linearization
    c = imu.compose(a, b_off)
    full = _integrate(gyro, acc, dt, bg=bg, ba=ba)
    np.testing.assert_allclose(c.dR, full.dR, atol=1e-4)
    np.testing.assert_allclose(c.dV, full.dV, atol=2e-3)
    np.testing.assert_allclose(c.dP, full.dP, atol=2e-3)
