"""Joint inertial-only initialization MAP (solve/imu_init.py).

Pins the reference semantics of Optimizer::InertialOptimization
(src/Optimizer.cc:5241): with keyframe poses fixed, the optimizer must
recover gravity direction, (mono) metric scale, gyro/accel biases and
per-keyframe velocities from the preintegration chain alone.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.ops import imu as imu_ops
from pli_slam_tpu.ops import lie
from pli_slam_tpu.solve import imu_init as ii
from pli_slam_tpu.utils.config import ImuConfig

IMU = ImuConfig(max_samples_per_frame=16)
G = 9.81


def make_chain(K=10, dt_kf=0.25, bg_true=(0.02, -0.01, 0.015), ba_true=(0.05, 0.08, -0.04),
               tilt=(0.25, -0.15), seed=0):
    """Sinusoidal body trajectory; gravity tilted by `tilt` (rx, ry);
    IMU measurements include the true biases."""
    rng = np.random.default_rng(seed)
    bg_true = np.asarray(bg_true, np.float32)
    ba_true = np.asarray(ba_true, np.float32)
    Rwg_true = np.asarray(lie.so3_exp(jnp.asarray([tilt[0], tilt[1], 0.0], jnp.float32)))
    g_w = Rwg_true @ np.array([0.0, 0.0, -G], np.float32)

    def pos(t):
        return np.array(
            [0.8 * math.sin(1.3 * t), 0.6 * math.sin(0.9 * t + 1.0), 0.4 * math.sin(1.7 * t + 2.0)],
            np.float32,
        )

    def rot(t):
        return np.asarray(lie.so3_exp(jnp.asarray([0.1 * math.sin(t), 0.2 * t, 0.15 * math.cos(t)], jnp.float32)))

    eps = 1e-4

    def vel(t):
        return (pos(t + eps) - pos(t - eps)) / (2 * eps)

    def acc_w(t):
        return (vel(t + eps) - vel(t - eps)) / (2 * eps)

    T = 50  # samples per KF interval (200 Hz at dt_kf=0.25)
    stamps = np.arange(K, dtype=np.float32) * dt_kf

    # ground-truth keyframe states = the DISCRETE dead-reckoned chain of
    # the unbiased samples (removes integrator-discretization error from
    # the test so only estimator error is measured)
    R_wb = [rot(0.0)]
    p_wb = [pos(0.0)]
    v_wb = [vel(0.0)]
    chains = []
    for k in range(K - 1):
        ts = stamps[k] + (np.arange(T) + 0.5) * dt_kf / T
        gyro = np.zeros((T, 3), np.float32)
        acc = np.zeros((T, 3), np.float32)
        for i, t in enumerate(ts):
            R0 = rot(t - eps)
            R1 = rot(t + eps)
            w = np.asarray(lie.so3_log(jnp.asarray(R0.T @ R1))) / (2 * eps)
            a_b = rot(t).T @ (acc_w(t) - g_w)
            gyro[i] = w
            acc[i] = a_b
        dts = jnp.full(T, dt_kf / T, jnp.float32)
        m = jnp.ones(T, bool)
        pre_clean = imu_ops.preintegrate(
            jnp.asarray(gyro), jnp.asarray(acc), dts, m, jnp.zeros(3), jnp.zeros(3), IMU
        )
        R1_, v1_, p1_ = imu_ops.predict_state(
            jnp.asarray(R_wb[-1]), jnp.asarray(v_wb[-1]), jnp.asarray(p_wb[-1]),
            pre_clean, jnp.zeros(3), jnp.zeros(3), jnp.asarray(g_w),
        )
        R_wb.append(np.asarray(R1_))
        v_wb.append(np.asarray(v1_))
        p_wb.append(np.asarray(p1_))
        # the estimator sees BIASED measurements
        pre = imu_ops.preintegrate(
            jnp.asarray(gyro + bg_true), jnp.asarray(acc + ba_true), dts, m,
            jnp.zeros(3), jnp.zeros(3), IMU,
        )
        chains.append(pre)
    R_wb = np.stack(R_wb)
    p_wb = np.stack(p_wb)
    v_wb = np.stack(v_wb)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *chains)
    return stacked, R_wb, p_wb, v_wb, stamps, Rwg_true, bg_true, ba_true


def test_recovers_gravity_and_biases_stereo():
    stacked, R_wb, p_wb, v_wb, stamps, Rwg_true, bg_true, ba_true = make_chain()
    K = R_wb.shape[0]
    mask = jnp.ones(K - 1, bool)
    Rwg0 = ii.gravity_dir_seed(stacked, mask, jnp.asarray(R_wb), G)
    v0 = ii.velocity_seed(jnp.asarray(p_wb), jnp.asarray(stamps))
    Rwg, s, bg, ba, v, costs = ii.inertial_optimization(
        stacked, mask, jnp.asarray(R_wb), jnp.asarray(p_wb), v0, Rwg0,
        jnp.zeros(3), jnp.zeros(3), IMU, prior_g=1e2, prior_a=1e2,
        fix_scale=True,
    )
    g_est = np.asarray(Rwg) @ np.array([0, 0, -G])
    g_true = Rwg_true @ np.array([0, 0, -G])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.9995, (g_est, g_true)
    np.testing.assert_allclose(np.asarray(bg), bg_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ba), ba_true, atol=5e-2)
    np.testing.assert_allclose(np.asarray(v), v_wb, atol=0.05)
    assert float(s) == 1.0


def test_recovers_metric_scale_mono():
    stacked, R_wb, p_wb, v_wb, stamps, Rwg_true, bg_true, ba_true = make_chain()
    K = R_wb.shape[0]
    mask = jnp.ones(K - 1, bool)
    s_true = 2.7  # mono map is 1/2.7 of metric
    p_scaled = p_wb / s_true
    Rwg0 = ii.gravity_dir_seed(stacked, mask, jnp.asarray(R_wb), G)
    v0 = ii.velocity_seed(jnp.asarray(p_scaled), jnp.asarray(stamps))
    Rwg, s, bg, ba, v, costs = ii.inertial_optimization(
        stacked, mask, jnp.asarray(R_wb), jnp.asarray(p_scaled), v0, Rwg0,
        jnp.zeros(3), jnp.zeros(3), IMU, prior_g=1e2, prior_a=1e2,
        fix_scale=False,
    )
    assert abs(float(s) - s_true) / s_true < 0.03, float(s)
    np.testing.assert_allclose(np.asarray(bg), bg_true, atol=5e-3)
    # velocities come out metric
    np.testing.assert_allclose(np.asarray(v), v_wb, atol=0.1)


def test_masked_chain_factor_ignored():
    stacked, R_wb, p_wb, v_wb, stamps, *_ = make_chain()
    K = R_wb.shape[0]
    # corrupt one factor but mask it out: result must stay close
    mask = jnp.ones(K - 1, bool).at[3].set(False)
    bad = jax.tree_util.tree_map(lambda a: a, stacked)
    Rwg0 = ii.gravity_dir_seed(stacked, mask, jnp.asarray(R_wb), G)
    v0 = ii.velocity_seed(jnp.asarray(p_wb), jnp.asarray(stamps))
    Rwg, s, bg, ba, v, costs = ii.inertial_optimization(
        bad, mask, jnp.asarray(R_wb), jnp.asarray(p_wb), v0, Rwg0,
        jnp.zeros(3), jnp.zeros(3), IMU, fix_scale=True,
    )
    assert np.all(np.isfinite(np.asarray(v)))


def test_scale_refinement_mode_freezes_biases():
    """ScaleRefinement semantics (reference LocalMapping::ScaleRefinement
    src/LocalMapping.cc:1337 -> InertialOptimization(Map*,Rwg,scale)
    src/Optimizer.cc:5755): with biases pinned by huge priors and the
    TRUE biases passed as linearization point, only scale and gravity
    direction move — and a 15% map-scale error is corrected."""
    stacked, R_wb, p_wb, v_wb, stamps, Rwg_true, bg_true, ba_true = make_chain()
    K = R_wb.shape[0]
    mask = jnp.ones(K - 1, bool)
    s_true = 1.15  # mild drift, the ScaleRefinement regime
    p_scaled = p_wb / s_true
    Rwg0 = ii.gravity_dir_seed(stacked, mask, jnp.asarray(R_wb), G)
    v0 = ii.velocity_seed(jnp.asarray(p_scaled), jnp.asarray(stamps))
    Rwg, s, bg, ba, v, costs = ii.inertial_optimization(
        stacked, mask, jnp.asarray(R_wb), jnp.asarray(p_scaled), v0, Rwg0,
        jnp.asarray(bg_true), jnp.asarray(ba_true), IMU,
        fix_scale=False, fix_bias=True,
    )
    # biases must not have moved off their linearization point
    np.testing.assert_allclose(np.asarray(bg), bg_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ba), ba_true, atol=1e-4)
    assert abs(float(s) - s_true) / s_true < 0.03, float(s)
    g_est = np.asarray(Rwg) @ np.array([0, 0, -G])
    g_true = Rwg_true @ np.array([0, 0, -G])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.999, (g_est, g_true)
