"""Visual-inertial pose solver and IMU initialization tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import imu as imu_ops
from pli_slam_tpu.ops import lie
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.solve import gn, inertial
from pli_slam_tpu.utils.config import ImuConfig, OptimizerConfig

OPT = OptimizerConfig()
IMU = ImuConfig()
G = 9.81


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def make_vi_scene(rng, cam, n_pts=96, dt_total=0.05):
    """Two body states linked by ideal IMU; landmarks seen from state 1."""
    ext = inertial.Extrinsics.identity()
    # state 0: at rest-ish with known motion
    R0 = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32)))
    p0 = rng.normal(size=3) * 0.5
    v0 = rng.normal(size=3) * 0.4
    # constant body acceleration + rotation rate over the window
    w_b = rng.normal(size=3) * 0.4
    a_w = rng.normal(size=3) * 1.5  # world-frame acceleration (excl. gravity)
    T = 10
    dt = dt_total / T
    g_w = np.array([0.0, 0.0, -G])

    gyro = np.tile(w_b, (T, 1)).astype(np.float32)
    acc = np.zeros((T, 3), np.float32)
    R = R0.copy()
    p = p0.copy()
    v = v0.copy()
    for k in range(T):
        acc[k] = R.T @ (a_w - g_w)  # specific force in body frame
        # integrate ground truth
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt, jnp.float32)))
    R1, p1, v1 = R, p, v

    preint = imu_ops.preintegrate(
        jnp.asarray(gyro), jnp.asarray(acc), jnp.full((T,), dt, jnp.float32),
        jnp.ones(T, bool), jnp.zeros(3), jnp.zeros(3), IMU,
    )

    # landmarks observed from state 1
    pts_w = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(4, 14, n_pts)], -1
    ).astype(np.float32)
    # camera = body (identity extrinsics): x_c = R1^T (x - p1)
    x_c = (pts_w - p1) @ R1
    uvr = np.asarray(cam_ops.stereo_project(cam, jnp.asarray(x_c)))
    uvr = uvr + rng.normal(size=uvr.shape) * 0.3

    n_l = 8
    obs = gn.PoseObservations(
        x_w=jnp.asarray(pts_w), uvr=jnp.asarray(uvr, jnp.float32),
        stereo_mask=jnp.ones(n_pts, bool), point_mask=jnp.ones(n_pts, bool),
        sigma2_pt=jnp.ones(n_pts),
        xs_w=jnp.zeros((n_l, 3)), xe_w=jnp.zeros((n_l, 3)), l_obs=jnp.zeros((n_l, 3)),
        line_mask=jnp.zeros(n_l, bool), sigma2_ln=jnp.ones(n_l),
    )
    prev = inertial.BodyState(
        R_wb=jnp.asarray(R0, jnp.float32), p_w=jnp.asarray(p0, jnp.float32),
        v_w=jnp.asarray(v0, jnp.float32), bg=jnp.zeros(3), ba=jnp.zeros(3),
    )
    truth = inertial.BodyState(
        R_wb=jnp.asarray(R1, jnp.float32), p_w=jnp.asarray(p1, jnp.float32),
        v_w=jnp.asarray(v1, jnp.float32), bg=jnp.zeros(3), ba=jnp.zeros(3),
    )
    return ext, obs, preint, prev, truth


class TestInertialPose:
    def test_converges_from_imu_prediction(self, cam, rng):
        ext, obs, preint, prev, truth = make_vi_scene(rng, cam)
        R_pred, v_pred, p_pred = imu_ops.predict_state(
            prev.R_wb, prev.v_w, prev.p_w, preint, prev.bg, prev.ba, G
        )
        init = inertial.BodyState(R_wb=R_pred, p_w=p_pred, v_w=v_pred, bg=prev.bg, ba=prev.ba)
        state, in_pt, _, n = inertial.solve_pose_inertial(
            cam, ext, obs, preint, prev, init, OPT, IMU
        )
        assert int(n) > 80
        np.testing.assert_allclose(np.asarray(state.p_w), np.asarray(truth.p_w), atol=8e-3)
        dR = np.asarray(state.R_wb) @ np.asarray(truth.R_wb).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 2e-3, ang
        np.testing.assert_allclose(np.asarray(state.v_w), np.asarray(truth.v_w), atol=0.1)

    def test_imu_only_matches_prediction(self, cam, rng):
        """With all visual obs masked out, solution should follow the IMU."""
        ext, obs, preint, prev, truth = make_vi_scene(rng, cam)
        obs = dataclasses.replace(obs, point_mask=jnp.zeros_like(obs.point_mask))
        R_pred, v_pred, p_pred = imu_ops.predict_state(
            prev.R_wb, prev.v_w, prev.p_w, preint, prev.bg, prev.ba, G
        )
        init = inertial.BodyState(R_wb=R_pred, p_w=p_pred, v_w=v_pred, bg=prev.bg, ba=prev.ba)
        state, _, _, _ = inertial.solve_pose_inertial(cam, ext, obs, preint, prev, init, OPT, IMU)
        np.testing.assert_allclose(np.asarray(state.p_w), np.asarray(p_pred), atol=1e-3)

    def test_recovers_from_biased_prediction(self, cam, rng):
        ext, obs, preint, prev, truth = make_vi_scene(rng, cam)
        init = inertial.BodyState(
            R_wb=lie._mm(truth.R_wb, lie.so3_exp(jnp.asarray([0.02, -0.01, 0.02]))),
            p_w=truth.p_w + jnp.asarray([0.05, -0.04, 0.06]),
            v_w=truth.v_w + jnp.asarray([0.2, 0.1, -0.2]),
            bg=jnp.zeros(3), ba=jnp.zeros(3),
        )
        state, _, _, n = inertial.solve_pose_inertial(cam, ext, obs, preint, prev, init, OPT, IMU)
        np.testing.assert_allclose(np.asarray(state.p_w), np.asarray(truth.p_w), atol=1e-2)


class TestImuInit:
    def test_gyro_bias_estimation(self, rng):
        bg_true = jnp.asarray([0.02, -0.015, 0.01])
        preints, dRs = [], []
        for _ in range(6):
            T, dt = 40, 0.005
            gyro = rng.normal(0, 0.5, size=(T, 3)).astype(np.float32)
            acc = rng.normal(0, 1.0, size=(T, 3)).astype(np.float32)
            # measured gyro = true rate + bias  =>  preintegrate measured with bg=0
            p = imu_ops.preintegrate(
                jnp.asarray(gyro) + bg_true, jnp.asarray(acc), jnp.full((T,), dt),
                jnp.ones(T, bool), jnp.zeros(3), jnp.zeros(3), ImuConfig(),
            )
            # "visual" rotation = integral of the true rates
            p_true = imu_ops.preintegrate(
                jnp.asarray(gyro), jnp.asarray(acc), jnp.full((T,), dt),
                jnp.ones(T, bool), jnp.zeros(3), jnp.zeros(3), ImuConfig(),
            )
            preints.append(p)
            dRs.append(p_true.dR)
        bg_est = inertial.estimate_gyro_bias(preints, dRs)
        np.testing.assert_allclose(np.asarray(bg_est), np.asarray(bg_true), atol=2e-3)

    def test_gravity_direction(self, rng):
        """Static body tilted by a known rotation: gravity recovered."""
        R_tilt = lie.so3_exp(jnp.asarray([0.3, -0.2, 0.0]))
        T, dt = 100, 0.005
        # accelerometer measures R_wb^T * (-g) = specific force; body static
        a_b = np.asarray(lie._einsum("ij,j->i", R_tilt.T, jnp.asarray([0.0, 0.0, G])))
        p = imu_ops.preintegrate(
            jnp.zeros((T, 3)), jnp.tile(a_b, (T, 1)), jnp.full((T,), dt),
            jnp.ones(T, bool), jnp.zeros(3), jnp.zeros(3), ImuConfig(),
        )
        # world frame guessed = body frame (R_wb = I): estimated gravity dir
        R_wg = inertial.estimate_gravity_direction([p], [jnp.eye(3)], G)
        # after rotating the world by R_wg^T, gravity should be -z:
        dirG = -np.asarray(lie._einsum("ij,j->i", jnp.eye(3), p.dV))
        dirG = dirG / np.linalg.norm(dirG)
        g_aligned = np.asarray(R_wg).T @ dirG
        np.testing.assert_allclose(g_aligned, [0, 0, -1], atol=1e-5)
