"""Visual-inertial windowed BA tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import imu as imu_ops
from pli_slam_tpu.ops import lie
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.solve import vi_ba
from pli_slam_tpu.utils.config import ImuConfig, OptimizerConfig

from test_ba import build_problem

OPT = OptimizerConfig()
IMU = ImuConfig()
G = 9.81


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def build_vi_problem(rng, cam, W=4):
    """Visual problem + consistent IMU chain along the camera track.

    Poses from test_ba.build_problem: R=I, t=[-0.3w,0,0] (T_cw), i.e. the
    body moves +x at 6 m/s between 50ms keyframes with zero rotation.
    """
    prob, R_true, t_true, pts_true, lns_true = build_problem(rng, cam, W=W, perturb=0.02)
    dt_kf = 0.05
    v_true = np.array([0.3 / dt_kf, 0.0, 0.0], np.float32)  # constant velocity
    g_w = np.array([0.0, 0.0, -G], np.float32)
    # constant-velocity, zero-rotation chain: accel measures -g in body frame
    T = 10
    dts = jnp.full((T,), dt_kf / T)
    acc = jnp.tile(jnp.asarray(-g_w), (T, 1))
    gyro = jnp.zeros((T, 3))
    pre_one = imu_ops.preintegrate(gyro, acc, dts, jnp.ones(T, bool), jnp.zeros(3), jnp.zeros(3), IMU)
    preint = jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (W - 1,) + (1,) * x.ndim), pre_one)

    viprob = vi_ba.VIBAProblem(
        base=prob,
        v=jnp.tile(jnp.asarray(v_true)[None], (W, 1)),
        bg=jnp.zeros((W, 3)),
        ba=jnp.zeros((W, 3)),
        preint=preint,
        imu_mask=jnp.ones(W - 1, bool),
        gravity_w=jnp.asarray(g_w),
        R_cb=jnp.eye(3),
        t_cb=jnp.zeros(3),
    )
    return viprob, R_true, t_true, pts_true, v_true


def test_vi_ba_converges(cam, rng):
    viprob, R_true, t_true, pts_true, v_true = build_vi_problem(rng, cam)
    R, t, v, bg, ba_, pts, lns = vi_ba.solve_vi_ba(cam, viprob, OPT, IMU, iters=8)
    for w in range(1, 4):
        dR = np.asarray(R[w]) @ np.asarray(R_true[w]).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        terr = np.linalg.norm(np.asarray(t[w]) - np.asarray(t_true[w]))
        assert ang < 3e-3, (w, ang)
        assert terr < 1.5e-2, (w, terr)
    # velocities stay near truth; biases bounded
    np.testing.assert_allclose(np.asarray(v), np.tile(v_true, (4, 1)), atol=0.25)
    assert float(np.abs(np.asarray(bg)).max()) < 0.05


def test_vi_ba_fixed_pose_untouched(cam, rng):
    viprob, *_ = build_vi_problem(rng, cam)
    R, t, *_ = vi_ba.solve_vi_ba(cam, viprob, OPT, IMU, iters=4)
    np.testing.assert_allclose(np.asarray(R[0]), np.asarray(viprob.base.R[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(viprob.base.t[0]), atol=1e-6)


def test_vi_ba_imu_pulls_velocity(cam, rng):
    """Start velocities wrong: the chain factors must correct them."""
    viprob, R_true, t_true, pts_true, v_true = build_vi_problem(rng, cam)
    viprob = dataclasses.replace(viprob, v=viprob.v + jnp.asarray([1.0, -0.5, 0.4]))
    R, t, v, bg, ba_, pts, lns = vi_ba.solve_vi_ba(cam, viprob, OPT, IMU, iters=10)
    # the free poses' velocities should move back toward truth
    err0 = np.linalg.norm(np.asarray(viprob.v[1:]) - v_true[None], axis=1).mean()
    err1 = np.linalg.norm(np.asarray(v[1:]) - v_true[None], axis=1).mean()
    assert err1 < 0.5 * err0, (err0, err1)
