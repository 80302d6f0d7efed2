"""Frame-pose GN solver tests: convergence from perturbed inits, outliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import lie
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.solve import gn
from pli_slam_tpu.utils.config import OptimizerConfig

CFG = OptimizerConfig()


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def make_scene(rng, cam, n_pts=128, n_lines=32, noise_px=0.3, outlier_frac=0.0):
    """Ground-truth pose + synthetic observations from world geometry."""
    xi_true = jnp.asarray(rng.normal(size=6) * np.array([0.3, 0.3, 0.3, 0.05, 0.05, 0.05]), jnp.float32)
    R_true, t_true = lie.se3_exp(xi_true)  # T_cw

    x_w = jnp.asarray(
        np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(4, 15, n_pts)], -1),
        jnp.float32,
    )
    x_c = lie.se3_apply(R_true, t_true, x_w)
    uvr = cam_ops.stereo_project(cam, x_c)
    uvr = uvr + jnp.asarray(rng.normal(size=uvr.shape) * noise_px, jnp.float32)
    n_out = int(outlier_frac * n_pts)
    if n_out:
        bad = jnp.asarray(rng.uniform(0, 400, size=(n_out, 3)), jnp.float32)
        uvr = uvr.at[:n_out].set(bad)

    # lines: world segments; observed infinite line from true projections
    xs_w = jnp.asarray(
        np.stack([rng.uniform(-4, 4, n_lines), rng.uniform(-3, 3, n_lines), rng.uniform(4, 15, n_lines)], -1),
        jnp.float32,
    )
    d = jnp.asarray(rng.normal(size=(n_lines, 3)), jnp.float32)
    xe_w = xs_w + d / jnp.linalg.norm(d, axis=-1, keepdims=True) * 1.5
    uv_s = cam_ops.project(cam, lie.se3_apply(R_true, t_true, xs_w))
    uv_e = cam_ops.project(cam, lie.se3_apply(R_true, t_true, xe_w))
    h_s = jnp.concatenate([uv_s, jnp.ones((n_lines, 1))], -1)
    h_e = jnp.concatenate([uv_e, jnp.ones((n_lines, 1))], -1)
    l_obs = jnp.cross(h_s, h_e)
    l_obs = l_obs / jnp.maximum(jnp.linalg.norm(l_obs[:, :2], axis=-1, keepdims=True), 1e-9)

    obs = gn.PoseObservations(
        x_w=x_w,
        uvr=uvr,
        stereo_mask=jnp.ones(n_pts, bool),
        point_mask=jnp.ones(n_pts, bool),
        sigma2_pt=jnp.ones(n_pts),
        xs_w=xs_w,
        xe_w=xe_w,
        l_obs=l_obs,
        line_mask=jnp.ones(n_lines, bool),
        sigma2_ln=jnp.ones(n_lines),
    )
    return R_true, t_true, obs


def pose_error(R, t, R_true, t_true):
    dR = np.asarray(R) @ np.asarray(R_true).T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(np.asarray(t) - np.asarray(t_true))


class TestPoseSolver:
    def test_converges_from_perturbation(self, cam, rng):
        R_true, t_true, obs = make_scene(rng, cam)
        dxi = jnp.asarray([0.1, -0.08, 0.05, 0.02, -0.03, 0.02])
        dR, dt = lie.se3_exp(dxi)
        R0 = lie._mm(dR, R_true)
        t0 = lie._einsum("ij,j->i", dR, t_true) + dt
        result = gn.solve_pose(cam, obs, R0, t0, CFG)
        ang, terr = pose_error(result.R_cw, result.t_cw, R_true, t_true)
        assert ang < 1e-3, ang
        assert terr < 5e-3, terr
        assert int(result.n_inliers) > 120

    def test_robust_to_outliers(self, cam, rng):
        R_true, t_true, obs = make_scene(rng, cam, outlier_frac=0.25)
        dxi = jnp.asarray([0.05, 0.05, -0.05, 0.01, 0.02, -0.01])
        dR, dt = lie.se3_exp(dxi)
        R0 = lie._mm(dR, R_true)
        t0 = lie._einsum("ij,j->i", dR, t_true) + dt
        result = gn.solve_pose(cam, obs, R0, t0, CFG)
        ang, terr = pose_error(result.R_cw, result.t_cw, R_true, t_true)
        assert ang < 2e-3, ang
        assert terr < 1e-2, terr
        # the planted outliers must be rejected
        inl = np.asarray(result.inlier_pt)
        assert inl[:32].sum() <= 3

    def test_lines_only(self, cam, rng):
        """With points masked out, lines alone should still fix rotation well."""
        R_true, t_true, obs = make_scene(rng, cam, n_lines=64)
        import dataclasses

        obs = dataclasses.replace(obs, point_mask=jnp.zeros_like(obs.point_mask))
        dxi = jnp.asarray([0.02, -0.02, 0.02, 0.01, -0.01, 0.005])
        dR, dt = lie.se3_exp(dxi)
        R0 = lie._mm(dR, R_true)
        t0 = lie._einsum("ij,j->i", dR, t_true) + dt
        result = gn.solve_pose(cam, obs, R0, t0, CFG)
        ang, _ = pose_error(result.R_cw, result.t_cw, R_true, t_true)
        assert ang < 5e-3, ang

    def test_jit_and_stability(self, cam, rng):
        R_true, t_true, obs = make_scene(rng, cam)
        f = jax.jit(lambda o, R, t: gn.solve_pose(cam, o, R, t, CFG))
        result = f(obs, R_true, t_true)  # starting at truth must stay near truth
        # (0.3 px observation noise bounds the ML solution away from the
        # noiseless ground truth — allow that statistical floor)
        ang, terr = pose_error(result.R_cw, result.t_cw, R_true, t_true)
        assert ang < 1e-3 and terr < 8e-3
        assert np.isfinite(float(result.cost))

    def test_empty_observations_safe(self, cam):
        n_p, n_l = 16, 8
        obs = gn.PoseObservations(
            x_w=jnp.zeros((n_p, 3)), uvr=jnp.zeros((n_p, 3)),
            stereo_mask=jnp.zeros(n_p, bool), point_mask=jnp.zeros(n_p, bool),
            sigma2_pt=jnp.ones(n_p),
            xs_w=jnp.zeros((n_l, 3)), xe_w=jnp.zeros((n_l, 3)),
            l_obs=jnp.zeros((n_l, 3)), line_mask=jnp.zeros(n_l, bool),
            sigma2_ln=jnp.ones(n_l),
        )
        result = gn.solve_pose(cam, obs, jnp.eye(3), jnp.zeros(3), CFG)
        assert int(result.n_inliers) == 0
        assert np.all(np.isfinite(np.asarray(result.R_cw)))
