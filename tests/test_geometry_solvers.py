"""Tests for triangulation, two-view reconstruction, and batched PnP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops import lie
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.solve import pnp, triangulate, twoview


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def two_view_scene(rng, cam, n=128, noise=0.3):
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], -1).astype(np.float32)
    R1, t1 = jnp.eye(3), jnp.zeros(3)
    xi = jnp.asarray([0.6, 0.05, 0.1, 0.02, -0.25, 0.03], jnp.float32)  # baseline mostly x
    R2, t2 = lie.se3_exp(xi)
    x1 = lie.se3_apply(R1, t1, jnp.asarray(X))
    x2 = lie.se3_apply(R2, t2, jnp.asarray(X))
    uv1 = np.asarray(cam_ops.project(cam, x1)) + rng.normal(size=(n, 2)) * noise
    uv2 = np.asarray(cam_ops.project(cam, x2)) + rng.normal(size=(n, 2)) * noise
    return X, (R1, t1), (R2, t2), jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)


class TestTriangulate:
    def test_dlt_recovers_points(self, cam, rng):
        X, (R1, t1), (R2, t2), uv1, uv2 = two_view_scene(rng, cam, noise=0.0)
        r1 = cam_ops.unproject(cam, uv1)
        r2 = cam_ops.unproject(cam, uv2)
        Xr = triangulate.triangulate_dlt(R1, t1, R2, t2, r1, r2)
        np.testing.assert_allclose(np.asarray(Xr), X, atol=5e-2)

    def test_midpoint_close_to_dlt(self, cam, rng):
        X, (R1, t1), (R2, t2), uv1, uv2 = two_view_scene(rng, cam, noise=0.2)
        r1 = cam_ops.unproject(cam, uv1)
        r2 = cam_ops.unproject(cam, uv2)
        Xm, cospar = triangulate.triangulate_midpoint(R1, t1, R2, t2, r1, r2)
        err = np.linalg.norm(np.asarray(Xm) - X, axis=1)
        assert np.median(err) < 0.15, np.median(err)
        assert float(cospar.max()) < 1.0

    def test_checks_reject_behind_camera(self, cam, rng):
        X, (R1, t1), (R2, t2), uv1, uv2 = two_view_scene(rng, cam)
        X_bad = jnp.asarray(X).at[:, 2].set(-5.0)
        ok = triangulate.triangulation_checks(
            cam, R1, t1, R2, t2, X_bad, uv1, uv2, jnp.ones(len(X)), jnp.ones(len(X))
        )
        assert not bool(ok.any())

    def test_epipolar_gate(self, cam, rng):
        X, (R1, t1), (R2, t2), uv1, uv2 = two_view_scene(rng, cam, noise=0.1)
        g = triangulate.epipolar_gate(cam, R1, t1, R2, t2, uv1, uv2)
        diag = np.diag(np.asarray(g))
        assert diag.mean() > 0.9  # true matches lie on the epiline


class TestTwoView:
    def test_reconstruct(self, cam, rng):
        X, (R1, t1), (R2, t2), uv1, uv2 = two_view_scene(rng, cam, n=200, noise=0.4)
        out = twoview.reconstruct_two_views(
            cam, uv1, uv2, jnp.ones(200, bool), jax.random.PRNGKey(1)
        )
        assert bool(out["success"]), int(out["n_inliers"])
        # rotation should match truth (translation only up to scale)
        dR = np.asarray(out["R"]) @ np.asarray(R2).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        t_dir = np.asarray(out["t"])
        t_true = np.asarray(t2) / np.linalg.norm(np.asarray(t2))
        assert abs(float(np.dot(t_dir, t_true))) > 0.99

    def test_low_parallax_fails_gracefully(self, cam, rng):
        n = 100
        uv = jnp.asarray(rng.uniform(50, 700, size=(n, 2)), jnp.float32)
        out = twoview.reconstruct_two_views(
            cam, uv, uv + 0.01, jnp.ones(n, bool), jax.random.PRNGKey(2)
        )
        assert np.isfinite(np.asarray(out["R"])).all()


class TestPnP:
    def test_recovers_pose_with_outliers(self, cam, rng):
        n = 128
        X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], -1).astype(np.float32)
        xi = jnp.asarray([0.2, -0.1, 0.15, 0.05, 0.02, -0.04], jnp.float32)
        R, t = lie.se3_exp(xi)
        x_c = lie.se3_apply(R, t, jnp.asarray(X))
        uv = np.asarray(cam_ops.project(cam, x_c)) + rng.normal(size=(n, 2)) * 0.3
        depth = np.asarray(x_c[:, 2]) * (1 + rng.normal(size=n) * 0.02)
        # corrupt 30%
        n_out = 38
        uv[:n_out] = rng.uniform(0, 700, size=(n_out, 2))
        R_e, t_e, inl, n_in, ok = pnp.ransac_pnp(
            cam, jnp.asarray(X), jnp.asarray(uv, jnp.float32), jnp.asarray(depth, jnp.float32),
            jnp.ones(n, bool), jax.random.PRNGKey(0),
        )
        assert bool(ok)
        assert int(n_in) >= 70
        dR = np.asarray(R_e) @ np.asarray(R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.03, ang
        # the raw 3-point hypothesis inherits the 2% depth-seed noise;
        # solve_pnp's GN polish (next test) is what tightens translation
        assert np.linalg.norm(np.asarray(t_e) - np.asarray(t)) < 0.3

    def test_full_solve_polishes(self, cam, rng):
        n = 96
        X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], -1).astype(np.float32)
        xi = jnp.asarray([0.1, 0.2, -0.1, 0.03, -0.02, 0.05], jnp.float32)
        R, t = lie.se3_exp(xi)
        x_c = lie.se3_apply(R, t, jnp.asarray(X))
        uvr = np.array(cam_ops.stereo_project(cam, x_c))
        uvr[:, :2] += rng.normal(size=(n, 2)) * 0.3
        depth = np.asarray(x_c[:, 2])
        R_e, t_e, inl, n_in, ok = pnp.solve_pnp(
            cam, jnp.asarray(X), jnp.asarray(uvr[:, :2], jnp.float32),
            jnp.asarray(uvr[:, 2], jnp.float32), jnp.ones(n, bool),
            jnp.asarray(depth, jnp.float32), jnp.ones(n), jnp.ones(n, bool),
            jax.random.PRNGKey(3),
        )
        assert np.linalg.norm(np.asarray(t_e) - np.asarray(t)) < 0.02
