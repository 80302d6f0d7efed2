"""Camera model tests: project/unproject round-trips, Jacobians, stereo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops.camera import Camera


@pytest.fixture
def pinhole():
    # EuRoC-like rectified intrinsics
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9, width=752, height=480)


@pytest.fixture
def kb8():
    # TUM-VI-like fisheye
    return Camera.kannala_brandt8(
        fx=190.978, fy=190.973, cx=254.932, cy=256.897,
        k=[0.00348, 0.000715, -0.00205, 0.000202], width=512, height=512,
    )


def _rand_points(rng, n=128, depth_range=(0.5, 20.0)):
    z = rng.uniform(*depth_range, size=n)
    x = rng.uniform(-0.5, 0.5, size=n) * z
    y = rng.uniform(-0.4, 0.4, size=n) * z
    return jnp.asarray(np.stack([x, y, z], axis=-1), jnp.float32)


class TestPinhole:
    def test_project_center(self, pinhole):
        uv = cam_ops.project(pinhole, jnp.array([0.0, 0.0, 5.0]))
        np.testing.assert_allclose(uv, [pinhole.cx, pinhole.cy], atol=1e-4)

    def test_unproject_roundtrip(self, pinhole, rng):
        pts = _rand_points(rng)
        uv = cam_ops.project(pinhole, pts)
        rays = cam_ops.unproject(pinhole, uv)
        # ray * z should recover the point
        rec = rays * pts[:, 2:3]
        np.testing.assert_allclose(rec, pts, rtol=1e-4, atol=1e-3)

    def test_jacobian_vs_autodiff(self, pinhole, rng):
        pts = _rand_points(rng, n=16)
        J = cam_ops.project_jacobian(pinhole, pts)
        J_ad = jax.vmap(jax.jacfwd(lambda p: cam_ops.project(pinhole, p)))(pts)
        np.testing.assert_allclose(J, J_ad, rtol=1e-4, atol=1e-4)

    def test_stereo_consistency(self, pinhole, rng):
        pts = _rand_points(rng)
        uvr = cam_ops.stereo_project(pinhole, pts)
        disparity = uvr[:, 0] - uvr[:, 2]
        rec = cam_ops.back_project_stereo(pinhole, uvr[:, :2], disparity)
        np.testing.assert_allclose(rec, pts, rtol=1e-3, atol=1e-3)
        assert bool(jnp.all(disparity > 0))

    def test_in_image(self, pinhole):
        assert bool(cam_ops.in_image(pinhole, jnp.array([10.0, 10.0])))
        assert not bool(cam_ops.in_image(pinhole, jnp.array([-1.0, 10.0])))
        assert not bool(cam_ops.in_image(pinhole, jnp.array([10.0, 480.0])))


class TestKB8:
    def test_unproject_roundtrip(self, kb8, rng):
        pts = _rand_points(rng, n=64)
        uv = cam_ops.project(kb8, pts)
        rays = cam_ops.unproject(kb8, uv)
        rec = rays * pts[:, 2:3]
        np.testing.assert_allclose(rec, pts, rtol=5e-3, atol=5e-3)

    def test_center_projection(self, kb8):
        uv = cam_ops.project(kb8, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(uv, [kb8.cx, kb8.cy], atol=1e-3)

    def test_wide_angle(self, kb8):
        # 60 deg off-axis must stay in a fisheye image
        p = jnp.array([jnp.tan(jnp.deg2rad(60.0)), 0.0, 1.0])
        uv = cam_ops.project(kb8, p)
        assert bool(cam_ops.in_image(kb8, uv))

    def test_jacobian_shape(self, kb8, rng):
        pts = _rand_points(rng, n=8)
        J = cam_ops.project_jacobian(kb8, pts)
        assert J.shape == (8, 2, 3)


class TestPytree:
    def test_camera_is_pytree(self, pinhole):
        leaves = jax.tree_util.tree_leaves(pinhole)
        assert len(leaves) == 6  # fx fy cx cy k bf

    def test_jit_through_camera(self, pinhole, rng):
        pts = _rand_points(rng, n=8)
        f = jax.jit(cam_ops.project)
        np.testing.assert_allclose(f(pinhole, pts), cam_ops.project(pinhole, pts), atol=1e-6)
