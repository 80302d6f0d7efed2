"""Unit tests for SO3/SE3/Sim3 ops against closed forms and round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import lie


def _rand_w(rng, n=64, scale=2.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_known_axis(self):
        # 90 deg about z
        R = lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_log_roundtrip(self, rng):
        w = _rand_w(rng)
        # keep |w| < pi for uniqueness
        w = w / (1.0 + jnp.linalg.norm(w, axis=-1, keepdims=True) / 3.0)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=2e-5)

    def test_log_small_angle(self):
        w = jnp.array([1e-8, -2e-8, 3e-8])
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-9)

    def test_log_near_pi(self):
        for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.6, 0.8, 0.0)]:
            w = jnp.asarray(axis, jnp.float32) * (np.pi - 1e-4)
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            np.testing.assert_allclose(lie.so3_exp(w2), R, atol=1e-4)

    def test_orthogonality(self, rng):
        R = lie.so3_exp(_rand_w(rng))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_right_jacobian_finite_diff(self, rng):
        w = jnp.asarray(rng.normal(size=3), jnp.float32) * 0.5
        Jr = lie.so3_right_jacobian(w)
        eps = 1e-3
        for i in range(3):
            dw = jnp.zeros(3).at[i].set(eps)
            # Exp(w + dw) ~ Exp(w) Exp(Jr dw)
            lhs = lie.so3_exp(w + dw)
            rhs = lie.so3_exp(w) @ lie.so3_exp(Jr @ dw)
            np.testing.assert_allclose(lhs, rhs, atol=5e-5)

    def test_right_jacobian_inverse(self, rng):
        w = _rand_w(rng, n=16, scale=1.0)
        J = lie.so3_right_jacobian(w)
        Jinv = lie.so3_right_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)

    def test_normalize_rotation(self, rng):
        R = lie.so3_exp(_rand_w(rng, n=8))
        noisy = R + jnp.asarray(rng.normal(size=R.shape) * 1e-3, jnp.float32)
        Rn = lie.normalize_rotation(noisy)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)), jnp.float32)
        xi = xi.at[:, 3:].multiply(0.6)
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi2, xi, atol=2e-5)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        R, t = lie.se3_exp(xi)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, [1, 2, 3], atol=1e-6)

    def test_inverse_compose(self, rng):
        xi = jnp.asarray(rng.normal(size=6), jnp.float32)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros(3), atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = jnp.asarray(rng.normal(size=6), jnp.float32)
        R, t = lie.se3_exp(xi)
        x = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        y = lie.se3_apply(R, t, x)
        T = lie.se3_matrix(R, t)
        xh = jnp.concatenate([x, jnp.ones((10, 1))], axis=-1)
        y2 = (T @ xh.T).T[:, :3]
        np.testing.assert_allclose(y, y2, atol=1e-5)


class TestSim3:
    def test_exp_reduces_to_se3(self, rng):
        xi6 = jnp.asarray(rng.normal(size=6), jnp.float32) * 0.5
        xi7 = jnp.concatenate([xi6, jnp.zeros(1)])
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(s7, 1.0, atol=1e-6)
        np.testing.assert_allclose(R7, R6, atol=1e-5)
        np.testing.assert_allclose(t7, t6, atol=1e-5)

    def test_inverse_compose(self, rng):
        xi = jnp.asarray(rng.normal(size=7), jnp.float32) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Rc, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(sc, 1.0, atol=1e-5)

    def test_apply(self, rng):
        xi = jnp.asarray(rng.normal(size=7), jnp.float32) * 0.5
        R, t, s = lie.sim3_exp(xi)
        x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        y = lie.sim3_apply(R, t, s, x)
        y2 = s * (R @ x.T).T + t
        np.testing.assert_allclose(y, y2, atol=1e-5)


class TestQuat:
    def test_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        R = lie.so3_exp(w)
        q = lie.quat_from_rotation(R)
        R2 = lie.rotation_from_quat(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-6)

    def test_identity(self):
        q = lie.quat_from_rotation(jnp.eye(3))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)


class TestJit:
    def test_all_jittable(self, rng):
        w = _rand_w(rng, n=4)
        jax.jit(lie.so3_exp)(w)
        jax.jit(lie.so3_log)(lie.so3_exp(w))
        xi = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        jax.jit(lie.se3_exp)(xi)
        jax.jit(lambda a: lie.se3_log(*lie.se3_exp(a)))(xi)
