"""Tests for image ops, FAST detection, ORB extraction, and Hamming matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import fast as fast_ops
from pli_slam_tpu.ops import image as image_ops
from pli_slam_tpu.ops import matching, orb
from pli_slam_tpu.utils.config import OrbConfig


def checkerboard(h=96, w=128, sq=16, lo=40.0, hi=200.0):
    ys, xs = np.mgrid[0:h, 0:w]
    board = ((ys // sq + xs // sq) % 2).astype(np.float32)
    return jnp.asarray(lo + board * (hi - lo))


def textured_image(rng, h=96, w=128, n_blobs=40):
    """Random bright squares on dark background — corner-rich."""
    img = np.full((h, w), 30.0, np.float32)
    for _ in range(n_blobs):
        y = rng.integers(8, h - 16)
        x = rng.integers(8, w - 16)
        s = rng.integers(4, 12)
        img[y : y + s, x : x + s] = rng.uniform(120, 250)
    return jnp.asarray(img)


class TestImageOps:
    def test_blur_preserves_mean(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, size=(64, 64)), jnp.float32)
        out = image_ops.gaussian_blur(img)
        np.testing.assert_allclose(float(out.mean()), float(img.mean()), rtol=0.02)
        assert float(out.std()) < float(img.std())

    def test_resize_constant(self):
        img = jnp.full((64, 64), 7.0)
        out = image_ops.bilinear_resize(img, 40, 52)
        np.testing.assert_allclose(out, 7.0, atol=1e-4)
        assert out.shape == (40, 52)

    def test_pyramid_shapes(self):
        shapes = image_ops.pyramid_shapes(480, 752, 8, 1.2)
        assert shapes[0] == (480, 752)
        assert len(shapes) == 8
        assert shapes[1][0] == 400  # 480/1.2

    def test_bilinear_sample_exact_at_pixels(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, size=(32, 32)), jnp.float32)
        uv = jnp.asarray([[3.0, 5.0], [10.0, 20.0]])
        vals = image_ops.bilinear_sample(img, uv)
        np.testing.assert_allclose(vals, [img[5, 3], img[20, 10]], atol=1e-4)


class TestFast:
    def test_detects_square_corners(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[20:40, 20:40] = 220.0
        score, keep = fast_ops.detect(jnp.asarray(img), 20.0)
        ys, xs = np.nonzero(np.asarray(keep))
        assert len(ys) >= 4
        # every detection should be near one of the 4 square corners
        corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
        for y, x in zip(ys, xs):
            d = np.abs(corners - [y, x]).sum(axis=1).min()
            assert d <= 4, (y, x)

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        _, keep = fast_ops.detect(img, 20.0)
        assert int(keep.sum()) == 0

    def test_threshold_monotone(self, rng):
        img = textured_image(rng)
        _, k1 = fast_ops.detect(img, 10.0)
        _, k2 = fast_ops.detect(img, 60.0)
        assert int(k2.sum()) <= int(k1.sum())


class TestOrb:
    def test_extract_budget_and_masks(self, rng):
        cfg = OrbConfig(n_features=256, n_levels=3)
        feats = orb.extract(textured_image(rng, 96, 128), cfg)
        assert feats.capacity == 256
        n = int(feats.count())
        assert 30 < n <= 256
        # valid features are inside the image
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 128).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 96).all()
        # invalid rows have zero descriptors
        d = np.asarray(feats.desc)[~np.asarray(feats.valid)]
        assert (d == 0).all()

    def test_level_counts_sum(self):
        counts = orb.level_feature_counts(1200, 8, 1.2)
        assert sum(counts) == 1200
        assert counts[0] > counts[-1] > 0

    def test_descriptor_rotation_invariance(self, rng):
        """Rotating the image by 90 deg should keep descriptors similar."""
        cfg = OrbConfig(n_features=64, n_levels=1)
        img = textured_image(rng, 96, 96)
        f1 = orb.extract(img, cfg)
        f2 = orb.extract(jnp.rot90(img), cfg)
        d = matching.hamming_matrix(f1.desc, f2.desc)
        idx2, best, ok = matching.match_nn(d, f1.valid, f2.valid, max_dist=60.0)
        # rotated coords: (x, y) -> (y, W-1-x) for rot90(ccw)
        uv1 = np.asarray(f1.uv)
        uv2 = np.asarray(f2.uv)
        okn = np.asarray(ok)
        idx = np.asarray(idx2)
        good = 0
        for i in np.nonzero(okn)[0]:
            x, y = uv1[i]
            exp = np.array([y, 96 - 1 - x])
            if np.abs(uv2[idx[i]] - exp).max() < 3.0:
                good += 1
        assert good >= 0.5 * max(okn.sum(), 1), (good, okn.sum())

    def test_pack_unpack_roundtrip(self, rng):
        d = jnp.asarray(rng.choice([-1, 1], size=(16, 256)), jnp.int8)
        packed = orb.pack_descriptors(d)
        assert packed.shape == (16, 8)
        np.testing.assert_array_equal(orb.unpack_descriptors(packed), d)


class TestMatching:
    def test_hamming_identity(self, rng):
        d = jnp.asarray(rng.choice([-1, 1], size=(32, 256)), jnp.int8)
        dist = matching.hamming_matrix(d, d)
        np.testing.assert_allclose(np.diag(np.asarray(dist)), 0.0)

    def test_hamming_known_distance(self):
        d1 = jnp.ones((1, 256), jnp.int8)
        d2 = jnp.ones((1, 256), jnp.int8).at[0, :10].set(-1)
        np.testing.assert_allclose(matching.hamming_matrix(d1, d2), [[10.0]])

    def test_nn_with_noise(self, rng):
        base = rng.choice([-1, 1], size=(64, 256)).astype(np.int8)
        noisy = base.copy()
        for i in range(64):
            flip = rng.choice(256, size=8, replace=False)
            noisy[i, flip] *= -1
        perm = rng.permutation(64)
        d1 = jnp.asarray(base)
        d2 = jnp.asarray(noisy[perm])
        v = jnp.ones(64, bool)
        idx2, best, ok = matching.match_descriptors(d1, d2, v, v, max_dist=20.0)
        inv = np.empty(64, int)
        inv[perm] = np.arange(64)
        np.testing.assert_array_equal(np.asarray(idx2), inv)
        assert bool(ok.all())

    def test_gate_blocks_matches(self, rng):
        d = jnp.asarray(rng.choice([-1, 1], size=(8, 256)), jnp.int8)
        v = jnp.ones(8, bool)
        gate = jnp.zeros((8, 8), bool)
        _, _, ok = matching.match_descriptors(d, d, v, v, gate=gate)
        assert not bool(ok.any())

    def test_window_gate(self):
        uv1 = jnp.asarray([[0.0, 0.0], [100.0, 100.0]])
        uv2 = jnp.asarray([[3.0, 4.0], [100.0, 108.0]])
        g = matching.window_gate(uv1, uv2, radius=6.0)
        np.testing.assert_array_equal(np.asarray(g), [[True, False], [False, False]])

    def test_rotation_consistency(self, rng):
        n = 100
        a1 = jnp.asarray(rng.uniform(0, 2 * np.pi, size=n), jnp.float32)
        # consistent rotation of 0.3 rad for most, random for 10 outliers
        a2 = a1 - 0.3
        a2 = a2.at[:10].set(jnp.asarray(rng.uniform(0, 2 * np.pi, size=10), jnp.float32))
        # make outlier deltas far from 0.3
        idx2 = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones(n, bool)
        kept = matching.rotation_consistency(a1, a2, idx2, ok)
        assert int(kept[10:].sum()) == 90
