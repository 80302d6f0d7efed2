"""Tests for robust weights and MAD statistics with masked/padded inputs."""

import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.ops import robust


def test_cauchy_weight():
    assert float(robust.cauchy_weight(jnp.array(0.0))) == 1.0
    w = robust.cauchy_weight(jnp.array(4.0), c2=1.0)
    np.testing.assert_allclose(w, 1.0 / 5.0, atol=1e-6)


def test_huber_weight():
    np.testing.assert_allclose(robust.huber_weight(jnp.array(0.25), delta=1.0), 1.0)
    np.testing.assert_allclose(robust.huber_weight(jnp.array(4.0), delta=1.0), 0.5, atol=1e-6)


def test_masked_median_ignores_padding(rng):
    x = jnp.asarray([1.0, 2.0, 3.0, 999.0, -999.0])
    mask = jnp.asarray([True, True, True, False, False])
    np.testing.assert_allclose(robust.masked_median(x, mask), 2.0)


def test_masked_median_even_count():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0, 0.0])
    mask = jnp.asarray([True, True, True, True, False])
    np.testing.assert_allclose(robust.masked_median(x, mask), 2.5)


def test_mad_sigma_gaussian(rng):
    x = jnp.asarray(rng.normal(0, 2.0, size=4096), jnp.float32)
    mask = jnp.ones(4096, bool)
    sigma = float(robust.mad_sigma(x, mask))
    assert 1.8 < sigma < 2.2


def test_mad_inlier_mask_rejects_outliers(rng):
    x = np.concatenate([rng.normal(0, 1.0, size=100), [50.0, -80.0]])
    mask = np.ones(102, bool)
    inliers = robust.mad_inlier_mask(jnp.asarray(x, jnp.float32), jnp.asarray(mask), k=4.0)
    assert not bool(inliers[100]) and not bool(inliers[101])
    assert int(jnp.sum(inliers)) >= 95


def test_empty_mask_is_safe():
    x = jnp.zeros(8)
    mask = jnp.zeros(8, bool)
    assert np.isfinite(float(robust.masked_median(x, mask)))
    assert np.isfinite(float(robust.mad_sigma(x, mask)))
