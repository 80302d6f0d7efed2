"""Pallas fused gated Hamming matcher vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import matching
from pli_slam_tpu.ops.pallas import hamming


def make_case(rng, n=64, p=256):
    fdesc = jnp.asarray(rng.choice([-1, 1], size=(n, 256)), jnp.int8)
    # store contains noisy copies of the frame descriptors at known rows
    sdesc = jnp.asarray(rng.choice([-1, 1], size=(p, 256)), jnp.int8)
    perm = rng.permutation(p)[:n]
    noisy = np.asarray(fdesc).copy()
    for i in range(n):
        noisy[i, rng.choice(256, size=6, replace=False)] *= -1
    sdesc = sdesc.at[jnp.asarray(perm)].set(jnp.asarray(noisy))
    fuv = jnp.asarray(rng.uniform(0, 500, size=(n, 2)), jnp.float32)
    suv = jnp.asarray(rng.uniform(0, 500, size=(p, 2)), jnp.float32)
    suv = suv.at[jnp.asarray(perm)].set(fuv + jnp.asarray(rng.normal(size=(n, 2)) * 2, jnp.float32))
    fvalid = jnp.ones(n, bool)
    svalid = jnp.ones(p, bool)
    return fdesc, fuv, fvalid, sdesc, suv, svalid, perm


def xla_reference(fdesc, fuv, fvalid, sdesc, suv, svalid, radius, max_dist, ratio):
    dist = matching.hamming_matrix(fdesc, sdesc)
    gate = matching.window_gate(fuv, suv, radius) & svalid[None, :]
    return matching.match_nn(dist, fvalid, svalid, gate, max_dist=max_dist, ratio=ratio)


def test_matches_xla_reference(rng):
    args = make_case(rng)
    fdesc, fuv, fvalid, sdesc, suv, svalid, perm = args
    idx_p, best_p, ok_p = hamming.gated_match_pallas(
        fdesc, fuv, fvalid, sdesc, suv, svalid, radius=15.0, max_dist=60.0,
        tile=64, interpret=True,
    )
    idx_x, best_x, ok_x = xla_reference(fdesc, fuv, fvalid, sdesc, suv, svalid, 15.0, 60.0, 1.0)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    m = np.asarray(ok_x)
    np.testing.assert_array_equal(np.asarray(idx_p)[m], np.asarray(idx_x)[m])
    np.testing.assert_allclose(np.asarray(best_p)[m], np.asarray(best_x)[m])


def test_finds_planted_matches(rng):
    fdesc, fuv, fvalid, sdesc, suv, svalid, perm = make_case(rng)
    idx_p, best_p, ok_p = hamming.gated_match_pallas(
        fdesc, fuv, fvalid, sdesc, suv, svalid, radius=15.0, max_dist=30.0,
        tile=64, interpret=True,
    )
    hit = np.asarray(idx_p) == perm
    assert hit[np.asarray(ok_p)].mean() > 0.95


def test_ratio_test_cross_tile(rng):
    """Best and second-best in different tiles must still ratio-test correctly."""
    n, p = 8, 128
    fdesc = jnp.asarray(rng.choice([-1, 1], size=(n, 256)), jnp.int8)
    sdesc = jnp.zeros((p, 256), jnp.int8)
    # best copy in tile 0 (row 3), near-copy in tile 1 (row 70)
    sdesc = sdesc.at[3].set(fdesc[0])
    near = np.asarray(fdesc[0]).copy()
    near[rng.choice(256, size=4, replace=False)] *= -1
    sdesc = sdesc.at[70].set(jnp.asarray(near))
    fuv = jnp.zeros((n, 2))
    suv = jnp.zeros((p, 2))
    fvalid = jnp.zeros(n, bool).at[0].set(True)
    svalid = jnp.zeros(p, bool).at[3].set(True).at[70].set(True)
    idx, best, ok = hamming.gated_match_pallas(
        fdesc, fuv, fvalid, sdesc, suv, svalid, radius=50.0, max_dist=60.0,
        ratio=0.6, tile=64, interpret=True,
    )
    # best dist 0 (row 3), second 2 (row 70): ratio 0 < 0.6 -> ok
    assert int(idx[0]) == 3 and bool(ok[0])
    # now make the two candidates equally good -> ratio test must kill it
    sdesc2 = sdesc.at[70].set(fdesc[0])
    idx2, best2, ok2 = hamming.gated_match_pallas(
        fdesc, fuv, fvalid, sdesc2, suv, svalid, radius=50.0, max_dist=60.0,
        ratio=0.6, tile=64, interpret=True,
    )
    assert not bool(ok2[0])
