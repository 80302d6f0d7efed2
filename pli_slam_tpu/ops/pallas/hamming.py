"""Pallas TPU kernel: fused gated Hamming nearest-neighbor matching.

The XLA path (ops/matching.py) materializes the [N, P] distance matrix
plus several same-shaped gate/select intermediates in HBM — at the
production budget (1280 frame features x 16384 landmarks) that is
~80 MB of traffic per materialized tensor. This kernel fuses the whole
search: each grid step loads one landmark tile into VMEM, runs the
int8 descriptor product on the MXU, applies the spatial window gate
inline, and folds a running (best, second-best, argmin) reduction in
VMEM scratch. HBM traffic drops to the inputs plus three [N] outputs.

Semantics match matching.match_nn(dist, valid1, valid2, gate=window&valid,
max_dist, ratio) for the window gate used by tracking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # plain float: a jnp scalar would be captured as a traced constant


def _kernel(
    r2_ref,  # [1, 1] f32 in SMEM — squared window radius (runtime scalar:
    #          tracking widens the window when no motion model exists)
    fdesc_ref,  # [N, 256] int8  (frame descriptors, full block)
    fuv_ref,  # [N, 2] f32
    fvalid_ref,  # [N, 1] f32 (1/0)
    sdesc_ref,  # [Pt, 256] int8 (store tile)
    suv_ref,  # [Pt, 2] f32 (projected store uv)
    svalid_ref,  # [Pt, 1] f32
    best_ref,  # [N, 1] f32 out
    second_ref,  # [N, 1] f32 out
    idx_ref,  # [N, 1] i32 out
    *,
    tile: int,  # rows per store tile (static)
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, BIG)
        second_ref[:] = jnp.full_like(second_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    n_bits = fdesc_ref.shape[1]
    # hamming = (bits - dot(pm1, pm1)) / 2 on the MXU
    dot = jax.lax.dot_general(
        fdesc_ref[:], sdesc_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = (n_bits - dot).astype(jnp.float32) * 0.5  # [N, Pt]

    du = fuv_ref[:, 0:1] - suv_ref[:, 0][None, :]
    dv = fuv_ref[:, 1:2] - suv_ref[:, 1][None, :]
    gate = (du * du + dv * dv) <= r2_ref[0, 0]
    gate = gate & (svalid_ref[:, 0][None, :] > 0) & (fvalid_ref[:, 0:1] > 0)
    dist = jnp.where(gate, dist, BIG)

    tile_min = jnp.min(dist, axis=1, keepdims=True)  # [N,1]
    tile_arg = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]
    # second-best within the tile: mask out the argmin column
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(cols == tile_arg, BIG, dist)
    tile_second = jnp.min(dist2, axis=1, keepdims=True)

    prev_best = best_ref[:]
    prev_second = second_ref[:]
    prev_idx = idx_ref[:]

    new_idx_global = tile_arg + t * tile  # this tile's base row
    better = tile_min < prev_best
    best_ref[:] = jnp.where(better, tile_min, prev_best)
    idx_ref[:] = jnp.where(better, new_idx_global, prev_idx)
    # second-best across tiles: min of (loser of best-contest, both seconds)
    second_ref[:] = jnp.minimum(
        jnp.where(better, prev_best, tile_min), jnp.minimum(prev_second, tile_second)
    )


def gated_match_pallas(
    fdesc: jax.Array,  # [N, 256] int8 ±1
    fuv: jax.Array,  # [N, 2] f32
    fvalid: jax.Array,  # [N] bool
    sdesc: jax.Array,  # [P, 256] int8
    suv: jax.Array,  # [P, 2] f32 projected store positions
    svalid: jax.Array,  # [P] bool
    radius: float | jax.Array,
    max_dist: float = 100.0,
    ratio: float = 1.0,
    tile: int = 2048,
    interpret: bool = False,
):
    """Fused match: returns (idx [N] int32, best [N] f32, ok [N] bool)."""
    n, bits = fdesc.shape
    p = sdesc.shape[0]
    assert p % tile == 0, (p, tile)
    n_tiles = p // tile

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, bits), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n, 2), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tile, bits), lambda t: (t, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda t: (t, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
    )
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1, 1)

    best, second, idx = pl.pallas_call(
        partial(_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        r2, fdesc, fuv, fvalid.astype(jnp.float32)[:, None],
        sdesc, suv, svalid.astype(jnp.float32)[:, None],
    )
    best = best[:, 0]
    second = second[:, 0]
    idx = idx[:, 0]
    ok = fvalid & (best <= max_dist) & (idx >= 0)
    if ratio < 1.0:
        ok = ok & (best < ratio * second)
    return idx, best, ok
