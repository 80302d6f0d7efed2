"""Distributed Schur-complement bundle adjustment over a device mesh.

The reference has no distributed computing at all (SURVEY.md §2.3); its
LocalBundleAdjustment is a single-threaded g2o solve over a shared-memory
heap. Here the BA problem is partitioned the TPU-native way:

- LANDMARKS (and their observations) are sharded across the mesh axis —
  the huge, embarrassingly-parallel side of the problem;
- POSES are replicated (the pose window is tiny: W <= ~16);
- each device assembles its shard's contribution to the reduced camera
  system S = Hpp - Hpl Hll^-1 Hlp, which is `psum`-reduced over ICI;
- the dense [6W, 6W] solve is computed redundantly on every device
  (cheaper than a broadcast), and landmark back-substitution is local.

This is the distributed analog of the reference's `Marginalize`
(src/Optimizer.cc:5125) and scales to pod slices by letting the psum
ride ICI within a slice and DCN across hosts, per the north star.

The per-shard math is exactly solve/ba.py with `axis_name` set, so the
single-chip and distributed paths cannot drift apart.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pli_slam_tpu.solve import ba as ba_mod
from pli_slam_tpu.utils.config import OptimizerConfig

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def partition_observations(
    prob: ba_mod.BAProblem, n_shards: int, compact: bool = True
) -> ba_mod.BAProblem:
    """Re-index a pose-major problem into `n_shards` landmark shards.

    Landmarks are split into contiguous blocks; each observation row is
    kept pose-major inside its shard (the solve/ba.py layout invariant
    holds per shard because a landmark lives in exactly one shard and
    per-pose slot ids were unique globally). Observation slots whose
    landmark belongs to another shard are masked out locally — across
    all shards every observation is counted exactly once.

    With `compact` (default), each shard's observation arrays are
    GATHERED down to (a small pad over) the rows it owns instead of
    carrying the full masked-out global arrays: per-shard linearization
    work then scales ~1/n_shards, which is what makes the distributed
    solve load-balanced at production shapes (16k landmarks / 100k
    observations) rather than merely correct.
    """
    P_total = prob.pts.shape[0]
    L_total = prob.lns.shape[0]
    assert P_total % n_shards == 0 and L_total % n_shards == 0
    p_blk = P_total // n_shards
    l_blk = L_total // n_shards

    def shard_obs(idx, blk):
        # per-shard local index or -1
        owner = jnp.where(idx >= 0, idx // blk, -1)
        local = jnp.where(idx >= 0, idx % blk, -1)
        return owner, local

    own_p, loc_p = shard_obs(prob.po_pt, p_blk)
    own_l, loc_l = shard_obs(prob.lo_ln, l_blk)

    if compact:
        own_p_np = np.asarray(own_p)
        own_l_np = np.asarray(own_l)
        po_rows = [np.nonzero(own_p_np == s)[0] for s in range(n_shards)]
        lo_rows = [np.nonzero(own_l_np == s)[0] for s in range(n_shards)]
        po_cap = max(max((len(r) for r in po_rows), default=1), 1)
        lo_cap = max(max((len(r) for r in lo_rows), default=1), 1)

        def pad_rows(rows, cap):
            out = np.zeros(cap, np.int64)  # padded rows point at row 0...
            out[: len(rows)] = rows
            keep = np.zeros(cap, bool)
            keep[: len(rows)] = True  # ...and are masked off here
            return jnp.asarray(out), jnp.asarray(keep)

    reps = []
    for s in range(n_shards):
        rep = dataclasses.replace(
            prob,
            pts=prob.pts[s * p_blk : (s + 1) * p_blk],
            pt_mask=prob.pt_mask[s * p_blk : (s + 1) * p_blk],
            lns=prob.lns[s * l_blk : (s + 1) * l_blk],
            ln_mask=prob.ln_mask[s * l_blk : (s + 1) * l_blk],
            po_pt=jnp.where(own_p == s, loc_p, -1),
            po_mask=prob.po_mask & (own_p == s),
            lo_ln=jnp.where(own_l == s, loc_l, -1),
            lo_mask=prob.lo_mask & (own_l == s),
        )
        if compact:
            pr, pk = pad_rows(po_rows[s], po_cap)
            lr, lk = pad_rows(lo_rows[s], lo_cap)
            rep = dataclasses.replace(
                rep,
                po_pose=rep.po_pose[pr], po_pt=rep.po_pt[pr],
                po_uvr=rep.po_uvr[pr], po_stereo=rep.po_stereo[pr],
                po_sigma2=rep.po_sigma2[pr], po_mask=rep.po_mask[pr] & pk,
                lo_pose=rep.lo_pose[lr], lo_ln=rep.lo_ln[lr],
                lo_l=rep.lo_l[lr], lo_sigma2=rep.lo_sigma2[lr],
                lo_mask=rep.lo_mask[lr] & lk,
            )
        reps.append(rep)
    # stack shard-locals along the leading (sharded) axis
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *reps)


def solve_ba_distributed(
    cam, prob_stacked: ba_mod.BAProblem, cfg: OptimizerConfig, mesh: Mesh, iters: int | None = None
) -> ba_mod.BAResult:
    """Run distributed BA. `prob_stacked` is the output of
    `partition_observations` — every array has a leading shard axis.

    Returns a BAResult whose landmark arrays keep the shard axis
    (concatenate on the host to recover the global stores) and whose
    pose arrays are replicated (identical on all shards).
    """
    from jax import shard_map

    spec_sharded = ba_mod.BAProblem(
        R=P(), t=P(), pose_mask=P(), fixed_mask=P(),
        pts=P(AXIS), pt_mask=P(AXIS), lns=P(AXIS), ln_mask=P(AXIS),
        po_pose=P(AXIS), po_pt=P(AXIS), po_uvr=P(AXIS), po_stereo=P(AXIS),
        po_sigma2=P(AXIS), po_mask=P(AXIS),
        lo_pose=P(AXIS), lo_ln=P(AXIS), lo_l=P(AXIS), lo_sigma2=P(AXIS), lo_mask=P(AXIS),
    )
    out_spec = ba_mod.BAResult(
        R=P(), t=P(), pts=P(AXIS), lns=P(AXIS), po_chi2=P(AXIS), lo_chi2=P(AXIS), cost=P()
    )

    # poses are replicated: drop the leading shard axis from pose fields
    prob_in = dataclasses.replace(
        prob_stacked,
        R=prob_stacked.R[0], t=prob_stacked.t[0],
        pose_mask=prob_stacked.pose_mask[0], fixed_mask=prob_stacked.fixed_mask[0],
    )

    _POSE_FIELDS = {"R", "t", "pose_mask", "fixed_mask"}

    def body(prob_local: ba_mod.BAProblem) -> ba_mod.BAResult:
        # shard_map passes each sharded field with a leading axis of size 1
        kw = {
            f.name: getattr(prob_local, f.name)
            if f.name in _POSE_FIELDS
            else getattr(prob_local, f.name)[0]
            for f in dataclasses.fields(ba_mod.BAProblem)
        }
        res = ba_mod.solve_ba(cam, ba_mod.BAProblem(**kw), cfg, iters=iters, axis_name=AXIS)
        return ba_mod.BAResult(
            R=res.R, t=res.t,
            pts=res.pts[None], lns=res.lns[None],
            po_chi2=res.po_chi2[None], lo_chi2=res.lo_chi2[None],
            cost=res.cost,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_sharded,),
        out_specs=out_spec,
    )
    return jax.jit(fn)(prob_in)


def solve_gba_distributed(
    cam, prob_stacked: ba_mod.BAProblem, cfg: OptimizerConfig, mesh: Mesh,
    iters: int | None = None, wcap: int = 16,
) -> ba_mod.BAResult:
    """Distributed whole-map GBA: the alternating (resection-intersection)
    solver with landmarks sharded across the mesh. The landmark step is
    embarrassingly parallel; the pose step psum-reduces [K,6,6]+[K,6]
    per-pose blocks — the only collective traffic per iteration
    (reference analog: the RunGlobalBundleAdjustment background thread,
    src/LoopClosing.cc:2243, here scaled across chips instead of hidden
    on a second core)."""
    from jax import shard_map

    spec_sharded = ba_mod.BAProblem(
        R=P(), t=P(), pose_mask=P(), fixed_mask=P(),
        pts=P(AXIS), pt_mask=P(AXIS), lns=P(AXIS), ln_mask=P(AXIS),
        po_pose=P(AXIS), po_pt=P(AXIS), po_uvr=P(AXIS), po_stereo=P(AXIS),
        po_sigma2=P(AXIS), po_mask=P(AXIS),
        lo_pose=P(AXIS), lo_ln=P(AXIS), lo_l=P(AXIS), lo_sigma2=P(AXIS), lo_mask=P(AXIS),
    )
    out_spec = ba_mod.BAResult(
        R=P(), t=P(), pts=P(AXIS), lns=P(AXIS), po_chi2=P(AXIS), lo_chi2=P(AXIS), cost=P()
    )
    prob_in = dataclasses.replace(
        prob_stacked,
        R=prob_stacked.R[0], t=prob_stacked.t[0],
        pose_mask=prob_stacked.pose_mask[0], fixed_mask=prob_stacked.fixed_mask[0],
    )
    _POSE_FIELDS = {"R", "t", "pose_mask", "fixed_mask"}

    def body(prob_local: ba_mod.BAProblem) -> ba_mod.BAResult:
        kw = {
            f.name: getattr(prob_local, f.name)
            if f.name in _POSE_FIELDS
            else getattr(prob_local, f.name)[0]
            for f in dataclasses.fields(ba_mod.BAProblem)
        }
        res = ba_mod.solve_ba_alternating(
            cam, ba_mod.BAProblem(**kw), cfg, iters=iters, wcap=wcap, axis_name=AXIS
        )
        return ba_mod.BAResult(
            R=res.R, t=res.t,
            pts=res.pts[None], lns=res.lns[None],
            po_chi2=res.po_chi2[None], lo_chi2=res.lo_chi2[None],
            cost=res.cost,
        )

    fn = shard_map(body, mesh=mesh, in_specs=(spec_sharded,), out_specs=out_spec)
    return jax.jit(fn)(prob_in)
