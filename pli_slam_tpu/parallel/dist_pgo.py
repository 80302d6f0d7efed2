"""Distributed pose-graph optimization: edges sharded over a device mesh.

The reference's essential-graph optimization is a single-threaded g2o
sparse solve over the whole keyframe graph (src/Optimizer.cc:2437
`OptimizeEssentialGraph`, :8247 4-DoF inertial). Here the EDGE set —
the expensive side: per-edge residuals + two 7x7 Jacobians via forward
autodiff — is sharded across the mesh; node states are replicated
(K <= ~1000 keyframes is a few hundred KB). Each device:

1. linearizes its edge shard,
2. scatter-adds its local contribution into the dense [K*7, K*7]
   normal-equation blocks,
3. `psum`s H and g over the mesh axis (ICI),
4. solves the identical dense system redundantly (cheaper than a
   broadcast) and applies the same update.

The per-edge math is solve/pgo.py's — the single-device and distributed
paths share the residual/Jacobian code and cannot drift apart.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pli_slam_tpu.ops import lie
from pli_slam_tpu.solve import pgo as pgo_mod
from pli_slam_tpu.solve.pgo import PoseGraph

AXIS = "shard"
_HI = jax.lax.Precision.HIGHEST


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def partition_edges(graph: PoseGraph, n_shards: int) -> PoseGraph:
    """Pad the edge set to a multiple of `n_shards` and stack contiguous
    edge blocks along a leading shard axis; node state is replicated."""
    E = graph.e_i.shape[0]
    E_pad = ((E + n_shards - 1) // n_shards) * n_shards
    pad = E_pad - E

    def pad_e(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    e_i = pad_e(graph.e_i)
    e_j = pad_e(graph.e_j)
    e_R = pad_e(graph.e_R) + (jnp.eye(3) if pad else 0.0) * 0.0  # shape keep
    if pad:
        e_R = e_R.at[E:].set(jnp.eye(3))
    e_t = pad_e(graph.e_t)
    e_s = pad_e(graph.e_s)
    if pad:
        e_s = e_s.at[E:].set(1.0)
    e_w = pad_e(graph.e_weight)
    e_m = pad_e(graph.e_mask.astype(jnp.int32)).astype(bool)
    blk = E_pad // n_shards

    def shard(a):
        return a.reshape((n_shards, blk) + a.shape[1:])

    return dataclasses.replace(
        graph,
        e_i=shard(e_i), e_j=shard(e_j), e_R=shard(e_R), e_t=shard(e_t),
        e_s=shard(e_s), e_weight=shard(e_w), e_mask=shard(e_m),
    )


def optimize_distributed(
    stacked: PoseGraph,
    mesh: Mesh,
    iters: int = 20,
    mode: str = "sim3",
    damping: float = 1e-6,
) -> PoseGraph:
    """Distributed equivalent of solve/pgo.optimize(graph, iters, mode).

    `stacked` comes from partition_edges; returns a graph with the
    optimized (replicated) node states and the original stacked edges.
    """
    K = stacked.R.shape[0]
    dof = 7
    if mode == "sim3":
        pinned = ()
    elif mode == "se3":
        pinned = (6,)
    elif mode == "4dof":
        pinned = (3, 4, 6)
    else:
        raise ValueError(f"unknown pgo mode {mode!r}")
    perturbed = (
        pgo_mod._edge_residual_perturbed_right
        if mode == "4dof"
        else pgo_mod._edge_residual_perturbed
    )
    zeros7 = jnp.zeros(7)

    node_spec = PoseGraph(
        R=P(), t=P(), s=P(), node_mask=P(), fixed_mask=P(),
        e_i=P(AXIS), e_j=P(AXIS), e_R=P(AXIS), e_t=P(AXIS), e_s=P(AXIS),
        e_weight=P(AXIS), e_mask=P(AXIS),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(node_spec,),
        out_specs=PoseGraph(
            R=P(), t=P(), s=P(), node_mask=P(), fixed_mask=P(),
            e_i=P(AXIS), e_j=P(AXIS), e_R=P(AXIS), e_t=P(AXIS), e_s=P(AXIS),
            e_weight=P(AXIS), e_mask=P(AXIS),
        ),
    )
    def body(g: PoseGraph) -> PoseGraph:
        # local edge block: [1, blk, ...] -> [blk, ...]
        e_i = g.e_i[0]
        e_j = g.e_j[0]
        e_R, e_t, e_s = g.e_R[0], g.e_t[0], g.e_s[0]
        e_w, e_m = g.e_weight[0], g.e_mask[0]

        def linearize(R, t, s):
            Ri, ti, si = R[e_i], t[e_i], s[e_i]
            Rj, tj, sj = R[e_j], t[e_j], s[e_j]

            def one(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
                r = perturbed(zeros7, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
                Ji = jax.jacfwd(lambda x: perturbed(x, zeros7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm))(zeros7)
                Jj = jax.jacfwd(lambda x: perturbed(zeros7, x, Ri, ti, si, Rj, tj, sj, Rm, tm, sm))(zeros7)
                return r, Ji, Jj

            return jax.vmap(one)(Ri, ti, si, Rj, tj, sj, e_R, e_t, e_s)

        def iteration(_, carry):
            R, t, s = carry
            r, Ji, Jj = linearize(R, t, s)
            w = jnp.where(e_m, e_w, 0.0)

            H = jnp.zeros((K, K, dof, dof))
            gv = jnp.zeros((K, dof))
            Hii = jnp.einsum("eai,e,eaj->eij", Ji, w, Ji, precision=_HI)
            Hjj = jnp.einsum("eai,e,eaj->eij", Jj, w, Jj, precision=_HI)
            Hij = jnp.einsum("eai,e,eaj->eij", Ji, w, Jj, precision=_HI)
            H = H.at[e_i, e_i].add(Hii)
            H = H.at[e_j, e_j].add(Hjj)
            H = H.at[e_i, e_j].add(Hij)
            H = H.at[e_j, e_i].add(jnp.swapaxes(Hij, -1, -2))
            gv = gv.at[e_i].add(jnp.einsum("eai,e,ea->ei", Ji, w, r, precision=_HI))
            gv = gv.at[e_j].add(jnp.einsum("eai,e,ea->ei", Jj, w, r, precision=_HI))

            # the one collective: reduce the normal equations over shards
            H = jax.lax.psum(H, AXIS)
            gv = jax.lax.psum(gv, AXIS)

            free = (g.node_mask & ~g.fixed_mask).astype(H.dtype)
            H = H * free[:, None, None, None] * free[None, :, None, None]
            eye = jnp.eye(dof)
            H = H.at[jnp.arange(K), jnp.arange(K)].add(
                (1.0 - free)[:, None, None] * eye + damping * eye
            )
            gv = gv * free[:, None]
            for d in pinned:
                H = H.at[:, :, d, :].set(0.0)
                H = H.at[:, :, :, d].set(0.0)
                H = H.at[jnp.arange(K), jnp.arange(K), d, d].set(1.0)
                gv = gv.at[:, d].set(0.0)

            Hd = H.transpose(0, 2, 1, 3).reshape(K * dof, K * dof)
            delta = -jnp.linalg.solve(Hd, gv.reshape(-1)).reshape(K, dof)
            bad = ~jnp.all(jnp.isfinite(delta))
            delta = jnp.where(bad, 0.0, delta)
            dR, dt, ds = lie.sim3_exp(delta)
            if mode == "4dof":
                R2, t2, s2 = lie.sim3_compose(R, t, s, dR, dt, ds)
            else:
                R2, t2, s2 = lie.sim3_compose(dR, dt, ds, R, t, s)
            return lie.normalize_rotation(R2), t2, s2

        R, t, s = jax.lax.fori_loop(0, iters, iteration, (g.R, g.t, g.s))
        return dataclasses.replace(
            g,
            R=R, t=t, s=s,
            e_i=g.e_i, e_j=g.e_j, e_R=g.e_R, e_t=g.e_t, e_s=g.e_s,
            e_weight=g.e_weight, e_mask=g.e_mask,
        )

    return body(stacked)
