"""Windowed bundle adjustment with Schur-complement reduction, fully batched.

TPU-native replacement for the reference's g2o-based local BA
(reference: src/Optimizer.cc — `LocalBundleAdjustment` :1864,
`BundleAdjustment` :63, Schur marginalization `Marginalize` :5125) and
— improving on the reference, whose local BA is points-only — line
landmarks participate too (SURVEY.md Phase 4 notes the reference's gap).

Structure exploited: each observation couples exactly one pose and one
landmark, so the direct Hessian is

    [ Hpp (block-diag)   Hpl ]
    [ Hlp                Hll (block-diag) ]

Landmarks are eliminated in closed form (batched 3x3 / 6x6 inverses);
the reduced camera system S = Hpp - Hpl Hll^-1 Hlp is a dense
[6W, 6W] matrix (W = pose window <= ~16) solved by Cholesky. Assembly
is scatter-adds over padded observation arrays; gauge freedom is fixed
by masking rows/cols of fixed poses. The same assembly generalizes to
the distributed version (parallel/dist_ba.py) where landmark blocks are
sharded and S is `psum`-reduced across devices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops import lie, robust
from pli_slam_tpu.utils.config import OptimizerConfig

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Padded BA problem. All index arrays point into the padded stores.

    LAYOUT INVARIANT: observations are pose-major — `po_pose` must equal
    `repeat(arange(W), Op//W)` (same for `lo_pose`), and landmark ids
    must be unique within each pose's block of rows; empty slots carry
    id -1. Per-KF observation tables (worldmap.stores.KeyFrameStore)
    produce exactly this layout by construction. The assembly exploits
    it to avoid duplicate-handling scatters on TPU.
    """

    # poses (T_cw)
    R: jax.Array  # [W,3,3]
    t: jax.Array  # [W,3]
    pose_mask: jax.Array  # [W] bool — pose slot exists
    fixed_mask: jax.Array  # [W] bool — pose is fixed (gauge / boundary)
    # point landmarks
    pts: jax.Array  # [P,3]
    pt_mask: jax.Array  # [P] bool
    # line landmarks (endpoints stacked)
    lns: jax.Array  # [L,6] (xs, xe)
    ln_mask: jax.Array  # [L] bool
    # point observations
    po_pose: jax.Array  # [Op] int32
    po_pt: jax.Array  # [Op] int32
    po_uvr: jax.Array  # [Op,3]
    po_stereo: jax.Array  # [Op] bool
    po_sigma2: jax.Array  # [Op]
    po_mask: jax.Array  # [Op] bool
    # line observations
    lo_pose: jax.Array  # [Ol] int32
    lo_ln: jax.Array  # [Ol] int32
    lo_l: jax.Array  # [Ol,3] normalized image line
    lo_sigma2: jax.Array  # [Ol]
    lo_mask: jax.Array  # [Ol] bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAResult:
    R: jax.Array
    t: jax.Array
    pts: jax.Array
    lns: jax.Array
    po_chi2: jax.Array  # [Op] final per-observation chi2
    lo_chi2: jax.Array  # [Ol]
    cost: jax.Array


def _point_obs_linearize(cam, prob: BAProblem, R, t, pts):
    """Residuals + Jacobians for every point observation. Batched over obs."""
    Ro = R[prob.po_pose]  # [Op,3,3]
    to = t[prob.po_pose]  # [Op,3]
    xw = pts[jnp.maximum(prob.po_pt, 0)]  # [Op,3]
    xc = jnp.einsum("nij,nj->ni", Ro, xw, precision=_HI) + to
    uvr = cam_ops.stereo_project(cam, xc)
    r = prob.po_uvr - uvr  # [Op,3]
    row = jnp.stack(
        [jnp.ones_like(prob.po_stereo), jnp.ones_like(prob.po_stereo), prob.po_stereo], axis=-1
    ).astype(r.dtype)
    r = r * row
    J2 = cam_ops.project_jacobian(cam, xc)  # [Op,2,3]
    z = xc[..., 2]
    inv_z2 = 1.0 / jnp.maximum(z * z, 1e-12)
    Jr = J2[..., 0, :] + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], axis=-1)
    Jproj = jnp.concatenate([J2, Jr[..., None, :]], axis=-2) * row[..., None]  # [Op,3,3]
    dxc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), xc.shape[:-1] + (3, 3)), -lie.hat(xc)], axis=-1
    )  # [Op,3,6]
    Jp = -jnp.einsum("nij,njk->nik", Jproj, dxc, precision=_HI)  # d r / d pose twist
    Jl = -jnp.einsum("nij,njk->nik", Jproj, Ro, precision=_HI)  # d r / d x_w
    ok = (
        prob.po_mask & (prob.po_pt >= 0) & (z > 0.05)
        & prob.pt_mask[jnp.maximum(prob.po_pt, 0)] & prob.pose_mask[prob.po_pose]
    )
    return r, Jp, Jl, ok


def _line_obs_linearize(cam, prob: BAProblem, R, t, lns):
    Ro = R[prob.lo_pose]
    to = t[prob.lo_pose]
    seg = lns[jnp.maximum(prob.lo_ln, 0)]  # [Ol,6]
    l_obs = prob.lo_l

    def endpoint(xw):
        xc = jnp.einsum("nij,nj->ni", Ro, xw, precision=_HI) + to
        uv = cam_ops.project(cam, xc)
        d = l_obs[:, 0] * uv[:, 0] + l_obs[:, 1] * uv[:, 1] + l_obs[:, 2]
        Jproj = cam_ops.project_jacobian(cam, xc)
        Jd_xc = jnp.einsum("ni,nij->nj", l_obs[:, :2], Jproj, precision=_HI)  # [Ol,3]
        dxc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), xc.shape[:-1] + (3, 3)), -lie.hat(xc)], axis=-1
        )
        Jd_pose = jnp.einsum("nj,njk->nk", Jd_xc, dxc, precision=_HI)  # [Ol,6]
        Jd_x = jnp.einsum("nj,njk->nk", Jd_xc, Ro, precision=_HI)  # [Ol,3]
        return d, Jd_pose, Jd_x, xc[:, 2]

    d0, Jp0, Jx0, z0 = endpoint(seg[:, :3])
    d1, Jp1, Jx1, z1 = endpoint(seg[:, 3:])
    r = -jnp.stack([d0, d1], axis=-1)  # residual = 0 - d (target distance 0)
    Jp = -jnp.stack([Jp0, Jp1], axis=-2)  # [Ol,2,6]
    zeros = jnp.zeros_like(Jx0)
    Jl = -jnp.stack(
        [jnp.concatenate([Jx0, zeros], -1), jnp.concatenate([zeros, Jx1], -1)], axis=-2
    )  # [Ol,2,6]
    ok = (
        prob.lo_mask & (prob.lo_ln >= 0) & (z0 > 0.05) & (z1 > 0.05)
        & prob.ln_mask[jnp.maximum(prob.lo_ln, 0)] & prob.pose_mask[prob.lo_pose]
    )
    return r, Jp, Jl, ok


def _robust_weight(r, sigma2, ok, delta):
    chi2 = jnp.sum(r * r, axis=-1) / sigma2
    w = robust.huber_weight(chi2, delta * delta) / sigma2
    return jnp.where(ok, w, 0.0), chi2


def ba_iteration(cam, prob: BAProblem, R, t, pts, lns, cfg: OptimizerConfig, damping, axis_name: str | None = None):
    W = prob.R.shape[0]
    P = prob.pts.shape[0]
    L = prob.lns.shape[0]

    r_p, Jp_p, Jl_p, ok_p = _point_obs_linearize(cam, prob, R, t, pts)
    w_p, chi2_p = _robust_weight(r_p, prob.po_sigma2, ok_p, cfg.huber_stereo)
    r_l, Jp_l, Jl_l, ok_l = _line_obs_linearize(cam, prob, R, t, lns)
    w_l, chi2_l = _robust_weight(r_l, prob.lo_sigma2, ok_l, cfg.huber_mono)

    # --- assemble -------------------------------------------------------
    # Layout invariant (see BAProblem docstring): observations are
    # pose-major — obs row k = [k*Sx, (k+1)*Sx) belongs to pose k, and
    # landmark ids are unique within each row (slot -1 = empty). This
    # turns the pose-side accumulation into a reshape-sum (no scatter)
    # and the landmark-side accumulation into W unique-index scatters —
    # general duplicate-handling scatter-adds are ~10x slower on TPU and
    # dominated this function before.
    Sx = prob.po_pt.shape[0] // W
    Sl = prob.lo_ln.shape[0] // W

    blk_pp = jnp.einsum("nia,n,nib->nab", Jp_p, w_p, Jp_p, precision=_HI).reshape(W, Sx, 6, 6)
    blk_gp = jnp.einsum("nia,n,ni->na", Jp_p, w_p, r_p, precision=_HI).reshape(W, Sx, 6)
    blk_pp_l = jnp.einsum("nia,n,nib->nab", Jp_l, w_l, Jp_l, precision=_HI).reshape(W, Sl, 6, 6)
    blk_gp_l = jnp.einsum("nia,n,ni->na", Jp_l, w_l, r_l, precision=_HI).reshape(W, Sl, 6)
    Hpp = blk_pp.sum(1) + blk_pp_l.sum(1)
    gp = blk_gp.sum(1) + blk_gp_l.sum(1)

    def rowwise_scatter(capacity, idx_2d, blocks_2d):
        """Accumulate [W, Sx, ...] blocks into [capacity, ...] rows.

        Masked slots (idx < 0) are redirected to unique sacrificial rows
        beyond `capacity`, keeping every per-row scatter collision-free.
        """
        n_rows, n_slots = idx_2d.shape
        acc = jnp.zeros((capacity + n_slots,) + blocks_2d.shape[2:], blocks_2d.dtype)
        spill = capacity + jnp.arange(n_slots, dtype=jnp.int32)
        for k in range(n_rows):
            safe = jnp.where(idx_2d[k] >= 0, idx_2d[k], spill)
            acc = acc.at[safe].add(blocks_2d[k], unique_indices=True)
        return acc[:capacity]

    def rowwise_scatter_per_pose(capacity, idx_2d, blocks_2d):
        """Like rowwise_scatter but into [capacity, W, ...] (the Hpl blocks)."""
        n_rows, n_slots = idx_2d.shape
        acc = jnp.zeros((capacity + n_slots, n_rows) + blocks_2d.shape[2:], blocks_2d.dtype)
        spill = capacity + jnp.arange(n_slots, dtype=jnp.int32)
        for k in range(n_rows):
            safe = jnp.where(idx_2d[k] >= 0, idx_2d[k], spill)
            acc = acc.at[safe, k].add(blocks_2d[k], unique_indices=True)
        return acc[:capacity]

    po_pt_2d = prob.po_pt.reshape(W, Sx)
    lo_ln_2d = prob.lo_ln.reshape(W, Sl)
    Hll_p = rowwise_scatter(
        P, po_pt_2d, jnp.einsum("nia,n,nib->nab", Jl_p, w_p, Jl_p, precision=_HI).reshape(W, Sx, 3, 3)
    )
    gl_p = rowwise_scatter(
        P, po_pt_2d, jnp.einsum("nia,n,ni->na", Jl_p, w_p, r_p, precision=_HI).reshape(W, Sx, 3)
    )
    Wb_p = rowwise_scatter_per_pose(
        P, po_pt_2d, jnp.einsum("nia,n,nib->nab", Jp_p, w_p, Jl_p, precision=_HI).reshape(W, Sx, 6, 3)
    )

    Hll_l = rowwise_scatter(
        L, lo_ln_2d, jnp.einsum("nia,n,nib->nab", Jl_l, w_l, Jl_l, precision=_HI).reshape(W, Sl, 6, 6)
    )
    gl_l = rowwise_scatter(
        L, lo_ln_2d, jnp.einsum("nia,n,ni->na", Jl_l, w_l, r_l, precision=_HI).reshape(W, Sl, 6)
    )
    Wb_l = rowwise_scatter_per_pose(
        L, lo_ln_2d, jnp.einsum("nia,n,nib->nab", Jp_l, w_l, Jl_l, precision=_HI).reshape(W, Sl, 6, 6)
    )

    # --- Schur elimination of landmarks --------------------------------
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    active_p = prob.pt_mask & (jnp.diagonal(Hll_p, axis1=1, axis2=2).sum(-1) > 1e-10)
    active_l = prob.ln_mask & (jnp.diagonal(Hll_l, axis1=1, axis2=2).sum(-1) > 1e-10)
    Hll_p_d = Hll_p + damping * eye3  # damped landmark blocks
    # The endpoint-to-infinite-line residual never constrains endpoint
    # motion ALONG the 3D line (a structural 2-dim nullspace per line
    # landmark — one reason the reference keeps lines out of BA).
    # Stiffen exactly those directions: the gradient there is zero, so
    # this pins the null components without biasing the constrained ones.
    seg_dir = lns[:, 3:] - lns[:, :3]
    u = seg_dir / jnp.maximum(jnp.linalg.norm(seg_dir, axis=-1, keepdims=True), 1e-6)
    D = jnp.einsum("la,lb->lab", u, u)  # [L,3,3] along-line projector
    reg = jnp.diagonal(Hll_l, axis1=1, axis2=2).sum(-1) / 6.0 + 1.0  # per-line scale
    Dblk = jnp.zeros((lns.shape[0], 6, 6)).at[:, :3, :3].set(D).at[:, 3:, 3:].set(D)
    Hll_l_d = Hll_l + damping * eye6 + reg[:, None, None] * Dblk
    Hll_p_inv = jnp.where(active_p[:, None, None], jnp.linalg.inv(Hll_p_d + (~active_p)[:, None, None] * eye3), 0.0)
    Hll_l_inv = jnp.where(active_l[:, None, None], jnp.linalg.inv(Hll_l_d + (~active_l)[:, None, None] * eye6), 0.0)

    S = jnp.zeros((W, W, 6, 6))
    S = S.at[jnp.arange(W), jnp.arange(W)].add(Hpp + damping * eye6)
    S = S - jnp.einsum("iwab,ibc,ivdc->wvad", Wb_p, Hll_p_inv, Wb_p, precision=_HI)
    S = S - jnp.einsum("iwab,ibc,ivdc->wvad", Wb_l, Hll_l_inv, Wb_l, precision=_HI)
    rhs = -gp
    rhs = rhs + jnp.einsum("iwab,ibc,ic->wa", Wb_p, Hll_p_inv, gl_p, precision=_HI)
    rhs = rhs + jnp.einsum("iwab,ibc,ic->wa", Wb_l, Hll_l_inv, gl_l, precision=_HI)

    if axis_name is not None:
        # Distributed Schur: each device assembled its landmark shard's
        # contribution; the reduced camera system is the psum over shards
        # (SURVEY.md §2.3 — collectives over ICI replace the g2o heap).
        S = jax.lax.psum(S, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)

    # --- gauge fixing: zero rows/cols of fixed or absent poses ----------
    free = (prob.pose_mask & ~prob.fixed_mask).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(W), jnp.arange(W)].add((1.0 - free)[:, None, None] * eye6)
    rhs = rhs * free[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    delta_p = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(W, 6)
    bad = ~jnp.all(jnp.isfinite(delta_p))
    delta_p = jnp.where(bad, 0.0, delta_p)

    # --- back-substitute landmarks --------------------------------------
    rhs_lp = -gl_p - jnp.einsum("iwab,wa->ib", Wb_p, delta_p, precision=_HI)
    delta_pt = jnp.einsum("iab,ib->ia", Hll_p_inv, rhs_lp, precision=_HI)
    rhs_ll = -gl_l - jnp.einsum("iwab,wa->ib", Wb_l, delta_p, precision=_HI)
    delta_ln = jnp.einsum("iab,ib->ia", Hll_l_inv, rhs_ll, precision=_HI)
    delta_pt = jnp.where(bad, 0.0, delta_pt)
    delta_ln = jnp.where(bad, 0.0, delta_ln)

    # --- apply updates ---------------------------------------------------
    dR, dt = lie.se3_exp(delta_p)  # batched over W
    R_new = lie.normalize_rotation(jnp.einsum("wij,wjk->wik", dR, R, precision=_HI))
    t_new = jnp.einsum("wij,wj->wi", dR, t, precision=_HI) + dt
    pts_new = pts + jnp.where(active_p[:, None], delta_pt, 0.0)
    lns_new = lns + jnp.where(active_l[:, None], delta_ln, 0.0)

    cost = jnp.sum(w_p * chi2_p * prob.po_sigma2) + jnp.sum(w_l * chi2_l * prob.lo_sigma2)
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return R_new, t_new, pts_new, lns_new, cost, chi2_p, chi2_l


def solve_ba(cam, prob: BAProblem, cfg: OptimizerConfig, iters: int | None = None, axis_name: str | None = None) -> BAResult:
    """Run `iters` damped GN iterations (reference budget: optimize(5)+optimize(10)).

    With `axis_name`, runs as the per-shard body of a `shard_map` over a
    landmark-sharded problem (poses replicated) — see parallel/dist_ba.py.
    """
    iters = cfg.local_ba_iters if iters is None else iters
    damping = jnp.asarray(cfg.damping_init, jnp.float32)

    def body(_, carry):
        R, t, pts, lns = carry
        R, t, pts, lns, _, _, _ = ba_iteration(cam, prob, R, t, pts, lns, cfg, damping, axis_name)
        return R, t, pts, lns

    R, t, pts, lns = jax.lax.fori_loop(0, iters, body, (prob.R, prob.t, prob.pts, prob.lns))
    _, _, _, _, cost, chi2_p, chi2_l = ba_iteration(cam, prob, R, t, pts, lns, cfg, damping, axis_name)
    return BAResult(R=R, t=t, pts=pts, lns=lns, po_chi2=chi2_p, lo_chi2=chi2_l, cost=cost)
