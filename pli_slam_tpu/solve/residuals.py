"""Typed residual blocks for the unified Gauss-Newton core.

One residual vocabulary replaces both of the reference's estimation
stacks — the g2o edge types (reference: src/G2oTypes.h:339-862,
src/OptimizableTypes.h:31-215) and the hand-rolled GN residuals of the
line-aware pose solver (reference: src/Optimizer.cc:8719-8877):

- point reprojection, mono (2-dof) and stereo (3-dof: u, v, u_right)
  == EdgeSE3ProjectXYZ(OnlyPose) / EdgeStereo(OnlyPose);
- line residual: signed distances of the two projected 3D endpoints to
  the observed infinite image line == the reference's line terms at
  src/Optimizer.cc:8808-8809;
- IMU preintegration factor (9-dof) == EdgeInertial (G2oTypes.h:492);
- bias random walk == EdgeGyroRW/EdgeAccRW; pose/state priors ==
  ConstraintPoseImu/EdgePriorPoseImu.

Pose convention: camera pose is T_cw = (R_cw, t_cw); x_c = R_cw x_w +
t_cw. Updates are LEFT-multiplicative twists: T_cw <- Exp(delta) T_cw,
delta = (rho, phi). Every function returns per-element residuals and
analytic Jacobians as dense batched arrays (masked, fixed shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops import lie


def transform_points(R_cw: jax.Array, t_cw: jax.Array, x_w: jax.Array) -> jax.Array:
    return lie._einsum("ij,...j->...i", R_cw, x_w) + t_cw


def point_residuals_mono(cam, R_cw, t_cw, x_w, uv_obs):
    """Mono reprojection. Returns (r [N,2], J_pose [N,2,6], x_c [N,3]).

    r = uv_obs - project(x_c); J wrt left-mult twist on T_cw.
    """
    x_c = transform_points(R_cw, t_cw, x_w)
    uv = cam_ops.project(cam, x_c)
    r = uv_obs - uv
    J_proj = cam_ops.project_jacobian(cam, x_c)  # [N,2,3] d(uv)/d(x_c)
    # d x_c / d delta = [I | -hat(x_c)]  -> J_pose = -J_proj @ [I | -hat]
    dxc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), x_c.shape[:-1] + (3, 3)), -lie.hat(x_c)], axis=-1
    )  # [N,3,6]
    J_pose = -jnp.einsum("nij,njk->nik", J_proj, dxc, precision=jax.lax.Precision.HIGHEST)
    return r, J_pose, x_c


def point_residuals_stereo(cam, R_cw, t_cw, x_w, uvr_obs):
    """Stereo reprojection (u_l, v_l, u_r). Returns (r [N,3], J_pose [N,3,6], x_c)."""
    x_c = transform_points(R_cw, t_cw, x_w)
    uvr = cam_ops.stereo_project(cam, x_c)
    r = uvr_obs - uvr
    J2 = cam_ops.project_jacobian(cam, x_c)  # [N,2,3]
    z = x_c[..., 2]
    inv_z2 = 1.0 / jnp.maximum(z * z, 1e-12)
    # u_r = u_l - bf/z -> d u_r/d x_c = d u_l/d x_c + [0, 0, bf/z^2]
    Jr = J2[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], axis=-1
    )
    J_proj = jnp.concatenate([J2, Jr[..., None, :]], axis=-2)  # [N,3,3]
    dxc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), x_c.shape[:-1] + (3, 3)), -lie.hat(x_c)], axis=-1
    )
    J_pose = -jnp.einsum("nij,njk->nik", J_proj, dxc, precision=jax.lax.Precision.HIGHEST)
    return r, J_pose, x_c


def point_residuals_landmark_jac(cam, R_cw, x_c, stereo: bool):
    """d r / d x_w for BA: J_lm = -J_proj @ R_cw. [N, 2or3, 3]."""
    J2 = cam_ops.project_jacobian(cam, x_c)
    if stereo:
        z = x_c[..., 2]
        inv_z2 = 1.0 / jnp.maximum(z * z, 1e-12)
        Jr = J2[..., 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], axis=-1
        )
        J_proj = jnp.concatenate([J2, Jr[..., None, :]], axis=-2)
    else:
        J_proj = J2
    return -jnp.einsum("nij,jk->nik", J_proj, R_cw, precision=jax.lax.Precision.HIGHEST)


def line_residuals(cam, R_cw, t_cw, xs_w, xe_w, l_obs):
    """Line endpoint-to-line residuals.

    xs_w, xe_w: [N,3] world endpoints of the 3D line;
    l_obs: [N,3] normalized image line coefficients (a,b,c), a^2+b^2=1.
    Residual r = [d(proj(xs)), d(proj(xe))] with d(p) = a*u + b*v + c —
    the reference's line error (src/Optimizer.cc:8808-8809).

    Returns (r [N,2], J_pose [N,2,6], (xs_c, xe_c)).
    """

    def endpoint(x_w):
        x_c = transform_points(R_cw, t_cw, x_w)
        uv = cam_ops.project(cam, x_c)
        d = l_obs[..., 0] * uv[..., 0] + l_obs[..., 1] * uv[..., 1] + l_obs[..., 2]
        J_proj = cam_ops.project_jacobian(cam, x_c)  # [N,2,3]
        # d d / d uv = (a, b) -> d d/d x_c = (a,b) @ J_proj
        ab = l_obs[..., :2]
        Jd_xc = jnp.einsum("ni,nij->nj", ab, J_proj, precision=jax.lax.Precision.HIGHEST)
        dxc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), x_c.shape[:-1] + (3, 3)), -lie.hat(x_c)], axis=-1
        )
        Jd_pose = jnp.einsum("nj,njk->nk", Jd_xc, dxc, precision=jax.lax.Precision.HIGHEST)
        return d, Jd_pose, x_c, Jd_xc

    ds, Js, xs_c, Jd_xc_s = endpoint(xs_w)
    de, Je, xe_c, Jd_xc_e = endpoint(xe_w)
    r = jnp.stack([ds, de], axis=-1)
    J_pose = jnp.stack([Js, Je], axis=-2)
    return r, J_pose, (xs_c, xe_c, Jd_xc_s, Jd_xc_e)


def line_residuals_landmark_jac(R_cw, Jd_xc_s, Jd_xc_e):
    """d r / d (xs_w, xe_w) for BA: [N, 2, 6] (2 residuals x 6 endpoint dof).

    Row 0 depends only on xs_w, row 1 only on xe_w.
    """
    Js = jnp.einsum("nj,jk->nk", Jd_xc_s, R_cw, precision=jax.lax.Precision.HIGHEST)
    Je = jnp.einsum("nj,jk->nk", Jd_xc_e, R_cw, precision=jax.lax.Precision.HIGHEST)
    z = jnp.zeros_like(Js)
    row0 = jnp.concatenate([Js, z], axis=-1)
    row1 = jnp.concatenate([z, Je], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def imu_residual(
    preint,  # Preintegrated between states 0 and 1
    R0, p0, v0, R1, p1, v1,  # body states in world (Rwb, p_w, v_w)
    bg, ba,  # biases at state 0 (shared linearization, like the reference)
    gravity=9.81,  # scalar magnitude (world -z) or world gravity vector [3]
):
    """9-dof preintegration factor (reference EdgeInertial::computeError,
    src/G2oTypes.cc): r = [r_phi, r_v, r_p].

    Returns r [9]. Jacobians are taken with jax.jacfwd at the call site
    (the factor is evaluated once per GN iteration for a handful of
    states — autodiff cost is negligible next to the front-end).
    """
    from pli_slam_tpu.ops import imu as imu_ops

    g = jnp.asarray(gravity)
    if g.ndim == 0:
        g = jnp.array([0.0, 0.0, -1.0]) * g
    dt = preint.dt
    dR = imu_ops.delta_rotation(preint, bg)
    dV = imu_ops.delta_velocity(preint, bg, ba)
    dP = imu_ops.delta_position(preint, bg, ba)
    r_phi = lie.so3_log(lie._mm(dR.T, lie._mm(R0.T, R1)))
    r_v = lie._einsum("ij,j->i", R0.T, v1 - v0 - g * dt) - dV
    r_p = lie._einsum("ij,j->i", R0.T, p1 - p0 - v0 * dt - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([r_phi, r_v, r_p])


def make_pose_prior(R_prior, t_prior, weight: float):
    """6-dof pose prior residual factory (gauge fixing / motion prior)."""

    def prior(R_cw, t_cw):
        dR = lie._mm(R_cw, R_prior.T)
        r_phi = lie.so3_log(dR)
        r_t = t_cw - lie._einsum("ij,j->i", dR, t_prior)
        return weight * jnp.concatenate([r_t, r_phi])

    return prior
