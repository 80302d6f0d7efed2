"""Local bundle adjustment tests: synthetic multi-view convergence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops import lie
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.solve import ba
from pli_slam_tpu.utils.config import OptimizerConfig

CFG = OptimizerConfig()


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def build_problem(rng, cam, W=4, P=64, L=16, noise_px=0.2, perturb=0.02):
    """W poses on a small trajectory observing a cloud of points/lines."""
    # ground truth poses: camera moving along +x, looking at +z
    R_true = np.stack([np.eye(3) for _ in range(W)]).astype(np.float32)
    t_true = np.stack([[-0.3 * w, 0.0, 0.0] for w in range(W)]).astype(np.float32)  # T_cw

    pts_true = np.stack(
        [rng.uniform(-3, 4, P), rng.uniform(-2, 2, P), rng.uniform(4, 12, P)], -1
    ).astype(np.float32)
    d = rng.normal(size=(L, 3)).astype(np.float32)
    xs = np.stack([rng.uniform(-3, 4, L), rng.uniform(-2, 2, L), rng.uniform(4, 12, L)], -1).astype(np.float32)
    xe = xs + d / np.linalg.norm(d, axis=-1, keepdims=True) * 1.2
    lns_true = np.concatenate([xs, xe], -1)

    # observations: every pose sees every landmark (dense, all in frustum)
    po_pose, po_pt, po_uvr = [], [], []
    for w in range(W):
        xc = pts_true @ R_true[w].T + t_true[w]
        uvr = np.asarray(cam_ops.stereo_project(cam, jnp.asarray(xc)))
        uvr = uvr + rng.normal(size=uvr.shape) * noise_px
        po_pose += [w] * P
        po_pt += list(range(P))
        po_uvr.append(uvr)
    lo_pose, lo_ln, lo_l = [], [], []
    for w in range(W):
        s_c = xs @ R_true[w].T + t_true[w]
        e_c = xe @ R_true[w].T + t_true[w]
        uv_s = np.asarray(cam_ops.project(cam, jnp.asarray(s_c)))
        uv_e = np.asarray(cam_ops.project(cam, jnp.asarray(e_c)))
        h_s = np.concatenate([uv_s, np.ones((L, 1))], -1)
        h_e = np.concatenate([uv_e, np.ones((L, 1))], -1)
        l = np.cross(h_s, h_e)
        l /= np.maximum(np.linalg.norm(l[:, :2], axis=-1, keepdims=True), 1e-9)
        lo_pose += [w] * L
        lo_ln += list(range(L))
        lo_l.append(l.astype(np.float32))

    # perturb everything except pose 0 (gauge)
    R0 = R_true.copy()
    t0 = t_true.copy()
    for w in range(1, W):
        dxi = rng.normal(size=6) * perturb
        dR, dt = lie.se3_exp(jnp.asarray(dxi, jnp.float32))
        R0[w] = np.asarray(dR) @ R0[w]
        t0[w] = np.asarray(dR) @ t0[w] + np.asarray(dt)
    pts0 = pts_true + rng.normal(size=pts_true.shape).astype(np.float32) * 0.05
    lns0 = lns_true + rng.normal(size=lns_true.shape).astype(np.float32) * 0.05

    Op = W * P
    Ol = W * L
    prob = ba.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        pose_mask=jnp.ones(W, bool),
        fixed_mask=jnp.asarray([True] + [False] * (W - 1)),
        pts=jnp.asarray(pts0), pt_mask=jnp.ones(P, bool),
        lns=jnp.asarray(lns0), ln_mask=jnp.ones(L, bool),
        po_pose=jnp.asarray(po_pose, jnp.int32), po_pt=jnp.asarray(po_pt, jnp.int32),
        po_uvr=jnp.asarray(np.concatenate(po_uvr), jnp.float32),
        po_stereo=jnp.ones(Op, bool), po_sigma2=jnp.ones(Op), po_mask=jnp.ones(Op, bool),
        lo_pose=jnp.asarray(lo_pose, jnp.int32), lo_ln=jnp.asarray(lo_ln, jnp.int32),
        lo_l=jnp.asarray(np.concatenate(lo_l), jnp.float32),
        lo_sigma2=jnp.ones(Ol), lo_mask=jnp.ones(Ol, bool),
    )
    return prob, jnp.asarray(R_true), jnp.asarray(t_true), jnp.asarray(pts_true), jnp.asarray(lns_true)


def test_ba_converges(cam, rng):
    prob, R_true, t_true, pts_true, lns_true = build_problem(rng, cam)
    result = ba.solve_ba(cam, prob, CFG, iters=10)
    # pose errors
    for w in range(1, 4):
        dR = np.asarray(result.R[w]) @ np.asarray(R_true[w]).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        terr = np.linalg.norm(np.asarray(result.t[w]) - np.asarray(t_true[w]))
        assert ang < 2e-3, (w, ang)
        assert terr < 1e-2, (w, terr)
    # landmark errors should shrink well below the 5cm perturbation
    # noise floor: 0.2 px reprojection noise at ~8 m depth over a ~1 m
    # total baseline gives ~2-3 cm triangulation sigma
    pt_err = np.linalg.norm(np.asarray(result.pts) - np.asarray(pts_true), axis=-1)
    assert np.median(pt_err) < 0.04, np.median(pt_err)


def test_ba_fixed_pose_untouched(cam, rng):
    prob, R_true, t_true, *_ = build_problem(rng, cam)
    result = ba.solve_ba(cam, prob, CFG, iters=5)
    np.testing.assert_allclose(result.R[0], prob.R[0], atol=1e-6)
    np.testing.assert_allclose(result.t[0], prob.t[0], atol=1e-6)


def test_ba_cost_decreases(cam, rng):
    # The correct convergence target is the NOISE FLOOR (cost at the
    # ground-truth state), not a fixed ratio of the initial cost: with
    # perturb=0.03 the initial cost is only ~1.9x the floor, so any
    # fixed-fraction threshold below the floor is unachievable. g2o's
    # quality bar (reference src/Optimizer.cc:2157) is likewise "reach
    # the noise floor in <=10 iterations".
    prob, R_true, t_true, pts_true, lns_true = build_problem(rng, cam, perturb=0.03)
    prob_gt = dataclasses.replace(prob, R=R_true, t=t_true, pts=pts_true, lns=lns_true)
    floor = float(ba.solve_ba(cam, prob_gt, CFG, iters=0).cost)
    r0 = ba.solve_ba(cam, prob, CFG, iters=0)
    r5 = ba.solve_ba(cam, prob, CFG, iters=5)
    assert float(r0.cost) > 1.5 * floor  # the problem is genuinely perturbed
    assert float(r5.cost) <= 1.02 * floor, (floor, float(r0.cost), float(r5.cost))


def test_ba_masked_landmarks_stay(cam, rng):
    prob, *_ = build_problem(rng, cam)
    pm = prob.pt_mask.at[:10].set(False)
    prob2 = dataclasses.replace(prob, pt_mask=pm)
    result = ba.solve_ba(cam, prob2, CFG, iters=3)
    np.testing.assert_allclose(result.pts[:10], prob.pts[:10], atol=1e-6)


def test_ba_jit(cam, rng):
    prob, *_ = build_problem(rng, cam, W=4, P=32, L=8)
    f = jax.jit(lambda p: ba.solve_ba(cam, p, CFG, iters=3))
    result = f(prob)
    assert np.all(np.isfinite(np.asarray(result.t)))
