"""4-DoF essential graph (inertial) + global BA after loop closure.

Reference: Optimizer::OptimizeEssentialGraph4DoF (src/Optimizer.cc:8247,
Edge4DoF — yaw+translation only, gravity-aligned maps) and
LoopClosing::RunGlobalBundleAdjustment (src/LoopClosing.cc:2243).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.ops import lie
from pli_slam_tpu.solve import pgo


def _yaw_rot(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _make_drifted_loop(K=12, drift_yaw=0.15, drift_t=0.3, seed=0):
    """Ground-truth poses on a circle; estimates drift in yaw+translation."""
    rng = np.random.default_rng(seed)
    R_gt, t_gt = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        R_wc = _yaw_rot(a)
        p = np.array([np.cos(a), np.sin(a), 0.0])
        R_cw = R_wc.T
        t_cw = -R_cw @ p
        R_gt.append(R_cw)
        t_gt.append(t_cw)
    R_gt = np.stack(R_gt)
    t_gt = np.stack(t_gt)
    # accumulate yaw/translation drift along the chain
    R_est, t_est = [R_gt[0]], [t_gt[0]]
    for k in range(1, K):
        dy = drift_yaw * k / K + rng.normal(0, 0.01)
        dt = drift_t * k / K * rng.normal(0, 1, 3) * np.array([1, 1, 0.2])
        R_est.append(R_gt[k] @ _yaw_rot(dy).T)
        t_est.append(t_gt[k] + dt)
    return (jnp.asarray(np.stack(R_est)), jnp.asarray(np.stack(t_est)),
            jnp.asarray(R_gt), jnp.asarray(t_gt))


def _graph_with_loop(R_est, t_est, R_gt, t_gt):
    K = R_est.shape[0]
    valid = jnp.ones(K, bool)
    # odometry edges from GROUND TRUTH (perfect relative measurements)
    i = jnp.arange(K - 1, dtype=jnp.int32)
    j = i + 1
    Rii, tii = lie.se3_inverse(R_gt[i], t_gt[i])
    Rm, tm = lie.se3_compose(R_gt[j], t_gt[j], Rii, tii)
    # loop edge K-1 -> 0
    Ri_inv, ti_inv = lie.se3_inverse(R_gt[K - 1], t_gt[K - 1])
    Rl, tl = lie.se3_compose(R_gt[0], t_gt[0], Ri_inv, ti_inv)
    e_i = jnp.concatenate([i, jnp.asarray([K - 1], jnp.int32)])
    e_j = jnp.concatenate([j, jnp.asarray([0], jnp.int32)])
    e_R = jnp.concatenate([Rm, Rl[None]])
    e_t = jnp.concatenate([tm, tl[None]])
    return pgo.PoseGraph(
        R=R_est, t=t_est, s=jnp.ones(K),
        node_mask=valid,
        fixed_mask=jnp.zeros(K, bool).at[0].set(True),
        e_i=e_i, e_j=e_j, e_R=e_R, e_t=e_t,
        e_s=jnp.ones(K), e_weight=jnp.ones(K), e_mask=jnp.ones(K, bool),
    )


def _pose_err(out, R_gt, t_gt):
    errs = []
    for k in range(R_gt.shape[0]):
        dR = np.asarray(out.R[k]) @ np.asarray(R_gt[k]).T
        errs.append(np.linalg.norm(np.asarray(out.t[k]) - np.asarray(t_gt[k])))
    return float(np.mean(errs))


def test_4dof_reduces_drift():
    R_est, t_est, R_gt, t_gt = _make_drifted_loop()
    graph = _graph_with_loop(R_est, t_est, R_gt, t_gt)
    out = pgo.optimize(graph, iters=15, mode="4dof")
    before = _pose_err(graph, R_gt, t_gt)
    after = _pose_err(out, R_gt, t_gt)
    assert after < 0.3 * before, (before, after)


def test_4dof_preserves_roll_pitch():
    """Nodes tilted out of plane must keep their roll/pitch: only yaw and
    translation are free in 4-DoF mode."""
    R_est, t_est, R_gt, t_gt = _make_drifted_loop()
    # tilt every estimate by a fixed roll; 4-DoF must NOT remove it
    tilt = np.array(
        [[1, 0, 0], [0, np.cos(0.2), -np.sin(0.2)], [0, np.sin(0.2), np.cos(0.2)]]
    )
    R_tilt = jnp.asarray(np.einsum("kij,jl->kil", np.asarray(R_est), tilt))
    graph = _graph_with_loop(R_tilt, t_est, R_gt, t_gt)
    out = pgo.optimize(graph, iters=10, mode="4dof")
    # the z-row of R_cw (world-z in camera coords) can only rotate about
    # world z; its NORM along the camera axes induced by roll must persist.
    # Check that out.R[k] @ R_tilt[k]^T is (approximately) a pure yaw:
    for k in [3, 7]:
        D = np.asarray(out.R[k]) @ np.asarray(R_tilt[k]).T
        # pure world-yaw conjugated into camera frame keeps |D[2,2]| small
        # deviation from a rotation about SOME axis is fine; verify D has
        # rotation angle consistent with axis ~ world z mapped by R:
        axis_c = np.asarray(R_tilt[k]) @ np.array([0, 0, 1.0])
        # D should fix axis_c: D @ axis_c ≈ axis_c
        np.testing.assert_allclose(D @ axis_c, axis_c, atol=5e-2)


def test_global_ba_runs_and_keeps_map_consistent():
    """global_ba over a real tiny tracker map must keep poses/landmarks
    finite and not degrade the trajectory."""
    from pli_slam_tpu.frontend import tracker as trk
    from pli_slam_tpu.frontend.tracker import Tracker
    from pli_slam_tpu.ops.camera import Camera
    from pli_slam_tpu.utils import synthetic
    from pli_slam_tpu.utils.config import SlamConfig

    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    gt = []
    for fr in synthetic.make_sequence(cam, 14, fps=cfg.fps, traj=traj, room_half=2.55):
        tracker.process(fr["img_l"], fr["img_r"], fr["t"])
        gt.append(fr["p_w"])
    assert tracker.n_kf >= 2
    ks, ps, ls = trk.global_ba(cam, cfg, tracker.kstore, tracker.pstore, tracker.lstore)
    assert bool(jnp.all(jnp.isfinite(ks.R)))
    assert bool(jnp.all(jnp.isfinite(ks.t)))
    assert bool(jnp.all(jnp.isfinite(ps.x)))
    # KF positions should not move dramatically (map was already good)
    for k in range(tracker.n_kf):
        d = float(jnp.linalg.norm(ks.t[k] - tracker.kstore.t[k]))
        assert d < 0.5, (k, d)
