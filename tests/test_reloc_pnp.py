"""Kidnap relocalization via PnP RANSAC.

Round-2 verdict Missing #5 done-criterion: a kidnap whose baseline
exceeds the projection-match window must fail under the old
candidate-pose re-track and succeed through the pose-free PnP path
(reference Tracking::Relocalization -> MLPnPsolver::iterate,
src/Tracking.cc:4223-4249).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


def _run(disable_bow_seeds: bool):
    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg,
        tracking=dataclasses.replace(
            cfg.tracking, recently_lost_sec=3.0,
            # raise the inlier floors: at the tiny default (6) the tracker
            # will happily hallucinate "OK" on aliased structure instead
            # of ever declaring loss
            min_inliers_track=20, min_inliers_local_map=25,
        ),
    )
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    if disable_bow_seeds:
        # simulate failed place recognition (empty candidate list — the
        # reference's Relocalization returns false outright in that case,
        # src/Tracking.cc:4190); recovery must then come from the
        # pose-free PnP seed alone
        tracker._bow_query_frame = lambda *a, **k: (
            jnp.full(cfg.loop.bow_candidates, -1, jnp.int32),
            jnp.full(cfg.loop.bow_candidates, -1.0),
        )
    frames = list(synthetic.make_sequence(cam, 20, fps=cfg.fps, traj=traj, room_half=2.55))
    for fr in frames:
        tracker.process(fr["img_l"], fr["img_r"], fr["t"])
    assert tracker.state == TrackingState.OK

    # kidnap: teleport to a viewpoint near the START of the trajectory but
    # displaced ~0.6 m — far beyond the 15 px matching window at scene depth
    R_wc, p_w = traj.pose(0.1)
    # non-lattice displacement + a yaw twist: far outside the projection
    # window, and the 1 m texture grid must not alias the offset
    p_kid = p_w + np.array([0.45, 0.3, -0.25])
    yaw = 0.35
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]])
    R_wc = R_wc @ Ry
    R_j = jnp.asarray(R_wc, jnp.float32)
    p_j = jnp.asarray(p_kid, jnp.float32)
    baseline = float(cam.bf / cam.fx)
    img_l = synthetic.render_view(cam, R_j, p_j, room_half=2.55)
    img_r = synthetic.render_view(cam, R_j, p_j + R_j[:, 0] * baseline, room_half=2.55)
    # Reference pose: the tracker's own converged optimum given an ORACLE
    # pose seed (the map drifts ~0.2-0.4 m at this tiny-camera scale, so
    # map-consistent truth, not global truth, is the recovery yardstick).
    R0_, p0_ = traj.pose(0.0)
    p_true = R0_.T @ (p_kid - p0_)
    # T_cw seed in tracker world: R_cw = (R0^T R_wc)^T, t = -R_cw p_true
    R_cw = jnp.asarray((R0_.T @ R_wc).T, jnp.float32)
    t_cw = -jnp.einsum("ij,j->i", R_cw, jnp.asarray(p_true, jnp.float32))
    frame = tracker.build_frame(img_l, img_r)
    (R_ref, t_ref, *_, n_ref, tracker.pstore, tracker.lstore) = tracker._track(
        frame, R_cw, t_cw, tracker.pstore, tracker.lstore
    )
    p_ref = -(np.asarray(R_ref).T @ np.asarray(t_ref))
    assert int(n_ref) >= cfg.tracking.min_inliers_local_map, int(n_ref)

    recovered = False
    err = np.inf
    for i in range(6):
        info = tracker.process(img_l, img_r, frames[-1]["t"] + 0.05 * (i + 1))
        if info["state"] == TrackingState.OK:
            est_p = -(np.asarray(tracker.R).T @ np.asarray(tracker.t))
            err = np.linalg.norm(est_p - p_ref)
            if err < 0.2:
                recovered = True
                break
    return recovered, err


def test_reloc_recovers_kidnap():
    recovered, err = _run(disable_bow_seeds=False)
    assert recovered, f"relocalization failed (err={err})"


def test_pnp_recovers_kidnap_without_bow_candidates():
    """The PnP path is pose-free AND candidate-free: it associates
    against the whole landmark store, so relocalization survives a total
    place-recognition miss — the reference cannot (its Relocalization
    bails with no KF candidates, src/Tracking.cc:4190)."""
    recovered, err = _run(disable_bow_seeds=True)
    assert recovered, f"PnP-only relocalization failed (err={err})"


def test_mono_pnp_recovers_kidnap():
    """Monocular kidnap: no stereo depth exists to lift PnP hypotheses,
    so recovery must come through the depth-free DLT hypothesis path
    (reference MLPnP consumes bearing vectors only, src/MLPnPsolver.cpp,
    dispatched from Tracking::Relocalization src/Tracking.cc:4223 — the
    round-3 build skipped PnP for mono entirely and fell back to the
    re-track heuristic that cannot span this baseline)."""
    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg,
        sensor="mono",
        tracking=dataclasses.replace(
            cfg.tracking, recently_lost_sec=3.0,
            min_inliers_track=20, min_inliers_local_map=25,
        ),
    )
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=0.0,
                         width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    # every 3rd frame: enough parallax for mono init + triangulation
    frames = list(synthetic.make_sequence(cam, 54, fps=cfg.fps, traj=traj, room_half=2.55))[::3]
    for fr in frames:
        tracker.process_mono(fr["img_l"], fr["t"])
    assert tracker.state == TrackingState.OK
    assert int(tracker.n_kf) >= 2

    # kidnap: displaced + yawed viewpoint near the trajectory start
    # (severity bounded by the tiny mono map's ~100-landmark coverage —
    # the point under test is the depth-free PnP hypothesis path, so the
    # BoW candidate-pose re-track seeds are DISABLED below and recovery
    # must come from PnP alone)
    R_wc, p_w = traj.pose(0.15)
    p_kid = p_w + np.array([0.3, 0.2, -0.15])
    yaw = 0.2
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]])
    R_wc = R_wc @ Ry
    img = synthetic.render_view(
        cam, jnp.asarray(R_wc, jnp.float32), jnp.asarray(p_kid, jnp.float32),
        room_half=2.55)

    # kill the BoW-candidate fallback seeds: only the PnP seed remains
    tracker._bow_query_frame = lambda *a, **k: (
        jnp.full(cfg.loop.bow_candidates, -1, jnp.int32),
        jnp.full(cfg.loop.bow_candidates, -1.0),
    )
    for i in range(6):
        info = tracker.process_mono(img, frames[-1]["t"] + 0.05 * (i + 1))
        if info["state"] == TrackingState.OK:
            break
    assert tracker.state == TrackingState.OK, "mono kidnap never relocalized via PnP"
    assert info["n_inliers"] >= cfg.tracking.min_inliers_local_map
