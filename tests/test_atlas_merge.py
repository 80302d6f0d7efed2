"""Atlas merge-back end-to-end: loss -> new map -> revisit -> weld.

Round-2 verdict Missing #1 done-criterion: an induced tracking loss
spawns a fresh map (reference Tracking::CreateMapInAtlas,
src/Tracking.cc:2565); when the camera revisits known terrain, place
recognition against the PARKED map's BoW database must fire and the
active map must be welded back (reference LoopClosing::MergeLocal,
src/LoopClosing.cc:1096), leaving one continuous map whose poses agree
with ground truth again.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


def test_loss_newmap_revisit_merge():
    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg,
        tracking=dataclasses.replace(cfg.tracking, recently_lost_sec=0.15),
        loop=dataclasses.replace(cfg.loop, min_kf_gap=3),
    )
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    frames = list(synthetic.make_sequence(cam, 24, fps=cfg.fps, traj=traj, room_half=2.55))
    tracker = Tracker(cam, cfg)

    # phase 1: build the first map
    for fr in frames[:20]:
        tracker.process(fr["img_l"], fr["img_r"], fr["t"])
    assert tracker.atlas.n_maps() == 1
    n_kf_map1 = int(tracker.n_kf)
    assert n_kf_map1 >= 3

    # phase 2: blackout forces loss and a fresh map
    blank = jnp.zeros_like(frames[0]["img_l"])
    t0 = frames[19]["t"]
    for i in range(8):
        tracker.process(blank, blank, t0 + 0.05 * (i + 1))
    assert tracker.atlas.n_maps() == 2, "tracking loss did not spawn a new map"
    assert tracker.state == TrackingState.NOT_INITIALIZED

    # phase 3: revisit known terrain -> init map 2, then merge back
    merged = False
    for fr in frames[2:]:
        tracker.process(fr["img_l"], fr["img_r"], fr["t"] + 2.0)
        if tracker.atlas.n_maps() == 1:
            merged = True
            break
    assert merged, "revisit never merged the maps"

    # a few more frames: tracking continues in the merged (original) world
    last_ok = 0
    idx0 = frames.index(fr)
    for fr2 in frames[idx0 + 1:idx0 + 5]:
        info = tracker.process(fr2["img_l"], fr2["img_r"], fr2["t"] + 2.0)
        last_ok = info["n_inliers"]
        # merged world == map-1 world == first CAMERA frame
        R0_, p0_ = traj.pose(0.0)
        gt_p = R0_.T @ (fr2["p_w"] - p0_)
        est_p = np.asarray(-(np.asarray(tracker.R).T @ np.asarray(tracker.t)))
        err = np.linalg.norm(est_p - gt_p)
        assert err < 0.5, (err, est_p, gt_p)
    assert last_ok >= cfg.tracking.min_inliers_track


def test_preint_chain_survives_merge_remap():
    """Inertial-aware merge (reference MergeInertialBA,
    src/Optimizer.cc:6858): the active side's device-resident
    preintegration chain must be re-indexed through the merge's KF slot
    mapping, not dropped — factors whose endpoints stay adjacent
    survive, others are pruned. (Payload round-trips are covered by
    tests/test_preint_store.py; this pins the merge slot-mapping
    semantics on the same three scenarios the old host-dict remap had.)"""
    from pli_slam_tpu.ops import imu as imu_ops

    def store_with(keys, tag_offset=0):
        st_ = imu_ops.PreintStore.empty(12)
        for i, k in enumerate(keys):
            p = imu_ops.Preintegrated.identity()
            p = dataclasses.replace(p, dt=jnp.asarray(float(i + 1 + tag_offset)))
            st_ = st_.set(k, p)
        return st_

    def valid_slots(st_):
        return sorted(np.nonzero(np.asarray(st_.valid))[0].tolist())

    # src KFs 0..3 land in dst slots 5..8 (contiguous tail): all survive
    st_ = store_with([1, 2, 3])
    out = st_.remap(np.asarray([5, 6, 7, 8, -1, -1]))
    assert valid_slots(out) == [6, 7, 8]
    # payload follows the factor (dt tags 1, 2, 3 -> slots 6, 7, 8)
    assert np.asarray(out.data.dt)[[6, 7, 8]].tolist() == [1.0, 2.0, 3.0]

    # non-adjacent landing (slot 2 skipped a hole): that factor pruned
    st_ = store_with([1, 2, 3])
    out = st_.remap(np.asarray([5, 6, 9, 10]))
    assert valid_slots(out) == [6, 10]

    # unmapped (-1) endpoints never crash or survive
    st_ = store_with([1, 2])
    out = st_.remap(np.asarray([-1, 4, 5]))
    assert valid_slots(out) == [5]
