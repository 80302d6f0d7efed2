"""Failure-detection guards: timestamp anomalies + active-map reset.

Reference behaviors covered: Tracking::Track timestamp-jump handling
(src/Tracking.cc:1382-1418) and System::ResetActiveMap /
bad-IMU map reset (src/LocalMapping.cc:111-121).
"""

import numpy as np
import pytest

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


@pytest.fixture(scope="module")
def rig():
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)
    frames = list(synthetic.make_sequence(cam, 8, fps=20.0))
    return cam, cfg, frames


def _run(tracker, frames, stamps):
    infos = []
    for fr, t in zip(frames, stamps):
        infos.append(tracker.process(fr["img_l"], fr["img_r"], t))
    return infos


def test_older_timestamp_resets_active_map(rig):
    cam, cfg, frames = rig
    tr = Tracker(cam, cfg)
    _run(tr, frames[:4], [0.0, 0.05, 0.10, 0.15])
    assert tr.state != TrackingState.NOT_INITIALIZED
    n_kf_before = tr.n_kf
    assert n_kf_before >= 1
    # a frame older than its predecessor must reset the active map
    tr.process(frames[4]["img_l"], frames[4]["img_r"], 0.02)
    # the reset happened before the frame was tracked: map restarted
    assert tr.n_kf <= 1
    # and tracking re-initializes cleanly on subsequent frames
    _run(tr, frames[5:8], [0.25, 0.30, 0.35])
    assert tr.state == TrackingState.OK


def test_forward_jump_without_imu_is_tolerated(rig):
    cam, cfg, frames = rig
    tr = Tracker(cam, cfg)
    _run(tr, frames[:4], [0.0, 0.05, 0.10, 0.15])
    kf = tr.n_kf
    # visual-only: a >1s gap is NOT a reset (the reference only guards
    # inertial sensors, src/Tracking.cc:1392 `if(mpAtlas->isInertial())`)
    tr.process(frames[4]["img_l"], frames[4]["img_r"], 5.0)
    assert tr.n_kf >= kf


def test_reset_active_map_keeps_parked_maps(rig):
    cam, cfg, frames = rig
    tr = Tracker(cam, cfg)
    _run(tr, frames[:4], [0.0, 0.05, 0.10, 0.15])
    tr._switch_to_new_map()  # park map 0
    n_maps = tr.atlas.n_maps()
    assert n_maps == 2
    _run(tr, frames[4:6], [0.20, 0.25])
    tr.reset_active_map()
    assert tr.atlas.n_maps() == n_maps  # parked maps survive
    assert tr.n_kf == 0
    assert tr.state == TrackingState.NOT_INITIALIZED
    assert not tr.imu_ready
