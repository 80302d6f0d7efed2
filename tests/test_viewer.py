"""Viewer artifacts render without error and contain the expected content."""

import numpy as np
import pytest

from pli_slam_tpu.frontend.tracker import Tracker
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic, viewer
from pli_slam_tpu.utils.config import SlamConfig


@pytest.fixture(scope="module")
def mini_tracker():
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tr = Tracker(cam, cfg)
    last = None
    for fr in synthetic.make_sequence(cam, 6, fps=cfg.fps, traj=traj, room_half=2.55):
        tr.process(fr["img_l"], fr["img_r"], fr["t"])
        last = fr
    return tr, last


def test_draw_map(mini_tracker, tmp_path):
    tr, _ = mini_tracker
    p = str(tmp_path / "map.png")
    viewer.draw_map(tr, p)
    assert open(p, "rb").read(8)[1:4] == b"PNG"


def test_draw_frame(mini_tracker, tmp_path):
    tr, fr = mini_tracker
    fd = tr.build_frame(fr["img_l"], fr["img_r"])
    p = str(tmp_path / "frame.png")
    viewer.draw_frame(fr["img_l"], fd, p)
    assert open(p, "rb").read(8)[1:4] == b"PNG"


def test_draw_trajectory_comparison(mini_tracker, tmp_path, rng):
    tr, _ = mini_tracker
    est = tr.positions()
    gt = est + rng.normal(size=est.shape) * 0.01
    p = str(tmp_path / "traj.png")
    viewer.draw_trajectory_comparison(est, gt, p, ate=0.01)
    assert open(p, "rb").read(8)[1:4] == b"PNG"
