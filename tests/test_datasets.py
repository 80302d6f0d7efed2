"""KITTI/TUM dataset loaders + live-feed synchronizer.

Reference behaviors covered: stereo_kitti.cc LoadImages + calib
parsing; rgbd_tum.cc association protocol + DepthMapFactor;
ros_stereo_inertial.cc SyncWithImu pairing/IMU-coverage logic.
"""

import os
import threading
import time

import numpy as np
import pytest

from pli_slam_tpu.utils.datasets import (
    KittiCalib, KittiSequence, TumCalib, TumRgbdSequence, associate,
)
from pli_slam_tpu.utils.livefeed import StereoInertialSync


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def kitti_dir(tmp_path):
    root = tmp_path / "seq00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (60, 200), dtype=np.uint8)
        _write_png(root / "image_0" / f"{i:06d}.png", img)
        _write_png(root / "image_1" / f"{i:06d}.png", img)
    (root / "times.txt").write_text("0.0\n0.1\n0.2\n")
    # P0/P1 with fx=700, baseline 0.54 -> P1[0,3] = -fx*b
    p0 = "P0: 700 0 100 0 0 700 30 0 0 0 1 0\n"
    p1 = "P1: 700 0 100 -378.0 0 700 30 0 0 0 1 0\n"
    (root / "calib.txt").write_text(p0 + p1 + "P2: " + " ".join(["0"] * 12) + "\n")
    poses = np.zeros((3, 12))
    poses[:, 0] = poses[:, 5] = poses[:, 10] = 1.0
    poses[:, 3] = [0.0, 0.5, 1.0]  # x translation
    np.savetxt(root / "poses.txt", poses)
    return str(root)


def test_kitti_loader(kitti_dir):
    seq = KittiSequence(kitti_dir)
    assert len(seq) == 3
    assert seq.calib.fx == 700.0
    assert abs(seq.calib.bf - 378.0) < 1e-6  # fx * 0.54m
    frames = list(seq.frames())
    assert frames[0]["img_l"].shape == (60, 200)
    assert frames[0]["img_l"].dtype == np.float32
    assert seq.calib.width == 200 and seq.calib.height == 60
    gt = seq.gt_positions_at([f["t"] for f in frames])
    assert gt.shape == (3, 3) and abs(gt[2, 0] - 1.0) < 1e-9


@pytest.fixture
def tum_dir(tmp_path):
    root = tmp_path / "fr3_seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rng = np.random.default_rng(1)
    rgb_lines, depth_lines = [], []
    for i in range(3):
        t = 100.0 + i * 0.033
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        _write_png(root / "rgb" / f"{t:.4f}.png", img)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        td = t + 0.004  # depth slightly offset, must still associate
        depth = (rng.uniform(0.5, 4.0, (48, 64)) * 5000).astype(np.uint16)
        _write_png(root / "depth" / f"{td:.4f}.png", depth)
        depth_lines.append(f"{td:.4f} depth/{td:.4f}.png")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(f"{100.0 + i * 0.033:.4f} {i * 0.1} 0 0 0 0 0 1" for i in range(3))
    )
    return str(root)


def test_tum_loader(tum_dir):
    seq = TumRgbdSequence(tum_dir, TumCalib.freiburg(3))
    assert len(seq) == 3  # association found all pairs despite 4ms skew
    frames = list(seq.frames())
    assert frames[0]["img"].shape == (48, 64)
    # depth rescaled to meters by DepthMapFactor
    assert 0.3 < frames[0]["depth"].mean() < 5.0
    gt = seq.gt_positions_at([f["t"] for f in frames])
    assert gt.shape == (3, 3)


def test_associate_rejects_far():
    rgb = [(1.0, "a"), (2.0, "b")]
    depth = [(1.005, "da"), (2.5, "db")]
    out = associate(rgb, depth, max_dt=0.02)
    assert len(out) == 1 and out[0][1] == "a"


def test_livefeed_sync_pairs_and_waits_for_imu():
    sync = StereoInertialSync(use_imu=True)
    # stale left frame with no right partner: must be dropped
    sync.left.push(0.90, "L_stale")
    sync.left.push(1.00, "L1")
    sync.right.push(1.002, "R1")  # within skew
    for k in range(4):
        sync.imu.push(0.96 + 0.01 * k, [0, 0, k], [0, 0, 9.8])
    # IMU coverage (0.99) does not reach the frame stamp (1.00): must block
    assert sync.next_frame(timeout=0.1) is None
    sync.imu.push(1.01, [0, 0, 9], [0, 0, 9.8])  # coverage passes stamp
    item = sync.next_frame(timeout=2.0)
    assert item is not None
    assert item["img_l"] == "L1" and item["img_r"] == "R1"
    assert item["t"] == 1.0
    # all imu samples <= stamp drained, later ones retained
    assert item["imu"] is not None
    assert np.all(item["imu"]["stamps"] <= 1.0)
    assert len(item["imu"]["stamps"]) == 4
    assert sync.imu.latest_stamp() > 1.0


def test_livefeed_sync_no_imu_mode():
    sync = StereoInertialSync(use_imu=False)
    sync.left.push(2.0, "L")
    sync.right.push(2.0, "R")
    item = sync.next_frame(timeout=0.5)
    assert item is not None and item["imu"] is None


def test_livefeed_timeout():
    sync = StereoInertialSync()
    assert sync.next_frame(timeout=0.05) is None
