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


def _random_traj(n=7, seed=3):
    import numpy as np

    from pli_slam_tpu.ops import lie
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    traj = []
    for i in range(n):
        R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.4, jnp.float32)))
        p = rng.normal(size=3).astype(np.float64)
        traj.append((0.05 * i + 1.5, R, p))
    return traj


def test_euroc_trajectory_roundtrip(tmp_path):
    """EuRoC CSV writer/parser round-trip (reference SaveTrajectoryEuRoC
    format, src/System.cc:502)."""
    import numpy as np

    from pli_slam_tpu.utils import trajectory as tio

    traj = _random_traj()
    path = str(tmp_path / "traj_euroc.csv")
    tio.save_euroc(path, traj)
    back = tio.load_euroc(path)
    assert len(back) == len(traj)
    for (s0, R0, p0), (s1, R1, p1) in zip(traj, back):
        assert abs(s0 - s1) < 1e-6
        np.testing.assert_allclose(R0, R1, atol=1e-4)
        np.testing.assert_allclose(p0, p1, atol=1e-6)


def test_kitti_trajectory_roundtrip(tmp_path):
    """KITTI 12-number [R|t] writer/parser round-trip (src/System.cc:654)."""
    import numpy as np

    from pli_slam_tpu.utils import trajectory as tio

    traj = _random_traj(seed=4)
    path = str(tmp_path / "traj_kitti.txt")
    tio.save_kitti(path, traj)
    back = tio.load_kitti(path)
    assert len(back) == len(traj)
    for (_, R0, p0), (_, R1, p1) in zip(traj, back):
        np.testing.assert_allclose(R0, R1, atol=1e-6)
        np.testing.assert_allclose(p0, p1, atol=1e-6)


def test_keyframe_savers_and_imu_init_log(tmp_path):
    """KF-trajectory savers in all three formats + the IMU-init debug CSV
    (reference SaveKeyFrameTrajectoryEuRoC src/System.cc:602 and
    SaveDebugData src/System.cc:708)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pli_slam_tpu.ops.camera import Camera
    from pli_slam_tpu.system import System
    from pli_slam_tpu.utils import trajectory as tio
    from pli_slam_tpu.utils.config import SlamConfig
    from pli_slam_tpu.ops import lie

    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)
    sys_ = System(cam, cfg)
    tr = sys_.tracker
    rng = np.random.default_rng(11)
    n = 4
    ks = tr.kstore
    for k in range(n):
        R = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.2, jnp.float32))
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        ks = dataclasses.replace(
            ks,
            R=ks.R.at[k].set(R), t=ks.t.at[k].set(t),
            stamp=ks.stamp.at[k].set(0.1 * k),
            valid=ks.valid.at[k].set(True),
        )
    tr.kstore = ks
    tr.n_kf = n

    p_eu = str(tmp_path / "kf_euroc.csv")
    p_ki = str(tmp_path / "kf_kitti.txt")
    p_tum = str(tmp_path / "kf_tum.txt")
    sys_.save_keyframe_trajectory_euroc(p_eu)
    sys_.save_keyframe_trajectory_kitti(p_ki)
    sys_.save_keyframe_trajectory_tum(p_tum)
    eu = tio.load_euroc(p_eu)
    ki = tio.load_kitti(p_ki)
    tum = tio.load_tum(p_tum)
    assert len(eu) == len(ki) == len(tum) == n
    # all three formats agree on the poses (camera-to-world)
    for (s_e, R_e, p_e), (_, R_k, p_k), (s_t, R_t, p_t) in zip(eu, ki, tum):
        np.testing.assert_allclose(R_e, R_k, atol=1e-4)
        np.testing.assert_allclose(p_e, p_k, atol=1e-5)
        np.testing.assert_allclose(p_e, p_t, atol=1e-5)
        assert abs(s_e - s_t) < 1e-6

    tr.imu_init_log.append({"n_kf": 3, "accepted": False,
                            "reason": "too_few_keyframes", "wall_ms": 0.2})
    tr.imu_init_log.append({
        "n_kf": 6, "accepted": True, "reason": "ok", "scale": 1.02,
        "gravity_angle_deg": 1.4, "bg": [0.01, -0.02, 0.003],
        "ba": [0.1, 0.0, -0.05], "cost0": 12.5, "cost1": 0.3,
        "wall_ms": 55.0,
    })
    p_log = str(tmp_path / "imu_init.csv")
    sys_.save_imu_init_log(p_log)
    lines = open(p_log).read().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("n_kf,accepted,reason")
    assert "too_few_keyframes" in lines[1]
    assert "ok" in lines[2] and "1.02" in lines[2]
