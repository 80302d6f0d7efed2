"""System facade tests: API surface, checkpoint round-trip, localization mode."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.system import System
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


@pytest.fixture(scope="module")
def short_run(tmp_path_factory):
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    sysm = System(cam, cfg)
    frames = list(synthetic.make_sequence(cam, 14, fps=cfg.fps, traj=traj, room_half=2.55))
    for fr in frames:
        info = sysm.track_stereo(fr["img_l"], fr["img_r"], fr["t"])
    return sysm, frames


def test_track_returns_pose(short_run):
    sysm, frames = short_run
    info = sysm.track_stereo(frames[-1]["img_l"], frames[-1]["img_r"], frames[-1]["t"] + 0.05)
    assert "R_wc" in info and info["R_wc"].shape == (3, 3)
    assert np.isfinite(info["p_w"]).all()


def test_trajectory_savers(short_run, tmp_path):
    sysm, _ = short_run
    for fn, name in [
        (sysm.save_trajectory_tum, "t.txt"),
        (sysm.save_trajectory_euroc, "e.csv"),
        (sysm.save_trajectory_kitti, "k.txt"),
        (sysm.save_keyframe_trajectory_tum, "kf.txt"),
    ]:
        p = str(tmp_path / name)
        fn(p)
        assert len(open(p).readlines()) >= 1


def test_checkpoint_roundtrip(short_run, tmp_path):
    sysm, frames = short_run
    p = str(tmp_path / "map.npz")
    sysm.save_map(p)
    cam = sysm.cam
    sys2 = System(cam, sysm.cfg)
    sys2.load_map(p)
    assert sys2.tracker.n_kf == sysm.tracker.n_kf
    np.testing.assert_allclose(
        np.asarray(sys2.tracker.pstore.x), np.asarray(sysm.tracker.pstore.x)
    )
    # the restored system can keep tracking (localization mode)
    sys2.activate_localization_mode()
    n_pts_before = int(sys2.tracker.pstore.valid.sum())
    info = sys2.track_stereo(frames[-1]["img_l"], frames[-1]["img_r"], frames[-1]["t"] + 0.05)
    assert info["state"] in ("OK", "RECENTLY_LOST")
    # localization mode must not grow the map
    assert int(sys2.tracker.pstore.valid.sum()) == n_pts_before


def test_timing_stats(short_run):
    sysm, _ = short_run
    stats = sysm.timing_stats()
    assert stats["fps"] > 0


def test_reset(short_run):
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    sysm = System(cam, cfg)
    sysm.reset()
    assert sysm.tracker.n_kf == 0
