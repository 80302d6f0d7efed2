"""End-to-end tracker test on a synthetic rendered sequence (CPU, tiny).

The tiny camera (fx=120, bf=13.2) is near its stereo observability
limit, so the ATE bound here is loose — this test guards integration
(init -> track -> KF -> BA -> trajectory), not accuracy. Accuracy is
measured by bench.py at the full EuRoC-scale configuration.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


@pytest.fixture(scope="module")
def run_result():
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=0.11 * 120.0, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    gt = []
    infos = []
    for fr in synthetic.make_sequence(cam, 30, fps=cfg.fps, traj=traj, room_half=2.55):
        infos.append(tracker.process(fr["img_l"], fr["img_r"], fr["t"]))
        gt.append(fr["p_w"])
    return tracker, infos, np.stack(gt)


def test_initializes_and_tracks(run_result):
    tracker, infos, gt = run_result
    assert infos[0]["state"] == TrackingState.OK
    ok_frames = sum(1 for i in infos if i["state"] == TrackingState.OK)
    assert ok_frames >= 27, ok_frames


def test_map_grows(run_result):
    tracker, infos, gt = run_result
    assert infos[-1]["n_kf"] >= 2
    assert infos[-1]["n_points"] > 50
    assert infos[-1]["n_lines"] > 3


def test_trajectory_sane(run_result):
    tracker, infos, gt = run_result
    est = tracker.positions()
    assert est.shape[0] == 30
    ate = synthetic.ate_rmse(est, gt)
    path = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    # loose: toy stereo geometry; guards against divergence
    assert ate < 0.35 * path, (ate, path)


def test_trajectory_io(tmp_path, run_result):
    tracker, _, _ = run_result
    from pli_slam_tpu.utils import trajectory as tio

    p = str(tmp_path / "traj.txt")
    tio.save_tum(p, tracker.trajectory)
    loaded = tio.load_tum(p)
    assert len(loaded) == len(tracker.trajectory)
    np.testing.assert_allclose(loaded[5][2], tracker.trajectory[5][2], atol=1e-5)
    tio.save_kitti(str(tmp_path / "kitti.txt"), tracker.trajectory)
    tio.save_euroc(str(tmp_path / "euroc.csv"), tracker.trajectory)
    t_rpe, r_rpe = tio.rpe_rmse(tracker.trajectory, tracker.trajectory)
    assert t_rpe < 1e-6 and r_rpe < 0.05  # f32 arccos noise floor ~0.02 deg


def test_landmark_last_kf_written_by_product_path(run_result):
    """Loop correction re-anchors each landmark through its last-observing
    keyframe (loop_closing.apply_loop_correction). last_kf must therefore
    be maintained by the live insert path for POINTS and LINES alike —
    regression guard for the round-3 bug where LineStore.last_kf was
    never written and every line re-anchored through KF0 (the PGO gauge),
    i.e. lines silently did not move at loop closure."""
    tracker, infos, gt = run_result
    n_kf = int(tracker.n_kf)
    assert n_kf >= 2
    pv = np.asarray(tracker.pstore.valid)
    lv = np.asarray(tracker.lstore.valid)
    p_last = np.asarray(tracker.pstore.last_kf)[pv]
    l_last = np.asarray(tracker.lstore.last_kf)[lv]
    assert lv.sum() > 3
    # landmarks created/re-observed after KF0 must carry a nonzero last_kf
    assert (p_last > 0).any(), "point last_kf never written past KF0"
    assert (l_last > 0).any(), "line last_kf never written past KF0"
    # last_kf is a valid KF slot and >= first_kf
    assert p_last.max() <= n_kf - 1 and l_last.max() <= n_kf - 1
    l_first = np.asarray(tracker.lstore.first_kf)[lv]
    assert (l_last >= l_first).all()


def test_distinctive_descriptor_is_bank_medoid(run_result):
    """Landmark descriptors are maintained as the min-sum-Hamming medoid
    of a small bank of stored views (reference ComputeDistinctiveDescriptors,
    src/MapPoint.cc:300) — not the last view, which random-walks with
    viewpoint. Verify the invariant on the live map: for re-observed
    landmarks the stored desc IS a bank row, and it minimizes the
    sum-of-Hamming over the valid bank rows."""
    from pli_slam_tpu.worldmap.stores import DESC_BANK

    tracker, infos, gt = run_result
    pv = np.asarray(tracker.pstore.valid)
    n_obs = np.asarray(tracker.pstore.n_obs)
    desc = np.asarray(tracker.pstore.desc)
    bank = np.asarray(tracker.pstore.desc_bank)
    multi = pv & (n_obs >= 3)
    assert multi.sum() > 10, "scene should re-observe many landmarks"
    ids = np.nonzero(multi)[0][:50]
    for i in ids:
        nb = min(int(n_obs[i]), DESC_BANK)
        rows = bank[i, :nb].astype(np.int32)
        dists = (256 - rows @ rows.T) // 2
        sums = dists.sum(axis=1)
        best = int(np.argmin(sums))
        assert (desc[i] == bank[i, best]).all(), i
