"""Monocular and RGB-D tracking modes end-to-end (CPU, tiny).

The reference exposes TrackMonocular / TrackRGBD next to TrackStereo
(src/System.h:107-118); these tests guard the mono two-view
initialization (Tracking.cc:2079 MonocularInitialization), mono
triangulation-based map growth, and the RGB-D virtual-right-coordinate
path (Frame.cc:231).
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


def _cam():
    return Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)


@pytest.fixture(scope="module")
def rgbd_run():
    cfg = SlamConfig.tiny_test().replace(sensor="rgbd")
    cam = _cam()
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    gt, infos = [], []
    for fr in synthetic.make_sequence(cam, 25, fps=cfg.fps, traj=traj, room_half=2.55, with_depth=True):
        infos.append(tracker.process_rgbd(fr["img_l"], fr["depth"], fr["t"]))
        gt.append(fr["p_w"])
    return tracker, infos, np.stack(gt)


def test_rgbd_initializes_and_tracks(rgbd_run):
    tracker, infos, gt = rgbd_run
    assert infos[0]["state"] == TrackingState.OK
    ok = sum(1 for i in infos if i["state"] == TrackingState.OK)
    assert ok >= 22, ok
    assert infos[-1]["n_points"] > 50


def test_rgbd_trajectory_sane(rgbd_run):
    tracker, infos, gt = rgbd_run
    est = tracker.positions()
    ate = synthetic.ate_rmse(est, gt)
    path = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert ate < 0.35 * path, (ate, path)


@pytest.fixture(scope="module")
def mono_run():
    cfg = SlamConfig.tiny_test().replace(sensor="mono")
    cam = _cam()
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    gt, infos = [], []
    # subsample 3x: mono init needs parallax between consecutive frames
    frames = list(synthetic.make_sequence(cam, 54, fps=cfg.fps, traj=traj, room_half=2.55))[::3]
    for fr in frames:
        infos.append(tracker.process_mono(fr["img_l"], fr["t"]))
        gt.append(fr["p_w"])
    return tracker, infos, np.stack(gt)


def test_mono_initializes(mono_run):
    tracker, infos, gt = mono_run
    assert tracker.n_kf >= 2, "mono two-view initialization never fired"
    assert infos[-1]["n_points"] > 30


def test_mono_tracks(mono_run):
    tracker, infos, gt = mono_run
    ok = sum(1 for i in infos if i["state"] == TrackingState.OK)
    assert ok >= len(infos) * 0.6, (ok, len(infos))


def test_mono_trajectory_up_to_scale(mono_run):
    tracker, infos, gt = mono_run
    est = tracker.positions()
    n = min(len(est), len(gt))
    est, gtn = est[:n], gt[:n]
    # Umeyama WITH scale (mono is scale-free)
    mu_e, mu_g = est.mean(0), gtn.mean(0)
    E, G = est - mu_e, gtn - mu_g
    U, S, Vt = np.linalg.svd(G.T @ E / n)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    var_e = (E ** 2).sum() / n
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    aligned = (s * (R @ E.T)).T + mu_g
    ate = float(np.sqrt(((aligned - gtn) ** 2).sum(axis=1).mean()))
    path = np.linalg.norm(np.diff(gtn, axis=0), axis=1).sum()
    assert ate < 0.4 * path, (ate, path)
