"""Mono-inertial metric scale recovery end-to-end.

The monocular map is born at an arbitrary (median-depth-normalized)
scale; the joint inertial initialization must recover the metric scale
from the preintegration chain and rescale the map (reference:
`VertexScale` in Optimizer::InertialOptimization src/Optimizer.cc:5431 +
Map::ApplyScaledRotation src/Map.cc:657). Round-2 verdict item 4's
done-criterion. The exact-chain unit test lives in
tests/test_imu_init.py::test_recovers_metric_scale_mono; this e2e run
asserts the full pipeline wiring: mono two-view init -> visual KF chain
-> joint MAP with free scale -> map rescale -> inertial tracking.

The tiny synthetic camera gives mono translation ~35% noise per frame,
so the post-init scale contract here is order-of-magnitude (0.5-2.0x);
the mono map before rescale sits at ~0.2-0.4x metric, so even the loose
band demonstrates genuine recovery.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import (
    ImuConfig, LineConfig, MapConfig, OrbConfig, SlamConfig, TrackingConfig,
)


def test_mono_inertial_recovers_metric_scale():
    cfg = SlamConfig(
        width=256, height=192,
        sensor="mono_imu",
        orb=OrbConfig(n_features=512, n_levels=4),
        lines=LineConfig(n_lines=48),
        map=MapConfig(max_keyframes=64, max_points=4096, max_lines=256,
                      max_obs_per_kf_points=512, max_obs_per_kf_lines=48),
        imu=ImuConfig(max_samples_per_frame=16, init_time_sec=1.2,
                      init_min_kfs=4,  # round-4 behavior: mono KF cadence is slow; this test exercises the scale pipeline, not init robustness
                      noise_gyro=2e-3, noise_acc=2e-2),
        tracking=TrackingConfig(min_init_features=60, min_matches_motion=8,
                                min_matches_ref_kf=8, min_inliers_track=8,
                                min_inliers_local_map=15),
    )
    cam = Camera.pinhole(fx=240.0, fy=240.0, cx=128.0, cy=96.0, bf=0.0,
                         width=256, height=192)
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    tracker = Tracker(cam, cfg)
    gt = []
    pre_init_ratio = None
    for fr in synthetic.make_sequence(cam, 50, fps=cfg.fps, traj=traj, room_half=2.55):
        imu = {"gyro": fr["imu_gyro"], "acc": fr["imu_acc"], "stamps": fr["imu_stamps"]}
        if not tracker.imu_ready and tracker.n_kf >= 3 and pre_init_ratio is None:
            est = tracker.positions()
            g = np.stack(gt)
            n = len(est)
            pe = np.linalg.norm(np.diff(est[2:n], axis=0), axis=1).sum()
            pg = np.linalg.norm(np.diff(g[2:n], axis=0), axis=1).sum()
            pre_init_ratio = pe / max(pg, 1e-9)
        tracker.process_mono(fr["img_l"], fr["t"], imu=imu)
        gt.append(fr["p_w"])
    assert tracker.imu_ready, "mono-inertial init never fired"
    gt = np.stack(gt)
    est = tracker.positions()
    # metric scale post-init: path-length ratio with NO scale alignment
    a = est[-20:]
    b = gt[len(est) - 20:len(est)]
    path_est = np.linalg.norm(np.diff(a, axis=0), axis=1).sum()
    path_gt = np.linalg.norm(np.diff(b, axis=0), axis=1).sum()
    ratio = path_est / max(path_gt, 1e-9)
    assert 0.5 < ratio < 2.0, (ratio, path_est, path_gt)
    # and it must be a genuine improvement over the arbitrary mono scale
    if pre_init_ratio is not None and pre_init_ratio < 0.5:
        assert abs(np.log(ratio)) < abs(np.log(pre_init_ratio)), (ratio, pre_init_ratio)
