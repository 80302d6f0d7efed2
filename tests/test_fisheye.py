"""KB8 fisheye pipeline (reference src/CameraModels/KannalaBrandt8.cpp,
wired through the mono path via keypoint undistortion — the reference's
Frame::UndistortKeyPoints, src/Frame.cc:872)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.frontend.frame import undistort_uv
from pli_slam_tpu.ops import camera as cam_ops
from pli_slam_tpu.ops.camera import Camera

KB8_K = [0.08, -0.02, 0.004, -0.001]


def _kb8(bf=0.0):
    return Camera.kannala_brandt8(
        fx=120.0, fy=120.0, cx=64.0, cy=48.0, k=KB8_K, bf=bf, width=128, height=96
    )


def test_undistort_uv_maps_to_pinhole_projection():
    cam = _kb8()
    pin = dataclasses.replace(cam, model=cam_ops.PINHOLE)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (64, 3)) + np.array([0, 0, 4.0]), jnp.float32)
    uv_fish = cam_ops.project(cam, pts)
    uv_pin_expect = cam_ops.project(pin, pts)
    uv_undist = undistort_uv(cam, uv_fish)
    err = np.abs(np.asarray(uv_undist - uv_pin_expect))
    assert err.max() < 0.05, err.max()


def test_kb8_stereo_requires_rig_extrinsics():
    from pli_slam_tpu.frontend.tracker import Tracker
    from pli_slam_tpu.utils.config import SlamConfig

    with pytest.raises(ValueError):
        Tracker(_kb8(bf=13.2), SlamConfig.tiny_test())  # no T_rl


@pytest.mark.slow
def test_kb8_stereo_e2e_tracks():
    """Fisheye STEREO: unrectifiable rig, so L/R association is
    epipolar-gated two-view matching + DLT triangulation
    (frame.build_frame_fisheye_stereo; reference
    KannalaBrandt8::matchAndtriangulate, src/CameraModels/
    KannalaBrandt8.cpp:240, fisheye Frame ctor src/Frame.cc:1484).
    Metric depth comes from the rig baseline, so the trajectory aligns
    WITHOUT scale (unlike the mono fisheye path)."""
    import dataclasses as _dc

    from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
    from pli_slam_tpu.utils import synthetic
    from pli_slam_tpu.utils.config import SlamConfig

    baseline = 0.11
    cam = _kb8(bf=120.0 * baseline)
    cfg = SlamConfig.tiny_test()
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline  # x_right = x_left - baseline (camera moved +x)
    tracker = Tracker(cam, cfg, T_rl=T_rl)

    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    render = jax.jit(lambda R, t: synthetic.render_view(cam, R, t, room_half=2.55))
    gt, infos = [], []
    for k in range(24):
        t = k / cfg.fps
        R_wb, p = traj.pose(t)
        R_j = jnp.asarray(R_wb, jnp.float32)
        p_j = jnp.asarray(p, jnp.float32)
        img_l = render(R_j, p_j)
        img_r = render(R_j, p_j + R_j[:, 0] * baseline)
        infos.append(tracker.process(img_l, img_r, t))
        gt.append(p)
    ok_frames = sum(1 for i in infos if i["state"] == TrackingState.OK)
    assert ok_frames >= 20, ok_frames
    assert infos[-1]["n_points"] > 30
    est = tracker.positions()
    ate = synthetic.ate_rmse(est, np.stack(gt))
    path = np.linalg.norm(np.diff(np.stack(gt), axis=0), axis=1).sum()
    assert ate < 0.35 * path, (ate, path)


@pytest.mark.slow
def test_mono_fisheye_e2e_tracks():
    """Monocular tracking on KB8-rendered fisheye imagery initializes,
    tracks, and recovers the trajectory shape up to scale (mono scale is
    free: Umeyama-with-scale alignment, same protocol as the pinhole
    mono e2e in test_mono_rgbd)."""
    from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
    from pli_slam_tpu.utils import synthetic
    from pli_slam_tpu.utils.config import SlamConfig

    cam = _kb8()
    cfg = SlamConfig.tiny_test().replace(sensor="mono")
    traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
    frames = list(synthetic.make_sequence(cam, 54, fps=cfg.fps, traj=traj, room_half=2.55))[::3]
    tr = Tracker(cam, cfg)
    gt, infos = [], []
    for fr in frames:
        infos.append(tr.process_mono(fr["img_l"], fr["t"]))
        gt.append(fr["p_w"])
    gt = np.stack(gt)
    assert tr.n_kf >= 2, "fisheye mono never initialized"
    n_ok = sum(1 for i in infos if i["state"] == TrackingState.OK)
    assert n_ok >= len(infos) * 0.5, (n_ok, len(infos))
    est = tr.positions()
    n = min(len(est), len(gt))
    est, gtn = est[:n], gt[:n]
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
