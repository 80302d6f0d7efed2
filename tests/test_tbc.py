"""Body-camera extrinsics (Tbc) plumbing.

The reference parses Tbc from the YAML into IMU::Calib
(src/Tracking.cc:761) and every inertial factor evaluates camera poses
through it (ImuCamPose, src/G2oTypes.cc). These tests pin:
- the Extrinsics <-> BodyState conversions are exact inverses,
- the YAML matrix parser reads an opencv-matrix Tbc node,
- a synthetic rig with EuRoC's actual Tbc tracks with ATE comparable to
  the identity-rig run (the round-2 build hardcoded identity and would
  fail this on real data).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import lie
from pli_slam_tpu.solve import inertial as inr

# EuRoC MAV body->camera (cam0) transform, reference
# Examples/Stereo-Inertial/Config/EuRoC.yaml "Tbc" node
EUROC_TBC = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def test_extrinsics_roundtrip():
    ext = inr.Extrinsics.from_Tbc(EUROC_TBC)
    # random body state
    rng = np.random.default_rng(3)
    R_wb = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.7, jnp.float32)))
    state = inr.BodyState(
        R_wb=jnp.asarray(R_wb),
        p_w=jnp.asarray(rng.normal(size=3), jnp.float32),
        v_w=jnp.asarray(rng.normal(size=3), jnp.float32),
        bg=jnp.zeros(3),
        ba=jnp.zeros(3),
    )
    R_cw, t_cw = inr.camera_pose(state, ext)
    back = inr.body_state_from_camera(R_cw, t_cw, state.v_w, state.bg, state.ba, ext)
    np.testing.assert_allclose(np.asarray(back.R_wb), R_wb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.p_w), np.asarray(state.p_w), atol=1e-5)
    # T_cw composed with T_wb must equal T_cb
    Rcb = np.asarray(R_cw) @ R_wb
    np.testing.assert_allclose(Rcb, np.asarray(ext.R_cb), atol=1e-5)


def test_from_tbc_identity():
    ext = inr.Extrinsics.from_Tbc(None)
    np.testing.assert_allclose(np.asarray(ext.R_cb), np.eye(3))
    np.testing.assert_allclose(np.asarray(ext.t_cb), np.zeros(3))


def test_yaml_tbc_parse(tmp_path):
    from pli_slam_tpu.utils.config import load_yaml, parse_yaml_matrices

    rows = [", ".join(f"{x}" for x in r) for r in EUROC_TBC]
    yml = tmp_path / "rig.yaml"
    yml.write_text(
        "%YAML:1.0\n"
        "Camera.width: 752\n"
        "Camera.height: 480\n"
        "Tbc: !!opencv-matrix\n"
        "   rows: 4\n"
        "   cols: 4\n"
        "   dt: f\n"
        "   data: [" + ",\n         ".join(rows) + "]\n"
        "IMU.NoiseGyro: 1.7e-4\n"
    )
    mats = parse_yaml_matrices(str(yml))
    assert "Tbc" in mats and mats["Tbc"][0] == (4, 4)
    cfg = load_yaml(str(yml))
    assert cfg.imu.Tbc is not None
    np.testing.assert_allclose(
        np.asarray(cfg.imu.Tbc).reshape(4, 4), EUROC_TBC, atol=1e-9
    )
    ext = inr.Extrinsics.from_Tbc(cfg.imu.Tbc)
    np.testing.assert_allclose(np.asarray(ext.R_cb), EUROC_TBC[:3, :3].T, atol=1e-6)


@pytest.mark.slow
def test_tracker_with_euroc_tbc():
    """A rig with EuRoC's real Tbc must track as well as the identity rig.

    Done-criterion from the round-2 verdict item 3.
    """
    from pli_slam_tpu.frontend.tracker import Tracker, TrackingState
    from pli_slam_tpu.ops.camera import Camera
    from pli_slam_tpu.utils import synthetic
    from pli_slam_tpu.utils.config import SlamConfig

    def run(tbc_cfg, tbc_gen):
        cfg = SlamConfig.tiny_test()
        cfg = dataclasses.replace(
            cfg,
            sensor="stereo_imu",
            imu=dataclasses.replace(
                cfg.imu, init_time_sec=1.0, max_samples_per_frame=16, Tbc=tbc_cfg,
                # the synthetic generator's finite-difference IMU carries
                # ~1e-3 discretization error — model it, or the whitened
                # preintegration factors overpower vision and biases
                # absorb the mismatch
                noise_gyro=2e-3, noise_acc=2e-2,
            ),
        )
        cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
        traj = synthetic.Trajectory(amp=(0.5, 0.35, 0.2), freq=(0.15, 0.19, 0.11), yaw_amp=0.25)
        tracker = Tracker(cam, cfg)
        gt = []
        n_ok = 0
        for fr in synthetic.make_sequence(cam, 70, fps=cfg.fps, traj=traj,
                                          room_half=2.55, Tbc=tbc_gen):
            imu = {"gyro": fr["imu_gyro"], "acc": fr["imu_acc"], "stamps": fr["imu_stamps"]}
            info = tracker.process(fr["img_l"], fr["img_r"], fr["t"], imu=imu)
            n_ok += info["state"] == TrackingState.OK
            gt.append(fr["p_w"])  # camera gt positions
        ate = synthetic.ate_rmse(tracker.positions(), np.stack(gt))
        return tracker, ate, n_ok

    tbc_tuple = tuple(float(x) for x in EUROC_TBC.reshape(-1))
    tr_tbc, ate_tbc, ok_tbc = run(tbc_tuple, EUROC_TBC)
    assert tr_tbc.imu_ready, "IMU init never fired with Tbc rig"
    assert ok_tbc >= 62, ok_tbc
    g = np.asarray(tr_tbc.gravity_w)
    np.testing.assert_allclose(np.linalg.norm(g), 9.81, rtol=0.15)

    tr_id, ate_id, ok_id = run(None, None)
    # comparable accuracy: within 50% + 2 cm of the identity rig
    assert ate_tbc <= 1.5 * ate_id + 0.02, (ate_tbc, ate_id)
