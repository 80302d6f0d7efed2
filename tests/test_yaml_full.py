"""Config round-trip: Camera + rectifier + Tbc from one YAML alone.

Round-2 verdict Missing #8 done-criterion. The YAML written here uses
the reference's EuRoC schema (Examples/Stereo-Inertial/Config/
EuRoC.yaml:6-104): scalar camera keys, LEFT./RIGHT. K/D/R/P
opencv-matrix blocks, Tbc, IMU noise, ORB budgets.
"""

import numpy as np

from pli_slam_tpu.ops.rectify import EUROC_KDRP, euroc_rectifier
from pli_slam_tpu.utils.config import load_yaml_full
from tests.test_tbc import EUROC_TBC


def _mat_node(name: str, arr: np.ndarray) -> str:
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    data = ", ".join(repr(float(x)) for x in arr.reshape(-1))
    return (
        f"{name}: !!opencv-matrix\n"
        f"   rows: {arr.shape[0]}\n   cols: {arr.shape[1]}\n   dt: d\n"
        f"   data: [{data}]\n"
    )


def test_full_yaml_roundtrip(tmp_path):
    c = EUROC_KDRP
    yml = (
        "%YAML:1.0\n"
        "Camera.fps: 20.0\nCamera.width: 752\nCamera.height: 480\n"
        "ORBextractor.nFeatures: 1200\nORBextractor.nLevels: 8\n"
        "ORBextractor.scaleFactor: 1.2\n"
        "IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
        "IMU.GyroWalk: 1.9393e-05\nIMU.AccWalk: 3.0e-03\nIMU.Frequency: 200\n"
        + _mat_node("Tbc", EUROC_TBC)
        + _mat_node("LEFT.K", c["K_l"]) + _mat_node("LEFT.D", c["D_l"])
        + _mat_node("LEFT.R", c["R_l"]) + _mat_node("LEFT.P", c["P_l"])
        + _mat_node("RIGHT.K", c["K_r"]) + _mat_node("RIGHT.D", c["D_r"])
        + _mat_node("RIGHT.R", c["R_r"]) + _mat_node("RIGHT.P", c["P_r"])
    )
    path = tmp_path / "EuRoC.yaml"
    path.write_text(yml)

    cfg, cam, rectifier = load_yaml_full(str(path))
    # camera from the rectified projection
    assert abs(float(cam.fx) - 435.2046959714599) < 1e-3
    assert abs(float(cam.cx) - 367.4517211914062) < 1e-3
    assert abs(float(cam.bf) - 47.90639384423901) < 1e-3
    assert cfg.orb.n_features == 1200
    assert abs(cfg.imu.walk_gyro - 1.9393e-05) < 1e-9
    # Tbc
    np.testing.assert_allclose(
        np.asarray(cfg.imu.Tbc).reshape(4, 4), EUROC_TBC, atol=1e-6
    )
    # rectifier grids identical to the reference-constant builder
    ref = euroc_rectifier()
    assert rectifier is not None
    np.testing.assert_allclose(
        np.asarray(rectifier.map_x_l), np.asarray(ref.map_x_l), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(rectifier.map_y_r), np.asarray(ref.map_y_r), atol=1e-3
    )
