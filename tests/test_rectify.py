"""Stereo rectification/undistortion (ops/rectify.py).

Validates the remap-grid math the way the reference relies on it
(src/Tracking.cc:144-258 + cv::remap at ingest): after rectification the
two cameras must behave as an ideal row-aligned pinhole rig.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import rectify


def _project_raw(X_cam: np.ndarray, K, D, R):
    """Project 3D points (RECTIFIED-camera frame) into the RAW image:
    rotate back by R^T, distort, apply K."""
    X_raw = X_cam @ R  # R maps raw->rect; raw coords = R^T X = X @ R
    x = X_raw[:, 0] / X_raw[:, 2]
    y = X_raw[:, 1] / X_raw[:, 2]
    xd, yd = rectify.radtan_distort(x, y, np.asarray(D))
    return np.stack([K[0][0] * xd + K[0][2], K[1][1] * yd + K[1][2]], -1)


def _project_rect(X_cam: np.ndarray, P):
    u = P[0][0] * X_cam[:, 0] / X_cam[:, 2] + P[0][2] + P[0][3] / X_cam[:, 2]
    v = P[1][1] * X_cam[:, 1] / X_cam[:, 2] + P[1][2]
    return np.stack([u, v], -1)


@pytest.fixture(scope="module")
def euroc():
    return rectify.EUROC_KDRP


def test_map_points_consistency(euroc, rng):
    """The remap grid evaluated at a rectified projection must equal the
    raw projection of the same 3D point (<0.3 px) — this is exactly the
    correspondence cv::initUndistortRectifyMap encodes."""
    c = euroc
    map_x, map_y = rectify.build_rectify_map(c["K_l"], c["D_l"], c["R_l"], c["P_l"], 752, 480)
    X = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200), rng.uniform(2, 8, 200)], -1)
    uv_rect = _project_rect(X, c["P_l"])
    uv_raw = _project_raw(X, c["K_l"], c["D_l"], c["R_l"])
    inside = (
        (uv_rect[:, 0] > 1) & (uv_rect[:, 0] < 750)
        & (uv_rect[:, 1] > 1) & (uv_rect[:, 1] < 478)
    )
    # bilinear-interpolate the map at the rectified projection
    ui = uv_rect[inside]
    x0 = np.floor(ui).astype(int)
    f = ui - x0

    def interp(m):
        return (
            m[x0[:, 1], x0[:, 0]] * (1 - f[:, 0]) * (1 - f[:, 1])
            + m[x0[:, 1], x0[:, 0] + 1] * f[:, 0] * (1 - f[:, 1])
            + m[x0[:, 1] + 1, x0[:, 0]] * (1 - f[:, 0]) * f[:, 1]
            + m[x0[:, 1] + 1, x0[:, 0] + 1] * f[:, 0] * f[:, 1]
        )

    raw_from_map = np.stack([interp(map_x), interp(map_y)], -1)
    err = np.linalg.norm(raw_from_map - uv_raw[inside], axis=1)
    assert err.max() < 0.3, err.max()


def test_epipolar_rows_aligned(euroc, rng):
    """After rectification, left/right projections of the same 3D point
    share the image row to <0.5 px (the stereo matcher's row-band gate
    assumes exactly this)."""
    c = euroc
    # world points in the LEFT rectified camera frame; right rectified
    # camera = pure baseline shift (P encodes -fx*b in column 3)
    X = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300), rng.uniform(2, 8, 300)], -1)
    uv_l = _project_rect(X, c["P_l"])
    uv_r = _project_rect(X, c["P_r"])
    assert np.abs(uv_l[:, 1] - uv_r[:, 1]).max() < 1e-6  # same P rows by construction
    # disparity positive and finite
    disp = uv_l[:, 0] - uv_r[:, 0]
    assert (disp > 0).all()


def test_remap_bilinear_identity_and_shift(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    u, v = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    out = rectify.remap_bilinear(img, jnp.asarray(u), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # half-pixel shift = average of horizontal neighbors
    out2 = rectify.remap_bilinear(img, jnp.asarray(u + 0.5), jnp.asarray(v))
    expect = 0.5 * (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:])  # [48, 63]
    np.testing.assert_allclose(np.asarray(out2)[:, :-1], expect, atol=1e-4)


def test_rectified_image_straightens_distortion(euroc):
    """Render a raw image containing the DISTORTED projection of a
    straight 3D line; after remap the line must be straight in the
    rectified image (max deviation from the fitted line < 1 px)."""
    c = euroc
    H, W = 480, 752
    # straight 3D line in the rectified-left camera frame
    # a line passing FAR from the principal point: radial distortion bends
    # off-center lines the most (center-crossing lines stay straight)
    ts = np.linspace(-1.0, 1.0, 600)
    X = np.stack([3.2 * ts, -1.7 + 0.05 * ts, np.full_like(ts, 4.0)], -1)
    uv_raw = _project_raw(X, c["K_l"], c["D_l"], c["R_l"])
    # paint the raw image: white background, dark thick line
    img_raw = np.full((H, W), 200.0, np.float32)
    for u, v in uv_raw:
        ui, vi = int(round(u)), int(round(v))
        if 1 <= ui < W - 1 and 1 <= vi < H - 1:
            img_raw[vi - 1 : vi + 2, ui - 1 : ui + 2] = 10.0
    # the raw curve must actually be curved (sanity of the setup):
    # fit u->v line on raw points, check curvature is visible
    A = np.stack([uv_raw[:, 0], np.ones_like(uv_raw[:, 0])], -1)
    resid_raw = np.abs(A @ np.linalg.lstsq(A, uv_raw[:, 1], rcond=None)[0] - uv_raw[:, 1])
    assert resid_raw.max() > 1.5, "distortion too small to test"

    map_x, map_y = rectify.build_rectify_map(c["K_l"], c["D_l"], c["R_l"], c["P_l"], W, H)
    img_rect = np.asarray(
        rectify.remap_bilinear(jnp.asarray(img_raw), jnp.asarray(map_x), jnp.asarray(map_y))
    )
    # locate the dark line in the rectified image per column
    uv_rect = _project_rect(X, c["P_l"])
    cols = np.clip(np.round(uv_rect[:, 0]).astype(int), 2, W - 3)
    rows = []
    for ucol in np.unique(cols):
        col = img_rect[:, ucol]
        vmin = int(np.argmin(col))
        if col[vmin] < 100:
            rows.append((ucol, vmin))
    rows = np.asarray(rows, np.float64)
    assert len(rows) > 100
    A = np.stack([rows[:, 0], np.ones_like(rows[:, 0])], -1)
    resid = np.abs(A @ np.linalg.lstsq(A, rows[:, 1], rcond=None)[0] - rows[:, 1])
    assert np.percentile(resid, 95) < 1.0, resid.max()
