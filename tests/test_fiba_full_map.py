"""Whole-map FullInertialBA: the chunked sweep must refine EVERY keyframe.

Round-3 verdict Weak #5 / Missing #3: the capped implementation windowed
the last <=32 KFs, so on a >32-KF map the "full" inertial refinement
never touched the far side (the KFs a loop closure moves most).
Reference behavior to match: Optimizer::FullInertialBA optimizes every
keyframe (src/Optimizer.cc:369).

Here a 40-KF constant-velocity inertial map is fabricated with corrupted
velocities on the FAR side (slots 1..6); after _full_inertial_ba they
must be pulled back toward truth — which only happens if the sweep
actually visits them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend.tracker import Tracker
from pli_slam_tpu.ops import imu as imu_ops
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils.config import (
    ImuConfig, LineConfig, MapConfig, OrbConfig, SlamConfig, TrackingConfig,
)

G = 9.81


def _make_cfg():
    return SlamConfig(
        sensor="stereo_imu",
        width=128, height=96,
        orb=OrbConfig(n_features=64, n_levels=2),
        lines=LineConfig(n_lines=8),
        map=MapConfig(max_keyframes=64, max_points=256, max_lines=32,
                      max_obs_per_kf_points=64, max_obs_per_kf_lines=8),
        imu=ImuConfig(max_samples_per_frame=16),
        tracking=TrackingConfig(min_init_features=10),
    )


def test_full_inertial_ba_reaches_far_side(rng):
    cfg = _make_cfg()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)
    tracker = Tracker(cam, cfg)
    n, S = 40, 64
    dt_kf = 0.1
    v_true = np.array([1.0, 0.0, 0.0], np.float32)
    g_w = np.array([0.0, 0.0, -G], np.float32)

    # landmarks: grid in front of the track, 4-8 m deep
    M = 128
    pts = np.stack([
        rng.uniform(-2.0, 2.0 + n * dt_kf, M),
        rng.uniform(-1.5, 1.5, M),
        rng.uniform(4.0, 8.0, M),
    ], -1).astype(np.float32)

    ks = tracker.kstore
    ps = tracker.pstore
    R_rows, t_rows, obs_pt, obs_uvr, obs_st = [], [], [], [], []
    for k in range(n):
        p_wc = np.array([k * dt_kf * v_true[0], 0.0, 0.0], np.float32)
        t_cw = -p_wc  # R = I
        xc = pts - p_wc  # camera coords (R = I)
        uv = np.stack([120.0 * xc[:, 0] / xc[:, 2] + 64.0,
                       120.0 * xc[:, 1] / xc[:, 2] + 48.0], -1)
        vis = ((uv[:, 0] > 2) & (uv[:, 0] < 126) & (uv[:, 1] > 2) & (uv[:, 1] < 94))
        ids = np.nonzero(vis)[0][:S]
        row_id = np.full(S, -1, np.int32)
        row_uvr = np.zeros((S, 3), np.float32)
        row_st = np.zeros(S, bool)
        row_id[:len(ids)] = ids
        row_uvr[:len(ids), :2] = uv[ids]
        row_uvr[:len(ids), 2] = uv[ids, 0] - 13.2 / xc[ids, 2]
        row_st[:len(ids)] = True
        R_rows.append(np.eye(3, dtype=np.float32))
        t_rows.append(t_cw)
        obs_pt.append(row_id)
        obs_uvr.append(row_uvr)
        obs_st.append(row_st)

    ks = dataclasses.replace(
        ks,
        R=ks.R.at[:n].set(jnp.asarray(np.stack(R_rows))),
        t=ks.t.at[:n].set(jnp.asarray(np.stack(t_rows))),
        v_w=ks.v_w.at[:n].set(jnp.asarray(np.tile(v_true, (n, 1)))),
        stamp=ks.stamp.at[:n].set(jnp.arange(n) * dt_kf),
        valid=ks.valid.at[:n].set(True),
        obs_pt=ks.obs_pt.at[:n].set(jnp.asarray(np.stack(obs_pt))),
        obs_uvr=ks.obs_uvr.at[:n].set(jnp.asarray(np.stack(obs_uvr))),
        obs_stereo=ks.obs_stereo.at[:n].set(jnp.asarray(np.stack(obs_st))),
    )
    ps = dataclasses.replace(
        ps,
        x=ps.x.at[:M].set(jnp.asarray(pts)),
        valid=ps.valid.at[:M].set(True),
    )
    # corrupt the FAR side's velocities (slots 1..6; slot 0 is the gauge)
    bad = jnp.asarray(np.array([0.0, 0.6, 0.0], np.float32))
    ks = dataclasses.replace(ks, v_w=ks.v_w.at[1:7].add(bad))

    # constant-velocity, zero-rotation preintegration chain for every pair
    T = 10
    dts = jnp.full((T,), dt_kf / T)
    acc = jnp.tile(jnp.asarray(-g_w), (T, 1))
    pre = imu_ops.preintegrate(jnp.zeros((T, 3)), acc, dts, jnp.ones(T, bool),
                               jnp.zeros(3), jnp.zeros(3), cfg.imu)
    tracker.kstore = ks
    tracker.pstore = ps
    tracker.n_kf = n
    tracker.gravity_w = jnp.asarray(g_w)
    tracker.imu_ready = True
    pints = tracker._pints
    for k in range(1, n):
        pints = pints.set(k, pre)
    tracker._pints = pints

    v_err_before = float(jnp.abs(tracker.kstore.v_w[1:7, 1]).max())
    tracker._full_inertial_ba()
    v_far = np.asarray(tracker.kstore.v_w[1:7])
    v_err_after = float(np.abs(v_far[:, 1]).max())
    assert n > max(Tracker._FIBA_CAPS), "scenario must exceed the window cap"
    assert v_err_before > 0.5
    # far-side velocities pulled back toward truth => the sweep reached them
    assert v_err_after < 0.25 * v_err_before, (v_err_before, v_err_after)
    # poses stay consistent (they started at truth)
    t_err = float(np.abs(np.asarray(tracker.kstore.t[:n]) -
                         np.stack(t_rows)).max())
    assert t_err < 0.05, t_err
