"""Windowed-BA landmark compaction: equivalence with the full solve.

The local BA's Schur elimination runs over a compacted landmark array
(the ids observed in the window, tracker.window_problem pt_cap/ln_cap)
instead of the full padded stores. Same window, same observations =>
the compacted solve must land on the same poses and landmark positions.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.frontend import tracker as trk
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils.config import SlamConfig
from pli_slam_tpu.worldmap import stores as st


@pytest.fixture
def scene(rng):
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)
    W, S, Sl = 4, 48, 8
    M = 40  # landmarks, scattered across a 1024-slot store
    ks = st.KeyFrameStore.empty(16, S, Sl)
    ps = st.PointStore.empty(1024)
    ls = st.LineStore.empty(64)
    slots_lm = np.sort(rng.choice(1024, size=M, replace=False))
    pts = np.stack([rng.uniform(-1.5, 1.5, M), rng.uniform(-1.0, 1.0, M),
                    rng.uniform(3, 6, M)], -1).astype(np.float32)
    ps = dataclasses.replace(
        ps,
        x=ps.x.at[jnp.asarray(slots_lm)].set(jnp.asarray(pts)),
        valid=ps.valid.at[jnp.asarray(slots_lm)].set(True),
    )
    obs_pt = np.full((16, S), -1, np.int32)
    obs_uvr = np.zeros((16, S, 3), np.float32)
    obs_st = np.zeros((16, S), bool)
    t_rows = []
    for k in range(W):
        p_wc = np.array([0.25 * k, 0.0, 0.0], np.float32)
        t_rows.append(-p_wc)
        xc = pts - p_wc
        uv = np.stack([120 * xc[:, 0] / xc[:, 2] + 64,
                       120 * xc[:, 1] / xc[:, 2] + 48], -1)
        obs_pt[k, :M] = slots_lm
        obs_uvr[k, :M, :2] = uv
        obs_uvr[k, :M, 2] = uv[:, 0] - 13.2 / xc[:, 2]
        obs_st[k, :M] = True
    t_noisy = np.stack(t_rows)
    t_noisy[1:] += rng.normal(size=(W - 1, 3)).astype(np.float32) * 0.03
    ks = dataclasses.replace(
        ks,
        t=ks.t.at[:W].set(jnp.asarray(t_noisy)),
        valid=ks.valid.at[:W].set(True),
        obs_pt=ks.obs_pt.at[:].set(jnp.asarray(obs_pt)),
        obs_uvr=ks.obs_uvr.at[:].set(jnp.asarray(obs_uvr)),
        obs_stereo=ks.obs_stereo.at[:].set(jnp.asarray(obs_st)),
    )
    window = jnp.arange(W, dtype=jnp.int32)
    fixed = jnp.zeros(W, bool).at[0].set(True)
    return cfg, cam, ks, ps, ls, window, fixed, np.stack(t_rows), slots_lm, pts


def test_compacted_local_ba_matches_full(scene):
    cfg, cam, ks, ps, ls, window, fixed, t_true, slots_lm, pts_true = scene
    cfg_full = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, ba_pt_cap=10 ** 6, ba_ln_cap=10 ** 6)
    )
    cfg_cmp = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, ba_pt_cap=64, ba_ln_cap=16)
    )
    ks1, ps1, ls1 = trk.local_ba(cam, cfg_full, ks, ps, ls, window, fixed)
    ks2, ps2, ls2 = trk.local_ba(cam, cfg_cmp, ks, ps, ls, window, fixed)
    np.testing.assert_allclose(np.asarray(ks1.t[:4]), np.asarray(ks2.t[:4]),
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ps1.x)[slots_lm], np.asarray(ps2.x)[slots_lm], atol=1e-4
    )
    # both recover the true poses
    assert np.abs(np.asarray(ks2.t[:4]) - t_true).max() < 5e-3
    # landmarks NOT in the window are untouched by the compacted solve
    untouched = np.ones(1024, bool)
    untouched[slots_lm] = False
    np.testing.assert_array_equal(np.asarray(ps2.x)[untouched],
                                  np.asarray(ps.x)[untouched])


def test_compact_ids_overflow_drops_gracefully(rng):
    obs = jnp.asarray(np.arange(100, dtype=np.int32))
    mask = jnp.ones(100, bool)
    uniq, remap, mask2 = trk._compact_ids(obs, mask, 1024, cap=32)
    # the 32 smallest ids survive, the rest are dropped (not corrupted)
    assert int(mask2.sum()) == 32
    kept = np.asarray(remap)[np.asarray(mask2)]
    assert (np.asarray(uniq)[kept] == np.asarray(obs)[np.asarray(mask2)]).all()
