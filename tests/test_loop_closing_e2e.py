"""Loop-closing correction test with a manufactured drifted map."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.frontend import loop_closing
from pli_slam_tpu.ops import lie
from pli_slam_tpu.utils.config import SlamConfig
from pli_slam_tpu.worldmap import stores as st


def test_apply_loop_correction_removes_drift(rng):
    """K keyframes along a line; the last half drifted by a known offset.

    After the loop edge (measured true relative pose) + correction, poses
    and landmarks re-anchor near truth.
    """
    cfg = SlamConfig.tiny_test()
    K = 12
    S, Sl = 8, 4
    kstore = st.KeyFrameStore.empty(cfg.map.max_keyframes, S, Sl)
    pstore = st.PointStore.empty(256)
    lstore = st.LineStore.empty(64)

    # ground truth: camera walks +x and returns to start
    t_gt = []
    for k in range(K):
        p = np.array([0.5 * min(k, K - 1 - k), 0.0, 0.0], np.float32)  # out and back
        t_gt.append(-p)  # T_cw with R=I: t = -p
    drift = np.array([0.4, 0.25, -0.3], np.float32)

    # consistent drift: the whole local frame (camera centers AND the
    # landmarks they triangulate) shifts by -frac*drift; for T_cw that
    # means t_est = t_gt + frac*drift
    R_est = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t_est = np.stack(t_gt)
    for k in range(K // 2, K):
        frac = (k - K // 2 + 1) / (K - K // 2)
        t_est[k] = t_gt[k] + frac * drift

    kstore = dataclasses.replace(
        kstore,
        R=kstore.R.at[:K].set(jnp.asarray(R_est)),
        t=kstore.t.at[:K].set(jnp.asarray(t_est)),
        valid=kstore.valid.at[:K].set(True),
    )
    # landmarks anchored at the last KF (drifted) and at KF 0 (clean)
    n_lm = 32
    x_true = np.stack(
        [rng.uniform(-2, 2, n_lm), rng.uniform(-2, 2, n_lm), rng.uniform(3, 6, n_lm)], -1
    ).astype(np.float32)
    x_drifted = x_true - drift  # same drift as their ref KF (K-1)
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:n_lm].set(jnp.asarray(x_drifted)),
        valid=pstore.valid.at[:n_lm].set(True),
        last_kf=pstore.last_kf.at[:n_lm].set(K - 1),
    )

    # verified relative transform: current-region world -> loop-region world
    # x_loop = x_cur + drift  => R=I, t=drift
    kstore2, pstore2, lstore2 = loop_closing.apply_loop_correction(
        kstore, pstore, lstore, K, K - 1, 0,
        jnp.eye(3), jnp.asarray(drift), cfg,
    )
    # corrected last pose should be near ground truth
    t_err_before = np.linalg.norm(t_est[K - 1] - t_gt[K - 1])
    t_err_after = np.linalg.norm(np.asarray(kstore2.t[K - 1]) - t_gt[K - 1])
    assert t_err_after < 0.35 * t_err_before, (t_err_before, t_err_after)
    # landmarks moved with their reference keyframe toward truth
    lm_err_before = np.linalg.norm(x_drifted - x_true, axis=1).mean()
    lm_err_after = np.linalg.norm(np.asarray(pstore2.x[:n_lm]) - x_true, axis=1).mean()
    assert lm_err_after < 0.5 * lm_err_before, (lm_err_before, lm_err_after)


def test_match_kf_landmarks(rng):
    cfg = SlamConfig.tiny_test()
    S = 16
    kstore = st.KeyFrameStore.empty(8, S, 4)
    pstore = st.PointStore.empty(64)
    # two KFs observing the same 10 landmarks with identical descriptors
    descs = jnp.asarray(rng.choice([-1, 1], size=(10, 256)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:10].set(x),
        valid=pstore.valid.at[:10].set(True),
    )
    obs_a = jnp.full(S, -1, jnp.int32).at[:10].set(jnp.arange(10))
    perm = rng.permutation(10)
    obs_b = jnp.full(S, -1, jnp.int32).at[:10].set(jnp.asarray(perm))
    kstore = dataclasses.replace(
        kstore,
        obs_pt=kstore.obs_pt.at[0].set(obs_a).at[1].set(obs_b),
        valid=kstore.valid.at[:2].set(True),
    )
    # landmark descriptors live in the point store (no per-KF copy)
    pstore = dataclasses.replace(pstore, desc=pstore.desc.at[:10].set(descs))
    xa, xb, ok = loop_closing.match_kf_landmarks(kstore, pstore, 0, 1)
    assert int(ok.sum()) == 10
    np.testing.assert_allclose(np.asarray(xa)[np.asarray(ok)], np.asarray(xb)[np.asarray(ok)], atol=1e-6)


def _decoy_scene(rng, cfg, partial_rigid=False):
    """Shared scene for decoy tests: cluster A seen by KF0, KF10, KF11
    (true loop); decoy KF5 observes aliased landmarks (same descriptors).
    With partial_rigid, HALF the decoy's landmarks are an exact rigid
    offset of A's (so 3D-3D RANSAC verifies the decoy on that subset)
    while the rest sit randomly — only the projection re-check can tell.
    """
    from pli_slam_tpu.ops.camera import Camera

    K = 12
    S = 64
    kstore = st.KeyFrameStore.empty(cfg.map.max_keyframes, S, 8)
    pstore = st.PointStore.empty(512)
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)

    nA = 40
    xA = np.stack([rng.uniform(-1.4, 1.4, nA), rng.uniform(-1.0, 1.0, nA),
                   rng.uniform(3, 6, nA)], -1).astype(np.float32)
    descA = np.sign(rng.normal(size=(nA, 256))).astype(np.int8)
    offset = np.asarray([5.0, 0.5, 1.0], np.float32)
    if partial_rigid:
        # decoy: first half exactly rigid-offset (RANSAC-consistent),
        # second half scattered (fails the wider projection fit)
        xD = xA + offset
        xD[nA // 2:] += rng.normal(size=(nA - nA // 2, 3)).astype(np.float32) * 1.3
    else:
        xD = xA + offset + rng.normal(size=(nA, 3)).astype(np.float32) * 1.3
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:nA].set(jnp.asarray(xA)).at[nA:2 * nA].set(jnp.asarray(xD)),
        desc=pstore.desc.at[:nA].set(jnp.asarray(descA)).at[nA:2 * nA].set(jnp.asarray(descA)),
        valid=pstore.valid.at[:2 * nA].set(True),
    )
    # observations: uv from projecting cluster A with each observer's pose
    # (identity poses: KF0/10/11 all see A head-on — the projection
    # re-check needs real uv rows to vote with)
    uvA = np.stack([120.0 * xA[:, 0] / xA[:, 2] + 64.0,
                    120.0 * xA[:, 1] / xA[:, 2] + 48.0], -1).astype(np.float32)
    obs = jnp.full((K, S), -1, jnp.int32)
    uvr = jnp.zeros((K, S, 3))
    ids = jnp.arange(nA, dtype=jnp.int32)
    row_uvr = jnp.asarray(np.concatenate([uvA, np.zeros((nA, 1), np.float32)], -1))
    for k in (0, 10, 11):
        obs = obs.at[k, :nA].set(ids)
        uvr = uvr.at[k, :nA].set(row_uvr)
    obs = obs.at[5, :nA].set(ids + nA)  # decoy KF5 sees the aliased cluster
    kstore = dataclasses.replace(
        kstore,
        valid=kstore.valid.at[:K].set(True),
        obs_pt=obs,
        obs_uvr=uvr,
    )

    class FakeTracker:
        pass

    tr = FakeTracker()
    tr.kstore = kstore
    tr.pstore = pstore
    tr.lstore = st.LineStore.empty(64)
    tr.n_kf = K
    tr.cam = cam
    tr.cfg = cfg
    tr.R = jnp.eye(3)
    tr.t = jnp.zeros(3)
    tr._reset_motion = lambda: None
    tr._full_inertial_ba = lambda: None
    tr.imu_ready = False
    return tr


def test_decoy_candidate_rejected_true_one_verified(rng):
    """Multi-candidate verification (reference verifies the 3 best BoW
    candidates, src/LoopClosing.cc:395-476): a perceptually-aliased decoy
    candidate that fails geometric verification must not block the true
    loop from closing.
    """
    from pli_slam_tpu.frontend.loop_closing import LoopCloser

    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_kf_gap=2, consistency_kfs=2,
                                      proj_min_inliers=30)
    )
    tr = _decoy_scene(rng, cfg, partial_rigid=False)
    lc = LoopCloser(cfg)
    # decoy first in the candidate list (higher BoW score), truth second
    cands = [(5, 0.9), (0, 0.5)]
    lc._consistency = cfg.loop.consistency_kfs  # pre-satisfied
    lc._consistent_with = 5
    closed = lc.on_keyframe(tr, 11, cands)
    assert closed, "true candidate was not verified behind the decoy"
    assert lc.n_loops_closed == 1


def test_ransac_passing_decoy_rejected_by_projection_check(rng):
    """A decoy whose matched SUBSET is genuinely rigid passes the 3D-3D
    RANSAC gate — only the projection re-check (the candidate's WIDER
    map must re-project onto the current keyframes, reference
    DetectAndReffineSim3FromLastKF src/LoopClosing.cc:429) kills it."""
    from pli_slam_tpu.frontend.loop_closing import LoopCloser

    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_kf_gap=2, consistency_kfs=2,
                                      sim3_min_inliers=15, proj_min_inliers=30)
    )
    tr = _decoy_scene(rng, cfg, partial_rigid=True)
    lc = LoopCloser(cfg)

    # decoy ALONE: RANSAC verifies its rigid half (>=15 inliers) but the
    # projection support tops out around nA/2 = 20 < 30 -> rejected
    lc._consistency = cfg.loop.consistency_kfs
    lc._consistent_with = 5
    closed = lc.on_keyframe(tr, 11, [(5, 0.9)])
    assert not closed, "partial-rigid decoy survived the projection check"

    # sanity: the true candidate still passes the full gate
    lc2 = LoopCloser(cfg)
    lc2._consistency = cfg.loop.consistency_kfs
    lc2._consistent_with = 0
    closed = lc2.on_keyframe(tr, 11, [(0, 0.9)])
    assert closed, "true candidate should pass RANSAC + projection"
    assert lc2.n_loops_closed == 1


def test_scale_drift_corrected_by_sim3_pgo(rng):
    """Mono scale drift (reference Sim3Solver with bFixScale=false,
    src/LoopClosing.cc:448 + 7-DoF OptimizeEssentialGraph
    src/Optimizer.cc:2437): the drifted half of the trajectory has grown
    10% too large; a loop edge carrying the verified scale must shrink
    it back through the sim3 pose graph."""
    cfg = SlamConfig.tiny_test()
    K = 12
    kstore = st.KeyFrameStore.empty(cfg.map.max_keyframes, 8, 4)
    pstore = st.PointStore.empty(256)
    lstore = st.LineStore.empty(64)

    s_drift = 1.10
    t_gt, t_est = [], []
    for k in range(K):
        p = np.array([0.5 * k, 0.0, 0.0], np.float32)  # outbound track
        t_gt.append(-p)
        # second half: positions (and the local map) scaled up by s_drift
        t_est.append(-p * (s_drift if k >= K // 2 else 1.0))
    kstore = dataclasses.replace(
        kstore,
        R=kstore.R.at[:K].set(jnp.tile(jnp.eye(3)[None], (K, 1, 1))),
        t=kstore.t.at[:K].set(jnp.asarray(np.stack(t_est))),
        valid=kstore.valid.at[:K].set(True),
    )
    n_lm = 32
    x_true = np.stack(
        [rng.uniform(-2, 2, n_lm), rng.uniform(-2, 2, n_lm), rng.uniform(3, 6, n_lm)], -1
    ).astype(np.float32)
    x_drifted = x_true * s_drift  # local map grew with its region
    pstore = dataclasses.replace(
        pstore,
        x=pstore.x.at[:n_lm].set(jnp.asarray(x_drifted)),
        valid=pstore.valid.at[:n_lm].set(True),
        last_kf=pstore.last_kf.at[:n_lm].set(K - 1),
    )
    # verified Sim3: x_loop = (1/s_drift) x_cur (R=I, t=0)
    kstore2, pstore2, lstore2 = loop_closing.apply_loop_correction(
        kstore, pstore, lstore, K, K - 1, 0,
        jnp.eye(3), jnp.zeros(3), cfg, s_rel=jnp.asarray(1.0 / s_drift),
    )
    # corrected last pose recovers the ground-truth (unscaled) position
    t_err_before = np.linalg.norm(t_est[K - 1] - t_gt[K - 1])
    t_err_after = np.linalg.norm(np.asarray(kstore2.t[K - 1]) - t_gt[K - 1])
    assert t_err_after < 0.3 * t_err_before, (t_err_before, t_err_after)
    # landmarks shrink back to true scale
    lm_err_before = np.linalg.norm(x_drifted - x_true, axis=1).mean()
    lm_err_after = np.linalg.norm(np.asarray(pstore2.x[:n_lm]) - x_true, axis=1).mean()
    assert lm_err_after < 0.35 * lm_err_before, (lm_err_before, lm_err_after)


@pytest.mark.parametrize("scene_scale", [0.1, 1.0, 10.0])
def test_verification_is_scene_scale_invariant(rng, scene_scale):
    """Loop verification gates must not depend on absolute scene scale
    (round-3 Weak #7: a fixed 0.25 m RANSAC threshold was generous at
    EuRoC scale and absurd for a mono map normalized to unit depth).
    The same scene at 0.1x / 1x / 10x must verify identically: true
    candidate accepted, partial-rigid decoy rejected."""
    from pli_slam_tpu.frontend.loop_closing import LoopCloser

    cfg = SlamConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_kf_gap=2, consistency_kfs=2,
                                      sim3_min_inliers=15, proj_min_inliers=30)
    )
    tr = _decoy_scene(rng, cfg, partial_rigid=True)
    # uniform scaling about the (origin-centered) cameras keeps every
    # projection identical; only the absolute geometry changes
    tr.pstore = dataclasses.replace(tr.pstore, x=tr.pstore.x * scene_scale)
    tr.kstore = dataclasses.replace(tr.kstore, t=tr.kstore.t * scene_scale)

    lc = LoopCloser(cfg)
    lc._consistency = cfg.loop.consistency_kfs
    lc._consistent_with = 5
    assert not lc.on_keyframe(tr, 11, [(5, 0.9)]), f"decoy passed at {scene_scale}x"
    lc2 = LoopCloser(cfg)
    lc2._consistency = cfg.loop.consistency_kfs
    lc2._consistent_with = 0
    assert lc2.on_keyframe(tr, 11, [(0, 0.9)]), f"true loop failed at {scene_scale}x"
