"""Covisibility graph (reference KeyFrame::UpdateConnections,
src/KeyFrame.cc:539): shared-landmark counts drive the local-BA window,
loop-candidate exclusion, and essential-graph edges."""

import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.frontend import tracker as trk
from pli_slam_tpu.frontend.tracker import Tracker
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig


def _run_out_and_back(n=26):
    """Trajectory that walks +x then returns: the first and last keyframes
    see the same wall (covisible) while being temporally far apart —
    exactly where a temporal BA window fails."""
    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2, width=128, height=96)
    traj = synthetic.Trajectory(amp=(0.9, 0.05, 0.03), freq=(0.4, 0.19, 0.11), yaw_amp=0.03)
    tracker = Tracker(cam, cfg)
    for fr in synthetic.make_sequence(cam, n, fps=cfg.fps, traj=traj, room_half=2.55):
        tracker.process(fr["img_l"], fr["img_r"], fr["t"])
    return tracker


def test_covis_counts_symmetric_and_adjacent():
    tracker = _run_out_and_back()
    n = tracker.n_kf
    assert n >= 4
    covis = np.asarray(tracker.kstore.covis)[:n, :n]
    # symmetric, zero diagonal
    np.testing.assert_array_equal(covis, covis.T)
    assert np.all(np.diag(covis) == 0)
    # temporal neighbors share landmarks
    adj = np.array([covis[k, k + 1] for k in range(n - 1)])
    assert (adj > 0).all(), adj


def test_covis_detects_revisit():
    """Out-and-back: the final keyframe must be covisible with an early
    keyframe (same viewpoint) even though they are temporally far apart."""
    tracker = _run_out_and_back()
    n = tracker.n_kf
    covis = np.asarray(tracker.kstore.covis)[:n, :n]
    last = n - 1
    early = covis[last, : max(n // 3, 1)]
    assert early.max() > 0, covis[last]


def test_covis_window_prefers_covisible():
    """_covis_window must pull a covisible-but-temporally-distant KF into
    the BA window, which a temporal window would miss."""
    tracker = _run_out_and_back()
    n = tracker.n_kf
    cfg = tracker.cfg
    W = cfg.opt.local_ba_window
    if n <= W:  # trajectory too short to distinguish: force synthetic case
        import dataclasses

        K = tracker.kstore.covis.shape[0]
        covis = np.zeros((K, K), np.int32)
        n = W + 4
        for k in range(n - 1):  # weak chain
            covis[k, k + 1] = covis[k + 1, k] = 2
        covis[n - 1, 0] = covis[0, n - 1] = 50  # strong revisit edge
        kstore = dataclasses.replace(
            tracker.kstore,
            covis=jnp.asarray(covis),
            valid=tracker.kstore.valid.at[:n].set(True),
        )
    else:
        kstore = tracker.kstore
        covis = np.asarray(kstore.covis)
        covis_n = covis[:n, :n].copy()
        covis_n[n - 1, 0] = covis_n[0, n - 1] = max(50, covis_n.max() + 1)
        covis = np.zeros_like(covis)
        covis[:n, :n] = covis_n
        import dataclasses

        kstore = dataclasses.replace(kstore, covis=jnp.asarray(covis))
    window, fixed = trk._covis_window(cfg, kstore, n - 1, n)
    window = np.asarray(window)
    assert 0 in window.tolist(), window  # the revisited keyframe is in
    assert int(np.asarray(fixed).sum()) >= 1
    assert window[0] == n - 1


def test_line_only_covisibility_weight():
    """Line observations count in covisibility weights (improving on the
    reference, whose line increment is commented out —
    src/KeyFrame.cc:573-590): a keyframe that shares ONLY line landmarks
    with an earlier keyframe still gets a nonzero covis edge."""
    import dataclasses

    import jax

    from pli_slam_tpu.frontend.frame import make_build_frame
    from pli_slam_tpu.worldmap import stores as st

    cfg = SlamConfig.tiny_test()
    cam = Camera.pinhole(fx=120.0, fy=120.0, cx=64.0, cy=48.0, bf=13.2,
                         width=128, height=96)
    fr = next(iter(synthetic.make_sequence(cam, 1, fps=cfg.fps)))
    frame = make_build_frame(cam, cfg)(fr["img_l"], fr["img_r"])
    assert int(np.asarray(frame.lines.valid.sum())) > 0

    m = cfg.map
    pstore = st.PointStore.empty(m.max_points)
    lstore = st.LineStore.empty(m.max_lines)
    kstore = st.KeyFrameStore.empty(m.max_keyframes, cfg.orb.n_features,
                                    cfg.lines.n_lines)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    nf = cfg.orb.n_features
    nl = cfg.lines.n_lines
    no_pt = (jnp.full(nf, -1, jnp.int32), jnp.zeros(nf, bool))
    insert = jax.jit(lambda *a: trk.insert_keyframe(cam, cfg, *a))

    # KF0: creates line landmarks (and points, but points are never
    # re-associated below)
    pstore, lstore, kstore, _ = insert(
        frame, R, t, 0.0, *no_pt, jnp.full(nl, -1, jnp.int32),
        jnp.zeros(nl, bool), 0, pstore, lstore, kstore)
    ln0 = np.asarray(kstore.obs_ln[0])
    assert (ln0 >= 0).sum() > 0

    # kill every point landmark so neither explicit association nor the
    # fuse-before-create channel can add point covisibility — the edge
    # below can only come from shared LINES
    pstore = dataclasses.replace(pstore, valid=jnp.zeros_like(pstore.valid))

    # KF1: re-observes ONLY the lines created at KF0 (pt associations
    # empty; freshly created landmarks are excluded from the count)
    ln_idx = jnp.asarray(ln0, jnp.int32)
    ln_in = ln_idx >= 0
    pstore, lstore, kstore, _ = insert(
        frame, R, t, 0.5, *no_pt, ln_idx, ln_in, 1, pstore, lstore, kstore)
    covis = np.asarray(kstore.covis)
    n_shared_lines = int((np.asarray(ln0) >= 0).sum())
    assert covis[1, 0] > 0, covis[:2, :2]
    assert covis[1, 0] <= n_shared_lines
    assert covis[0, 1] == covis[1, 0]
