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
