"""Diagnose the bench-scene ATE: frame-trajectory vs keyframe-pose accuracy.

Runs the exact bench operating point (bench.py) and prints:
  - per-frame position error after SE(3) alignment of the full trajectory
  - ATE over frames vs ATE over keyframe poses only (kstore at the end)
If KF ATE << frame ATE, the trajectory readout is stale (BA refinements
never reach recorded frame poses) and relative-to-KF recording fixes it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def aligned(est, gt):
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    H = (est - mu_e).T @ (gt - mu_g)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_e
    return est @ R.T + t


def main():
    from pli_slam_tpu.frontend.tracker import Tracker
    from pli_slam_tpu.ops.camera import Camera
    from pli_slam_tpu.utils import synthetic
    from pli_slam_tpu.utils.config import SlamConfig

    cfg = SlamConfig.euroc_stereo()
    cam = Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2,
                         bf=0.11 * 435.2, width=752, height=480)
    n_frames = int(os.environ.get("BENCH_FRAMES", "40"))
    frames = list(synthetic.make_sequence(cam, n_frames, fps=cfg.fps))
    tracker = Tracker(cam, cfg)
    tracker.streaming = os.environ.get("DIAG_STREAMING", "1") == "1"
    timing = os.environ.get("DIAG_TIMING", "0") == "1"
    import time

    import jax as _jax

    for fr in frames:
        t0 = time.perf_counter()
        info = tracker.process(fr["img_l"], fr["img_r"], fr["t"])
        if timing:
            _jax.block_until_ready(tracker.t)  # serialize: device ms per frame
        ms = (time.perf_counter() - t0) * 1e3
        print(f"f={fr['t']*cfg.fps:3.0f} inl={info['n_inliers']:4d} kf={info['n_kf']:2d} "
              f"pts={info['n_points']:5d} lns={info['n_lines']:4d} new={info['new_landmarks']:4d} "
              f"state={info['state']}" + (f" ms={ms:7.1f}" if timing else ""),
              file=sys.stderr)

    gt = np.stack([fr["p_w"] for fr in frames])
    est = tracker.positions()
    al = aligned(est, gt)
    err = np.linalg.norm(al - gt, axis=1)
    for k in range(n_frames):
        print(f"frame {k:3d}  err={err[k]*1000:7.1f} mm", file=sys.stderr)
    ate_frames = float(np.sqrt(np.mean(err ** 2)))

    # keyframe-only ATE: kstore poses at the end (post-BA) vs gt at KF stamps
    ks = tracker.kstore
    n_kf = int(tracker.n_kf)
    Rk = np.asarray(ks.R)[:n_kf]
    tk = np.asarray(ks.t)[:n_kf]
    stamps = np.asarray(ks.stamp)[:n_kf]
    pk = np.stack([-Rk[i].T @ tk[i] for i in range(n_kf)])
    fps = cfg.fps
    gt_kf = np.stack([frames[int(round(s * fps))]["p_w"] for s in stamps])
    al_k = aligned(pk, gt_kf)
    err_k = np.linalg.norm(al_k - gt_kf, axis=1)
    ate_kf = float(np.sqrt(np.mean(err_k ** 2)))
    for i in range(n_kf):
        print(f"KF {i:2d} stamp={stamps[i]:5.2f} err={err_k[i]*1000:7.1f} mm", file=sys.stderr)

    print(json.dumps({"ate_frames_m": round(ate_frames, 4),
                      "ate_kf_m": round(ate_kf, 4),
                      "n_kf": n_kf}))


if __name__ == "__main__":
    main()
