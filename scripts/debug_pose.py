"""Debug: why does solve_pose move away from the GT pose?"""
import os, sys, dataclasses
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
import numpy as np, jax.numpy as jnp
from pli_slam_tpu.frontend import tracker as trk
from pli_slam_tpu.frontend.tracker import Tracker
from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.solve import gn, residuals as res
from pli_slam_tpu.utils import synthetic
from pli_slam_tpu.utils.config import SlamConfig

cam = Camera.pinhole(fx=120., fy=120., cx=64., cy=48., bf=0.11*120., width=128, height=96)
traj = synthetic.Trajectory(amp=(0.5,0.35,0.2), freq=(0.15,0.19,0.11), yaw_amp=0.25)
cfg = dataclasses.replace(SlamConfig.tiny_test(), use_lines=False)
tr = Tracker(cam, cfg)
frames = list(synthetic.make_sequence(cam, 11, fps=cfg.fps, traj=traj, room_half=2.55))
fr0, fr10 = frames[0], frames[10]
tr.process(fr0['img_l'], fr0['img_r'], fr0['t'])
R0g, p0g = fr0['R_wc'], fr0['p_w']
R_wc_t = R0g.T @ fr10['R_wc']; p_wc_t = R0g.T @ (fr10['p_w'] - p0g)
R_gt = jnp.asarray(R_wc_t.T, jnp.float32); t_gt = jnp.asarray(-R_wc_t.T @ p_wc_t, jnp.float32)
fd = tr.build_frame(jnp.asarray(fr10['img_l']), jnp.asarray(fr10['img_r']))

pt_idx, pt_ok, _ = trk._match_points_against_store(cam, cfg, fd, R_gt, t_gt, tr.pstore, 15.0)
ln_idx = jnp.full(cfg.lines.n_lines, -1, jnp.int32); ln_ok = jnp.zeros(cfg.lines.n_lines, bool)
obs = trk._pose_obs_from_matches(cfg, fd, tr.pstore, tr.lstore, pt_idx, pt_ok, ln_idx, ln_ok)

r, J, xc = res.point_residuals_stereo(cam, R_gt, t_gt, obs.x_w, obs.uvr)
m = np.asarray(obs.point_mask)
rn = np.asarray(r)[m]
print('at GT:  |r_uv| med=%.2f  r_ur med=%+.2f  mean=%+.2f  p90(|r_ur|)=%.2f' % (
    np.median(np.linalg.norm(rn[:,:2],axis=1)), np.median(rn[:,2]), rn[:,2].mean(), np.percentile(np.abs(rn[:,2]),90)))
result = gn.solve_pose(cam, obs, R_gt, t_gt, cfg.opt)
r2, _, _ = res.point_residuals_stereo(cam, result.R_cw, result.t_cw, obs.x_w, obs.uvr)
r2n = np.asarray(r2)[m]
print('at SOL: |r_uv| med=%.2f  r_ur med=%+.2f' % (
    np.median(np.linalg.norm(r2n[:,:2],axis=1)), np.median(r2n[:,2])))
print('terr=%.1fmm' % (np.linalg.norm(np.asarray(result.t_cw)-np.asarray(t_gt))*1000))
# decompose: which landmarks pull? look at per-landmark depth error sign
# landmark depth at GT pose vs stereo-measured depth in this frame
z_lm = np.asarray(xc)[m][:,2]
disp_meas = np.asarray(obs.uvr)[m][:,0] - np.asarray(obs.uvr)[m][:,2]
z_meas = float(cam.bf)/np.maximum(disp_meas, 1e-6)
rel = (z_lm - z_meas)/z_meas
print('landmark-vs-measured depth: med=%+.2f%% p10=%+.1f%% p90=%+.1f%%' % (
    100*np.median(rel), 100*np.percentile(rel,10), 100*np.percentile(rel,90)))
