"""Distributed (edge-sharded) pose-graph optimization vs single-device.

Reference: the essential-graph optimizers (src/Optimizer.cc:2437/8247)
are single-threaded g2o; here the edge set shards over the 8-device
virtual CPU mesh and the psum-reduced solve must match solve/pgo.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pli_slam_tpu.parallel import dist_pgo
from pli_slam_tpu.solve import pgo

from test_pgo_4dof_gba import _graph_with_loop, _make_drifted_loop, _pose_err


def test_partition_edges_pads_and_shards():
    R_est, t_est, R_gt, t_gt = _make_drifted_loop(K=12)
    g = _graph_with_loop(R_est, t_est, R_gt, t_gt)  # 12 edges
    stacked = dist_pgo.partition_edges(g, 8)  # pads 12 -> 16, 2 per shard
    assert stacked.e_i.shape == (8, 2)
    assert stacked.R.shape == g.R.shape  # nodes replicated
    # padded edges are masked out
    assert int(stacked.e_mask.sum()) == 12


def test_distributed_pgo_matches_single():
    R_est, t_est, R_gt, t_gt = _make_drifted_loop(K=12)
    g = _graph_with_loop(R_est, t_est, R_gt, t_gt)
    single = pgo.optimize(g, iters=10, mode="se3")
    mesh = dist_pgo.make_mesh(8)
    stacked = dist_pgo.partition_edges(g, 8)
    dist = dist_pgo.optimize_distributed(stacked, mesh, iters=10, mode="se3")
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(single.R), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(single.t), atol=3e-3)
    # and it actually corrects the drift
    err0 = _pose_err(g, R_gt, t_gt)
    err1 = _pose_err(dist, R_gt, t_gt)
    assert err1 < 0.2 * err0, (err0, err1)


def test_distributed_pgo_4dof_mode():
    R_est, t_est, R_gt, t_gt = _make_drifted_loop(K=12)
    g = _graph_with_loop(R_est, t_est, R_gt, t_gt)
    single = pgo.optimize(g, iters=10, mode="4dof")
    mesh = dist_pgo.make_mesh(8)
    stacked = dist_pgo.partition_edges(g, 8)
    dist = dist_pgo.optimize_distributed(stacked, mesh, iters=10, mode="4dof")
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(single.R), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(single.t), atol=3e-3)
