"""Distributed BA on the 8-device virtual CPU mesh vs the single-device solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops.camera import Camera
from pli_slam_tpu.parallel import dist_ba
from pli_slam_tpu.solve import ba
from pli_slam_tpu.utils.config import OptimizerConfig

from test_ba import build_problem  # reuse the synthetic multi-view builder

CFG = OptimizerConfig()


@pytest.fixture
def cam():
    return Camera.pinhole(fx=435.2, fy=435.2, cx=367.4, cy=252.2, bf=47.9)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_matches_single(cam, rng):
    prob, R_true, t_true, pts_true, lns_true = build_problem(rng, cam, W=4, P=64, L=16)
    single = ba.solve_ba(cam, prob, CFG, iters=5)

    mesh = dist_ba.make_mesh(8)
    stacked = dist_ba.partition_observations(prob, 8)
    dist = dist_ba.solve_ba_distributed(cam, stacked, CFG, mesh, iters=5)

    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(single.R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(single.t), atol=2e-3)
    # interleaved shards: global id of shard s's local row j is j*n + s,
    # so [n, P/n, 3] -> transpose -> flatten restores store order
    pts_gathered = np.asarray(dist.pts).transpose(1, 0, 2).reshape(-1, 3)
    np.testing.assert_allclose(pts_gathered, np.asarray(single.pts), atol=2e-3)


def test_distributed_converges(cam, rng):
    prob, R_true, t_true, pts_true, _ = build_problem(rng, cam, W=4, P=64, L=16, perturb=0.03)
    mesh = dist_ba.make_mesh(8)
    stacked = dist_ba.partition_observations(prob, 8)
    dist = dist_ba.solve_ba_distributed(cam, stacked, CFG, mesh, iters=8)
    for w in range(1, 4):
        dR = np.asarray(dist.R[w]) @ np.asarray(R_true[w]).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 3e-3, (w, ang)
        assert np.linalg.norm(np.asarray(dist.t[w]) - np.asarray(t_true[w])) < 1.5e-2


def test_observation_partition_is_exact(cam, rng):
    """Each observation must be owned by exactly one shard.

    Non-compacted layout: shards keep the global row indexing, so the
    per-row ownership sum is checkable directly. The compacted layout
    (default) gathers per (shard, pose); there the invariant is that the
    TOTAL live observation count — and each (pose, landmark) pair — is
    preserved exactly once across shards."""
    prob, *_ = build_problem(rng, cam, W=4, P=64, L=16)
    stacked = dist_ba.partition_observations(prob, 8, compact=False)
    owned = np.asarray(stacked.po_mask).sum(axis=0)
    np.testing.assert_array_equal(owned, np.asarray(prob.po_mask).astype(int))

    comp = dist_ba.partition_observations(prob, 8, compact=True)
    # every live (pose, landmark-global-id) pair appears exactly once
    pairs = []
    for s in range(8):
        m = np.asarray(comp.po_mask[s])
        pose = np.asarray(comp.po_pose[s])[m]
        loc = np.asarray(comp.po_pt[s])[m]
        pairs.append(np.stack([pose, loc * 8 + s], axis=1))
    pairs = np.concatenate(pairs, axis=0)
    ref = np.stack(
        [np.asarray(prob.po_pose)[np.asarray(prob.po_mask)],
         np.asarray(prob.po_pt)[np.asarray(prob.po_mask)]], axis=1
    )
    assert len(pairs) == len(ref)
    pset = {tuple(r) for r in pairs.tolist()}
    rset = {tuple(r) for r in ref.tolist()}
    assert pset == rset
