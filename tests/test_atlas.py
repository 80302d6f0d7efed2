"""Atlas multi-map container and merge tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pli_slam_tpu.ops import lie
from pli_slam_tpu.utils.config import SlamConfig
from pli_slam_tpu.worldmap import atlas as atlas_mod
from pli_slam_tpu.worldmap import stores as st

CFG = SlamConfig.tiny_test()


def _populate(bundle: atlas_mod.MapBundle, rng, n_pts=20, n_kf=3, offset=0.0):
    pts = jnp.asarray(
        np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(3, 6, n_pts)], -1)
        + offset,
        jnp.float32,
    )
    ps = dataclasses.replace(
        bundle.pstore,
        x=bundle.pstore.x.at[:n_pts].set(pts),
        valid=bundle.pstore.valid.at[:n_pts].set(True),
        desc=bundle.pstore.desc.at[:n_pts].set(
            jnp.asarray(rng.choice([-1, 1], (n_pts, 256)), jnp.int8)
        ),
    )
    ks = bundle.kstore
    S = ks.obs_pt.shape[1]
    for k in range(n_kf):
        obs = jnp.full(S, -1, jnp.int32).at[:n_pts].set(jnp.arange(n_pts))
        ks = dataclasses.replace(
            ks,
            valid=ks.valid.at[k].set(True),
            t=ks.t.at[k].set(jnp.asarray([0.1 * k + offset, 0.0, 0.0])),
            obs_pt=ks.obs_pt.at[k].set(obs),
        )
    return atlas_mod.MapBundle(pstore=ps, lstore=bundle.lstore, kstore=ks, n_kf=n_kf)


def test_new_map_on_loss(rng):
    at = atlas_mod.Atlas(CFG)
    at.maps[0] = _populate(at.active, rng)
    assert at.n_maps() == 1
    at.create_new_map()
    assert at.n_maps() == 2
    assert int(at.active.pstore.valid.sum()) == 0  # fresh map
    assert int(at.maps[0].pstore.valid.sum()) == 20  # old map intact


def test_merge_transforms_and_remaps(rng):
    at = atlas_mod.Atlas(CFG)
    at.maps[0] = _populate(at.active, rng, n_pts=20, n_kf=3)
    at.create_new_map()
    at.maps[1] = _populate(at.active, rng, n_pts=10, n_kf=2, offset=5.0)

    # active(1) -> target(0): pure translation by [1, 2, 3]
    R_rel = jnp.eye(3)
    t_rel = jnp.asarray([1.0, 2.0, 3.0])
    src_pts = np.asarray(at.maps[1].pstore.x[:10])
    merged = at.merge_active_into(0, R_rel, t_rel)

    assert at.n_maps() == 1
    assert int(merged.pstore.valid.sum()) == 30
    # the 10 source points landed (transformed) in free slots 20..29
    np.testing.assert_allclose(
        np.asarray(merged.pstore.x[20:30]), src_pts + np.array([1, 2, 3]), atol=1e-5
    )
    # source keyframes copied into free KF slots with remapped observations
    assert int(merged.kstore.valid.sum()) == 5
    obs_k3 = np.asarray(merged.kstore.obs_pt[3])
    valid_obs = obs_k3[obs_k3 >= 0]
    assert valid_obs.min() >= 20 and valid_obs.max() <= 29  # re-indexed into new rows


def test_merge_pose_transform_consistency(rng):
    """A camera observing a point keeps observing it after the merge."""
    at = atlas_mod.Atlas(CFG)
    at.maps[0] = _populate(at.active, rng, n_pts=5, n_kf=1)
    at.create_new_map()
    at.maps[1] = _populate(at.active, rng, n_pts=5, n_kf=1, offset=2.0)
    xi = jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.2, -0.1], jnp.float32)
    R_rel, t_rel = lie.se3_exp(xi)

    src = at.maps[1]
    x_src = np.asarray(src.pstore.x[0])
    R_cw = np.asarray(src.kstore.R[0])
    t_cw = np.asarray(src.kstore.t[0])
    x_cam_before = R_cw @ x_src + t_cw

    merged = at.merge_active_into(0, R_rel, t_rel)
    x_dst = np.asarray(merged.pstore.x[5])  # first free slot after 5
    R2 = np.asarray(merged.kstore.R[1])
    t2 = np.asarray(merged.kstore.t[1])
    x_cam_after = R2 @ x_dst + t2
    np.testing.assert_allclose(x_cam_after, x_cam_before, atol=1e-4)
