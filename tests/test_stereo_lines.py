"""Tests for stereo point matching and the Hough line detector + LBD."""

import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import lines as line_ops
from pli_slam_tpu.ops import orb, stereo
from pli_slam_tpu.utils.config import LineConfig, OrbConfig


def stereo_pair(rng, h=96, w=160, disparity=7, n_blobs=30):
    """Right image = left shifted right-to-left by `disparity` px."""
    imgL = np.full((h, w + disparity), 30.0, np.float32)
    for _ in range(n_blobs):
        y = rng.integers(8, h - 16)
        x = rng.integers(8, w + disparity - 16)
        s = rng.integers(4, 12)
        imgL[y : y + s, x : x + s] = rng.uniform(120, 250)
    # physical rig: right camera sees the scene shifted LEFT by `disparity`
    left = imgL[:, :-disparity]
    right = imgL[:, disparity:]
    return jnp.asarray(left), jnp.asarray(right)


class TestStereoPoints:
    def test_constant_disparity_recovered(self, rng):
        disparity = 7
        left_img, right_img = stereo_pair(rng, disparity=disparity)
        cfg = OrbConfig(n_features=128, n_levels=2)
        fl = orb.extract(left_img, cfg)
        fr = orb.extract(right_img, cfg)
        u_r, ok = stereo.match_stereo(fl, fr, left_img, right_img, max_disparity=48.0)
        n_ok = int(ok.sum())
        assert n_ok >= 10, n_ok
        d = np.asarray(fl.uv[:, 0] - u_r)[np.asarray(ok)]
        # at least 80% of accepted disparities within 1px of truth
        close = (np.abs(d - disparity) < 1.0).mean()
        assert close >= 0.8, (close, d[:20])

    def test_depths_sign(self, rng):
        left_img, right_img = stereo_pair(rng)
        cfg = OrbConfig(n_features=64, n_levels=1)
        fl = orb.extract(left_img, cfg)
        fr = orb.extract(right_img, cfg)
        u_r, ok = stereo.match_stereo(fl, fr, left_img, right_img, max_disparity=48.0)
        depth = stereo.depths_from_stereo(fl, u_r, ok, bf=40.0)
        d = np.asarray(depth)
        okn = np.asarray(ok)
        assert (d[okn] > 0).all()
        assert (d[~okn] == -1.0).all()


def line_image(h=128, w=160):
    """A dark image with two bright bars -> strong straight edges."""
    img = np.full((h, w), 40.0, np.float32)
    img[30:36, 20:140] = 220.0  # horizontal bar
    img[60:120, 80:86] = 220.0  # vertical bar
    return jnp.asarray(img)


CFG_L = LineConfig(n_lines=32, n_candidates=128, n_samples=256, grad_threshold=40.0)


class TestLineDetect:
    def test_detects_bar_edges(self):
        feats = line_ops.detect(line_image(), CFG_L)
        n = int(feats.count())
        assert n >= 2, n
        p0 = np.asarray(feats.p0)[np.asarray(feats.valid)]
        p1 = np.asarray(feats.p1)[np.asarray(feats.valid)]
        ang = np.asarray(feats.angle)[np.asarray(feats.valid)]
        length = np.asarray(feats.length)[np.asarray(feats.valid)]
        # must find at least one long horizontal and one long vertical segment
        horiz = (np.abs(np.sin(ang)) < 0.1) & (length > 60)
        vert = (np.abs(np.cos(ang)) < 0.1) & (length > 30)
        assert horiz.any(), (ang, length)
        assert vert.any(), (ang, length)

    def test_flat_image_no_lines(self):
        feats = line_ops.detect(jnp.full((128, 160), 90.0), CFG_L)
        assert int(feats.count()) == 0

    def test_endpoints_on_edges(self):
        feats = line_ops.detect(line_image(), CFG_L)
        v = np.asarray(feats.valid)
        ln = np.asarray(feats.length)[v]
        horiz_idx = np.argmax(ln)  # longest should be the horizontal top edge
        p0 = np.asarray(feats.p0)[v][horiz_idx]
        p1 = np.asarray(feats.p1)[v][horiz_idx]
        # x-extent should roughly cover the bar [20, 140]
        xs = sorted([p0[0], p1[0]])
        assert xs[0] < 35 and xs[1] > 125, (p0, p1)

    def test_descriptor_stability_under_shift(self):
        """Same structure shifted by 2px -> nearly identical descriptors."""
        imgA = line_image()
        imgB = jnp.roll(imgA, 2, axis=1)
        fA = line_ops.detect(imgA, CFG_L)
        fB = line_ops.detect(imgB, CFG_L)
        from pli_slam_tpu.ops import matching

        dist = matching.hamming_matrix(fA.desc, fB.desc)
        idx, best, ok = matching.match_nn(dist, fA.valid, fB.valid, max_dist=80.0)
        assert int(ok.sum()) >= 2
        assert float(best[np.asarray(ok)].mean()) < 60.0


class TestStereoLines:
    def test_endpoint_disparity(self):
        """Vertical bar shifted horizontally between the stereo images."""
        disparity = 6
        h, w = 128, 160
        imgL = np.full((h, w), 40.0, np.float32)
        imgL[20:110, 90:96] = 220.0
        imgR = np.full((h, w), 40.0, np.float32)
        imgR[20:110, 90 - disparity : 96 - disparity] = 220.0
        fL = line_ops.detect(jnp.asarray(imgL), CFG_L)
        fR = line_ops.detect(jnp.asarray(imgR), CFG_L)
        d0, d1, idx_r, ok = line_ops.match_stereo_lines(fL, fR, max_disparity=48.0)
        okn = np.asarray(ok)
        assert okn.sum() >= 1
        d0n = np.asarray(d0)[okn]
        d1n = np.asarray(d1)[okn]
        np.testing.assert_allclose(d0n, disparity, atol=1.5)
        np.testing.assert_allclose(d1n, disparity, atol=1.5)

    def test_vertical_overlap(self):
        f = line_ops.detect(line_image(), CFG_L)
        ov = line_ops.vertical_overlap(f, f)
        v = np.asarray(f.valid)
        diag = np.diag(np.asarray(ov))[v]
        np.testing.assert_allclose(diag, 1.0, atol=1e-5)
