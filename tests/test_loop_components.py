"""Tests for pose-graph optimization, Sim3 RANSAC, and BoW place recognition."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pli_slam_tpu.ops import lie
from pli_slam_tpu.solve import pgo, sim3
from pli_slam_tpu.worldmap import vocab


class TestHorn:
    def test_exact_alignment(self, rng):
        x = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        R_true = lie.so3_exp(jnp.asarray([0.3, -0.5, 0.8]))
        s_true = 1.7
        t_true = jnp.asarray([1.0, -2.0, 0.5])
        y = s_true * x @ R_true.T + t_true
        R, t, s = sim3.horn_alignment(x, y, jnp.ones(32))
        np.testing.assert_allclose(s, s_true, atol=1e-4)
        np.testing.assert_allclose(R, R_true, atol=1e-4)
        np.testing.assert_allclose(t, t_true, atol=1e-3)

    def test_se3_mode(self, rng):
        x = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        R_true = lie.so3_exp(jnp.asarray([0.1, 0.2, -0.3]))
        y = x @ R_true.T + jnp.asarray([0.5, 0.0, -1.0])
        R, t, s = sim3.horn_alignment(x, y, jnp.ones(16), with_scale=False)
        np.testing.assert_allclose(s, 1.0)
        np.testing.assert_allclose(R, R_true, atol=1e-4)


class TestRansacSim3:
    def test_with_outliers(self, rng):
        n = 128
        x = jnp.asarray(rng.normal(size=(n, 3)) * 2, jnp.float32)
        R_true = lie.so3_exp(jnp.asarray([0.4, 0.1, -0.6]))
        s_true = 1.3
        t_true = jnp.asarray([0.5, 1.0, -0.7])
        y = s_true * x @ R_true.T + t_true
        y = y + jnp.asarray(rng.normal(size=(n, 3)) * 0.01, jnp.float32)
        # 30% outliers
        n_out = 38
        y = y.at[:n_out].set(jnp.asarray(rng.normal(size=(n_out, 3)) * 5, jnp.float32))
        R, t, s, inl, n_in = sim3.ransac_sim3(
            x, y, jnp.ones(n, bool), jax.random.PRNGKey(0), inlier_thresh=0.15
        )
        assert int(n_in) >= 80
        np.testing.assert_allclose(float(s), s_true, atol=0.02)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=0.02)
        assert int(inl[:n_out].sum()) <= 3


class TestPGO:
    def _make_loop_graph(self, K=20, drift=0.02):
        """Circular trajectory with accumulated drift + one loop edge."""
        rng = np.random.default_rng(7)
        # ground truth poses around a circle
        R_gt, t_gt = [], []
        for k in range(K):
            a = 2 * np.pi * k / K
            Rw = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, a], jnp.float32)))
            pw = np.array([np.cos(a), np.sin(a), 0.0]) * 3.0
            R_gt.append(Rw.T)
            t_gt.append(-Rw.T @ pw)
        R_gt = np.stack(R_gt).astype(np.float32)
        t_gt = np.stack(t_gt).astype(np.float32)
        # drifted estimates: inject noise into each odometry step
        R_est = [R_gt[0]]
        t_est = [t_gt[0]]
        rels = []
        for k in range(1, K):
            Rm = R_gt[k] @ R_gt[k - 1].T
            tm = t_gt[k] - Rm @ t_gt[k - 1]
            rels.append((Rm.copy(), tm.copy()))
            dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * drift, jnp.float32)))
            Rm_n = dR @ Rm
            tm_n = tm + rng.normal(size=3) * drift
            R_est.append(Rm_n @ R_est[-1])
            t_est.append(Rm_n @ t_est[-1] + tm_n)
        R_est = np.stack(R_est).astype(np.float32)
        t_est = np.stack(t_est).astype(np.float32)

        e_i = list(range(K - 1))
        e_j = list(range(1, K))
        e_R = [r for r, _ in rels]
        e_t = [t for _, t in rels]
        # loop edge K-1 -> 0 with the TRUE relative pose
        Rm = R_gt[0] @ R_gt[K - 1].T
        tm = t_gt[0] - Rm @ t_gt[K - 1]
        e_i.append(K - 1)
        e_j.append(0)
        e_R.append(Rm)
        e_t.append(tm)
        E = len(e_i)
        graph = pgo.PoseGraph(
            R=jnp.asarray(R_est), t=jnp.asarray(t_est), s=jnp.ones(K),
            node_mask=jnp.ones(K, bool),
            fixed_mask=jnp.zeros(K, bool).at[0].set(True),
            e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
            e_R=jnp.asarray(np.stack(e_R), jnp.float32),
            e_t=jnp.asarray(np.stack(e_t), jnp.float32),
            e_s=jnp.ones(E),
            e_weight=jnp.ones(E).at[E - 1].set(5.0),
            e_mask=jnp.ones(E, bool),
        )
        return graph, R_gt, t_gt

    def test_loop_closure_reduces_drift(self):
        graph, R_gt, t_gt = self._make_loop_graph()

        def total_err(R, t):
            # camera-center error vs gt
            errs = []
            for k in range(R.shape[0]):
                c_est = -np.asarray(R[k]).T @ np.asarray(t[k])
                c_gt = -R_gt[k].T @ t_gt[k]
                errs.append(np.linalg.norm(c_est - c_gt))
            return float(np.mean(errs))

        before = total_err(graph.R, graph.t)
        out = pgo.optimize(graph, iters=15, se3=True)
        after = total_err(out.R, out.t)
        assert after < 0.5 * before, (before, after)
        # scales untouched in se3 mode
        np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-4)

    def test_fixed_node_untouched(self):
        graph, *_ = self._make_loop_graph()
        out = pgo.optimize(graph, iters=5, se3=True)
        np.testing.assert_allclose(np.asarray(out.R[0]), np.asarray(graph.R[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.t[0]), np.asarray(graph.t[0]), atol=1e-5)

    def test_chain_edges(self):
        graph, *_ = self._make_loop_graph()
        i, j, Rm, tm, sm, mask = pgo.chain_edges(graph.R, graph.t, graph.s, graph.node_mask)
        assert int(mask.sum()) == graph.R.shape[0] - 1
        # consistency: measured edge reproduces S_j S_i^-1 at the estimate
        Rii, tii, sii = lie.sim3_inverse(graph.R[i], graph.t[i], graph.s[i])
        Rji, tji, sji = lie.sim3_compose(graph.R[j], graph.t[j], graph.s[j], Rii, tii, sii)
        np.testing.assert_allclose(np.asarray(Rm), np.asarray(Rji), atol=1e-5)


class TestVocab:
    def test_same_descriptors_score_high(self, rng):
        voc = vocab.Vocabulary()
        desc = jnp.asarray(rng.choice([-1, 1], size=(200, 256)), jnp.int8)
        valid = jnp.ones(200, bool)
        bow1 = voc.bow(desc, valid)
        # slightly corrupted copy
        noisy = np.asarray(desc).copy()
        for i in range(200):
            flip = rng.choice(256, size=10, replace=False)
            noisy[i, flip] *= -1
        bow2 = voc.bow(jnp.asarray(noisy), valid)
        other = voc.bow(jnp.asarray(rng.choice([-1, 1], size=(200, 256)), jnp.int8), valid)
        sim_same = float(bow1 @ bow2)
        sim_diff = float(bow1 @ other)
        assert sim_same > 3 * sim_diff, (sim_same, sim_diff)

    def test_database_query(self, rng):
        voc = vocab.Vocabulary()
        db = vocab.BowDatabase.empty(16, voc.n_words)
        descs = []
        for k in range(8):
            d = jnp.asarray(rng.choice([-1, 1], size=(100, 256)), jnp.int8)
            descs.append(d)
            b = voc.bow(d, jnp.ones(100, bool))
            db = db.add(k, b, jnp.zeros(voc.n_words))
        # query with a noisy copy of kf 3
        noisy = np.asarray(descs[3]).copy()
        for i in range(100):
            noisy[i, rng.choice(256, size=8, replace=False)] *= -1
        bq = voc.bow(jnp.asarray(noisy), jnp.ones(100, bool))
        slots, scores = vocab.query(db, bq, jnp.zeros(voc.n_words), jnp.zeros(16, bool))
        assert int(slots[0]) == 3
        # excluding kf 3 removes it from candidates
        excl = jnp.zeros(16, bool).at[3].set(True)
        slots2, _ = vocab.query(db, bq, jnp.zeros(voc.n_words), excl)
        assert int(slots2[0]) != 3


def test_group_scoring_defeats_perceptual_alias():
    """Covisibility-group accumulation (reference DetectNBestCandidates,
    src/KeyFrameDatabase.cc:806): a single look-alike keyframe elsewhere
    outranks the true loop KF under flat scoring, but the true site's
    covisible neighbors all score, so group accumulation ranks the true
    site first."""
    import jax.numpy as jnp
    import numpy as np

    from pli_slam_tpu.worldmap import vocab as vocab_mod

    K, W = 16, 32
    hist_pt = np.zeros((K, W), np.float32)
    # query hits word 0; each KF's histogram = alpha*e0 + sqrt(1-a^2)*e_k
    sims = {2: 0.60, 3: 0.65, 4: 0.60, 10: 0.70}  # 10 is the alias
    for k, a in sims.items():
        hist_pt[k, 0] = a
        hist_pt[k, 1 + k] = np.sqrt(1 - a * a)
    for k in range(K):
        if k not in sims:
            hist_pt[k, 1 + k] = 1.0
    db = vocab_mod.BowDatabase(
        hist_pt=jnp.asarray(hist_pt),
        hist_ln=jnp.zeros((K, W)),
        valid=jnp.ones(K, bool),
    )
    bow_q = jnp.zeros(W).at[0].set(1.0)
    bow_l = jnp.zeros(W)
    excl = jnp.zeros(K, bool)

    # flat scoring: the alias wins
    flat_slots, _ = vocab_mod.query(db, bow_q, bow_l, excl, n_best=3)
    assert int(flat_slots[0]) == 10

    # covis: 2-3-4 are a group; the alias's neighbors (9, 11) score zero
    covis = np.zeros((K, K), np.int32)
    for i, j in [(2, 3), (3, 4), (2, 4), (9, 10), (10, 11)]:
        covis[i, j] = covis[j, i] = 30
    slots, scores = vocab_mod.query(
        db, bow_q, bow_l, excl, n_best=3, covis=jnp.asarray(covis)
    )
    slots = np.asarray(slots)
    # the true site's best member (KF 3) ranks first; the alias is beaten
    assert slots[0] == 3, (slots, np.asarray(scores))
    # overlapping groups elect the same member once (dedup)
    kept = [s for s in slots.tolist() if s >= 0]
    assert len(kept) == len(set(kept))
