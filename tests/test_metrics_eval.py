"""Tests: metric math, AUC aggregation, and the end-to-end evaluator with a
synthetic perfect matcher."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu.eval.metrics import (aggregate_metrics, error_auc,
                                    epidist_prec, essential_from_pose,
                                    relative_pose_error,
                                    symmetric_epipolar_distance)


def test_error_auc_known_values():
    # all errors zero -> perfect AUC
    aucs = error_auc([0.0] * 10)
    assert aucs["auc@5"] > 0.9
    # all errors above threshold -> zero AUC
    aucs = error_auc([100.0] * 10)
    assert aucs["auc@5"] == 0.0
    assert aucs["auc@20"] == 0.0
    # half the pairs at zero error: AUC ~ 0.5
    aucs = error_auc([0.0] * 5 + [100.0] * 5)
    assert 0.35 < aucs["auc@10"] < 0.55


def test_relative_pose_error_identity():
    T = np.eye(4)
    T[:3, 3] = [1, 0, 0]
    t_err, r_err = relative_pose_error(T, np.eye(3), np.array([1.0, 0, 0]))
    assert t_err < 1e-6 and r_err < 1e-6
    # antiparallel translation: E-ambiguity folds 180 -> 0
    t_err, _ = relative_pose_error(T, np.eye(3), np.array([-1.0, 0, 0]))
    assert t_err < 1e-6
    # orthogonal translation: 90 deg
    t_err, _ = relative_pose_error(T, np.eye(3), np.array([0, 1.0, 0]))
    np.testing.assert_allclose(t_err, 90.0, atol=1e-4)


def test_epipolar_distance_zero_for_true_matches():
    rng = np.random.RandomState(0)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, 0.1, 0.0], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    pts3d = rng.rand(50, 3).astype(np.float32) * [2, 2, 2] + [-1, -1, 3]
    p0 = pts3d @ K.T
    p0 = p0[:, :2] / p0[:, 2:]
    p1c = pts3d @ R.T + t
    p1 = p1c @ K.T
    p1 = p1[:, :2] / p1[:, 2:]

    E = essential_from_pose(jnp.asarray(T[None]))
    d = symmetric_epipolar_distance(jnp.asarray(p0[None]),
                                    jnp.asarray(p1[None]), E,
                                    jnp.asarray(K[None]),
                                    jnp.asarray(K[None]))
    assert np.asarray(d).max() < 1e-6
    # perturbed matches get nonzero distance
    p1_bad = p1 + 5.0
    d_bad = symmetric_epipolar_distance(jnp.asarray(p0[None]),
                                        jnp.asarray(p1_bad[None]), E,
                                        jnp.asarray(K[None]),
                                        jnp.asarray(K[None]))
    assert np.median(np.asarray(d_bad)) > 1e-5


def test_aggregate_dedup():
    # NB: reference semantics (metrics.py:180): the LAST occurrence of a
    # duplicated identifier wins (OrderedDict comprehension overwrite).
    m = {"identifiers": ["a", "b", "a"],
         "R_errs": [50.0, 2.0, 1.0],
         "t_errs": [50.0, 2.0, 1.0],
         "epi_errs": [np.array([1.0]), np.array([1e-5]),
                      np.array([1e-5])]}
    agg = aggregate_metrics(m)
    # the stale first 'a' (with bad values) must be ignored
    assert agg["auc@5"] > 0.5
    assert agg["prec@5e-04"] == 1.0
    # only 2 unique pairs contribute
    m2 = dict(m)
    m2["identifiers"] = ["a", "b", "c"]
    agg3 = aggregate_metrics(m2)
    assert agg3["auc@5"] < agg["auc@5"]  # the bad pair now counts


class _PerfectMatcherEvaluator:
    """Evaluator with the model swapped for an oracle that returns GT
    correspondences - exercises epi/pose/AUC plumbing end to end."""

    def __init__(self, config, solver):
        from loftr_tpu.eval.evaluator import Evaluator
        self.ev = Evaluator(config, variables={}, pose_solver=solver)
        self.ev._fwd = self._fake_forward

    def _fake_forward(self, variables, inp):
        from loftr_tpu.structs import CoarseMatches, MatchResult
        rng = np.random.RandomState(0)
        B = inp.image0.shape[0]
        K_cap = 64
        pts3d = rng.rand(B, K_cap, 3).astype(np.float32) * [2, 2, 2] + \
            [-1, -1, 3]
        K0 = np.asarray(inp.K0)
        T = np.asarray(inp.T_0to1)
        p0 = np.einsum("bij,bkj->bki", K0, pts3d)
        p0 = p0[..., :2] / p0[..., 2:]
        p1c = np.einsum("bij,bkj->bki", T[:, :3, :3], pts3d) + \
            T[:, None, :3, 3]
        p1 = np.einsum("bij,bkj->bki", np.asarray(inp.K1), p1c)
        p1 = p1[..., :2] / p1[..., 2:]
        p0 += rng.randn(*p0.shape).astype(np.float32) * 0.1
        p1 += rng.randn(*p1.shape).astype(np.float32) * 0.1
        valid = np.ones((B, K_cap), bool)
        coarse = CoarseMatches(
            i_ids=jnp.zeros((B, K_cap), jnp.int32),
            j_ids=jnp.zeros((B, K_cap), jnp.int32),
            mconf=jnp.ones((B, K_cap)), mask=jnp.asarray(valid),
            gt_mask=jnp.zeros((B, K_cap), bool))
        return MatchResult(
            coarse=coarse, mkpts0_c=jnp.asarray(p0), mkpts1_c=jnp.asarray(p1),
            mkpts0_f=jnp.asarray(p0), mkpts1_f=jnp.asarray(p1),
            expec_f=jnp.zeros((B, K_cap, 3)))


@pytest.mark.parametrize("solver", [
    "opencv", "jax",
    pytest.param("jax5pt", marks=pytest.mark.heavy),  # ~140 s on CPU
    "native", "5pt"])
def test_evaluator_perfect_matches(solver):
    from loftr_tpu.config import get_config
    from loftr_tpu.structs import MatchInput

    cfg = get_config("default")
    ev = _PerfectMatcherEvaluator(cfg, solver)

    rng = np.random.RandomState(1)
    batches = []
    for i in range(3):
        aa = rng.randn(3) * 0.05
        angle = np.linalg.norm(aa)
        axis = aa / angle
        Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                       [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
        t = rng.randn(3)
        t /= np.linalg.norm(t)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]],
                     np.float32)
        inp = MatchInput(
            image0=np.zeros((1, 64, 64, 1), np.float32),
            image1=np.zeros((1, 64, 64, 1), np.float32),
            T_0to1=T[None], T_1to0=np.linalg.inv(T)[None].astype(np.float32),
            K0=K[None], K1=K[None])
        batches.append((inp, [{"scene_id": "synth", "pair_id": i,
                               "dataset_name": "synth", "pair_names": None}]))

    agg = ev.ev.evaluate_batches(batches)
    # near-perfect matches -> tiny pose errors -> high AUC
    assert agg["auc@5"] > 0.8, agg
    assert agg["prec@5e-04"] > 0.9, agg


def test_evaluator_figure_sink_fires():
    """The val match-figure hook (reference lightning_loftr.py:194-198)
    must fire: figure_sink receives matplotlib figures, capped at
    n_figure_pairs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from loftr_tpu.config import get_config
    from loftr_tpu.structs import MatchInput

    cfg = get_config("default")
    ev = _PerfectMatcherEvaluator(cfg, "opencv")

    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 0, 0]
    batches = []
    for i in range(2):
        inp = MatchInput(
            image0=np.zeros((1, 64, 64, 1), np.float32),
            image1=np.zeros((1, 64, 64, 1), np.float32),
            T_0to1=T[None], T_1to0=np.linalg.inv(T)[None].astype(np.float32),
            K0=K[None], K1=K[None])
        batches.append((inp, [{"scene_id": "synth", "pair_id": i,
                               "dataset_name": "synth",
                               "pair_names": None}]))

    received = []

    def sink(figs):
        received.extend(figs)
        for f in figs:
            plt.close(f)

    ev.ev.evaluate_batches(batches, figure_sink=sink, n_figure_pairs=1)
    assert len(received) == 1  # capped at n_figure_pairs, not n_batches
    ev.ev.evaluate_batches(batches, figure_sink=sink, n_figure_pairs=8)
    assert len(received) == 3  # 1 + both pairs this time
