"""Pallas fused dual-softmax matcher vs the XLA oracle (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu.ops.matching import (dual_softmax_conf,
                                    mutual_nearest_candidates,
                                    pallas_mutual_nearest_candidates)


def _feats(B, L, S, C, seed=0, plant=8):
    rng = np.random.RandomState(seed)
    f0 = rng.randn(B, L, C).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
    f1 = rng.randn(B, S, C).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    for b in range(B):
        ii = rng.permutation(L)[:plant]
        jj = rng.permutation(S)[:plant]
        for i, j in zip(ii, jj):
            f1[b, j] = f0[b, i]
    return f0 * 4, f1 * 4


@pytest.mark.parametrize("shape", [(6, 8, 6, 8), (4, 5, 6, 7)])
def test_fused_matches_oracle(shape):
    h0, w0, h1, w1 = shape
    L, S = h0 * w0, h1 * w1
    f0, f1 = _feats(2, L, S, 32, seed=1)
    conf = dual_softmax_conf(jnp.asarray(f0), jnp.asarray(f1), 0.1)
    want = mutual_nearest_candidates(conf, 0.2, 1, (h0, w0), (h1, w1))
    got = pallas_mutual_nearest_candidates(
        jnp.asarray(f0), jnp.asarray(f1), 0.1, 0.2, 1, (h0, w0), (h1, w1),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_array_equal(np.asarray(got.j_ids)[v],
                                  np.asarray(want.j_ids)[v])
    np.testing.assert_allclose(np.asarray(got.mconf)[v],
                               np.asarray(want.mconf)[v],
                               rtol=1e-4, atol=1e-6)


def test_fused_matches_oracle_masked():
    h0 = w0 = h1 = w1 = 8
    L = S = 64
    f0, f1 = _feats(1, L, S, 16, seed=3)
    pm = np.zeros((1, 8, 8), bool)
    pm[:, :6, :7] = True
    conf = dual_softmax_conf(jnp.asarray(f0), jnp.asarray(f1), 0.1,
                             jnp.asarray(pm.reshape(1, L)),
                             jnp.asarray(pm.reshape(1, S)))
    want = mutual_nearest_candidates(conf, 0.2, 1, (h0, w0), (h1, w1),
                                     jnp.asarray(pm), jnp.asarray(pm))
    got = pallas_mutual_nearest_candidates(
        jnp.asarray(f0), jnp.asarray(f1), 0.1, 0.2, 1, (h0, w0), (h1, w1),
        jnp.asarray(pm), jnp.asarray(pm), interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_array_equal(np.asarray(got.j_ids)[v],
                                  np.asarray(want.j_ids)[v])


def test_fused_multi_tile():
    """L larger than one tile exercises the flash column accumulation."""
    h0, w0 = 16, 20  # L = 320, tile_l=128 -> 3 tiles
    L = h0 * w0
    f0, f1 = _feats(1, L, L, 32, seed=5, plant=20)
    from loftr_tpu.ops.pallas.dual_softmax import fused_dual_softmax_match
    bv, bj, cc = fused_dual_softmax_match(
        jnp.asarray(f0[0]), jnp.asarray(f1[0]), 0.1, tile_l=128,
        interpret=True)
    conf = np.asarray(dual_softmax_conf(jnp.asarray(f0), jnp.asarray(f1),
                                        0.1))[0]
    np.testing.assert_allclose(np.asarray(bv), conf.max(axis=1),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(bj), conf.argmax(axis=1))
    np.testing.assert_allclose(np.asarray(cc), conf.max(axis=0),
                               rtol=1e-4, atol=1e-7)


def _ot_oracle(f0, f1, bin_score, iters, m0=None, m1=None, prefilter=False):
    from loftr_tpu.ops.matching import sinkhorn_conf
    conf, assign = sinkhorn_conf(jnp.asarray(f0), jnp.asarray(f1),
                                 jnp.asarray(bin_score), iters,
                                 None if m0 is None else jnp.asarray(m0),
                                 None if m1 is None else jnp.asarray(m1),
                                 prefilter=prefilter)
    return np.asarray(conf), np.asarray(assign)


@pytest.mark.parametrize("shape", [(48, 48), (40, 56)])
def test_fused_sinkhorn_matches_oracle(shape):
    from loftr_tpu.ops.pallas.sinkhorn import fused_sinkhorn_match
    L, S = shape
    f0, f1 = _feats(1, L, S, 32, seed=7)
    conf, assign = _ot_oracle(f0, f1, 1.0, 3)
    bv, bj, cc, pf0, pf1 = fused_sinkhorn_match(
        jnp.asarray(f0[0]), jnp.asarray(f1[0]), jnp.asarray(1.0), 3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(bv), conf[0].max(axis=1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bj), conf[0].argmax(axis=1))
    np.testing.assert_allclose(np.asarray(cc), conf[0].max(axis=0),
                               rtol=1e-4, atol=1e-6)
    # prefilter flags == argmax-is-dustbin on the full assignment
    want_pf0 = assign[0].argmax(axis=1)[:L] == S
    want_pf1 = assign[0].argmax(axis=0)[:S] == L
    np.testing.assert_array_equal(np.asarray(pf0), want_pf0)
    np.testing.assert_array_equal(np.asarray(pf1), want_pf1)


def test_fused_sinkhorn_masked():
    from loftr_tpu.ops.pallas.sinkhorn import fused_sinkhorn_match
    L = S = 64
    f0, f1 = _feats(1, L, S, 16, seed=8)
    m0 = np.ones(L, bool); m0[50:] = False
    m1 = np.ones(S, bool); m1[56:] = False
    conf, _ = _ot_oracle(f0, f1, 1.0, 3, m0[None], m1[None])
    bv, bj, cc, _, _ = fused_sinkhorn_match(
        jnp.asarray(f0[0]), jnp.asarray(f1[0]), jnp.asarray(1.0), 3,
        jnp.asarray(m0), jnp.asarray(m1), interpret=True)
    np.testing.assert_allclose(np.asarray(bv), conf[0].max(axis=1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cc), conf[0].max(axis=0),
                               rtol=1e-4, atol=1e-6)


def test_fused_sinkhorn_multi_tile():
    from loftr_tpu.ops.pallas.sinkhorn import fused_sinkhorn_match
    L, S = 320, 192
    f0, f1 = _feats(1, L, S, 32, seed=9, plant=24)
    conf, _ = _ot_oracle(f0, f1, 0.5, 3)
    bv, bj, cc, _, _ = fused_sinkhorn_match(
        jnp.asarray(f0[0]), jnp.asarray(f1[0]), jnp.asarray(0.5), 3,
        tile_l=128, interpret=True)
    np.testing.assert_allclose(np.asarray(bv), conf[0].max(axis=1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bj), conf[0].argmax(axis=1))


def test_fused_sinkhorn_prefilter_exact():
    """prefilter=True epilogue == XLA sinkhorn_conf(prefilter=True) +
    argmax/max: rows/cols whose assignment argmax is the dustbin are zeroed
    BEFORE best selection, so a row whose best column got filtered falls
    back to its best unfiltered column."""
    from loftr_tpu.ops.pallas.sinkhorn import fused_sinkhorn_match
    L, S = 56, 48
    # low bin score rarely filters; use a high one so the filter really fires
    for bin_score, seed in ((1.5, 11), (0.5, 12)):
        f0, f1 = _feats(1, L, S, 32, seed=seed)
        conf, assign = _ot_oracle(f0, f1, bin_score, 3, prefilter=True)
        bv, bj, cc, pf0, pf1 = fused_sinkhorn_match(
            jnp.asarray(f0[0]), jnp.asarray(f1[0]), jnp.asarray(bin_score),
            3, interpret=True, prefilter=True)
        assert np.asarray(pf0).any() or np.asarray(pf1).any() or \
            bin_score < 1.0, "filter should fire at high bin score"
        np.testing.assert_allclose(np.asarray(bv), conf[0].max(axis=1),
                                   rtol=1e-4, atol=1e-6)
        # argmax comparison only where the row survives (ties at 0 differ)
        rows = conf[0].max(axis=1) > 0
        np.testing.assert_array_equal(np.asarray(bj)[rows],
                                      conf[0].argmax(axis=1)[rows])
        np.testing.assert_allclose(np.asarray(cc), conf[0].max(axis=0),
                                   rtol=1e-4, atol=1e-6)


def test_matcher_ot_prefilter_uses_pallas_path():
    """Full model forward with sinkhorn + skh_prefilter on the fused path
    matches the XLA path (use_pallas=False) bit-for-bit on selections."""
    import jax
    from loftr_tpu import LoFTR, MatchInput, get_config
    rng = np.random.RandomState(0)
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32))
    cfg = get_config("indoor_ot").replaced({
        "loftr": {
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"max_matches": 16, "skh_prefilter": True,
                             "thr": 0.0, "border_rm": 0},
        }})
    model = LoFTR(cfg.loftr)
    v = model.init(jax.random.PRNGKey(0), inp)
    out_pallas = model.apply(v, inp)
    cfg2 = cfg.replaced({"loftr": {"match_coarse": {"use_pallas": False}}})
    out_xla = LoFTR(cfg2.loftr).apply(v, inp)
    np.testing.assert_array_equal(np.asarray(out_pallas.valid),
                                  np.asarray(out_xla.valid))
    keep = np.asarray(out_pallas.valid)
    np.testing.assert_allclose(np.asarray(out_pallas.mkpts0_f)[keep],
                               np.asarray(out_xla.mkpts0_f)[keep],
                               atol=1e-4)


def test_fused_matches_oracle_large_s_tile_shrink():
    """At large S the kernel shrinks its row tile to fit scoped VMEM
    (observed compile-OOM at the 840x840 shape, S=11136); the shrunken
    tiling must stay exact vs the oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from loftr_tpu.ops import matching as M

    r = np.random.RandomState(0)
    L, S, C = 64, 7200, 32  # S large enough to force tile_l < 128
    f0 = jnp.asarray(r.randn(1, L, C) * 0.3, jnp.float32)
    f1 = jnp.asarray(r.randn(1, S, C) * 0.3, jnp.float32)
    hw0, hw1 = (8, 8), (72, 100)
    want = M.mutual_nearest_candidates(
        M.dual_softmax_conf(f0, f1, 0.1), 0.01, 0, hw0, hw1)
    got = M.pallas_mutual_nearest_candidates(
        f0, f1, 0.1, 0.01, 0, hw0, hw1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_array_equal(np.asarray(got.j_ids)[v],
                                  np.asarray(want.j_ids)[v])
    np.testing.assert_allclose(np.asarray(got.mconf)[v],
                               np.asarray(want.mconf)[v],
                               rtol=1e-5, atol=1e-6)
