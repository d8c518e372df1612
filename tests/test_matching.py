"""Unit tests: dual-softmax confidence, MNN selection, top-K capacity,
train-time GT padding."""
import numpy as np
import jax
import jax.numpy as jnp

from loftr_tpu.ops.matching import (dual_softmax_conf,
                                    mutual_nearest_candidates,
                                    topk_matches, select_train_matches,
                                    matches_to_kpts)


def np_dual_softmax(f0, f1, temp):
    c = f0.shape[-1]
    sim = np.einsum("blc,bsc->bls", f0 / np.sqrt(c), f1 / np.sqrt(c)) / temp
    def sm(x, ax):
        e = np.exp(x - x.max(axis=ax, keepdims=True))
        return e / e.sum(axis=ax, keepdims=True)
    return sm(sim, 1) * sm(sim, 2)


def test_dual_softmax_matches_numpy():
    rng = np.random.RandomState(0)
    f0 = rng.randn(2, 12, 16).astype(np.float32)
    f1 = rng.randn(2, 10, 16).astype(np.float32)
    got = np.asarray(dual_softmax_conf(jnp.asarray(f0), jnp.asarray(f1), 0.1))
    want = np_dual_softmax(f0, f1, 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _planted_conf(B, h0, w0, h1, w1, pairs, conf_val=0.9):
    """Confidence matrix with planted strong mutual matches."""
    L, S = h0 * w0, h1 * w1
    conf = np.full((B, L, S), 1e-4, np.float32)
    for b, i, j, v in pairs:
        conf[b, i, j] = v
    return conf


def test_mnn_candidates_and_topk():
    h0 = w0 = h1 = w1 = 4  # L = S = 16, border_rm=1 keeps cells 5,6,9,10
    pairs = [(0, 5, 5, 0.9), (0, 6, 10, 0.8),
             (0, 0, 1, 0.95),   # in border -> removed
             (0, 9, 5, 0.5)]    # col 5 already taken by stronger 0.9 -> not MNN
    conf = _planted_conf(1, h0, w0, h1, w1, pairs)
    cand = mutual_nearest_candidates(jnp.asarray(conf), thr=0.2, border_rm=1,
                                     hw0_c=(h0, w0), hw1_c=(h1, w1))
    valid = np.asarray(cand.valid)[0]
    assert valid[5] and valid[6]
    assert not valid[0] and not valid[9]
    m = topk_matches(cand, k=8)
    mask = np.asarray(m.mask)[0]
    assert mask.sum() == 2
    got = {(int(i), int(j)) for i, j, ok in
           zip(np.asarray(m.i_ids)[0], np.asarray(m.j_ids)[0], mask) if ok}
    assert got == {(5, 5), (6, 10)}
    # ordering by confidence
    assert np.asarray(m.mconf)[0, 0] >= np.asarray(m.mconf)[0, 1]


def test_topk_capacity_overflow_keeps_strongest():
    h = w = 6
    pairs = [(0, i, i, 0.3 + 0.01 * i) for i in range(7, 29)]
    conf = _planted_conf(1, h, w, h, w, pairs)
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 0,
                                     (h, w), (h, w))
    m = topk_matches(cand, k=4)
    assert np.asarray(m.mask)[0].all()
    # keeps the 4 highest-confidence matches
    np.testing.assert_array_equal(np.sort(np.asarray(m.i_ids)[0]),
                                  [25, 26, 27, 28])


def test_border_with_padding_mask():
    h0 = w0 = h1 = w1 = 4
    # effective area 3x3 (last row/col padded)
    pm = np.zeros((1, 4, 4), bool)
    pm[:, :3, :3] = True
    pairs = [(0, 5, 5, 0.9),      # (1,1): interior of effective area
             (0, 6, 6, 0.8)]      # (1,2): col 2 >= w_eff - border = 2 -> out
    conf = _planted_conf(1, h0, w0, h1, w1, pairs)
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 1,
                                     (h0, w0), (h1, w1),
                                     jnp.asarray(pm), jnp.asarray(pm))
    valid = np.asarray(cand.valid)[0]
    assert valid[5] and not valid[6]


def test_select_train_matches_static_capacity():
    h = w = 6
    L = h * w
    pairs = [(0, i, i, 0.5) for i in range(5, 10)]  # 5 predictions
    conf = _planted_conf(1, h, w, h, w, pairs)
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 0,
                                     (h, w), (h, w))
    gt_j = np.zeros((1, L), np.int32)
    gt_valid = np.zeros((1, L), bool)
    for i in range(20, 30):  # 10 GT matches at (i, i+1)
        gt_j[0, i] = i + 1
        gt_valid[0, i] = True
    k_train, pad_min = 12, 4
    m = select_train_matches(cand, jnp.asarray(gt_j), jnp.asarray(gt_valid),
                             jax.random.PRNGKey(0), k_train, pad_min)
    assert m.i_ids.shape == (1, k_train)
    assert np.asarray(m.mask).all()          # every slot filled
    gt_mask = np.asarray(m.gt_mask)[0]
    assert gt_mask.sum() >= pad_min          # at least pad_min GT slots
    # pred slots carry conf>0 and come from the planted predictions
    i_ids, j_ids = np.asarray(m.i_ids)[0], np.asarray(m.j_ids)[0]
    mconf = np.asarray(m.mconf)[0]
    for s in range(k_train):
        if gt_mask[s]:
            assert mconf[s] == 0.0
            assert j_ids[s] == i_ids[s] + 1  # GT structure
        else:
            assert mconf[s] > 0.0
            assert j_ids[s] == i_ids[s]      # pred structure
    # all 5 predictions kept (5 <= k_train - pad_min)
    assert (~gt_mask).sum() == 5


def test_select_train_matches_global_replacement():
    """'global_replacement' emulates the reference's batch-global
    with-replacement draw (coarse_matching.py:214-217): candidate-rich
    pairs get proportionally more predicted slots, duplicates may occur,
    and every predicted slot still maps to a real candidate."""
    h = w = 6
    L = h * w
    # pair 0: 12 candidates; pair 1: 2 candidates
    pairs0 = [(0, i, i, 0.5) for i in range(2, 14)]
    pairs1 = [(1, i, i, 0.5) for i in range(20, 22)]
    conf = _planted_conf(2, h, w, h, w, pairs0 + pairs1)
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 0,
                                     (h, w), (h, w))
    gt_j = np.zeros((2, L), np.int32)
    gt_valid = np.zeros((2, L), bool)
    for b in range(2):
        for i in range(25, 32):
            gt_j[b, i] = i + 1
            gt_valid[b, i] = True
    k_train, pad_min = 10, 2
    n_pred = np.zeros(2)
    reps = 30
    for s in range(reps):
        m = select_train_matches(
            cand, jnp.asarray(gt_j), jnp.asarray(gt_valid),
            jax.random.PRNGKey(s), k_train, pad_min,
            sampling="global_replacement")
        gm = np.asarray(m.gt_mask)
        pred = np.asarray(m.mask) & ~gm
        n_pred += pred.sum(axis=1)
        # predicted slots must reference planted candidates (i == j here)
        i_ids, j_ids = np.asarray(m.i_ids), np.asarray(m.j_ids)
        assert (j_ids[pred] == i_ids[pred]).all()
        assert (np.asarray(m.mconf)[pred] > 0).all()
        assert gm.sum(axis=1).min() >= pad_min
    # proportional allocation: pair 0 has 6x the candidates of pair 1
    ratio = n_pred[0] / max(n_pred[1], 1)
    assert 3.0 < ratio < 12.0, (n_pred, ratio)


def test_select_train_matches_mask_budget():
    """Mask-aware train capacity (reference coarse_matching.py:46-56,
    200-204): with padding masks, the per-pair budget is
    train_coarse_percent * min(effective areas); over-budget slots are
    masked out while the array capacity stays static."""
    from loftr_tpu.ops.matching import mask_match_budget
    h = w = 6
    L = h * w
    # pair 0: full masks; pair 1: only a 3x4 region valid
    pm = np.zeros((2, h, w), bool)
    pm[0] = True
    pm[1, :3, :4] = True
    budget = np.asarray(mask_match_budget(
        jnp.asarray(pm), jnp.asarray(pm), 0.5))
    np.testing.assert_array_equal(budget, [18, 6])  # 0.5*36, 0.5*12

    pairs = [(b, i, i, 0.5) for b in range(2) for i in range(5, 10)]
    conf = _planted_conf(2, h, w, h, w, pairs)
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 0,
                                     (h, w), (h, w))
    gt_j = np.zeros((2, L), np.int32)
    gt_valid = np.zeros((2, L), bool)
    for i in range(20, 30):
        gt_j[:, i] = i + 1
        gt_valid[:, i] = True
    k_train, pad_min = 12, 4
    m = select_train_matches(cand, jnp.asarray(gt_j), jnp.asarray(gt_valid),
                             jax.random.PRNGKey(0), k_train, pad_min,
                             budget=jnp.asarray(budget))
    mask = np.asarray(m.mask)
    gt_mask = np.asarray(m.gt_mask)
    # pair 0: budget 18 > k_train -> all 12 slots live
    assert mask[0].sum() == k_train
    # pair 1: budget 6 -> exactly 6 live slots, rest masked out
    assert mask[1].sum() == 6
    # within pair 1's live slots: at most budget-pad_min=2 predictions
    assert (~gt_mask[1] & mask[1]).sum() <= 2
    assert (gt_mask[1] & mask[1]).sum() >= pad_min
    # gt_mask never marks a dead slot
    assert not (gt_mask & ~mask).any()
    # budget=None behaves as before: every slot filled
    m0 = select_train_matches(cand, jnp.asarray(gt_j), jnp.asarray(gt_valid),
                              jax.random.PRNGKey(0), k_train, pad_min)
    assert np.asarray(m0.mask).all()


def test_select_train_matches_no_gt_dummy():
    h = w = 4
    L = h * w
    conf = _planted_conf(1, h, w, h, w, [])
    cand = mutual_nearest_candidates(jnp.asarray(conf), 0.2, 0,
                                     (h, w), (h, w))
    m = select_train_matches(cand, jnp.zeros((1, L), jnp.int32),
                             jnp.zeros((1, L), bool),
                             jax.random.PRNGKey(1), 8, 2)
    # no preds, no GT -> dummy (0, 0) everywhere, all slots "filled"
    assert np.asarray(m.mask).all()
    assert (np.asarray(m.i_ids) == 0).all()
    assert (np.asarray(m.j_ids) == 0).all()


def test_matches_to_kpts_scaling():
    from loftr_tpu.structs import CoarseMatches
    m = CoarseMatches(
        i_ids=jnp.asarray([[5]]), j_ids=jnp.asarray([[7]]),
        mconf=jnp.asarray([[0.9]]), mask=jnp.asarray([[True]]),
        gt_mask=jnp.asarray([[False]]))
    k0, k1 = matches_to_kpts(m, (4, 4), (4, 4), 8)
    np.testing.assert_array_equal(np.asarray(k0)[0, 0], [8.0, 8.0])   # (x=1,y=1)*8
    np.testing.assert_array_equal(np.asarray(k1)[0, 0], [24.0, 8.0])  # (x=3,y=1)*8
    scale = jnp.asarray([[2.0, 3.0]])
    k0s, _ = matches_to_kpts(m, (4, 4), (4, 4), 8, scale0=scale, scale1=scale)
    np.testing.assert_array_equal(np.asarray(k0s)[0, 0], [16.0, 24.0])
