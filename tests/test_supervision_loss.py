"""Unit tests: depth-warp, coarse/fine supervision, loss semantics."""
import numpy as np
import jax.numpy as jnp

from loftr_tpu.structs import MatchInput, Supervision, CoarseMatches
from loftr_tpu.supervision import warp_kpts, coarse_supervision, fine_supervision
from loftr_tpu.losses import coarse_loss, fine_loss, compute_c_weight
from loftr_tpu.config import LossConfig, MatchCoarseConfig


def test_warp_identity():
    """Identity pose + flat depth: points map to themselves."""
    B, H, W = 1, 32, 40
    depth = np.full((B, H, W), 2.0, np.float32)
    K = np.array([[[30.0, 0, 20], [0, 30.0, 16], [0, 0, 1]]], np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    kpts = np.array([[[5.0, 7.0], [20.0, 10.0], [0.0, 0.0]]], np.float32)
    valid, warped = warp_kpts(jnp.asarray(kpts), jnp.asarray(depth),
                              jnp.asarray(depth), jnp.asarray(T),
                              jnp.asarray(K), jnp.asarray(K))
    w = np.asarray(warped)
    np.testing.assert_allclose(w[0, :2], kpts[0, :2], atol=1e-2)
    v = np.asarray(valid)
    assert v[0, 0] and v[0, 1]
    # (0,0) fails the strict >0 covisibility bound (geometry.py:43-44)
    assert not v[0, 2]


def test_warp_translation():
    """Known camera translation along x shifts projections by f*tx/z."""
    B, H, W = 1, 64, 64
    z = 4.0
    depth = np.full((B, H, W), z, np.float32)
    f = 32.0
    K = np.array([[[f, 0, 32], [0, f, 32], [0, 0, 1]]], np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    tx = 0.5
    T[0, 0, 3] = tx
    kpts = np.array([[[30.0, 30.0]]], np.float32)
    valid, warped = warp_kpts(jnp.asarray(kpts), jnp.asarray(depth),
                              jnp.asarray(depth), jnp.asarray(T),
                              jnp.asarray(K), jnp.asarray(K))
    expect_dx = f * tx / z  # = 4 px
    np.testing.assert_allclose(np.asarray(warped)[0, 0],
                               [30.0 + expect_dx, 30.0], atol=0.05)


def test_warp_zero_depth_invalid():
    B, H, W = 1, 16, 16
    depth = np.zeros((B, H, W), np.float32)
    K = np.array([[[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]]], np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    kpts = np.array([[[4.0, 4.0]]], np.float32)
    valid, _ = warp_kpts(jnp.asarray(kpts), jnp.asarray(depth),
                         jnp.asarray(depth), jnp.asarray(T),
                         jnp.asarray(K), jnp.asarray(K))
    assert not np.asarray(valid)[0, 0]


def _identity_inputs(B=1, H=64, W=64):
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, 1).astype(np.float32)
    depth = np.full((B, H, W), 2.0, np.float32)
    K = np.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]] * B,
                 np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    return MatchInput(image0=jnp.asarray(img), image1=jnp.asarray(img),
                      depth0=jnp.asarray(depth), depth1=jnp.asarray(depth),
                      T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
                      K0=jnp.asarray(K), K1=jnp.asarray(K))


def test_coarse_supervision_identity_diagonal():
    inp = _identity_inputs()
    spv = coarse_supervision(inp, 8)
    gt_valid = np.asarray(spv.gt_valid)
    gt_j = np.asarray(spv.gt_j)
    L = (64 // 8) ** 2
    # identity: every cell (except ignored top-left) matches itself
    assert not gt_valid[0, 0]
    ii = np.nonzero(gt_valid[0])[0]
    assert len(ii) == L - 1
    np.testing.assert_array_equal(gt_j[0, ii], ii)
    # conf_matrix_gt materialization agrees
    cm = np.asarray(spv.conf_matrix_gt(L))
    assert cm.sum() == L - 1
    assert (np.nonzero(cm[0])[0] == np.nonzero(cm[0])[1]).all()


def test_fine_supervision_identity_zero_offset():
    inp = _identity_inputs()
    spv = coarse_supervision(inp, 8)
    matches = CoarseMatches(
        i_ids=jnp.asarray([[9, 10]]), j_ids=jnp.asarray([[9, 10]]),
        mconf=jnp.asarray([[0.5, 0.5]]), mask=jnp.asarray([[True, True]]),
        gt_mask=jnp.asarray([[False, False]]))
    egt = np.asarray(fine_supervision(spv, matches, inp, 2, 5))
    np.testing.assert_allclose(egt, 0.0, atol=1e-3)


def test_focal_loss_dense_values():
    """Hand-computed focal loss on a 1x2x2 case."""
    conf = jnp.asarray([[[0.9, 0.1], [0.2, 0.8]]])
    gt = jnp.asarray([[[True, False], [False, True]]])
    cfg = LossConfig()
    mc = MatchCoarseConfig(sparse_spvs=False)
    got = float(coarse_loss(conf, gt, cfg, mc))
    a, g = 0.25, 2.0
    lp = np.mean([-a * (1 - 0.9) ** g * np.log(0.9),
                  -a * (1 - 0.8) ** g * np.log(0.8)])
    ln = np.mean([-a * 0.1 ** g * np.log(0.9),
                  -a * 0.2 ** g * np.log(0.8)])
    np.testing.assert_allclose(got, lp + ln, rtol=1e-5)


def test_focal_loss_empty_pos_is_finite():
    conf = jnp.asarray([[[0.1, 0.1], [0.1, 0.1]]])
    gt = jnp.zeros((1, 2, 2), bool)
    got = float(coarse_loss(conf, gt, LossConfig(),
                            MatchCoarseConfig(sparse_spvs=False)))
    assert np.isfinite(got)


def test_fine_loss_l2_std():
    expec = jnp.asarray([[[0.1, 0.0, 0.5], [0.0, 0.2, 1.0],
                          [2.0, 2.0, 1.0]]])  # 3rd: gt out of window
    egt = jnp.asarray([[[0.0, 0.0], [0.0, 0.0], [3.0, 3.0]]])
    cfg = LossConfig()
    got = float(fine_loss(expec, egt, cfg))
    inv = np.array([2.0, 1.0, 1.0])
    w = inv / inv.mean()
    l2 = np.array([0.01, 0.04])
    want = np.mean(l2 * w[:2])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fine_loss_no_correct_returns_zero():
    expec = jnp.asarray([[[0.0, 0.0, 1.0]]])
    egt = jnp.asarray([[[5.0, 5.0]]])
    assert float(fine_loss(expec, egt, LossConfig())) == 0.0


def test_c_weight_outer_product():
    m = np.zeros((1, 2, 2), np.float32)
    m[0, 0, :] = 1
    inp = MatchInput(image0=jnp.zeros((1, 16, 16, 1)),
                     image1=jnp.zeros((1, 16, 16, 1)),
                     mask0=jnp.asarray(m), mask1=jnp.asarray(m))
    w = np.asarray(compute_c_weight(inp))
    assert w.shape == (1, 4, 4)
    assert w.sum() == 4  # 2 valid cells x 2 valid cells
