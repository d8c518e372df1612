"""Fused focal-loss kernel (fwd + custom VJP) vs jax.grad of the XLA path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu.config import LossConfig, MatchCoarseConfig
from loftr_tpu.losses import coarse_loss, compute_c_weight
from loftr_tpu.ops.matching import dual_softmax_conf
from loftr_tpu.ops.pallas.focal_loss import fused_focal_coarse_loss
from loftr_tpu.structs import Supervision


def _xla_loss(feat0, feat1, gt_j, gt_valid, mask0, mask1, temperature=0.1):
    conf = dual_softmax_conf(feat0[None], feat1[None], temperature,
                             None if mask0 is None else mask0[None],
                             None if mask1 is None else mask1[None])
    S = feat1.shape[0]
    cols = jnp.arange(S)
    gt = (gt_j[None, :, None] == cols[None, None, :]) & \
        gt_valid[None, :, None]
    weight = None
    if mask0 is not None:
        weight = (mask0.astype(jnp.float32)[None, :, None] *
                  mask1.astype(jnp.float32)[None, None, :])
    return coarse_loss(conf, gt, LossConfig(),
                       MatchCoarseConfig(sparse_spvs=False), weight=weight)


def _case(L, S, C, n_gt, seed=0, masked=False):
    rng = np.random.RandomState(seed)
    f0 = rng.randn(L, C).astype(np.float32)
    f1 = rng.randn(S, C).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    # plant correspondences so conf at GT cells is non-degenerate
    gt_j = np.zeros(L, np.int32)
    gt_valid = np.zeros(L, bool)
    ii = rng.permutation(L)[:n_gt]
    jj = rng.permutation(S)[:n_gt]
    for i, j in zip(ii, jj):
        f1[j] = f0[i] + rng.randn(C).astype(np.float32) * 0.2
        gt_j[i] = j
        gt_valid[i] = True
    f0 *= 3
    f1 *= 3
    m0 = m1 = None
    if masked:
        m0 = np.ones(L, bool)
        m0[-L // 5:] = False
        m1 = np.ones(S, bool)
        m1[-S // 7:] = False
    return (jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(gt_j),
            jnp.asarray(gt_valid),
            None if m0 is None else jnp.asarray(m0),
            None if m1 is None else jnp.asarray(m1))


@pytest.mark.parametrize("shape,masked", [((64, 64, 16), False),
                                          ((96, 80, 16), False),
                                          ((64, 64, 16), True)])
def test_fused_loss_matches_xla(shape, masked):
    L, S, C = shape
    f0, f1, gt_j, gt_valid, m0, m1 = _case(L, S, C, n_gt=10, masked=masked)

    want_loss, (want_df0, want_df1) = jax.value_and_grad(
        _xla_loss, argnums=(0, 1))(f0, f1, gt_j, gt_valid, m0, m1)

    fused = lambda a, b: fused_focal_coarse_loss(
        a, b, 0.1, gt_j, gt_valid, m0, m1, interpret=True)
    got_loss, (got_df0, got_df1) = jax.value_and_grad(
        fused, argnums=(0, 1))(f0, f1)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_df0), np.asarray(want_df0),
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_df1), np.asarray(want_df1),
                               rtol=1e-3, atol=1e-7)


def test_fused_loss_no_positives():
    L = S = 32
    f0, f1, gt_j, gt_valid, _, _ = _case(L, S, 8, n_gt=0, seed=3)
    fused = lambda a, b: fused_focal_coarse_loss(
        a, b, 0.1, gt_j, gt_valid, None, None, interpret=True)
    loss, (df0, df1) = jax.value_and_grad(fused, argnums=(0, 1))(f0, f1)
    want = _xla_loss(f0, f1, gt_j, gt_valid, None, None)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    assert np.isfinite(np.asarray(df0)).all()


def test_fused_loss_multi_tile():
    L, S, C = 320, 192, 32
    f0, f1, gt_j, gt_valid, _, _ = _case(L, S, C, n_gt=24, seed=5)
    fused = lambda a, b: fused_focal_coarse_loss(
        a, b, 0.1, gt_j, gt_valid, None, None, tile_l=128, interpret=True)
    got_loss, (got_df0, got_df1) = jax.value_and_grad(
        fused, argnums=(0, 1))(f0, f1)
    want_loss, (want_df0, want_df1) = jax.value_and_grad(
        _xla_loss, argnums=(0, 1))(f0, f1, gt_j, gt_valid, None, None)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_df0), np.asarray(want_df0),
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_df1), np.asarray(want_df1),
                               rtol=1e-3, atol=1e-7)


@pytest.mark.heavy
def test_fused_training_step_matches_standard():
    """Full train step with the fused loss path == the standard path:
    same loss, same parameter gradients."""
    import __graft_entry__ as ge
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer

    tiny = {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"train_matches": 8, "train_pad_num_gt_min": 2},
    }
    base = get_config("indoor_ds").replaced({
        "loftr": {**tiny, "loss": {"use_pallas": False}},
        "trainer": {"scheduler_interval": "step", "warmup_step": 10}})
    fused = base.replaced({"loftr": {"loss": {
        "use_pallas": True,
        # CPU test: opt in to interpret-mode pallas (the default gate
        # engages the fused path on TPU backends only)
        "force_pallas_cpu": True}}})

    batch = ge._train_example(B=2)
    t_std = Trainer(base)
    t_fus = Trainer(fused)
    state = t_std.init_state(jax.random.PRNGKey(0),
                             jax.tree.map(lambda x: x[:1], batch))
    s_std, sc_std = t_std.train_step(state, batch)
    s_fus, sc_fus = t_fus.train_step(state, batch)

    np.testing.assert_allclose(float(sc_fus["loss"]), float(sc_std["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(sc_fus["loss_c"]),
                               float(sc_std["loss_c"]), rtol=1e-4)
    np.testing.assert_allclose(float(sc_fus["grad_norm"]),
                               float(sc_std["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s_fus.params),
                    jax.tree.leaves(s_std.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
