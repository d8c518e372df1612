"""Model-level tests: init/apply shapes, jit-ability, train path, both
matcher types, (16,4) variant, masked (MegaDepth-style) inputs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu import LoFTR, MatchInput, get_config
from loftr_tpu.supervision import coarse_supervision, fine_supervision
from loftr_tpu.losses import loftr_loss


def _small_cfg(**over):
    # XLA-oracle config: fused-Pallas inference paths off (they are the
    # shipped DEFAULT, covered by test_pallas_path_equals_xla_path and
    # tests/test_golden.py; interpret mode would also dominate CPU runtime)
    base = {
        "backbone": {"initial_dim": 16, "block_dims": (16, 24, 32)},
        "coarse": {"d_model": 32, "nhead": 4,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 16, "nhead": 2,
                 "layer_names": ("self", "cross"), "window_size": 5,
                 "use_pallas": False},
        "match_coarse": {"max_matches": 16, "train_matches": 12,
                         "train_pad_num_gt_min": 4,
                         "use_pallas": False},
    }
    for key, value in over.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            base[key] = {**base[key], **value}
        else:
            base[key] = value
    return get_config("default").replaced({"loftr": base})


def _inputs(B=1, H=64, W=64, masked=False, seed=0):
    rng = np.random.RandomState(seed)
    img0 = rng.rand(B, H, W, 1).astype(np.float32)
    img1 = rng.rand(B, H, W, 1).astype(np.float32)
    kw = {}
    if masked:
        m = np.zeros((B, H // 8, W // 8), bool)
        m[:, :6, :7] = True
        kw = dict(mask0=jnp.asarray(m), mask1=jnp.asarray(m),
                  scale0=jnp.ones((B, 2), np.float32) * 2,
                  scale1=jnp.ones((B, 2), np.float32) * 2)
    return MatchInput(image0=jnp.asarray(img0), image1=jnp.asarray(img1), **kw)


def test_forward_shapes_dual_softmax():
    cfg = _small_cfg()
    model = LoFTR(cfg.loftr)
    inp = _inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    out = jax.jit(model.apply)(variables, inp)
    K = cfg.loftr.match_coarse.max_matches
    assert out.mkpts0_f.shape == (1, K, 2)
    assert out.mkpts1_f.shape == (1, K, 2)
    assert out.expec_f.shape == (1, K, 3)
    L = (64 // 8) ** 2
    assert out.conf_matrix.shape == (1, L, L)
    # conf matrix is a product of two softmaxes: in [0, 1]
    c = np.asarray(out.conf_matrix)
    assert c.min() >= 0 and c.max() <= 1.0 + 1e-5


def test_forward_jit_and_masked():
    cfg = _small_cfg()
    model = LoFTR(cfg.loftr)
    inp = _inputs(masked=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    fwd = jax.jit(lambda v, i: model.apply(v, i))
    out = fwd(variables, inp)
    valid = np.asarray(out.valid)
    i_ids = np.asarray(out.coarse.i_ids)
    # no match may come from a padded (masked-out) cell
    m = np.asarray(inp.mask0).reshape(1, -1)
    for b, k in zip(*np.nonzero(valid)):
        assert m[b, i_ids[b, k]]


def test_forward_sinkhorn():
    cfg = _small_cfg(match_coarse={"match_type": "sinkhorn",
                                   "max_matches": 16,
                                   "skh_iters": 3})
    model = LoFTR(cfg.loftr)
    inp = _inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    assert "bin_score" in variables["params"]
    out = jax.jit(model.apply)(variables, inp)
    assert out.conf_matrix.shape[1] == (64 // 8) ** 2


def test_backbone_16_4():
    cfg = _small_cfg(backbone={"initial_dim": 16,
                               "block_dims": (16, 24, 32, 48),
                               "resolution": (16, 4)},
                     coarse={"d_model": 48, "nhead": 4,
                             "layer_names": ("self", "cross")},
                     fine={"d_model": 24, "nhead": 2,
                           "layer_names": ("self", "cross"),
                           "window_size": 5})
    model = LoFTR(cfg.loftr)
    inp = _inputs(H=64, W=64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    out = jax.jit(model.apply)(variables, inp)
    L = (64 // 16) ** 2
    assert out.conf_matrix.shape == (1, L, L)


def _train_inputs(B=1, H=64, W=64, seed=3):
    rng = np.random.RandomState(seed)
    base = _inputs(B, H, W, seed=seed)
    depth = rng.rand(B, H, W).astype(np.float32) * 2 + 1.0
    K = np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]] * B,
                 np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    return base.replace(depth0=jnp.asarray(depth), depth1=jnp.asarray(depth),
                        T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
                        K0=jnp.asarray(K), K1=jnp.asarray(K))


def test_train_path_and_loss():
    cfg = _small_cfg()
    model = LoFTR(cfg.loftr)
    inp = _train_inputs()
    spv = coarse_supervision(inp, cfg.loftr.backbone.resolution[0])
    # identity pose + same depth: grid warps onto itself -> diagonal GT
    gt_valid = np.asarray(spv.gt_valid)
    assert gt_valid.sum() > 10
    gt_j = np.asarray(spv.gt_j)
    ii = np.nonzero(gt_valid[0])[0]
    np.testing.assert_array_equal(gt_j[0, ii], ii)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)

    def loss_fn(params, bstats, rng):
        out, updates = model.apply(
            {"params": params, "batch_stats": bstats}, inp, train=True,
            rng=rng, gt_j=spv.gt_j, gt_valid=spv.gt_valid,
            mutable=["batch_stats"])
        egt = fine_supervision(spv, out.coarse, inp,
                               cfg.loftr.backbone.resolution[1],
                               cfg.loftr.fine.window_size)
        loss, scalars = loftr_loss(out, spv, egt, inp, cfg.loftr.loss,
                                   cfg.loftr.match_coarse)
        return loss, scalars

    (loss, scalars), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"], variables["batch_stats"], jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(scalars["loss_c"]) > 0
    # gradient flows to both coarse transformer and backbone
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("match_type", ["dual_softmax", "sinkhorn"])
def test_pallas_path_equals_xla_path(match_type):
    """Full matcher with use_pallas=True produces the same matches as the
    XLA path (interpret-mode kernels on CPU)."""
    import loftr_tpu.ops.pallas.dual_softmax as pds
    import loftr_tpu.ops.pallas.sinkhorn as psk

    # force interpret mode on CPU by monkeypatching the kernel entry points
    orig_ds = pds.fused_dual_softmax_match
    orig_sk = psk.fused_sinkhorn_match

    cfg_base = _small_cfg(match_coarse={"match_type": match_type,
                                        "max_matches": 16,
                                        "thr": 0.05})
    inp = _inputs(seed=7)
    model = LoFTR(cfg_base.loftr)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), inp)
    want = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    cfg_p = cfg_base.replaced({"loftr": {"match_coarse": {
        "use_pallas": True}}})
    model_p = LoFTR(cfg_p.loftr)
    import unittest.mock as mock
    with mock.patch.object(
            pds, "fused_dual_softmax_match",
            lambda *a, **k: orig_ds(*a, **{**k, "interpret": True})), \
         mock.patch.object(
            psk, "fused_sinkhorn_match",
            lambda *a, **k: orig_sk(*a, **{**k, "interpret": True})):
        got = jax.jit(lambda v, i: model_p.apply(v, i))(variables, inp)

    np.testing.assert_array_equal(np.asarray(got.coarse.mask),
                                  np.asarray(want.coarse.mask))
    m = np.asarray(want.coarse.mask)
    np.testing.assert_array_equal(np.asarray(got.coarse.i_ids)[m],
                                  np.asarray(want.coarse.i_ids)[m])
    np.testing.assert_array_equal(np.asarray(got.coarse.j_ids)[m],
                                  np.asarray(want.coarse.j_ids)[m])
    np.testing.assert_allclose(np.asarray(got.mkpts1_f)[m],
                               np.asarray(want.mkpts1_f)[m],
                               rtol=1e-4, atol=1e-3)


def test_trainer_val_step():
    from loftr_tpu.train.trainer import Trainer
    cfg = _small_cfg().replaced({"trainer": {"scheduler_interval": "step",
                                             "warmup_step": 5}})
    trainer = Trainer(cfg)
    batch = _train_inputs(B=2)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jax.tree.map(lambda x: x[:1], batch))
    out, scalars = trainer.val_step(state, batch)
    assert np.isfinite(float(scalars["loss"]))
    assert out.mkpts0_f.shape[0] == 2


def test_gradient_accumulation():
    """accum_steps=2: params frozen on micro-step 1, updated on micro-step
    2; LR scaling counts the effective batch (config.scaled_lr)."""
    from loftr_tpu.train.trainer import Trainer
    cfg = _small_cfg()
    # warmup_step=0: linear warmup starts at LR=0 (warmup_ratio default 0),
    # which would make the first REAL update a zero update and mask the
    # thing under test
    cfg = cfg.replaced({"trainer": {"accum_steps": 2, "warmup_step": 0,
                                    "steps_per_epoch": 4}})
    # effective-batch LR scaling: accum doubles the effective batch
    lr2, _ = cfg.scaled_lr(1, 2)
    lr1, _ = cfg.replaced({"trainer": {"accum_steps": 1}}).scaled_lr(1, 2)
    assert abs(lr2 - 2 * lr1) < 1e-12

    inp = _train_inputs()
    tr = Trainer(cfg, world_size=1, batch_size_per_device=1)
    state = tr.init_state(jax.random.PRNGKey(0), inp)
    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
    state1, _ = tr.train_step(state, inp)
    # first micro-step: gradients accumulated, params NOT applied
    deltas = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state1.params, p0)
    assert max(jax.tree.leaves(deltas)) == 0.0
    state2, _ = tr.train_step(state1, inp)
    deltas = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state2.params, p0)
    assert max(jax.tree.leaves(deltas)) > 0.0


def test_match_pair_convenience_api():
    """loftr_tpu.match_pair: the reference's 3-key contract
    (demo_loftr.py:160-187 / kornia one-liner, README.md:31-44)."""
    from loftr_tpu import match_pair, load_matcher
    r = np.random.RandomState(0)
    img0 = (r.rand(64, 64) * 255).astype(np.uint8)
    img1 = (r.rand(64, 64, 3) * 255).astype(np.uint8)  # color accepted
    vs = load_matcher(preset="indoor_ds")
    out = match_pair(img0, img1, vs, dtype="float32", use_pallas=False)
    assert set(out) == {"mkpts0", "mkpts1", "mconf"}
    assert out["mkpts0"].shape == out["mkpts1"].shape
    assert out["mkpts0"].shape[0] == out["mconf"].shape[0]
    # untrained net on noise: any returned match must at least be in-bounds
    if len(out["mkpts0"]):
        assert out["mkpts0"].min() >= 0 and out["mkpts0"].max() < 64


def test_match_pair_with_optimized_variables():
    """api.optimize_variables (fold + pad) is auto-detected by match_pair
    and the serving config, and preserves the outputs."""
    import numpy as np
    from loftr_tpu import load_matcher, match_pair, optimize_variables
    from loftr_tpu.utils.channel_pad import infer_backbone_overrides
    r = np.random.RandomState(0)
    img0 = (r.rand(64, 64) * 255).astype(np.uint8)
    img1 = (r.rand(64, 64) * 255).astype(np.uint8)
    v = load_matcher()
    base = match_pair(img0, img1, v, dtype="float32", min_conf=-1.0)
    v2 = optimize_variables(v)
    ov = infer_backbone_overrides(v2)["backbone"]
    assert ov["norm"] == "none"
    assert ov["block_dims"] == (128, 256, 256)
    opt = match_pair(img0, img1, v2, dtype="float32", min_conf=-1.0)
    assert base["mkpts0"].shape == opt["mkpts0"].shape
    np.testing.assert_allclose(opt["mconf"], base["mconf"], atol=1e-3)
