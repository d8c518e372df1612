"""Hybrid (Pallas-fwd / recomputed-XLA-bwd) fine stage for training.

Three layers of evidence (ops/fine_stage_hybrid.py):
1. the functional XLA oracle reproduces the flax LocalFeatureTransformer +
   fine_match pipeline exactly (same params, same numerics);
2. the custom-VJP gradients equal differentiating the oracle directly
   (fwd value from the interpreted kernel, cotangents from the recompute);
3. the full train step runs end-to-end with fine.use_pallas_train=True and
   produces finite, oracle-close gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np

from loftr_tpu.models.transformer import LocalFeatureTransformer
from loftr_tpu.ops.fine_match import fine_match
from loftr_tpu.ops.fine_stage_hybrid import (fused_fine_stage_hybrid,
                                             xla_fine_stage)
from loftr_tpu.ops.pallas.fine_stage import EncoderWeights

B, K, W2, C, H = 2, 8, 25, 128, 8


def _random_inputs(seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    win0 = jnp.asarray(r.randn(B * K, W2, C) * 0.5, dtype)
    win1 = jnp.asarray(r.randn(B * K, W2, C) * 0.5, dtype)
    return win0, win1


def _module_weights(seed=1):
    """Init the XLA flax stack and extract EncoderWeights per layer."""
    win0, win1 = _random_inputs()
    tr = LocalFeatureTransformer(C, H, ("self", "cross"), "linear")
    v = tr.init(jax.random.PRNGKey(seed), win0, win1)
    layers = []
    for i in (0, 1):
        p = v["params"][f"layer_{i}"]
        layers.append(EncoderWeights(
            q=p["q_proj"]["kernel"], k=p["k_proj"]["kernel"],
            v=p["v_proj"]["kernel"], merge=p["merge"]["kernel"],
            ln1_s=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
            mlp0=p["mlp_0"]["kernel"], mlp2=p["mlp_2"]["kernel"],
            ln2_s=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"]))
    return tr, v, layers


def test_xla_oracle_matches_flax_stack():
    win0, win1 = _random_inputs()
    tr, v, (l0, l1) = _module_weights()
    f0, f1 = tr.apply(v, win0, win1)
    want = fine_match(f0.reshape(B, K, W2, C), f1.reshape(B, K, W2, C))
    got = xla_fine_stage(win0, win1, l0, l1, H).reshape(B, K, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_grads_match_oracle_grads():
    win0, win1 = _random_inputs()
    _, _, (l0, l1) = _module_weights()
    g_out = jnp.asarray(
        np.random.RandomState(3).randn(B * K, 3), jnp.float32)

    def loss_hybrid(a, b, p0, p1):
        return jnp.sum(fused_fine_stage_hybrid(a, b, p0, p1, H) * g_out)

    def loss_oracle(a, b, p0, p1):
        return jnp.sum(xla_fine_stage(a, b, p0, p1, H) * g_out)

    gh = jax.jit(jax.grad(loss_hybrid, argnums=(0, 1, 2, 3)))(
        win0, win1, l0, l1)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3)))(
        win0, win1, l0, l1)
    for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # and the forward VALUE comes from the kernel: finite + oracle-close
    out = fused_fine_stage_hybrid(win0, win1, l0, l1, H)
    ref = xla_fine_stage(win0, win1, l0, l1, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_train_step_with_hybrid_fine_stage():
    """Full train step with fine.use_pallas_train=True: runs, finite loss,
    grads close to the plain-XLA train step (same params, same batch)."""
    import __graft_entry__ as ge
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer

    small = {
        "loftr": {
            "dtype": "float32",
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            # d_model 128 so the kernel itself would be lane-legal on TPU;
            # on CPU it runs interpreted either way
            "fine": {"d_model": 128, "nhead": 8,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"train_matches": 8, "train_pad_num_gt_min": 2},
        },
        "trainer": {"scheduler_interval": "step", "warmup_step": 10}}
    batch = ge._train_example(B=2)

    def run(use_hybrid):
        cfg = get_config("indoor_ds", small).replaced(
            {"loftr": {"fine": {"use_pallas_train": use_hybrid}}})
        trainer = Trainer(cfg, world_size=1)
        state = trainer.init_state(jax.random.PRNGKey(0),
                                   jax.tree.map(lambda x: x[:1], batch))
        state2, sc = jax.jit(trainer._train_step)(state, batch)
        return state, state2, sc

    _, s_h, sc_h = run(True)
    _, s_x, sc_x = run(False)
    assert np.isfinite(float(sc_h["loss"]))
    np.testing.assert_allclose(float(sc_h["loss"]), float(sc_x["loss"]),
                               rtol=1e-4)
    # post-step params agree (fine stage grads are a small part of the
    # step; kernel-vs-XLA fwd rounding differences stay tiny at f32)
    for a, b in zip(jax.tree.leaves(s_h.params), jax.tree.leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
