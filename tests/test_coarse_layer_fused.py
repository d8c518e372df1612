"""Fused coarse encoder layer (ops/pallas/coarse_layer.py) vs XLA stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loftr_tpu.models.fused_coarse import FusedCoarseTransformer
from loftr_tpu.models.transformer import (LocalFeatureTransformer,
                                          LoFTREncoderLayer)
from loftr_tpu.ops.pallas.coarse_layer import fused_coarse_layer
from loftr_tpu.ops.pallas.fine_stage import EncoderWeights

B, L, S, C, H = 2, 96, 80, 64, 8


def _weights_from(variables, layer="layer_0"):
    p = variables["params"][layer] if layer in variables["params"] \
        else variables["params"]
    return EncoderWeights(
        q=p["q_proj"]["kernel"], k=p["k_proj"]["kernel"],
        v=p["v_proj"]["kernel"], merge=p["merge"]["kernel"],
        ln1_s=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
        mlp0=p["mlp_0"]["kernel"], mlp2=p["mlp_2"]["kernel"],
        ln2_s=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"])


def _rand(seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, L, C) * 0.5, jnp.float32)
    src = jnp.asarray(r.randn(B, S, C) * 0.5, jnp.float32)
    return x, src


@pytest.mark.parametrize("tile", [32, 16])
def test_single_layer_matches_xla(tile):
    x, src = _rand()
    layer = LoFTREncoderLayer(C, H, "linear")
    v = layer.init(jax.random.PRNGKey(0), x, src)
    want = layer.apply(v, x, src)
    got = fused_coarse_layer(x, src, _weights_from(v), nheads=H, tile=tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_single_layer_with_masks():
    x, src = _rand(1)
    r = np.random.RandomState(2)
    xm = jnp.asarray(r.rand(B, L) > 0.3)
    sm = jnp.asarray(r.rand(B, S) > 0.3)
    layer = LoFTREncoderLayer(C, H, "linear")
    v = layer.init(jax.random.PRNGKey(0), x, src)
    want = layer.apply(v, x, src, xm, sm)
    got = fused_coarse_layer(x, src, _weights_from(v), xm, sm,
                             nheads=H, tile=32)
    # XLA path zeroes phi(q) rows via the mask too; compare valid rows only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_full_stack_matches_xla():
    names = ("self", "cross") * 2
    x, src = _rand(3)
    src = src[:, :L]  # same shape so 'self' batches both
    tr = LocalFeatureTransformer(C, H, names, "linear")
    v = tr.init(jax.random.PRNGKey(1), x, src)
    want0, want1 = tr.apply(v, x, src)
    fused = FusedCoarseTransformer(C, H, names, tile=32)
    got0, got1 = fused.apply(v, x, src)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               atol=5e-4, rtol=5e-4)


def test_param_tree_matches_xla_path():
    names = ("self", "cross") * 2
    x, src = _rand(4)
    tr = LocalFeatureTransformer(C, H, names, "linear")
    v_xla = tr.init(jax.random.PRNGKey(0), x, src)
    fused = FusedCoarseTransformer(C, H, names)
    v_f = fused.init(jax.random.PRNGKey(0), x, src)
    pa = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_leaves_with_path(v_xla["params"])}
    pb = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_leaves_with_path(v_f["params"])}
    assert pa == pb


def test_full_model_fused_coarse_vs_xla():
    """End-to-end: same variables, coarse use_pallas on/off -> same result."""
    from loftr_tpu import LoFTR, MatchInput, get_config
    r = np.random.RandomState(5)
    inp = MatchInput(
        image0=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32))
    over = {"loftr": {"dtype": "float32",
                      "match_coarse": {"use_pallas": False,
                                       "max_matches": 16}}}
    cfg_f = get_config("indoor_ds", over)
    cfg_x = cfg_f.replaced({"loftr": {"coarse": {"use_pallas": False}}})
    m_x, m_f = LoFTR(cfg_x.loftr), LoFTR(cfg_f.loftr)
    v = jax.jit(m_x.init)(jax.random.PRNGKey(0), inp)
    out_x = jax.jit(m_x.apply)(v, inp)
    out_f = jax.jit(m_f.apply)(v, inp)
    np.testing.assert_allclose(np.asarray(out_f.coarse.mconf),
                               np.asarray(out_x.coarse.mconf),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_f.mkpts1_f),
                               np.asarray(out_x.mkpts1_f), atol=5e-3)
