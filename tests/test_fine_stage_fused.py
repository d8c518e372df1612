"""Fused fine stage (ops/pallas/fine_stage.py) vs the XLA layer stack.

The fused kernel must (a) declare the identical param tree, so checkpoints
are interchangeable, and (b) reproduce LocalFeatureTransformer('self',
'cross') + fine_match numerics, including the reference's sequential cross
update (transformer.py:96-97).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loftr_tpu import LoFTR, MatchInput, get_config
from loftr_tpu.models.fused_fine import FusedFineStage
from loftr_tpu.models.transformer import LocalFeatureTransformer
from loftr_tpu.ops.fine_match import fine_match
from loftr_tpu.ops.pallas.fine_stage import EncoderWeights, fused_fine_stage

B, K, W2, C, H = 2, 8, 25, 128, 8


def _xla_reference(variables, win0, win1):
    tr = LocalFeatureTransformer(C, H, ("self", "cross"), "linear")
    b, k = win0.shape[:2]
    f0 = win0.reshape(b * k, W2, C)
    f1 = win1.reshape(b * k, W2, C)
    f0, f1 = tr.apply(variables, f0, f1)
    return fine_match(f0.reshape(b, k, W2, C), f1.reshape(b, k, W2, C))


def _random_inputs(seed=0):
    r = np.random.RandomState(seed)
    win0 = jnp.asarray(r.randn(B, K, W2, C) * 0.5, jnp.float32)
    win1 = jnp.asarray(r.randn(B, K, W2, C) * 0.5, jnp.float32)
    return win0, win1


def test_param_tree_matches_xla_path():
    win0, win1 = _random_inputs()
    tr = LocalFeatureTransformer(C, H, ("self", "cross"), "linear")
    v_xla = tr.init(jax.random.PRNGKey(0),
                    win0.reshape(B * K, W2, C), win1.reshape(B * K, W2, C))
    fused = FusedFineStage(C, H)
    v_fused = fused.init(jax.random.PRNGKey(0), win0, win1)
    paths_xla = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(v_xla["params"])}
    paths_fused = {jax.tree_util.keystr(p): v.shape for p, v in
                   jax.tree_util.tree_leaves_with_path(v_fused["params"])}
    assert paths_xla == paths_fused


@pytest.mark.parametrize("mode,win_pack", [
    ("stack", 1), ("bdot", 1), ("stack", 2), ("stack", 4)])
def test_fused_matches_xla(mode, win_pack):
    win0, win1 = _random_inputs()
    tr = LocalFeatureTransformer(C, H, ("self", "cross"), "linear")
    v = tr.init(jax.random.PRNGKey(1),
                win0.reshape(B * K, W2, C), win1.reshape(B * K, W2, C))
    want = _xla_reference(v, win0, win1)

    fused = FusedFineStage(C, H, mode=mode, block_windows=4,
                           win_pack=win_pack)
    got = fused.apply(v, win0, win1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_respects_window_independence():
    """Perturbing window j must not change window i's output."""
    win0, win1 = _random_inputs()
    tr = LocalFeatureTransformer(C, H, ("self", "cross"), "linear")
    v = tr.init(jax.random.PRNGKey(2),
                win0.reshape(B * K, W2, C), win1.reshape(B * K, W2, C))
    fused = FusedFineStage(C, H, block_windows=4)
    base = fused.apply(v, win0, win1)
    win0_p = win0.at[0, 3].add(1.0)
    pert = fused.apply(v, win0_p, win1)
    np.testing.assert_allclose(np.asarray(pert[0, :3]),
                               np.asarray(base[0, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(pert[0, 3]), np.asarray(base[0, 3]),
                           atol=1e-6)


def test_full_model_fused_vs_xla_fine():
    """End-to-end: same variables, use_pallas fine on/off -> same outputs."""
    r = np.random.RandomState(3)
    inp = MatchInput(
        image0=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32))
    over = {"loftr": {"dtype": "float32",
                      "match_coarse": {"use_pallas": False,
                                       "max_matches": 16}}}
    cfg_x = get_config("indoor_ds", {**over})
    cfg_x = cfg_x.replaced({"loftr": {"fine": {"use_pallas": False}}})
    cfg_f = cfg_x.replaced({"loftr": {"fine": {"use_pallas": True}}})
    m_x, m_f = LoFTR(cfg_x.loftr), LoFTR(cfg_f.loftr)
    v = jax.jit(m_x.init)(jax.random.PRNGKey(0), inp)
    out_x = jax.jit(m_x.apply)(v, inp)
    out_f = jax.jit(m_f.apply)(v, inp)  # same variables: identical tree
    np.testing.assert_allclose(np.asarray(out_f.expec_f),
                               np.asarray(out_x.expec_f),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_f.mkpts1_f),
                               np.asarray(out_x.mkpts1_f),
                               atol=5e-3)
