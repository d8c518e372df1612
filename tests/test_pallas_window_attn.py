"""Fused per-window linear attention (ops/pallas/window_attention.py) vs the
XLA oracle (ops/attention.py) — the score-form identity must be exact up to
accumulation order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loftr_tpu.ops.attention import linear_attention
from loftr_tpu.ops.pallas.window_attention import window_linear_attention


def _oracle(q, k, v, h):
    NB, W2, C = q.shape
    d = C // h
    out = linear_attention(q.reshape(NB, W2, h, d), k.reshape(NB, W2, h, d),
                           v.reshape(NB, W2, h, d))
    return out.reshape(NB, W2, C)


def test_window_attention_matches_oracle_f32():
    r = np.random.RandomState(0)
    NB, W2, C, H = 96, 25, 128, 8
    q = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    k = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    v = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    got = window_linear_attention(q, k, v, nheads=H)
    want = _oracle(q, k, v, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_window_attention_matches_oracle_bf16():
    r = np.random.RandomState(1)
    NB, W2, C, H = 64, 25, 128, 8
    q = jnp.asarray(r.randn(NB, W2, C), jnp.bfloat16)
    k = jnp.asarray(r.randn(NB, W2, C), jnp.bfloat16)
    v = jnp.asarray(r.randn(NB, W2, C), jnp.bfloat16)
    got = np.asarray(window_linear_attention(q, k, v, nheads=H), np.float32)
    # CPU cannot execute bf16xbf16->f32 dots: run the oracle on f32 casts
    want = np.asarray(_oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), H), np.float32)
    # bf16 operands; fused path normalizes in f32 (>= oracle precision)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_window_attention_under_jit_and_odd_counts():
    """NB not divisible by the default block: the kernel halves G."""
    r = np.random.RandomState(2)
    NB, W2, C, H = 24, 25, 128, 8   # 24 -> G=8
    q = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    k = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    v = jnp.asarray(r.randn(NB, W2, C), jnp.float32)
    got = jax.jit(lambda a, b, c: window_linear_attention(
        a, b, c, nheads=H))(q, k, v)
    want = _oracle(q, k, v, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.heavy
def test_fused_matcher_fine_stage_matches_xla():
    """Full matcher: fine.use_pallas inference output == XLA fine path."""
    from loftr_tpu import LoFTR, MatchInput, get_config
    r = np.random.RandomState(3)
    img0 = jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32)
    img1 = jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32)
    inp = MatchInput(image0=img0, image1=img1)
    cfg = get_config("indoor_ds", {"loftr": {
        "match_coarse": {"thr": 0.0, "border_rm": 0, "max_matches": 16}}})
    model = LoFTR(cfg.loftr)
    vs = model.init(jax.random.PRNGKey(0), inp)
    out_ref = model.apply(vs, inp)

    cfg_p = get_config("indoor_ds", {"loftr": {
        "match_coarse": {"thr": 0.0, "border_rm": 0, "max_matches": 16},
        "fine": {"use_pallas": True}}})
    out_fused = LoFTR(cfg_p.loftr).apply(vs, inp)
    np.testing.assert_allclose(np.asarray(out_fused.mkpts0_f),
                               np.asarray(out_ref.mkpts0_f),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_fused.mkpts1_f),
                               np.asarray(out_ref.mkpts1_f),
                               rtol=1e-4, atol=1e-3)
