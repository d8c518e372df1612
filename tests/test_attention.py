"""Unit tests: linear/full attention vs independent numpy oracles."""
import numpy as np
import jax.numpy as jnp

from loftr_tpu.ops.attention import linear_attention, full_attention


def np_elu(x):
    return np.where(x > 0, x, np.expm1(x))


def np_linear_attention(q, k, v, q_mask=None, kv_mask=None, eps=1e-6):
    Q = np_elu(q) + 1.0
    K = np_elu(k) + 1.0
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    s = v.shape[1]
    vs = v / s
    kv = np.einsum("bshd,bshv->bhdv", K, vs)
    z = 1.0 / (np.einsum("blhd,bhd->blh", Q, K.sum(axis=1)) + eps)
    return np.einsum("blhd,bhdv,blh->blhv", Q, kv, z) * s


def test_linear_attention_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 7, 4, 8).astype(np.float32)
    k = rng.randn(2, 9, 4, 8).astype(np.float32)
    v = rng.randn(2, 9, 4, 8).astype(np.float32)
    got = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v)))
    want = np_linear_attention(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_linear_attention_masked():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 6, 2, 4).astype(np.float32)
    k = rng.randn(2, 5, 2, 4).astype(np.float32)
    v = rng.randn(2, 5, 2, 4).astype(np.float32)
    qm = (rng.rand(2, 6) > 0.3).astype(np.float32)
    km = (rng.rand(2, 5) > 0.3).astype(np.float32)
    got = np.asarray(linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(qm), jnp.asarray(km)))
    want = np_linear_attention(q, k, v, qm, km)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # masked-out query rows produce ~zero output (Q rows zeroed)
    dead = qm == 0
    assert np.abs(got[dead]).max() < 1e-4


def test_full_attention_matches_numpy():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 5, 2, 4).astype(np.float32)
    k = rng.randn(1, 6, 2, 4).astype(np.float32)
    v = rng.randn(1, 6, 2, 4).astype(np.float32)
    qk = np.einsum("blhd,bshd->blsh", q, k) / np.sqrt(4.0)
    a = np.exp(qk - qk.max(axis=2, keepdims=True))
    a /= a.sum(axis=2, keepdims=True)
    want = np.einsum("blsh,bshd->blhd", a, v)
    got = np.asarray(full_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_full_attention_mask_excludes_keys():
    rng = np.random.RandomState(3)
    q = rng.randn(1, 4, 1, 4).astype(np.float32)
    k = rng.randn(1, 6, 1, 4).astype(np.float32)
    v = rng.randn(1, 6, 1, 4).astype(np.float32)
    km = np.array([[1, 1, 1, 0, 0, 0]], np.float32)
    qm = np.ones((1, 4), np.float32)
    got = np.asarray(full_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(qm),
                                    jnp.asarray(km)))
    got_trunc = np.asarray(full_attention(jnp.asarray(q), jnp.asarray(k[:, :3]),
                                          jnp.asarray(v[:, :3])))
    np.testing.assert_allclose(got, got_trunc, rtol=1e-5, atol=1e-5)


def test_fused_heads_matches_oracle():
    """linear_attention_fused_heads is the same math as linear_attention
    (head-block-diagonal KV restructuring), incl. masked rows."""
    import numpy as np
    import jax.numpy as jnp
    from loftr_tpu.ops.attention import (linear_attention,
                                         linear_attention_fused_heads)
    r = np.random.RandomState(0)
    B, L, S, H, D = 3, 40, 56, 8, 32
    q = jnp.asarray(r.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(r.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(r.randn(B, S, H, D), jnp.float32)
    qm = jnp.asarray(r.rand(B, L) > 0.2)
    km = jnp.asarray(r.rand(B, S) > 0.2)
    for masks in ((None, None), (qm, km)):
        want = linear_attention(q, k, v, q_mask=masks[0], kv_mask=masks[1])
        got = linear_attention_fused_heads(q, k, v, q_mask=masks[0],
                                           kv_mask=masks[1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
