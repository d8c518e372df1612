"""Attention primitives (pure JAX; the XLA oracle for the Pallas kernels).

Semantics match the reference implementations:
  - linear attention: /root/reference/src/loftr/loftr_module/linear_attention.py:14-47
    ("Transformers are RNNs" elu+1 feature map, O(L*D^2))
  - full attention:   linear_attention.py:50-81 (softmax(QK/sqrt(D)))

Layout: [B, L, H, D] throughout ("BLHD"), B=batch, H=heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def elu_feature_map(x: jax.Array) -> jax.Array:
    """phi(x) = elu(x) + 1 (strictly positive feature map)."""
    return jax.nn.elu(x) + 1.0


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     q_mask: jax.Array | None = None,
                     kv_mask: jax.Array | None = None,
                     eps: float = 1e-6) -> jax.Array:
    """O(L) linear attention.

    Args:
      q: [B, L, H, D]; k, v: [B, S, H, D]
      q_mask: [B, L] bool/float; kv_mask: [B, S]
    Returns: [B, L, H, D]

    Matches linear_attention.py:31-47 numerics, including the divide-by-S /
    multiply-by-S round trip guarding low-precision accumulation.
    """
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        m = kv_mask[:, :, None, None].astype(K.dtype)
        K = K * m
        v = v * m

    s_len = v.shape[1]
    v_scaled = v / s_len
    # KV: [B, H, D, Dv] = sum_s K[b,s,h,d] * v[b,s,h,dv]
    kv = jnp.einsum("bshd,bshv->bhdv", K, v_scaled)
    # Z: [B, L, H] normalizer
    k_sum = jnp.sum(K, axis=1)  # [B, H, D]
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q, k_sum) + eps)
    out = jnp.einsum("blhd,bhdv,blh->blhv", Q, kv, z) * s_len
    return out


def full_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_mask: jax.Array | None = None,
                   kv_mask: jax.Array | None = None) -> jax.Array:
    """Softmax attention fallback (linear_attention.py:56-81).

    Args/returns as :func:`linear_attention`.
    """
    d = q.shape[-1]
    qk = jnp.einsum("blhd,bshd->blsh", q, k)
    if q_mask is not None or kv_mask is not None:
        qm = q_mask if q_mask is not None else jnp.ones(q.shape[:2], bool)
        kvm = kv_mask if kv_mask is not None else jnp.ones(k.shape[:2], bool)
        pair = (qm[:, :, None].astype(bool) & kvm[:, None, :].astype(bool))
        qk = jnp.where(pair[..., None], qk, -jnp.inf)
    attn = jax.nn.softmax(qk / jnp.sqrt(d).astype(qk.dtype), axis=2)
    # rows that are fully masked produce NaN from softmax(-inf); zero them
    if q_mask is not None or kv_mask is not None:
        attn = jnp.nan_to_num(attn)
    return jnp.einsum("blsh,bshd->blhd", attn, v)
