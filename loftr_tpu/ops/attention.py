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
    # fp32 accumulation (MXU accumulates fp32 for bf16 operands; make the
    # intermediates explicit so the normalizer never lives in bf16)
    f32 = jnp.float32
    kv = jnp.einsum("bshd,bshv->bhdv", K, v_scaled,
                    preferred_element_type=f32)  # [B, H, D, Dv]
    k_sum = jnp.sum(K.astype(f32), axis=1)       # [B, H, D]
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q.astype(f32), k_sum) + eps)
    qkv = jnp.einsum("blhd,bhdv->blhv", Q, kv.astype(q.dtype),
                     preferred_element_type=f32)
    out = qkv * z[..., None] * s_len
    return out.astype(q.dtype)


def linear_attention_fused_heads(q: jax.Array, k: jax.Array, v: jax.Array,
                                 q_mask: jax.Array | None = None,
                                 kv_mask: jax.Array | None = None,
                                 eps: float = 1e-6) -> jax.Array:
    """Linear attention with heads fused into full-width matmuls.

    Mathematically IDENTICAL to :func:`linear_attention` (up to fp
    accumulation order), restructured for the MXU: with D=32 heads the
    per-head einsums have 32x32 outputs (~16x tile waste — measured 1.7
    ms/pair of the end-to-end model at 640x480).  Since heads occupy
    disjoint lane blocks of C = H*D, compute the FULL [C, C] matrix
    K^T V in one deep matmul and mask it block-diagonally: the off-head
    blocks are zeroed, so Q @ KV_bd reproduces per-head attention exactly.
    8x more FLOPs on kv/apply, but every matmul runs at full MXU
    utilization — and the mask is O(C^2), not O(L^2).

    Args/returns exactly as :func:`linear_attention` (the oracle).
    """
    B, L, H, D = q.shape
    C = H * D
    f32 = jnp.float32
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        m = kv_mask[:, :, None, None].astype(K.dtype)
        K = K * m
        v = v * m

    s_len = v.shape[1]
    Qf = Q.reshape(B, L, C)
    Kf = K.reshape(B, s_len, C)
    Vf = (v / s_len).reshape(B, s_len, C)

    kv_full = jnp.einsum("bld,ble->bde", Kf, Vf,
                         preferred_element_type=f32)        # [B, C, C]
    d_head = jnp.arange(C) // D
    head_bd = (d_head[:, None] == d_head[None, :])
    kv_bd = jnp.where(head_bd, kv_full, 0.0).astype(q.dtype)
    qkv = jnp.einsum("bld,bde->ble", Qf, kv_bd,
                     preferred_element_type=f32)            # [B, L, C]

    k_sum = jnp.sum(Kf.astype(f32), axis=1)                 # [B, C]
    onehot = (d_head[:, None] == jnp.arange(H)[None, :]).astype(f32)
    denom = jnp.einsum("bld,dh->blh",
                       Qf.astype(f32) * k_sum[:, None, :], onehot)
    z = 1.0 / (denom + eps)                                 # [B, L, H]
    out = qkv * jnp.repeat(z, D, axis=-1) * s_len
    return out.reshape(B, L, H, D).astype(q.dtype)


def full_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_mask: jax.Array | None = None,
                   kv_mask: jax.Array | None = None) -> jax.Array:
    """Softmax attention fallback (linear_attention.py:56-81).

    Args/returns as :func:`linear_attention`.
    """
    d = q.shape[-1]
    qk = jnp.einsum("blhd,bshd->blsh", q, k,
                    preferred_element_type=jnp.float32)
    if q_mask is not None or kv_mask is not None:
        qm = q_mask if q_mask is not None else jnp.ones(q.shape[:2], bool)
        kvm = kv_mask if kv_mask is not None else jnp.ones(k.shape[:2], bool)
        pair = (qm[:, :, None].astype(bool) & kvm[:, None, :].astype(bool))
        qk = jnp.where(pair[..., None], qk, -jnp.inf)
    attn = jax.nn.softmax(qk / jnp.sqrt(d).astype(qk.dtype), axis=2)
    # rows that are fully masked produce NaN from softmax(-inf); zero them
    if q_mask is not None or kv_mask is not None:
        attn = jnp.nan_to_num(attn)
    out = jnp.einsum("blsh,bshd->blhd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
