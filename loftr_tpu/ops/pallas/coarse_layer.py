"""Fused coarse encoder layer (Pallas, TPU): one LoFTREncoderLayer pass
with VMEM-resident projections, KV-form linear attention, merge+LayerNorm,
concat-FFN and residual.

The coarse transformer (8 layer-applications at L=4800, C=256,
/root/reference/src/loftr/loftr_module/transformer.py:80-101) is
HBM-bound under XLA: every matmul boundary round-trips the [B, L, C]
activations, and the per-head linear-attention einsums (D=32 outputs)
underfill MXU tiles.  Measured 1.57 ms/pair of the 640x480 flagship at
B=32 — 2x its analytic compute.

Per layer application this module runs TWO kernels:

  kernel A (source pass, grid (B, S/tile)): K/V projections per tile,
    flash-accumulates  KV = phi(K)^T (V/S)  [C, C]  and
    ksum = sum_s phi(K)[s]  [1, C]  across the sequential grid.
    The full [C, C] KV is computed (not per-head [D, D] blocks): heads
    occupy disjoint channel blocks, so kernel B masks KV block-diagonally
    and recovers per-head attention exactly (cf.
    ops/attention.py::linear_attention_fused_heads) while every matmul
    contracts the full C=256.

  kernel B (x pass, grid (B, L/tile)): q projection, phi,
    out = phi(q) @ KV_bd * S / (phi(q) . ksum_head + eps), then merge,
    LayerNorm1, concat-FFN, LayerNorm2, residual — all in VMEM; the
    [B, L, C] activations are read once and written once.

Numerics match ops/attention.py::linear_attention (elu+1 feature map, /S
fp16-range guard, f32 normalizer) composed with the rest of
LoFTREncoderLayer (models/transformer.py:48-90).  Inference-only;
training uses the XLA path (no custom VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loftr_tpu.ops.pallas.fine_stage import (EncoderWeights, _layer_norm,
                                             _phi)
from loftr_tpu.ops.pallas.window_attention import _auto_interpret


def _kv_kernel(src_ref, m_ref, wk_ref, wv_ref, kv_ref, ksum_ref, *,
               inv_s: float):
    """Accumulate KV [C, C] and ksum [1, C] over source tiles."""
    j = pl.program_id(1)
    f32 = jnp.float32
    dt = src_ref.dtype
    src = src_ref[0]
    k = jnp.dot(src, wk_ref[:], preferred_element_type=f32)
    v = jnp.dot(src, wv_ref[:], preferred_element_type=f32)
    m = m_ref[0].astype(f32)                       # [T, 1] 0/1
    K = _phi(k) * m                                 # masked phi(K), f32
    V = v * (m * inv_s)                             # v/S, masked
    kv_part = jnp.dot(K.astype(dt).T, V.astype(dt),
                      preferred_element_type=f32)   # [C, C]
    ks_part = jnp.sum(K, axis=0, keepdims=True)     # [1, C]

    @pl.when(j == 0)
    def _():
        kv_ref[0] = kv_part
        ksum_ref[0] = ks_part

    @pl.when(j > 0)
    def _():
        kv_ref[0] = kv_ref[0] + kv_part
        ksum_ref[0] = ksum_ref[0] + ks_part


def _apply_kernel(x_ref, m_ref, kv_ref, ksum_ref, wq_ref, wm_ref, ln1_ref,
                  mlp0_ref, mlp2_ref, ln2_ref, out_ref, *,
                  nheads: int, eps: float, s_len: int):
    """q-projection, masked-head attention apply, merge+LN, FFN+LN,
    residual for one x tile."""
    f32 = jnp.float32
    dt = x_ref.dtype
    C = x_ref.shape[-1]
    d = C // nheads
    x = x_ref[0]                                    # [T, C]
    q = jnp.dot(x, wq_ref[:], preferred_element_type=f32)
    Q = (_phi(q) * m_ref[0].astype(f32)).astype(dt)  # masked phi(q)

    # block-diagonal head mask on the full KV
    row_h = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // d
    col_h = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // d
    kv_bd = jnp.where(row_h == col_h, kv_ref[0], 0.0).astype(dt)
    qkv = jnp.dot(Q, kv_bd, preferred_element_type=f32)       # [T, C]

    # denom per channel: (phi(q) * ksum) @ headmask pools each head's
    # channels and broadcasts the sum back to that head's channels
    headmask = (row_h == col_h).astype(dt)
    dq = (Q.astype(f32) * ksum_ref[0]).astype(dt)
    denom = jnp.dot(dq, headmask, preferred_element_type=f32)  # [T, C]
    msg = qkv * (float(s_len) / (denom + eps))

    msg = jnp.dot(msg.astype(dt), wm_ref[:], preferred_element_type=f32)
    msg = _layer_norm(msg, ln1_ref[0:1, :], ln1_ref[1:2, :]).astype(dt)
    y = jnp.concatenate([x, msg], axis=1)                      # [T, 2C]
    y = jnp.dot(y, mlp0_ref[:], preferred_element_type=f32)
    y = jnp.maximum(y, 0.0).astype(dt)
    y = jnp.dot(y, mlp2_ref[:], preferred_element_type=f32)
    y = _layer_norm(y, ln2_ref[0:1, :], ln2_ref[1:2, :])
    out_ref[0] = (x.astype(f32) + y).astype(out_ref.dtype)


def _pad_rows(x, lp):
    if x.shape[1] == lp:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))


@jax.named_scope("pallas_coarse_layer")
def fused_coarse_layer(x: jax.Array, src: jax.Array, w: EncoderWeights,
                       x_mask: jax.Array | None = None,
                       src_mask: jax.Array | None = None,
                       nheads: int = 8, eps: float = 1e-6,
                       tile: int = 512, interpret: bool = False
                       ) -> jax.Array:
    """One LoFTREncoderLayer application, fused.

    x: [B, L, C]; src: [B, S, C]; masks [B, L] / [B, S] (1 = valid).
    Returns [B, L, C] matching the XLA LoFTREncoderLayer.
    """
    B, L, C = x.shape
    S = src.shape[1]
    dt = x.dtype
    interpret = _auto_interpret(interpret)
    Lp = (L + tile - 1) // tile * tile
    Sp = (S + tile - 1) // tile * tile

    def mask_col(mask, n, npad):
        """[B, n] (or None) -> [B, npad, 1] f32 with padding rows zeroed."""
        if mask is None:
            m = jnp.ones((B, n, 1), jnp.float32)
        else:
            m = mask.astype(jnp.float32)[:, :, None]
        return jnp.pad(m, ((0, 0), (0, npad - n), (0, 0)))

    xp = _pad_rows(x, Lp)
    srcp = _pad_rows(src, Sp)
    xm = mask_col(x_mask, L, Lp)
    sm = mask_col(src_mask, S, Sp)

    wk = w.k.astype(dt)
    wv = w.v.astype(dt)
    ln1 = jnp.stack([w.ln1_s, w.ln1_b]).astype(jnp.float32)   # [2, C]
    ln2 = jnp.stack([w.ln2_s, w.ln2_b]).astype(jnp.float32)

    tile_spec = pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, tile, 1), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM)

    def wspec(a):
        return pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    acc_spec = pl.BlockSpec((1, C, C), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    ks_spec = pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    kv, ksum = pl.pallas_call(
        functools.partial(_kv_kernel, inv_s=1.0 / S),
        grid=(B, Sp // tile),
        in_specs=[tile_spec, mspec, wspec(wk), wspec(wv)],
        out_specs=(acc_spec, ks_spec),
        out_shape=(jax.ShapeDtypeStruct((B, C, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)),
        interpret=interpret,
    )(srcp, sm, wk, wv)

    wq = w.q.astype(dt)
    wm = w.merge.astype(dt)
    mlp0 = w.mlp0.astype(dt)
    mlp2 = w.mlp2.astype(dt)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, nheads=nheads, eps=eps, s_len=S),
        grid=(B, Lp // tile),
        in_specs=[tile_spec, mspec, acc_spec, ks_spec, wspec(wq), wspec(wm),
                  wspec(ln1), wspec(mlp0), wspec(mlp2), wspec(ln2)],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp, C), dt),
        interpret=interpret,
    )(xp, xm, kv, ksum, wq, wm, ln1, mlp0, mlp2, ln2)
    return out[:, :L]
