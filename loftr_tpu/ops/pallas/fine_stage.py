"""Fully-fused fine stage: fine transformer + soft-argmax in one kernel.

The fine stage applies a 2-layer LoFTR transformer (self + sequential cross,
/root/reference/src/loftr/loftr_module/transformer.py:80-101) to tens of
thousands of independent 5x5 windows and then soft-argmaxes the center-vs-
window similarity (/root/reference/src/loftr/utils/fine_matching.py:15-60).
Every op is *window-local*: window k of image0 only ever interacts with
window k of image1.

The XLA lowering of this stage is pathological on TPU: each matmul-separated
fusion group round-trips the [B*K, 25, 128] activations (~210 MB at the
flagship batch) through HBM, and the per-window attention einsums become
batches of 16x16-output matmuls.  Measured at B=32, K=1024 on v5e: 2.6
ms/pair with the attention-only Pallas kernel, 3.4 ms/pair pure-XLA - for a
stage whose analytic compute is ~34 GFLOP/pair (~0.2 ms).

This kernel keeps a block of G window-pairs resident in VMEM through the
ENTIRE stage - projections, linear attention, merge+LayerNorm, concat-FFN,
second layer with the reference's sequential cross update, and the final
soft-argmax - and writes only the [G, 3] (x, y, std) result.  HBM traffic
drops from ~10 passes over the activations to exactly one read of win0/win1.

Attention formulation (`mode`):
  - 'bdot': per-head scores via G-batched dot_general [G,25,dh]x[G,dh,25].
  - 'stack': head-stacked per-window batched matmul [G,25,C]x[G,C,8*25]
    where the stacked K carries each head's channel mask - full C=128
    contraction depth (no 8x MXU K-padding waste), one matmul issue per
    window-block instead of 8.
Both are algebraically the score-form linear-attention identity used by
ops/pallas/window_attention.py (exact for phi = elu+1 > 0).

Weights arrive as plain arrays (see models/fused_fine.py for the flax
module that declares them under the SAME param tree as the XLA path, so
checkpoints are interchangeable).  Inference-only: no custom VJP - training
uses the XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loftr_tpu.ops.pallas.window_attention import _auto_interpret


class EncoderWeights(NamedTuple):
    """One LoFTREncoderLayer's parameters (transformer.py:35-90 layout)."""
    q: jax.Array       # [C, C]
    k: jax.Array       # [C, C]
    v: jax.Array       # [C, C]
    merge: jax.Array   # [C, C]
    ln1_s: jax.Array   # [C]
    ln1_b: jax.Array   # [C]
    mlp0: jax.Array    # [2C, 2C]
    mlp2: jax.Array    # [2C, C]
    ln2_s: jax.Array   # [C]
    ln2_b: jax.Array   # [C]


def _layer_norm(x32, scale, bias, eps=1e-5):
    """f32 LayerNorm over the last axis (flax LayerNorm semantics)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _phi(x):
    """elu + 1 in f32 (Mosaic has no expm1 lowering; cf. window_attention)."""
    x = x.astype(jnp.float32)
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _head_rowmask(W2, nheads, C, dt):
    """[nheads*W2, C] block mask: row h*W2+j keeps only head h's channels.
    Constant per kernel - computed once and reused by all 4 attention
    calls (it is pure VPU iota/compare work)."""
    d = C // nheads
    srow = jax.lax.broadcasted_iota(jnp.int32, (nheads * W2, C), 0) // W2
    scol = jax.lax.broadcasted_iota(jnp.int32, (nheads * W2, C), 1) // d
    return (srow == scol).astype(dt)


def _win_blockmask(P, W2, nheads):
    """[P*W2, P*nheads*W2] f32 mask keeping only same-window score blocks
    (constant per kernel)."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (P * W2, P * nheads * W2), 0) // W2
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (P * W2, P * nheads * W2), 1) // (nheads * W2)
    return (rows == cols).astype(jnp.float32)


def _attention(q, k, v, G, W2, nheads, eps, mode, dt, rowmask=None,
               win_pack=1):
    """Score-form linear attention per window.

    q/k/v: [G*W2, C] in compute dtype.  Returns [G*W2, C] f32.

    win_pack (stack mode): pack P windows into each matmul's M/N dims with
    a block-diagonal mask.  The per-window batched dots otherwise issue G
    tiny [W2, H*W2]-output matmuls per call, which is MXU-issue-bound at
    W2=25; packing trades P x redundant FLOPs (masked away) for P x fewer,
    larger issues.
    """
    C = q.shape[-1]
    d = C // nheads
    f32 = jnp.float32
    Q = _phi(q).astype(dt)
    K = _phi(k).astype(dt)

    if mode == "bdot":
        Q3 = Q.reshape(G, W2, C)
        K3 = K.reshape(G, W2, C)
        V3 = v.reshape(G, W2, C)
        outs = []
        for h in range(nheads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                Q3[:, :, sl], K3[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32)             # [G, W2, W2]
            z = 1.0 / (jnp.sum(s, axis=2, keepdims=True) + eps)
            o = jax.lax.dot_general(
                s.astype(dt), V3[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)             # [G, W2, d]
            outs.append(o * z)
        return jnp.concatenate(outs, axis=2).reshape(G * W2, C)

    # mode == 'stack': head-masked row-stacked K/V -> full-C contraction
    # depth (no 8x MXU K-padding waste), one matmul issue per window block.
    # kst[g, h*W2+j, c] = K[g, j, c] * (c // d == h)
    if rowmask is None:
        rowmask = _head_rowmask(W2, nheads, C, dt)       # [H*W2, C]
    kst = jnp.tile(K.reshape(G, W2, C), (1, nheads, 1)) * rowmask
    vst = jnp.tile(v.reshape(G, W2, C), (1, nheads, 1)) * rowmask
    P = win_pack if win_pack > 1 and G % win_pack == 0 else 1
    HW = nheads * W2
    if P > 1:
        GB = G // P
        s = jax.lax.dot_general(
            Q.reshape(GB, P * W2, C).astype(dt),
            kst.reshape(GB, P * HW, C),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)                  # [GB, P*W2, P*HW]
        # kill cross-window blocks; downstream sums then see own-window
        # scores only, so pooling/apply can contract the full P*HW axis
        s = s * _win_blockmask(P, W2, nheads)
        z = jnp.dot(s.reshape(G * W2, P * HW).astype(dt),
                    jnp.tile(rowmask, (P, 1)),
                    preferred_element_type=f32)          # [G*W2, C]
        zfull = 1.0 / (z + eps)
        o = jax.lax.dot_general(
            s.astype(dt), vst.reshape(GB, P * HW, C),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                  # [GB, P*W2, C]
        return (o.reshape(G * W2, C) * zfull)
    s = jax.lax.dot_general(
        Q.reshape(G, W2, C).astype(dt), kst,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                      # [G, W2, H*W2]
    # Per-head row sums via a pooling matmul (lane-dim reshapes of
    # non-128-multiples have no Mosaic lowering): P[h*W2+j, c] = (c//d == h)
    # pools each head's W2 columns straight into that head's d channels,
    # fusing the zinv broadcast-back into the same contraction shape.
    z = jnp.dot(s.reshape(G * W2, nheads * W2).astype(dt),
                rowmask, preferred_element_type=f32)     # [G*W2, C]
    zfull = 1.0 / (z + eps)
    # vst[g, h*W2+j, c] = V[g, j, c] * (c // d == h)
    o = jax.lax.dot_general(
        s.astype(dt), vst,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)                      # [G, W2, C]
    return (o.reshape(G * W2, C) * zfull)


def _encoder(x, src, w: EncoderWeights, G, W2, nheads, eps, mode, dt,
             rowmask=None, win_pack=1):
    """One LoFTREncoderLayer (transformer.py:48-90), rows = [G*W2, C]."""
    f32 = jnp.float32
    q = jnp.dot(x, w.q, preferred_element_type=f32).astype(dt)
    k = jnp.dot(src, w.k, preferred_element_type=f32).astype(dt)
    v = jnp.dot(src, w.v, preferred_element_type=f32).astype(dt)
    msg = _attention(q, k, v, G, W2, nheads, eps, mode, dt,
                     rowmask=rowmask, win_pack=win_pack)       # [R, C] f32
    msg = jnp.dot(msg.astype(dt), w.merge, preferred_element_type=f32)
    msg = _layer_norm(msg, w.ln1_s, w.ln1_b).astype(dt)
    y = jnp.concatenate([x, msg], axis=1)                     # [R, 2C]
    y = jnp.dot(y, w.mlp0, preferred_element_type=f32)
    y = jnp.maximum(y, 0.0).astype(dt)
    y = jnp.dot(y, w.mlp2, preferred_element_type=f32)
    y = _layer_norm(y, w.ln2_s, w.ln2_b).astype(dt)
    return x + y


def _fine_stage_kernel(*refs, G, W2, nheads, eps, mode, nw, win_pack=1):
    """refs: win0, win1, <2*nw weight refs>, out."""
    win0_ref, win1_ref = refs[0], refs[1]
    out_ref = refs[-1]
    wrefs = refs[2:-1]
    dt = win0_ref.dtype
    f32 = jnp.float32

    def load_layer(i):
        return EncoderWeights(*(r[:] if r.shape[0] != 1 else r[0, :]
                                for r in wrefs[i * nw:(i + 1) * nw]))

    L0, L1 = load_layer(0), load_layer(1)
    C = win0_ref.shape[-1]
    x0 = win0_ref[:].reshape(G * W2, C)
    x1 = win1_ref[:].reshape(G * W2, C)

    rowmask = (_head_rowmask(W2, nheads, C, dt) if mode == "stack"
               else None)
    enc = functools.partial(_encoder, G=G, W2=W2, nheads=nheads, eps=eps,
                            mode=mode, dt=dt, rowmask=rowmask,
                            win_pack=win_pack)
    # 'self' layer on both windows as ONE 2G-window batch (shared L0
    # weights; windows are independent rows, so stacking doubles every
    # matmul's row count), then 'cross' with the reference's SEQUENTIAL
    # update (transformer.py:96-97): x1 attends to the already-updated x0.
    xs = jnp.concatenate([x0, x1], axis=0)                # [2R, C]
    xs = _encoder(xs, xs, L0, 2 * G, W2, nheads, eps, mode, dt,
                  rowmask=rowmask, win_pack=win_pack)
    x0, x1 = xs[:G * W2], xs[G * W2:]
    x0 = enc(x0, x1, w=L1)
    x1 = enc(x1, x0, w=L1)

    # fine_match (fine_matching.py:15-60 / ops/fine_match.py): center of
    # window0 vs all W2 of window1 -> softmax heatmap -> E[grid], std.
    x0 = x0.reshape(G, W2, C)
    x1 = x1.reshape(G, W2, C)
    center = x0[:, W2 // 2, :][:, None, :]                 # [G, 1, C]
    sim = jnp.sum(center.astype(f32) * x1.astype(f32), axis=2)  # [G, W2]
    sim = sim / (C ** 0.5)
    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    e = jnp.exp(sim)
    heat = e / jnp.sum(e, axis=1, keepdims=True)           # [G, W2]

    w = int(round(W2 ** 0.5))
    idx = jax.lax.broadcasted_iota(jnp.int32, (G, W2), 1)
    gx = (idx % w).astype(f32) / (w - 1) * 2.0 - 1.0
    gy = (idx // w).astype(f32) / (w - 1) * 2.0 - 1.0
    cx = jnp.sum(heat * gx, axis=1)
    cy = jnp.sum(heat * gy, axis=1)
    ex2 = jnp.sum(heat * gx * gx, axis=1)
    ey2 = jnp.sum(heat * gy * gy, axis=1)
    vx = jnp.clip(ex2 - cx * cx, min=1e-10)
    vy = jnp.clip(ey2 - cy * cy, min=1e-10)
    std = jnp.sqrt(vx) + jnp.sqrt(vy)

    res = jnp.stack([cx, cy, std], axis=1)                 # [G, 3]
    pad = jnp.zeros((G, out_ref.shape[-1] - 3), f32)
    out_ref[:] = jnp.concatenate([res, pad], axis=1).astype(out_ref.dtype)


@jax.named_scope("pallas_fine_stage")
def fused_fine_stage(win0: jax.Array, win1: jax.Array,
                     layer0: EncoderWeights, layer1: EncoderWeights,
                     nheads: int, eps: float = 1e-6,
                     block_windows: int = 32, mode: str = "stack",
                     win_pack: int = 1,
                     interpret: bool = False) -> jax.Array:
    """Fine transformer (self + sequential cross) + soft-argmax, fused.

    win0, win1: [NB, W2, C] gathered windows (post coarse-context merge).
    Returns expec_f rows [NB, 3] (x, y, std), f32 - identical math to
    LocalFeatureTransformer(layer_names=('self','cross')) + fine_match.
    """
    NB, W2, C = win0.shape
    G = block_windows
    while G > 1 and NB % G:
        G //= 2

    def prep(w: EncoderWeights):
        dt = win0.dtype
        return EncoderWeights(
            q=w.q.astype(dt), k=w.k.astype(dt), v=w.v.astype(dt),
            merge=w.merge.astype(dt),
            ln1_s=w.ln1_s.astype(jnp.float32).reshape(1, C),
            ln1_b=w.ln1_b.astype(jnp.float32).reshape(1, C),
            mlp0=w.mlp0.astype(dt), mlp2=w.mlp2.astype(dt),
            ln2_s=w.ln2_s.astype(jnp.float32).reshape(1, C),
            ln2_b=w.ln2_b.astype(jnp.float32).reshape(1, C),
        )

    L0, L1 = prep(layer0), prep(layer1)
    nw = len(L0)
    wargs = list(L0) + list(L1)

    win_spec = pl.BlockSpec((G, W2, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                           memory_space=pltpu.VMEM) for a in wargs]
    OUTC = 128
    out = pl.pallas_call(
        functools.partial(_fine_stage_kernel, G=G, W2=W2, nheads=nheads,
                          eps=eps, mode=mode, nw=nw, win_pack=win_pack),
        grid=(NB // G,),
        in_specs=[win_spec, win_spec] + wspecs,
        out_specs=pl.BlockSpec((G, OUTC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, OUTC), jnp.float32),
        interpret=_auto_interpret(interpret),
    )(win0, win1, *wargs)
    return out[:, :3]
