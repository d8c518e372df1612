"""Training-time hybrid fused fine stage: Pallas forward, recomputed-XLA
backward (round-5 verdict ask #2; builder handoff #1).

The fused fine kernel (ops/pallas/fine_stage.py) keeps each window block
VMEM-resident through the whole stage and has no backward.  For training,
this module wraps it in a ``jax.custom_vjp``:

- forward: the Pallas kernel — one HBM read of the windows, [NB, 3] out,
  NO residual activations stored (the XLA path stores ~10 intermediate
  tensors of [NB, 25, C] for the backward pass);
- backward: re-derive the VJP by recomputing the mathematically identical
  XLA expression (``xla_fine_stage`` below — the same math as
  ``LocalFeatureTransformer(('self','cross')) + fine_match``, parity-tested
  in tests/test_fine_hybrid.py) and differentiating through it.

This is rematerialization with a faster primal: compute = pallas_fwd +
xla_fwd + xla_bwd, memory = O(windows).  Grad inconsistency: the cotangent
is exact for the XLA recompute but the downstream loss consumed the pallas
forward value; the two forwards differ by kernel-vs-XLA rounding (bf16
matmul order, ~1e-3 relative at bf16, ~1e-6 at f32 interpret).  That is
the same inconsistency class as ``jax.checkpoint`` under different fusion
decisions; shipping it as a default is gated on the synthetic-benchmark
convergence A/B (tools/fine_hybrid_ab.py).

Reference hot path being accelerated: /root/reference/src/loftr/loftr.py:72-75
(fine transformer + fine matching over gathered windows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from loftr_tpu.ops.attention import linear_attention
from loftr_tpu.ops.fine_match import fine_match
from loftr_tpu.ops.pallas.fine_stage import (EncoderWeights, _layer_norm,
                                             fused_fine_stage)


def _encoder_layer(x: jax.Array, source: jax.Array, w: EncoderWeights,
                   nheads: int) -> jax.Array:
    """One LoFTREncoderLayer as a pure function of EncoderWeights.

    Identical math to models/transformer.py::LoFTREncoderLayer (bias-free
    q/k/v + linear attention + merge + f32 LayerNorm + concat-FFN) with
    weights as plain arrays so jax.vjp can differentiate it without flax.
    """
    b, l, c = x.shape
    d = c // nheads
    dt = x.dtype
    q = (x @ w.q.astype(dt)).reshape(b, l, nheads, d)
    k = (source @ w.k.astype(dt)).reshape(b, -1, nheads, d)
    v = (source @ w.v.astype(dt)).reshape(b, -1, nheads, d)
    msg = linear_attention(q, k, v).reshape(b, l, c)
    msg = msg @ w.merge.astype(dt)
    msg = _layer_norm(msg.astype(jnp.float32), w.ln1_s.astype(jnp.float32),
                      w.ln1_b.astype(jnp.float32)).astype(dt)
    y = jnp.concatenate([x, msg], axis=-1) @ w.mlp0.astype(dt)
    y = jax.nn.relu(y)
    y = y @ w.mlp2.astype(dt)
    y = _layer_norm(y.astype(jnp.float32), w.ln2_s.astype(jnp.float32),
                    w.ln2_b.astype(jnp.float32)).astype(dt)
    return x + y


def xla_fine_stage(win0: jax.Array, win1: jax.Array, l0: EncoderWeights,
                   l1: EncoderWeights, nheads: int) -> jax.Array:
    """XLA oracle of the fused kernel: ('self', 'cross') stage + soft-argmax.

    win0, win1: [NB, W2, C] flattened windows.  Returns expec_f [NB, 3].
    Cross is sequential (win1 attends to the already-updated win0),
    matching /root/reference/src/loftr/loftr_module/transformer.py:96-97.
    """
    nb, w2, c = win0.shape
    f0 = _encoder_layer(win0, win0, l0, nheads)
    f1 = _encoder_layer(win1, win1, l0, nheads)
    f0b = _encoder_layer(f0, f1, l1, nheads)
    f1b = _encoder_layer(f1, f0b, l1, nheads)
    return fine_match(f0b[None], f1b[None])[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_fine_stage_hybrid(win0, win1, l0: EncoderWeights,
                            l1: EncoderWeights, nheads: int,
                            mode: str = "stack", block_windows: int = 32,
                            win_pack: int = 1):
    """Pallas-forward / XLA-recompute-backward fine stage.  [NB,W2,C]x2 ->
    expec_f [NB, 3].  mode/block_windows/win_pack only tune the forward
    kernel's scheduling (ops/pallas/fine_stage.py), not the math, so the
    XLA backward is unaffected.  (Non-TPU backends auto-run the kernel
    interpreted.)"""
    return fused_fine_stage(win0, win1, l0, l1, nheads=nheads, mode=mode,
                            block_windows=block_windows, win_pack=win_pack)


def _hybrid_fwd(win0, win1, l0, l1, nheads, mode, block_windows, win_pack):
    out = fused_fine_stage(win0, win1, l0, l1, nheads=nheads, mode=mode,
                           block_windows=block_windows, win_pack=win_pack)
    return out, (win0, win1, l0, l1)


def _hybrid_bwd(nheads, mode, block_windows, win_pack, res, g):
    win0, win1, l0, l1 = res
    _, vjp = jax.vjp(
        lambda a, b, p0, p1: xla_fine_stage(a, b, p0, p1, nheads),
        win0, win1, l0, l1)
    return vjp(g.astype(jnp.float32))


fused_fine_stage_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
