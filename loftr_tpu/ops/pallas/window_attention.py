"""Fused per-window linear attention for the fine stage (Pallas, TPU).

The fine transformer runs linear attention over tens of thousands of tiny
independent windows ([B*K, W*W=25, C=128], heads of dim 16 — reference
shapes from src/loftr/loftr_module/fine_preprocess.py + default.py:39-44).
XLA lowers the per-window einsums (`bshd,bshv->bhdv` with S=25, D=16) to
enormous batches of 16x16-output matmuls — ~40x off speed-of-light on the
MXU (measured: the fine stage costs 3.5 ms/pair at batch 32, second only
to the backbone).

This kernel restructures the computation across windows.  For the strictly
positive feature maps of linear attention (phi = elu+1), associativity
gives an EXACT score-form identity:

    out[l] = (sum_s A[l,s] v[s]) / (sum_s A[l,s] + eps),   A = phi(q) phi(k)^T

(the reference's v/S pre-scale and *S post-scale cancel; its eps lands on
sum_s A[l,s] = phi(q)[l] . k_sum, identical to the denominator here).  The
kernel packs G windows into one [G*W2, C] tile so every matmul has >= 400
MXU rows, computes the [G*W2, G*W2] score matrix per head in VMEM only
(never HBM — the XLA formulation of this trick OOMs materializing scores),
masks it block-diagonally so windows stay independent, row-normalizes, and
applies it to v.

The XLA path in ops/attention.py stays the oracle (and the training path —
this kernel is inference-only, no custom VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _auto_interpret(flag: bool) -> bool:
    """Pallas TPU kernels run interpreted on non-TPU backends (CPU tests,
    fake-device meshes)."""
    return flag or jax.default_backend() != "tpu"


def _window_attn_kernel(q_ref, k_ref, v_ref, out_ref, *,
                        window2: int, nheads: int, eps: float):
    """One block of G windows, flattened to rows.

    q/k/v/out refs: [G*W2, C] (C = nheads * dhead).  Scores per head live
    in registers/VMEM only.
    """
    R, C = q_ref.shape
    d = C // nheads
    f32 = jnp.float32

    # phi = elu + 1 on the whole tile (VPU), f32 for stable normalization.
    # Written as where(x>0, x+1, exp(x)): jax.nn.elu lowers through expm1,
    # which Mosaic has no TPU lowering for.
    def phi(x):
        x = x.astype(f32)
        return jnp.where(x > 0, x + 1.0, jnp.exp(x))

    # phi computed in f32, then cast back to the input dtype for the MXU:
    # bf16 x bf16 -> f32-accum is exactly the oracle einsum's scheme, and
    # f32 matmuls cost 3x MXU passes
    dt_in = q_ref.dtype
    Q = phi(q_ref[:]).astype(dt_in)                       # [R, C]
    K = phi(k_ref[:]).astype(dt_in)
    V = v_ref[:]                                          # keep input dtype

    # block-diagonal window mask: rows/cols in the same window only
    row_w = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // window2
    col_w = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // window2
    same = (row_w == col_w).astype(f32)

    outs = []
    for h in range(nheads):
        sl = slice(h * d, (h + 1) * d)
        # A_h = phi(q)_h phi(k)_h^T  [R, R] — K=d contraction (d=16 pays
        # 8x MXU depth waste, but rows/cols are full tiles; measured far
        # ahead of the per-window einsum lowering)
        scores = jax.lax.dot_general(
            Q[:, sl], K[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        scores = scores * same
        z = 1.0 / (jnp.sum(scores, axis=1, keepdims=True) + eps)  # [R, 1]
        # apply in the INPUT dtype (bf16 in the production path): the f32
        # scores matmul costs 3x MXU passes; the oracle's kv einsum is
        # bf16 x bf16 -> f32-accum too, so this loses no parity headroom.
        # Normalization (z) stays f32 from the f32 row sums above.
        o = jnp.dot(scores.astype(v_ref.dtype), V[:, sl],
                    preferred_element_type=f32)
        outs.append(o * z)
    out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@jax.named_scope("pallas_window_attention")
def window_linear_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            nheads: int, eps: float = 1e-6,
                            block_windows: int = 16,
                            interpret: bool = False) -> jax.Array:
    """Per-window linear attention, fused.

    q, k, v: [NB, W2, C] with C = nheads * dhead; every window attends only
    within itself (the fine stage's self/cross calls both have this shape —
    'cross' differs only in which features were projected into k/v).
    Returns [NB, W2, C] matching ops.attention.linear_attention(q', k', v')
    applied per window (no masks).
    """
    NB, W2, C = q.shape
    G = block_windows
    while G > 1 and NB % G:
        G //= 2
    R = G * W2

    qf = q.reshape(NB * W2, C)
    kf = k.reshape(NB * W2, C)
    vf = v.reshape(NB * W2, C)

    kern = functools.partial(_window_attn_kernel, window2=W2,
                             nheads=nheads, eps=eps)
    spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(NB // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NB * W2, C), q.dtype),
        interpret=_auto_interpret(interpret),
    )(qf, kf, vf)
    return out.reshape(NB, W2, C)
