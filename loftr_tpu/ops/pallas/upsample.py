"""Pallas x2 align-corners bilinear upsample, NHWC-layout-preserving.

Why a kernel for something this small: the FPN upsample's separable
interpolation matmuls (ops/interpolate.py) produce dot outputs whose minor
dim is W, so XLA threads NHCW layouts into the adjacent 1/2-resolution
convolutions and pays ~0.6-0.9 ms/pair of fused relayout work at 640x480
B=32 (op-level trace: the fpn_fine conv fusion reads
bf16[64,240,256,320]{2,3,1,0} and emits {3,0,2,1}).  This kernel does both
1-D interpolations as VMEM-resident MXU matmuls with lane-preserving
sublane transposes, so inputs AND outputs stay canonical NHWC and the convs
keep their fast layout.

Semantics identical to upsample2x_matmul / F.interpolate(align_corners=True)
(resnet_fpn.py:110,114): same [2N, N] two-tap interpolation matrices, H pass
then W pass, f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loftr_tpu.ops.interpolate import _interp_matrix
from loftr_tpu.ops.pallas.dual_softmax import _auto_interpret


def _upsample_kernel(x_ref, ah_ref, aw_ref, out_ref):
    """x [1, h, w, Cb]; ah [R2, h]; aw [2w, w]; out [1, R2, 2w, Cb]."""
    h, w, cb = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    r2 = ah_ref.shape[0]
    dt = x_ref.dtype
    f32 = jnp.float32

    x2d = x_ref[0].reshape(h, w * cb)
    t = jnp.dot(ah_ref[:], x2d, preferred_element_type=f32)   # [R2, w*Cb]
    t3 = t.astype(dt).reshape(r2, w, cb).swapaxes(0, 1)       # [w, R2, Cb]
    y = jnp.dot(aw_ref[:], t3.reshape(w, r2 * cb),
                preferred_element_type=f32)                   # [2w, R2*Cb]
    y3 = y.astype(dt).reshape(2 * w, r2, cb).swapaxes(0, 1)   # [R2, 2w, Cb]
    out_ref[0] = y3


@functools.partial(jax.jit, static_argnames=("interpret",))
@jax.named_scope("pallas_upsample2x")
def upsample2x_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x: [B, H, W, C] -> [B, 2H, 2W, C], align_corners=True bilinear."""
    b, h, w, c = x.shape
    dt = x.dtype
    ah = jnp.asarray(_interp_matrix(h, 2 * h)).astype(dt)  # [2H, H]
    aw = jnp.asarray(_interp_matrix(w, 2 * w)).astype(dt)  # [2W, W]

    # Mosaic block constraints: the channel block must be a multiple of 128
    # or the full dim; the A_h row block (r2) a multiple of 8 or the full
    # dim; r2 must divide 2h.  The full-h input slab plus Mosaic's double
    # buffering dominates VMEM, so keep r2 small at large h.
    cb = 128 if c % 128 == 0 else c

    def vmem(r):
        # calibrated against compiler stack accounting (27.2 MB at
        # r2=24/cb=128, h=120, w=160): ~2x(in+out) buffering + f32 temps
        return 8 * h * w * cb + 30 * r * w * cb

    cands = [d for d in range(2 * h, 0, -1)
             if (2 * h) % d == 0 and (d % 8 == 0 or d == 2 * h)]
    r2 = next((d for d in cands if vmem(d) <= 15 * 2 ** 20), cands[-1])
    grid = (b, (2 * h) // r2, c // cb)

    out = pl.pallas_call(
        _upsample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j, k: (i, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, h), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w, w), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r2, 2 * w, cb),
                               lambda i, j, k: (i, j, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), dt),
        interpret=_auto_interpret(interpret),
    )(x, ah, aw)
    return out
