"""Bilinear upsampling with align_corners=True semantics, as dense matmuls.

The reference FPN upsamples with
``F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)``
(/root/reference/src/loftr/backbone/resnet_fpn.py:110,114).  ``jax.image.resize``
implements half-pixel-center sampling only, so align-corners is expressed here
as two small dense interpolation matrices applied along H and W - separable
1-D linear interpolation that XLA maps straight onto the MXU (better than a
gather on TPU for these sizes, H,W <= ~512).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] align-corners linear interpolation weights."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    w = np.zeros((n_out, n_in), np.float64)
    w[np.arange(n_out), lo] = 1.0 - frac
    w[np.arange(n_out), lo + 1] = frac
    return w.astype(np.float32)


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """x: [B, H, W, C] -> [B, 2H, 2W, C], bilinear, align_corners=True.

    The interpolation matmuls run in the feature dtype: with f32 weights the
    einsum promotes bf16 features to f32, materializing the 2x-upsampled FPN
    tensor (e.g. [2B, H/2, W/2, 196] at 640x480) in f32 plus an extra layout
    copy — measured ~1 ms/pair of pure HBM traffic on v5e. Two-tap weights
    in bf16 are within the bf16 feature error budget; the MXU still
    accumulates in f32 internally.
    """
    b, h, w, c = x.shape
    dt = x.dtype
    wh = jnp.asarray(_interp_matrix(h, 2 * h)).astype(dt)  # [2H, H]
    ww = jnp.asarray(_interp_matrix(w, 2 * w)).astype(dt)  # [2W, W]
    x = jnp.einsum("oh,bhwc->bowc", wh, x)   # dtype-preserving: bf16 stays
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)   # bf16 in HBM (f32 MXU accum)
    return x
