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
    """x: [B, H, W, C] -> [B, 2H, 2W, C], bilinear, align_corners=True."""
    b, h, w, c = x.shape
    wh = jnp.asarray(_interp_matrix(h, 2 * h))  # [2H, H]
    ww = jnp.asarray(_interp_matrix(w, 2 * w))  # [2W, W]
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x
