"""Bilinear x2 upsampling with align_corners=True semantics.

The reference FPN upsamples with
``F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)``
(/root/reference/src/loftr/backbone/resnet_fpn.py:110,114).  ``jax.image.resize``
implements half-pixel-center sampling only, so align-corners is implemented
here directly, as separable 1-D linear interpolation.

Two implementations:

- ``gather`` (default): static-index row gathers along H then W plus a
  two-tap lerp.  Keeps the tensor in canonical NHWC (C-minor) layout, so
  surrounding convolutions stay in their fast layout.  This matters a lot:
  the earlier matmul formulation's dot_general outputs were W-minor, and
  XLA layout assignment then threaded NHCW layouts through the 1/2-res conv
  chain, paying ~1 ms/pair of fused relayout work at 640x480 B=32 (seen
  directly in the op-level trace: [64,240,256,320]->[64,240,320,256]
  transpose-fusions around the FPN convs).
- ``matmul``: the original pair of dense [2N, N] interpolation matmuls
  (MXU work, but layout-hostile).  Kept as the oracle for tests.
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


@functools.lru_cache(maxsize=64)
def _lerp_taps(n_in: int, n_out: int):
    """Static (lo, hi, frac) tap arrays for align-corners 1-D interp."""
    if n_in == 1:
        z = np.zeros(n_out, np.int32)
        return z, z, np.zeros(n_out, np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int32), 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    return lo, lo + 1, frac


def upsample2x_matmul(x: jax.Array) -> jax.Array:
    """Matmul formulation (layout-hostile; test oracle)."""
    b, h, w, c = x.shape
    dt = x.dtype
    wh = jnp.asarray(_interp_matrix(h, 2 * h)).astype(dt)  # [2H, H]
    ww = jnp.asarray(_interp_matrix(w, 2 * w)).astype(dt)  # [2W, W]
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x


def upsample2x_gather(x: jax.Array) -> jax.Array:
    """Gather+lerp formulation.  MEASURED SLOWER end-to-end than the matmul
    form on v5e (98 vs 122 pairs/s in bench.py): TPU lowers the static row
    gathers on the big 1/2-res tensors poorly, costing more than the NHCW
    relayouts it avoids.  Kept for reference/CPU.
    """
    b, h, w, c = x.shape
    dt = x.dtype
    lo_h, hi_h, f_h = _lerp_taps(h, 2 * h)
    lo_w, hi_w, f_w = _lerp_taps(w, 2 * w)
    fh = jnp.asarray(f_h).astype(dt)[None, :, None, None]
    x = x[:, lo_h] * (1 - fh) + x[:, hi_h] * fh
    fw = jnp.asarray(f_w).astype(dt)[None, None, :, None]
    x = x[:, :, lo_w] * (1 - fw) + x[:, :, hi_w] * fw
    return x


# Default: the matmul form.  See upsample2x_gather's note - the gather
# variant measured slower end-to-end despite its friendlier layout.
upsample2x_align_corners = upsample2x_matmul
