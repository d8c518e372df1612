"""2-D sinusoidal position encoding.

Matches /root/reference/src/loftr/utils/position_encoding.py:6-42, including
the ``temp_bug_fix`` compatibility flag: released pre-fix checkpoints were
trained with ``div_term = exp(arange(0,C//2,2) * ((-log 1e4 / C) // 2))``
(a floor-division typo); the fixed version divides by C//2.  Both are kept so
either family of converted checkpoints reproduces bit-exact encodings.

Positions are 1-based (cumsum-of-ones, position_encoding.py:23-24).
Layout here is NHWC: pe[h, w, c] with channels interleaved in groups of 4:
(sin x, cos x, sin y, cos y) per frequency.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _pe_table(d_model: int, h: int, w: int, temp_bug_fix: bool) -> np.ndarray:
    """[h, w, d_model] float32 table (computed once per shape on host)."""
    if temp_bug_fix:
        exponent = np.arange(0, d_model // 2, 2, dtype=np.float64) * (
            -math.log(10000.0) / (d_model // 2))
    else:  # reproduce the buggy `(-log(1e4) / d_model) // 2` exactly
        exponent = np.arange(0, d_model // 2, 2, dtype=np.float64) * (
            (-math.log(10000.0) / d_model) // 2)
    div_term = np.exp(exponent)  # [C//4]

    y_pos = np.arange(1, h + 1, dtype=np.float64)[:, None, None]  # [h,1,1]
    x_pos = np.arange(1, w + 1, dtype=np.float64)[None, :, None]  # [1,w,1]
    pe = np.zeros((h, w, d_model), np.float64)
    pe[:, :, 0::4] = np.sin(x_pos * div_term)
    pe[:, :, 1::4] = np.cos(x_pos * div_term)
    pe[:, :, 2::4] = np.sin(y_pos * div_term)
    pe[:, :, 3::4] = np.cos(y_pos * div_term)
    return pe.astype(np.float32)


def add_position_encoding(x, temp_bug_fix: bool = True):
    """x: [B, H, W, C] -> x + PE[:H, :W] (position_encoding.py:37-42)."""
    b, h, w, c = x.shape
    pe = jnp.asarray(_pe_table(c, h, w, temp_bug_fix), dtype=x.dtype)
    return x + pe[None]
