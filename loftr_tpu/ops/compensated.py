"""Double-float (compensated) arithmetic primitives for TPU.

A "df" value is an unevaluated sum hi + lo of two same-dtype floats with
|lo| <= ulp(hi)/2, giving ~2x the mantissa bits of the base dtype (f32 df
~= 48-bit mantissa).  Classic error-free transformations (Dekker 1971,
Knuth TwoSum) — no FMA assumed, which matters on the TPU VPU.

XLA does not reassociate floating-point adds/muls by default, so the
cancellation patterns below survive jit compilation (unit-checked in
tests/test_compensated.py, including under jit).

Used by eval/five_point_tpu.py: the Gauss-Newton polish of near-double
roots needs residuals evaluated beyond f32 — plain f32 evaluation of the
cubic essential constraints carries ~1e-7 absolute noise, which a twisted
pair's quadratic residual geometry turns into ~1e-3 parameter error.

All ops are elementwise over arbitrary (broadcastable) array shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

DF = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo)


def _split_const(dtype) -> float:
    # Dekker splitter 2^ceil(p/2) + 1: p=24 -> 2^12+1, p=53 -> 2^27+1
    return 4097.0 if jnp.dtype(dtype) == jnp.float32 else 134217729.0


def two_sum(a, b) -> DF:
    """Exact a + b = s + e (Knuth, no magnitude assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b) -> DF:
    """Exact a + b = s + e, requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def two_prod(a, b) -> DF:
    """Exact a * b = p + e via Dekker splitting (FMA-free)."""
    p = a * b
    c = _split_const(jnp.result_type(a, b))
    ca = c * a
    ah = ca - (ca - a)
    al = a - ah
    cb = c * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df(x) -> DF:
    """Promote a plain float array to df."""
    return x, jnp.zeros_like(x)


def df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x[0], y[0])
    return quick_two_sum(s, e + x[1] + y[1])


def df_neg(x: DF) -> DF:
    return -x[0], -x[1]

def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x[0], y[0])
    return quick_two_sum(p, e + x[0] * y[1] + x[1] * y[0])


def df_scale(x: DF, s) -> DF:
    """Multiply by an exact scalar (e.g. 2.0)."""
    return x[0] * s, x[1] * s


def df_div(x: DF, y: DF) -> DF:
    """Double-float division (two Newton correction terms)."""
    q1 = x[0] / y[0]
    r = df_sub(x, df_mul((q1, jnp.zeros_like(q1)), y))
    q2 = (r[0] + r[1]) / y[0]
    return quick_two_sum(q1, q2)


def df_const(v, dtype=jnp.float32) -> DF:
    """Split a host f64 constant array into a df pair of `dtype`."""
    import numpy as np
    hi = np.asarray(v, np.float64).astype(np.dtype(dtype))
    lo = (np.asarray(v, np.float64) - hi.astype(np.float64)).astype(
        np.dtype(dtype))
    return jnp.asarray(hi), jnp.asarray(lo)


def df_sum(*xs: DF) -> DF:
    acc = xs[0]
    for x in xs[1:]:
        acc = df_add(acc, x)
    return acc


def df_hi(x: DF):
    """Round df back to the base dtype."""
    return x[0] + x[1]
