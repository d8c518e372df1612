"""Fused dual-softmax + mutual-nearest-neighbor matching (Pallas, TPU).

The XLA inference path materializes conf = softmax_rows(sim)*softmax_cols(sim)
as a full [L, S] fp32 matrix and re-reads it for row/col maxima and MNN
(ops/matching.py; reference behavior at coarse_matching.py:112-119,174-196).
At 640x480 that is a 92 MB tensor touched several times per pair - pure HBM
traffic.

This kernel never materializes conf.  Streaming passes over row tiles,
recomputing the sim tile from the (VMEM-resident) feature matrices each time
- FLOPs are ~free on the MXU relative to HBM:

  pass 1: row softmax stats (max, sumexp) + flash-style accumulated column
          stats (running max/sumexp with rescale);
  pass 2: conf tile on the fly -> per-row best value/index + accumulated
          per-column conf maximum;
  epilogue (plain JAX, [L]-sized): thr/border/MNN checks
          (valid iff best_val > thr and best_val == colconfmax[best_j]).

Validity (MegaDepth padding masks) and geometric padding are handled with
per-row/per-column mask VECTORS whose outer product is applied in-kernel -
no [L, S] bias array exists in any path (critical for VMEM at 840x840,
where a [128, 11136] fp32 bias tile alone would blow the 16MB budget).

Outputs feed the same CandidateMatches/top-K machinery as the XLA path,
which remains the oracle (tested in tests/test_pallas_match.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _auto_interpret(flag: bool) -> bool:
    """Pallas TPU kernels run interpreted on non-TPU backends (CPU tests,
    fake-device meshes)."""
    import jax as _jax
    return flag or _jax.default_backend() != "tpu"


def _stats_kernel(sim_scale, f0_ref, f1_ref, m0_ref, m1_ref,
                  rowmax_ref, rowsum_ref, colmax_ref, colsum_ref):
    """Pass 1. f0 [TL,C] row tile; f1 [Sp,C] resident; m0 [TL,1], m1 [1,Sp]
    validity vectors (0/1 incl. geometric padding).  Row stats per tile;
    column stats flash-accumulated across the sequential grid.

    sim_scale (python float closure) applies the 1/(C*temperature) dual-
    softmax normalization to the f32 dot product in-kernel, so the raw
    feature matrices are kernel inputs directly — no scaled [L, C]/[S, C]
    copies ever hit HBM."""
    i = pl.program_id(0)
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * sim_scale
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * (-NEG)
    rmax = jnp.max(sim, axis=1, keepdims=True)
    rowmax_ref[:] = rmax
    rowsum_ref[:] = jnp.sum(jnp.exp(sim - rmax), axis=1, keepdims=True)

    tile_cmax = jnp.max(sim, axis=0, keepdims=True)
    tile_csum = jnp.sum(jnp.exp(sim - tile_cmax), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        colmax_ref[:] = tile_cmax
        colsum_ref[:] = tile_csum

    @pl.when(i > 0)
    def _():
        old_max = colmax_ref[:]
        new_max = jnp.maximum(old_max, tile_cmax)
        colsum_ref[:] = colsum_ref[:] * jnp.exp(old_max - new_max) + \
            tile_csum * jnp.exp(tile_cmax - new_max)
        colmax_ref[:] = new_max


def _best_kernel(sim_scale, f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref,
                 rowsum_ref, colmax_ref, colsum_ref,
                 best_val_ref, best_j_ref, colconf_ref):
    """Pass 2: conf tile on the fly; row best + accumulated column conf max."""
    i = pl.program_id(0)
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * sim_scale
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * (-NEG)
    row_sm = jnp.exp(sim - rowmax_ref[:]) / rowsum_ref[:]
    col_sm = jnp.exp(sim - colmax_ref[:]) / colsum_ref[:]
    conf = row_sm * col_sm

    best_val_ref[:] = jnp.max(conf, axis=1, keepdims=True)
    best_j_ref[:] = jnp.argmax(conf, axis=1,
                               keepdims=True).astype(jnp.int32)
    tile_colmax = jnp.max(conf, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        colconf_ref[:] = tile_colmax

    @pl.when(i > 0)
    def _():
        colconf_ref[:] = jnp.maximum(colconf_ref[:], tile_colmax)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def make_mask_vectors(L, S, Lp, Sp, mask0, mask1):
    """[Lp,1], [1,Sp] fp32 validity vectors folding padding + user masks."""
    m0 = jnp.ones((L,), jnp.float32) if mask0 is None else \
        mask0.astype(jnp.float32)
    m1 = jnp.ones((S,), jnp.float32) if mask1 is None else \
        mask1.astype(jnp.float32)
    m0 = _pad_to(m0, Lp, 0, value=0.0)
    m1 = _pad_to(m1, Sp, 0, value=0.0)
    return m0[:, None], m1[None, :]


@functools.partial(jax.jit,
                   static_argnames=("temperature", "tile_l", "interpret"))
@jax.named_scope("pallas_dual_softmax")
def _fused_dual_softmax_core(feat0: jax.Array, feat1: jax.Array,
                             temperature: float = 0.1,
                             mask0: Optional[jax.Array] = None,
                             mask1: Optional[jax.Array] = None,
                             tile_l: int = 128,
                             interpret: bool = False
                             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-pair fused matcher core.

    feat0: [L, C]; feat1: [S, C] (raw transformer outputs; the 1/sqrt(C) and
    1/temperature scaling is applied here, matching dual_softmax_conf).
    mask0: [L] / mask1: [S] optional padding masks.
    Returns (best_val [L], best_j [L] int32, colconfmax [S]).
    vmap over the batch axis for batched pairs.
    """
    interpret = _auto_interpret(interpret)
    L, C = feat0.shape
    S = feat1.shape[0]
    # sim = f0.f1/(C*T), applied to the f32 dot in-kernel (better numerics
    # than pre-scaling bf16 operands, and no scaled [L, C] copies of the feats)
    sim_scale = 1.0 / (C * float(temperature))
    f0, f1 = feat0, feat1

    # VMEM budget: f1 stays resident ([Sp, C] bf16) and each row tile holds
    # ~3 f32 [tile_l, Sp] temporaries (sim + exp copies).  At large S the
    # default tile blows the 16 MB scoped limit (observed: 17.3 MB at
    # S=11136, the 840x840 MegaDepth shape) - shrink the row tile to fit
    # ~10 MB of temporaries.
    Sp_est = (S + 127) // 128 * 128
    while tile_l > 8 and 3 * tile_l * Sp_est * 4 > 10 * 2 ** 20:
        tile_l //= 2

    Lp = (L + tile_l - 1) // tile_l * tile_l
    Sp = (S + 127) // 128 * 128
    f0 = _pad_to(f0, Lp, 0)
    f1 = _pad_to(f1, Sp, 0)
    m0v, m1v = make_mask_vectors(L, S, Lp, Sp, mask0, mask1)

    grid = (Lp // tile_l,)
    row_spec = pl.BlockSpec((tile_l, f0.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((Sp, f1.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    m0_spec = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    m1_spec = pl.BlockSpec((1, Sp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    rowout_spec = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    colout_spec = pl.BlockSpec((1, Sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    rowmax, rowsum, colmax, colsum = pl.pallas_call(
        functools.partial(_stats_kernel, sim_scale),
        grid=grid,
        in_specs=[row_spec, full_spec, m0_spec, m1_spec],
        out_specs=(rowout_spec, rowout_spec, colout_spec, colout_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Sp), jnp.float32),
            jax.ShapeDtypeStruct((1, Sp), jnp.float32),
        ),
        interpret=interpret,
    )(f0, f1, m0v, m1v)

    best_val, best_j, colconf = pl.pallas_call(
        functools.partial(_best_kernel, sim_scale),
        grid=grid,
        in_specs=[row_spec, full_spec, m0_spec, m1_spec, rowout_spec,
                  rowout_spec, colout_spec, colout_spec],
        out_specs=(rowout_spec,
                   pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   colout_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, Sp), jnp.float32),
        ),
        interpret=interpret,
    )(f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum)

    return (best_val[:L, 0], best_j[:L, 0],
            colconf[0, :S])


# Match selection is non-differentiable by design (the reference wraps it in
# @torch.no_grad, coarse_matching.py:150): declare a zero-gradient VJP so
# the kernel never enters a linearization trace (pallas_call has no JVP
# rule, and interpret-mode tracing breaks under grad even off-path).
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6))
def fused_dual_softmax_match(feat0, feat1, temperature=0.1,
                             mask0=None, mask1=None,
                             tile_l=128, interpret=False):
    return _fused_dual_softmax_core(feat0, feat1, temperature, mask0, mask1,
                                    tile_l, interpret)


def _match_fwd(feat0, feat1, temperature, mask0, mask1, tile_l, interpret):
    out = _fused_dual_softmax_core(feat0, feat1, temperature, mask0, mask1,
                                   tile_l, interpret)
    # residuals alias the inputs (no extra memory under jit); bwd only needs
    # their shapes/dtypes for the zero cotangents
    return out, (feat0, feat1)


def _match_bwd(temperature, tile_l, interpret, res, _g):
    f0, f1 = res
    return (jnp.zeros_like(f0), jnp.zeros_like(f1), None, None)


fused_dual_softmax_match.defvjp(_match_fwd, _match_bwd)
