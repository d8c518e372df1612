"""Fused Sinkhorn-OT matching (Pallas, TPU).

The XLA OT path (ops/sinkhorn.py + ops/matching.py::sinkhorn_conf)
materializes the [L+1, S+1] coupling matrix and re-reads it ~4x per Sinkhorn
iteration.  Here the couplings are recomputed from the VMEM-resident feature
matrices every pass (sim = f0 f1^T on the MXU is ~free next to HBM traffic):

  per iteration, ONE streaming pass over row tiles:
    u_i = log_mu - lse_j([sim_i + v, alpha + v_bin])   (row update)
    + flash-accumulated column stats of (sim + u_new)  (for the v update)
  dustbin row/column updates are O(L+S) closed forms done in plain JAX.

  final pass: conf_ij = exp(sim + u_i + v_j + log(L+S)) on the fly ->
  per-row best value/index + per-column conf max (+ the logit maxima needed
  for the skh_prefilter rule), same epilogue contract as the dual-softmax
  kernel.

Semantics match ops/sinkhorn.py::log_optimal_transport (same update order:
u from current v, then v from new u) - verified in tests/test_pallas_match.py.
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


def _u_kernel(sim_scale, f0_ref, f1_ref, m0_ref, m1_ref, v_ref, scal_ref,
              u_ref, colmax_ref, colsum_ref):
    """One Sinkhorn half-iteration over a row tile.

    m0_ref [TL,1] / m1_ref [1,Sp]: validity vectors (outer product = pair
    mask; no [L,S] bias array - VMEM budget at 840x840).
    scal_ref (SMEM [3]): [alpha + v_bin, log_mu (=-log(L+S)), pad].
    v_ref: [1, Sp] current column potentials.
    Outputs: u (new, per row), flash-accumulated colmax/colsum of
    (sim + u_new) over row tiles.
    """
    i = pl.program_id(0)
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * sim_scale
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * (-NEG)
    av_bin = scal_ref[0, 0]
    log_mu = scal_ref[0, 1]

    t = sim + v_ref[:]                                    # [TL, Sp]
    m = jnp.maximum(jnp.max(t, axis=1, keepdims=True), av_bin)
    lse = m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True) +
                      jnp.exp(av_bin - m))
    u_new = log_mu - lse                                  # [TL, 1]
    u_ref[:] = u_new

    z2 = sim + u_new                                      # [TL, Sp]
    tile_cmax = jnp.max(z2, axis=0, keepdims=True)
    tile_csum = jnp.sum(jnp.exp(z2 - tile_cmax), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        colmax_ref[:] = tile_cmax
        colsum_ref[:] = tile_csum

    @pl.when(i > 0)
    def _():
        old = colmax_ref[:]
        new = jnp.maximum(old, tile_cmax)
        colsum_ref[:] = colsum_ref[:] * jnp.exp(old - new) + \
            tile_csum * jnp.exp(tile_cmax - new)
        colmax_ref[:] = new


def _ot_best_kernel(sim_scale, f0_ref, f1_ref, m0_ref, m1_ref, u_ref, v_ref, scal_ref,
                    best_val_ref, best_j_ref, colconf_ref, rowlog_ref,
                    collog_ref):
    """Final pass: conf = exp(sim + u + v + log(L+S)) on the fly.

    scal_ref (SMEM [1]): [log(L+S)].
    Outputs: per-row best conf value/index; accumulated per-column conf max;
    per-row max of (sim + v) and per-column max of (sim + u) (for the
    dustbin prefilter comparisons)."""
    i = pl.program_id(0)
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * sim_scale
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * (-NEG)
    logits = sim + u_ref[:] + v_ref[:] + scal_ref[0, 0]
    conf = jnp.exp(logits)

    best_val_ref[:] = jnp.max(conf, axis=1, keepdims=True)
    best_j_ref[:] = jnp.argmax(conf, axis=1,
                               keepdims=True).astype(jnp.int32)
    rowlog_ref[:] = jnp.max(sim + v_ref[:], axis=1, keepdims=True)

    tile_colmax = jnp.max(conf, axis=0, keepdims=True)
    tile_collog = jnp.max(sim + u_ref[:], axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        colconf_ref[:] = tile_colmax
        collog_ref[:] = tile_collog

    @pl.when(i > 0)
    def _():
        colconf_ref[:] = jnp.maximum(colconf_ref[:], tile_colmax)
        collog_ref[:] = jnp.maximum(collog_ref[:], tile_collog)


def _ot_best_filtered_kernel(sim_scale, f0_ref, f1_ref, m0_ref, m1_ref, u_ref, v_ref,
                             filt0_ref, filt1_ref, scal_ref,
                             best_val_ref, best_j_ref, colconf_ref):
    """Epilogue with the skh_prefilter applied EXACTLY: conf is zeroed on
    rows/columns whose assignment argmax is the dustbin (filt* are 0/1 keep
    vectors), THEN the per-row best and per-column max are taken - matching
    the XLA path where a row whose best column was filtered falls back to
    its best unfiltered column (coarse_matching.py:136-140 semantics
    composed with the MNN selection)."""
    i = pl.program_id(0)
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * sim_scale
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * (-NEG)
    logits = sim + u_ref[:] + v_ref[:] + scal_ref[0, 0]
    conf = jnp.exp(logits) * filt0_ref[:] * filt1_ref[:]

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


@functools.partial(jax.jit,
                   static_argnames=("iters", "tile_l", "interpret",
                                    "prefilter"))
@jax.named_scope("pallas_sinkhorn")
def fused_sinkhorn_match(feat0: jax.Array, feat1: jax.Array,
                         bin_score: jax.Array, iters: int = 3,
                         mask0: Optional[jax.Array] = None,
                         mask1: Optional[jax.Array] = None,
                         tile_l: int = 256, interpret: bool = False,
                         prefilter: bool = False):
    """Per-pair fused OT matcher core.

    feat0: [L, C]; feat1: [S, C] raw transformer features (the 1/sqrt(C)
    scaling is applied here, matching sinkhorn_conf).
    Returns (best_val [L], best_j [L], colconf [S],
             prefilter0 [L], prefilter1 [S]) where prefilter* flag rows/cols
    whose assignment argmax is the dustbin (coarse_matching.py:136-140).
    With prefilter=True, best_val/best_j/colconf are computed over the
    coupling with those rows/columns zeroed (exact skh_prefilter
    semantics), at the cost of one extra streaming pass.
    """
    interpret = _auto_interpret(interpret)
    L, C = feat0.shape
    S = feat1.shape[0]
    f32 = jnp.float32
    # sim = f0.f1/C, applied to the f32 dot in-kernel (no scaled HBM
    # copies of the feature matrices; better numerics than bf16 pre-scale)
    sim_scale = 1.0 / C
    f0, f1 = feat0, feat1
    alpha = jnp.asarray(bin_score, f32)

    # shrink the row tile at large S so the ~3 f32 [tile_l, Sp] in-kernel
    # temporaries fit the 16 MB scoped-VMEM limit (same issue as
    # dual_softmax.py; observed at the 840x840 MegaDepth shape, S=11136)
    Sp_est = (S + 127) // 128 * 128
    while tile_l > 8 and 3 * tile_l * Sp_est * 4 > 10 * 2 ** 20:
        tile_l //= 2

    Lp = (L + tile_l - 1) // tile_l * tile_l
    Sp = (S + 127) // 128 * 128
    f0 = _pad_to(f0, Lp, 0)
    f1 = _pad_to(f1, Sp, 0)
    from loftr_tpu.ops.pallas.dual_softmax import make_mask_vectors
    m0v, m1v = make_mask_vectors(L, S, Lp, Sp, mask0, mask1)
    # geometric padding vs mask-invalid: the dustbin row/column spans ALL
    # real rows/cols (bins are alpha regardless of the pair mask,
    # coarse_matching.py:121-131), so only j >= S / i >= L are excluded
    # from the dustbin lses.
    col_real = jnp.arange(Sp) < S
    row_real = jnp.arange(Lp) < L

    norm = -jnp.log(jnp.asarray(L + S, f32))
    log_mu_bin = jnp.log(jnp.asarray(S, f32)) + norm
    log_nu = norm
    log_nu_bin = jnp.log(jnp.asarray(L, f32)) + norm

    grid = (Lp // tile_l,)
    row_spec = pl.BlockSpec((tile_l, f0.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((Sp, f1.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    m0_spec = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    rowout_spec = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    colin_spec = pl.BlockSpec((1, Sp), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    u = jnp.zeros((Lp, 1), f32)
    u_bin = jnp.zeros((), f32)
    v = jnp.zeros((1, Sp), f32)
    v_bin = jnp.zeros((), f32)

    def lse(x):
        return jax.nn.logsumexp(x)

    for _ in range(iters):
        # dustbin-row update from current v (z[L, :] = alpha everywhere)
        v_full_real = jnp.where(col_real, v[0], -jnp.inf)
        u_bin = log_mu_bin - (alpha + lse(
            jnp.concatenate([v_full_real, v_bin[None]])))
        scal = jnp.stack([alpha + v_bin, norm, 0.0]).reshape(1, 3)
        u, colmax, colsum = pl.pallas_call(
            functools.partial(_u_kernel, sim_scale),
            grid=grid,
            in_specs=[row_spec, full_spec, m0_spec, colin_spec, colin_spec,
                      pl.BlockSpec((1, 3), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowout_spec, colin_spec, colin_spec),
            out_shape=(jax.ShapeDtypeStruct((Lp, 1), f32),
                       jax.ShapeDtypeStruct((1, Sp), f32),
                       jax.ShapeDtypeStruct((1, Sp), f32)),
            interpret=interpret,
        )(f0, f1, m0v, m1v, v, scal)
        # v update from new u: per real column, lse over rows + dustbin row
        col_lse = colmax[0] + jnp.log(jnp.maximum(colsum[0], 1e-38))
        col_total = jnp.logaddexp(col_lse, alpha + u_bin)
        v = jnp.where(col_real, log_nu - col_total, 0.0)[None, :]
        # dustbin column: z[:, S] = alpha for all real rows (incl corner)
        u_full_real = jnp.where(row_real, u[:, 0], -jnp.inf)
        v_bin = log_nu_bin - (alpha + lse(
            jnp.concatenate([u_full_real, u_bin[None]])))

    scal2 = jnp.stack([-norm]).reshape(1, 1)  # log(L+S)
    best_val, best_j, colconf, rowlog, collog = pl.pallas_call(
        functools.partial(_ot_best_kernel, sim_scale),
        grid=grid,
        in_specs=[row_spec, full_spec, m0_spec, colin_spec, rowout_spec,
                  colin_spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(rowout_spec,
                   pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   colin_spec, rowout_spec, colin_spec),
        out_shape=(jax.ShapeDtypeStruct((Lp, 1), f32),
                   jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, Sp), f32),
                   jax.ShapeDtypeStruct((Lp, 1), f32),
                   jax.ShapeDtypeStruct((1, Sp), f32)),
        interpret=interpret,
    )(f0, f1, m0v, m1v, u, v, scal2)

    # prefilter: row/col argmax of the assignment (incl. dustbin) is the bin
    prefilter0 = (alpha + v_bin) > rowlog[:L, 0]
    prefilter1 = (alpha + u_bin) > collog[0, :S]

    if prefilter:
        # exact filtered epilogue: one more streaming pass with the
        # dustbin-dominated rows/columns zeroed before best/colmax
        filt0 = _pad_to((~prefilter0).astype(f32)[:, None], Lp, 0)
        filt1 = _pad_to((~prefilter1).astype(f32)[None, :], Sp, 1)
        best_val, best_j, colconf = pl.pallas_call(
            functools.partial(_ot_best_filtered_kernel, sim_scale),
            grid=grid,
            in_specs=[row_spec, full_spec, m0_spec, colin_spec, rowout_spec,
                      colin_spec, m0_spec, colin_spec,
                      pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(rowout_spec,
                       pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       colin_spec),
            out_shape=(jax.ShapeDtypeStruct((Lp, 1), f32),
                       jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
                       jax.ShapeDtypeStruct((1, Sp), f32)),
            interpret=interpret,
        )(f0, f1, m0v, m1v, u, v, filt0, filt1, scal2)

    return (best_val[:L, 0], best_j[:L, 0], colconf[0, :S],
            prefilter0, prefilter1)
