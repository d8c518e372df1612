"""Fused dense focal coarse loss with custom VJP (Pallas, TPU).

Training's dense focal loss (losses.py::coarse_loss, reference
loftr_loss.py:87-94) evaluates focal terms over every cell of
conf = softmax_rows(sim) * softmax_cols(sim) - the XLA path materializes the
[B, L, S] confidence matrix for the forward AND keeps it (plus several
same-sized intermediates) alive for autodiff.  At 640x480 training that is
~92 MB fp32 per pair times several buffers.

This kernel pair computes the loss and its feature gradients with O(L + S)
memory, recomputing sim tiles from the VMEM-resident features:

forward:
  pass 1: row/col softmax stats of sim (shared shape with the inference
          matching kernel);
  pass 2: per-tile conf on the fly -> accumulated positive/negative focal
          sums (GT arrives as the per-row static table gt_j/gt_valid - one
          scatter-free comparison per tile).

backward (closed form through both softmax normalizations):
  with A_ij = g'(conf_ij) * w_ij * conf_ij,
       Srow_i = sum_j A_ij,  Scol_j = sum_i A_ij:
    dL/dsim_ij = 2 A_ij - r_ij Srow_i - c_ij Scol_j
  (r/c the row/col softmaxes), then dfeat0 = dsim @ f1 * scale and
  dfeat1 = dsim^T @ f0 * scale:
  pass B1: accumulate Srow [L], Scol [S];
  pass B2: dsim tile -> dfeat0 tile directly + flash-accumulated dfeat1.

Verified against jax.grad of the XLA path in tests/test_pallas_loss.py.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loftr_tpu.ops.pallas.dual_softmax import (_auto_interpret, _pad_to,
                                               _stats_kernel,
                                               make_mask_vectors)

EPS = 1e-6  # conf clamp (loftr_loss.py:53)


def _named_pallas_call(scope: str, *args, **kw):
    """pallas_call whose device op carries `scope` in the profiler's
    framework-op path (tools/trace_ledger.py attributes the per-kernel
    split of the 'pallas-custom-call' category from it)."""

    def call(*operands):
        with jax.named_scope(scope):
            return pl.pallas_call(*args, **kw)(*operands)

    return call


def _focal_terms(conf, is_pos, alpha, gamma):
    """Per-cell focal loss value and d/dconf, with the clamp's zero-gradient
    outside [EPS, 1-EPS] (torch.clamp backward semantics)."""
    c = jnp.clip(conf, EPS, 1.0 - EPS)
    in_range = ((conf > EPS) & (conf < 1.0 - EPS)).astype(conf.dtype)
    loss_pos = -alpha * (1 - c) ** gamma * jnp.log(c)
    loss_neg = -alpha * c ** gamma * jnp.log(1 - c)
    dpos = -alpha * (-gamma * (1 - c) ** (gamma - 1) * jnp.log(c) +
                     (1 - c) ** gamma / c)
    dneg = -alpha * (gamma * c ** (gamma - 1) * jnp.log(1 - c) -
                     c ** gamma / (1 - c))
    loss = jnp.where(is_pos, loss_pos, loss_neg)
    dloss = jnp.where(is_pos, dpos, dneg) * in_range
    return loss, dloss


def _conf_tile(f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref, rowsum_ref,
               colmax_ref, colsum_ref):
    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32)
    sim = sim + (m0_ref[:] * m1_ref[:] - 1.0) * 1e9
    r = jnp.exp(sim - rowmax_ref[:]) / rowsum_ref[:]
    c = jnp.exp(sim - colmax_ref[:]) / colsum_ref[:]
    return r, c


def _gt_tile(gtj_ref, gtv_ref, Sp):
    """[TL, Sp] one-hot GT from the per-row table."""
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1)
    return (col_ids == gtj_ref[:]) & (gtv_ref[:] > 0)


def _loss_kernel(alpha, gamma, f0_ref, f1_ref, m0_ref, m1_ref,
                 rowmax_ref, rowsum_ref, colmax_ref, colsum_ref,
                 gtj_ref, gtv_ref,
                 pos_ref, neg_ref):
    """Forward pass 2: accumulate pos/neg focal sums (weight = m0*m1)."""
    i = pl.program_id(0)
    Sp = f1_ref.shape[0]
    r, c = _conf_tile(f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref,
                      rowsum_ref, colmax_ref, colsum_ref)
    conf = r * c
    is_pos = _gt_tile(gtj_ref, gtv_ref, Sp)
    w = m0_ref[:] * m1_ref[:]
    loss, _ = _focal_terms(conf, is_pos, alpha, gamma)
    pos_sum = jnp.sum(jnp.where(is_pos, loss * w, 0.0))
    neg_sum = jnp.sum(jnp.where(is_pos, 0.0, loss * w))

    @pl.when(i == 0)
    def _():
        pos_ref[:] = pos_sum.reshape(1, 1)
        neg_ref[:] = neg_sum.reshape(1, 1)

    @pl.when(i > 0)
    def _():
        pos_ref[:] = pos_ref[:] + pos_sum.reshape(1, 1)
        neg_ref[:] = neg_ref[:] + neg_sum.reshape(1, 1)


def _a_tile(alpha, gamma, gpos, gneg, f0_ref, f1_ref, m0_ref, m1_ref,
            rowmax_ref, rowsum_ref, colmax_ref, colsum_ref, gtj_ref,
            gtv_ref):
    """(A, r, c) for a row tile; A folds the pos/neg upstream scales."""
    Sp = f1_ref.shape[0]
    r, c = _conf_tile(f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref,
                      rowsum_ref, colmax_ref, colsum_ref)
    conf = r * c
    is_pos = _gt_tile(gtj_ref, gtv_ref, Sp)
    w = m0_ref[:] * m1_ref[:]
    _, dloss = _focal_terms(conf, is_pos, alpha, gamma)
    g = jnp.where(is_pos, gpos, gneg)
    A = dloss * w * g * conf
    return A, r, c


def _srow_scol_kernel(alpha, gamma, *refs):
    """Backward pass 1: Srow per row tile; Scol accumulated."""
    (f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref, rowsum_ref, colmax_ref,
     colsum_ref, gtj_ref, gtv_ref, scal_ref,
     srow_ref, scol_ref) = refs
    i = pl.program_id(0)
    A, _, _ = _a_tile(alpha, gamma, scal_ref[0, 0], scal_ref[0, 1], f0_ref,
                      f1_ref, m0_ref, m1_ref, rowmax_ref, rowsum_ref,
                      colmax_ref, colsum_ref, gtj_ref, gtv_ref)
    srow_ref[:] = jnp.sum(A, axis=1, keepdims=True)
    tile_scol = jnp.sum(A, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        scol_ref[:] = tile_scol

    @pl.when(i > 0)
    def _():
        scol_ref[:] += tile_scol


def _grad_kernel(alpha, gamma, scale, *refs):
    """Backward pass 2: dfeat0 row tile + accumulated dfeat1."""
    (f0_ref, f1_ref, m0_ref, m1_ref, rowmax_ref, rowsum_ref, colmax_ref,
     colsum_ref, gtj_ref, gtv_ref, scal_ref, srow_ref, scol_ref,
     df0_ref, df1_ref) = refs
    i = pl.program_id(0)
    A, r, c = _a_tile(alpha, gamma, scal_ref[0, 0], scal_ref[0, 1], f0_ref,
                      f1_ref, m0_ref, m1_ref, rowmax_ref, rowsum_ref,
                      colmax_ref, colsum_ref, gtj_ref, gtv_ref)
    dsim = 2.0 * A - r * srow_ref[:] - c * scol_ref[:]
    df0_ref[:] = jnp.dot(dsim, f1_ref[:],
                         preferred_element_type=jnp.float32) * scale
    tile_df1 = jnp.dot(dsim.T, f0_ref[:],
                       preferred_element_type=jnp.float32) * scale

    @pl.when(i == 0)
    def _():
        df1_ref[:] = tile_df1

    @pl.when(i > 0)
    def _():
        df1_ref[:] += tile_df1


def _specs(tile_l, Lp, Sp, C):
    row = pl.BlockSpec((tile_l, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((Sp, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m0 = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((1, Sp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rowv = pl.BlockSpec((tile_l, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    colv = pl.BlockSpec((1, Sp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return row, full, m0, m1, rowv, colv


def _prep(feat0, feat1, temperature, gt_j, gt_valid, mask0, mask1, tile_l):
    L, C = feat0.shape
    S = feat1.shape[0]
    scale = (1.0 / C ** 0.5) / (temperature ** 0.5)
    f0 = (feat0 * scale).astype(jnp.float32)
    f1 = (feat1 * scale).astype(jnp.float32)
    Lp = (L + tile_l - 1) // tile_l * tile_l
    Sp = (S + 127) // 128 * 128
    f0 = _pad_to(f0, Lp, 0)
    f1 = _pad_to(f1, Sp, 0)
    m0v, m1v = make_mask_vectors(L, S, Lp, Sp, mask0, mask1)
    gtj = _pad_to(gt_j.astype(jnp.int32), Lp, 0, value=-1)[:, None]
    gtv = _pad_to(gt_valid.astype(jnp.float32), Lp, 0)[:, None]
    return f0, f1, m0v, m1v, gtj, gtv, Lp, Sp, scale


def _stats(f0, f1, m0v, m1v, tile_l, Lp, Sp, interpret):
    row, full, m0s, m1s, rowv, colv = _specs(tile_l, Lp, Sp, f0.shape[1])
    # _prep already folded the 1/(C*temperature) normalization into the
    # features (the backward tiles need the scaled copies anyway), so the
    # shared stats kernel runs with sim_scale=1.0.
    return _named_pallas_call(
        "pallas_focal_stats",
        functools.partial(_stats_kernel, 1.0),
        grid=(Lp // tile_l,),
        in_specs=[row, full, m0s, m1s],
        out_specs=(rowv, rowv, colv, colv),
        out_shape=(jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, Sp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Sp), jnp.float32)),
        interpret=interpret,
    )(f0, f1, m0v, m1v)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 7, 8, 9, 10))
def fused_focal_sums(feat0, feat1, temperature, gt_j, gt_valid,
                     mask0, mask1, alpha=0.25, gamma=2.0,
                     tile_l=128, interpret=False):
    """(pos_sum, neg_sum) of the dense focal terms over the dual-softmax
    confidences, fused, differentiable w.r.t. feat0/feat1.

    The caller divides by its own (batch-global) pos/neg counts - autodiff
    routes the resulting cotangents straight into the fused backward.
    feat0 [L, C], feat1 [S, C]; gt_j/gt_valid: per-row GT; masks optional.
    vmap over pairs.
    """
    (p, n), _ = _fused_fwd(feat0, feat1, temperature, gt_j, gt_valid,
                           mask0, mask1, alpha, gamma, tile_l,
                           _auto_interpret(interpret))
    return p, n


def fused_focal_coarse_loss(feat0, feat1, temperature, gt_j, gt_valid,
                            mask0, mask1, alpha=0.25, gamma=2.0,
                            pos_weight=1.0, neg_weight=1.0,
                            tile_l=128, interpret=False):
    """Scalar  pos_w * mean_pos + neg_w * mean_neg  for ONE pair, exactly as
    losses.py::coarse_loss (dense focal branch)."""
    p, n = fused_focal_sums(feat0, feat1, temperature, gt_j, gt_valid,
                            mask0, mask1, alpha, gamma, tile_l, interpret)
    L, S = feat0.shape[0], feat1.shape[0]
    n_pos, n_neg = _counts(gt_valid, L, S)
    mean_pos = jnp.where(n_pos > 0, p / jnp.maximum(n_pos, 1), 0.0)
    mean_neg = jnp.where(n_neg > 0, n / jnp.maximum(n_neg, 1), 0.0)
    return pos_weight * mean_pos + neg_weight * mean_neg


def _counts(gt_valid, L, S):
    """Denominators match the reference .mean() semantics: counts over ALL
    cells of each class; padding weights scale only the numerator."""
    n_pos = jnp.sum(gt_valid.astype(jnp.float32))
    n_neg = jnp.asarray(L * S, jnp.float32) - n_pos
    return n_pos, n_neg


def _fused_fwd(feat0, feat1, temperature, gt_j, gt_valid, mask0, mask1,
               alpha, gamma, tile_l, interpret):
    L, C = feat0.shape
    S = feat1.shape[0]
    f0, f1, m0v, m1v, gtj, gtv, Lp, Sp, scale = _prep(
        feat0, feat1, temperature, gt_j, gt_valid, mask0, mask1, tile_l)
    rowmax, rowsum, colmax, colsum = _stats(f0, f1, m0v, m1v, tile_l, Lp,
                                            Sp, interpret)
    row, full, m0s, m1s, rowv, colv = _specs(tile_l, Lp, Sp, C)
    scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    pos_sum, neg_sum = _named_pallas_call(
        "pallas_focal_loss_fwd",
        functools.partial(_loss_kernel, alpha, gamma),
        grid=(Lp // tile_l,),
        in_specs=[row, full, m0s, m1s, rowv, rowv, colv, colv, m0s,
                  m0s],
        out_specs=(scalar, scalar),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=interpret,
    )(f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum, gtj, gtv)

    res = (f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum, gtj, gtv,
           scale, L, S, Lp, Sp, C, jnp.zeros((), feat0.dtype))
    return (pos_sum[0, 0], neg_sum[0, 0]), res


def _fused_bwd(temperature, alpha, gamma, tile_l, interpret, res, gbar):
    interpret = _auto_interpret(interpret)
    (f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum, gtj, gtv,
     scale, L, S, Lp, Sp, C, dtype_probe) = res
    gpos, gneg = gbar  # cotangents of (pos_sum, neg_sum)
    scal = jnp.stack([gpos, gneg]).astype(jnp.float32).reshape(1, 2)

    row, full, m0s, m1s, rowv, colv = _specs(tile_l, Lp, Sp, C)
    smem = pl.BlockSpec((1, 2), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    srow, scol = _named_pallas_call(
        "pallas_focal_bwd_srow_scol",
        functools.partial(_srow_scol_kernel, alpha, gamma),
        grid=(Lp // tile_l,),
        in_specs=[row, full, m0s, m1s, rowv, rowv, colv, colv, m0s, m0s,
                  smem],
        out_specs=(rowv, colv),
        out_shape=(jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, Sp), jnp.float32)),
        interpret=interpret,
    )(f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum, gtj, gtv, scal)

    full_out = pl.BlockSpec((Sp, C), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    df0, df1 = _named_pallas_call(
        "pallas_focal_bwd_grads",
        functools.partial(_grad_kernel, alpha, gamma, scale),
        grid=(Lp // tile_l,),
        in_specs=[row, full, m0s, m1s, rowv, rowv, colv, colv, m0s, m0s,
                  smem, rowv, colv],
        out_specs=(row, full_out),
        out_shape=(jax.ShapeDtypeStruct((Lp, C), jnp.float32),
                   jax.ShapeDtypeStruct((Sp, C), jnp.float32)),
        interpret=interpret,
    )(f0, f1, m0v, m1v, rowmax, rowsum, colmax, colsum, gtj, gtv, scal,
      srow, scol)

    # the kernels computed dsim @ f_scaled * scale = dsim @ feat * scale^2,
    # which is exactly d/dfeat (sim = scale^2 feat0 feat1^T); cotangents
    # must match the primal dtype (bf16 features under mixed precision)
    dt = dtype_probe.dtype
    return (df0[:L].astype(dt), df1[:S].astype(dt), None, None, None, None)


def _vjp_fwd(feat0, feat1, temperature, gt_j, gt_valid, mask0, mask1,
             alpha, gamma, tile_l, interpret):
    return _fused_fwd(feat0, feat1, temperature, gt_j, gt_valid,
                      mask0, mask1, alpha, gamma, tile_l,
                      _auto_interpret(interpret))


fused_focal_sums.defvjp(_vjp_fwd, _fused_bwd)
