"""LoFTR loss: coarse focal/CE + fine L2-with-std, in static shapes.

Reimplements /root/reference/src/losses/loftr_loss.py:22-192 with masked
sums/counts instead of boolean indexing (XLA-static).  Reduction semantics
match the reference exactly: each term is a *mean over its mask's cell count*
with optional per-cell padding weights multiplied in (loftr_loss.py:43-96),
including the corner-case behavior of contributing 0 when a mask is empty
(loftr_loss.py:32-41 assigns a dummy cell with zero weight - equivalent).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from loftr_tpu.config import LossConfig, MatchCoarseConfig
from loftr_tpu.structs import MatchInput, MatchResult, Supervision


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(values * mask) / count(mask), 0 if the mask is empty."""
    count = jnp.sum(mask)
    total = jnp.sum(values * mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def compute_c_weight(inp: MatchInput) -> Optional[jax.Array]:
    """Padding-mask outer product weight (loftr_loss.py:152-159)."""
    if inp.mask0 is None:
        return None
    b = inp.mask0.shape[0]
    m0 = inp.mask0.reshape(b, -1).astype(jnp.float32)
    m1 = inp.mask1.reshape(b, -1).astype(jnp.float32)
    return m0[:, :, None] * m1[:, None, :]


def coarse_loss(conf: jax.Array, conf_gt: jax.Array, cfg: LossConfig,
                mc: MatchCoarseConfig,
                weight: Optional[jax.Array] = None,
                conf_with_bin: Optional[jax.Array] = None) -> jax.Array:
    """Coarse-level loss (loftr_loss.py:22-96).

    conf: [B, L, S] confidence; conf_gt: [B, L, S] bool;
    conf_with_bin: [B, L+1, S+1] (sinkhorn sparse supervision only).
    """
    pos = conf_gt.astype(jnp.float32)
    neg = 1.0 - pos
    w = weight if weight is not None else 1.0

    if cfg.coarse_type == "cross_entropy":
        assert not mc.sparse_spvs, \
            "sparse supervision for cross-entropy not implemented (parity)"
        c = jnp.clip(conf, 1e-6, 1 - 1e-6)
        loss_pos = _masked_mean(-jnp.log(c) * w, pos)
        loss_neg = _masked_mean(-jnp.log1p(-c) * w, neg)
        return cfg.pos_weight * loss_pos + cfg.neg_weight * loss_neg

    if cfg.coarse_type != "focal":
        raise ValueError(cfg.coarse_type)
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma

    if mc.sparse_spvs:
        if mc.match_type == "sinkhorn":
            assert conf_with_bin is not None
            cb = jnp.clip(conf_with_bin, 1e-6, 1 - 1e-6)
            inner = cb[:, :-1, :-1]
            loss_pos = _masked_mean(
                -alpha * (1 - inner) ** gamma * jnp.log(inner) * w, pos)
            # dustbin negatives: rows/cols with no GT (loftr_loss.py:63-66)
            neg0 = ~jnp.any(conf_gt, axis=2)              # [B, L]
            neg1 = ~jnp.any(conf_gt, axis=1)              # [B, S]
            bin_col = cb[:, :-1, -1]                      # [B, L]
            bin_row = cb[:, -1, :-1]                      # [B, S]
            if weight is not None:
                neg0 = neg0 & (jnp.sum(weight, axis=2) != 0)
                neg1 = neg1 & (jnp.sum(weight, axis=1) != 0)
            l0 = -alpha * (1 - bin_col) ** gamma * jnp.log(bin_col)
            l1 = -alpha * (1 - bin_row) ** gamma * jnp.log(bin_row)
            n_neg = jnp.sum(neg0) + jnp.sum(neg1)
            loss_neg = jnp.where(
                n_neg > 0,
                (jnp.sum(l0 * neg0) + jnp.sum(l1 * neg1)) /
                jnp.maximum(n_neg, 1), 0.0)
            return cfg.pos_weight * loss_pos + cfg.neg_weight * loss_neg
        else:
            # dual-softmax sparse: positives only (loftr_loss.py:67-70,82-84)
            c = jnp.clip(conf, 1e-6, 1 - 1e-6)
            loss_pos = _masked_mean(
                -alpha * (1 - c) ** gamma * jnp.log(c) * w, pos)
            return cfg.pos_weight * loss_pos
    else:
        # dense supervision (loftr_loss.py:87-94)
        c = jnp.clip(conf, 1e-6, 1 - 1e-6)
        loss_pos = _masked_mean(
            -alpha * (1 - c) ** gamma * jnp.log(c) * w, pos)
        loss_neg = _masked_mean(
            -alpha * c ** gamma * jnp.log1p(-c) * w, neg)
        return cfg.pos_weight * loss_pos + cfg.neg_weight * loss_neg


def fine_loss(expec_f: jax.Array, expec_f_gt: jax.Array, cfg: LossConfig,
              slot_mask: Optional[jax.Array] = None) -> jax.Array:
    """Fine-level loss (loftr_loss.py:98-150).

    expec_f: [B, K, 3] (x, y, std); expec_f_gt: [B, K, 2];
    slot_mask: [B, K] valid slots (training fills all slots, eval may not).
    Returns scalar loss (0 when no correct slot exists - the static-shape
    analogue of returning None / fake-supervision injection).
    """
    if slot_mask is None:
        slot_mask = jnp.ones(expec_f.shape[:2], bool)
    correct = (jnp.max(jnp.abs(expec_f_gt), axis=-1) < cfg.fine_correct_thr) \
        & slot_mask

    offset_l2 = jnp.sum((expec_f_gt - expec_f[..., :2]) ** 2, axis=-1)
    if cfg.fine_type == "l2":
        return _masked_mean(offset_l2, correct)
    if cfg.fine_type != "l2_with_std":
        raise NotImplementedError(cfg.fine_type)

    std = expec_f[..., 2]
    inverse_std = 1.0 / jnp.clip(std, min=1e-10)
    # normalize by the mean inverse-std over all (valid) slots
    # (loftr_loss.py:133-134; detached to stop std-inflation)
    mean_inv = _masked_mean(inverse_std, slot_mask)
    weight = jax.lax.stop_gradient(
        inverse_std / jnp.maximum(mean_inv, 1e-10))
    return _masked_mean(offset_l2 * weight, correct)


def _fused_coarse_loss(result: MatchResult, spv: Supervision,
                       inp: MatchInput, cfg: LossConfig,
                       mc: MatchCoarseConfig) -> jax.Array:
    """Batch dense focal loss via the fused Pallas kernel - never
    materializes [B, L, S]; batch-global mean denominators match
    coarse_loss exactly."""
    from loftr_tpu.ops.pallas.focal_loss import fused_focal_sums
    f0, f1 = result.feat_c0, result.feat_c1
    B, L, _ = f0.shape
    S = f1.shape[1]
    m0 = None if inp.mask0 is None else inp.mask0.reshape(B, L)
    m1 = None if inp.mask1 is None else inp.mask1.reshape(B, S)
    fn = lambda a, b, gj, gv, ma, mb: fused_focal_sums(
        a, b, mc.dsmax_temperature, gj, gv, ma, mb,
        cfg.focal_alpha, cfg.focal_gamma)
    if m0 is None:
        p, n = jax.vmap(lambda a, b, gj, gv: fn(a, b, gj, gv, None, None))(
            f0, f1, spv.gt_j, spv.gt_valid)
    else:
        p, n = jax.vmap(fn)(f0, f1, spv.gt_j, spv.gt_valid, m0, m1)
    n_pos = jnp.sum(spv.gt_valid)
    n_neg = B * L * S - n_pos
    mean_pos = jnp.where(n_pos > 0,
                         jnp.sum(p) / jnp.maximum(n_pos, 1), 0.0)
    mean_neg = jnp.where(n_neg > 0,
                         jnp.sum(n) / jnp.maximum(n_neg, 1), 0.0)
    return cfg.pos_weight * mean_pos + cfg.neg_weight * mean_neg


def loftr_loss(result: MatchResult, spv: Supervision, expec_f_gt: jax.Array,
               inp: MatchInput, cfg: LossConfig, mc: MatchCoarseConfig):
    """Total loss (loftr_loss.py:161-192).

    Returns (loss, scalars dict)."""
    if result.conf_matrix is None:
        assert result.feat_c0 is not None, \
            "no conf matrix and no coarse features - fused loss needs the " \
            "matcher's fused_train path"
        loss_c = _fused_coarse_loss(result, spv, inp, cfg, mc)
    else:
        S = result.conf_matrix.shape[2]
        conf_gt = spv.conf_matrix_gt(S)
        c_weight = compute_c_weight(inp)
        loss_c = coarse_loss(result.conf_matrix, conf_gt, cfg, mc,
                             weight=c_weight,
                             conf_with_bin=result.conf_matrix_with_bin)
    loss_f = fine_loss(result.expec_f, expec_f_gt, cfg,
                       slot_mask=result.coarse.mask)
    loss = cfg.coarse_weight * loss_c + cfg.fine_weight * loss_f
    return loss, {"loss": loss, "loss_c": loss_c, "loss_f": loss_f}
