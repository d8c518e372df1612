"""LoFTR matcher: the full coarse-to-fine pipeline as a pure static-shape
function.

Pipeline (mirrors /root/reference/src/loftr/loftr.py:29-75):
  [1] ResNet-FPN backbone (same-shape fast path batches both images,
      loftr.py:45-49)
  [2] position encoding + flatten to [B, L, C]
  [3] coarse LocalFeatureTransformer (self/cross x4)
  [4] coarse matching (dual-softmax / sinkhorn) -> static top-K selection
  [5] fine preprocess: gather WxW fine windows at matches (+ coarse context)
  [6] fine LocalFeatureTransformer (self/cross x1)
  [7] fine matching: soft-argmax refinement -> final keypoints

Differences by design (TPU-first): NHWC; fixed match capacity K with validity
masks instead of data-dependent M (see ops/matching.py); windows gathered
directly instead of unfold-everything (see ops/windows.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from loftr_tpu.config import ModelConfig
from loftr_tpu.models.backbone import build_backbone
from loftr_tpu.models.fused_coarse import FusedCoarseTransformer
from loftr_tpu.models.fused_fine import FusedFineStage
from loftr_tpu.models.position_encoding import add_position_encoding
from loftr_tpu.models.transformer import LocalFeatureTransformer, dense
from loftr_tpu.ops import matching as M
from loftr_tpu.ops.fine_match import fine_kpts, fine_match
from loftr_tpu.ops.windows import (gather_fine_windows,
                                   gather_fine_windows_direct)
from loftr_tpu.structs import CoarseMatches, MatchInput, MatchResult


class LoFTR(nn.Module):
    """Detector-free matcher.  Call with a MatchInput; returns MatchResult."""
    config: ModelConfig

    @nn.compact
    def __call__(self, inp: MatchInput, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 gt_j: Optional[jax.Array] = None,
                 gt_valid: Optional[jax.Array] = None) -> MatchResult:
        cfg = self.config
        dt = None if cfg.dtype == "float32" else jnp.dtype(cfg.dtype)
        res_c, res_f = cfg.backbone.resolution
        B, H0, W0, _ = inp.image0.shape
        _, H1, W1, _ = inp.image1.shape
        hw0_c = (H0 // res_c, W0 // res_c)
        hw1_c = (H1 // res_c, W1 // res_c)
        hw0_f = (H0 // res_f, W0 // res_f)
        L = hw0_c[0] * hw0_c[1]
        S = hw1_c[0] * hw1_c[1]

        # [1] backbone - same-shape fast path (loftr.py:45-49)
        backbone = build_backbone(cfg.backbone.resolution,
                                  cfg.backbone.initial_dim,
                                  cfg.backbone.block_dims, cfg.backbone.norm,
                                  name="backbone", dtype=dt,
                                  winograd=getattr(cfg.backbone, "winograd",
                                                   False))
        pk = getattr(cfg, "batch_packing", "concat")
        if (H0, W0) == (H1, W1):
            # two-image packing (ops/packing.py): cfg.batch_packing selects
            # concat (single-chip layout) vs interleave (shard-local DP)
            from loftr_tpu.ops.packing import pack_rows, unpack_rows
            feat_c, feat_f = backbone(
                pack_rows(inp.image0, inp.image1, pk), train)
            feat_c0, feat_c1 = unpack_rows(feat_c, pk)
            feat_f0, feat_f1 = unpack_rows(feat_f, pk)
        else:
            feat_c0, feat_f0 = backbone(inp.image0, train)
            feat_c1, feat_f1 = backbone(inp.image1, train)

        # [2] position encoding + flatten (loftr.py:58-59)
        d_c = cfg.coarse.d_model
        feat_c0 = add_position_encoding(feat_c0, cfg.coarse.temp_bug_fix)
        feat_c1 = add_position_encoding(feat_c1, cfg.coarse.temp_bug_fix)
        feat_c0 = feat_c0.reshape(B, L, d_c)
        feat_c1 = feat_c1.reshape(B, S, d_c)

        mask_c0 = None if inp.mask0 is None else inp.mask0.reshape(B, L)
        mask_c1 = None if inp.mask1 is None else inp.mask1.reshape(B, S)

        # Fused Pallas inference kernels are compiled for the bf16
        # deployment dtype; at fp32 their doubled VMEM tile footprint blows
        # up the TPU compiler (observed: compile-helper OOM/SIGKILL at
        # 640x480).  fp32 configs transparently take the XLA oracle paths
        # on TPU; non-TPU backends (interpret-mode tests) are unaffected.
        pallas_dtype_ok = (cfg.dtype == "bfloat16"
                           or jax.default_backend() != "tpu")

        # [3] coarse transformer (loftr.py:64).  Inference uses the fused
        # Pallas encoder layers (same param tree; ops/pallas/coarse_layer.py);
        # with cfg.coarse.seq_axis the XLA stack runs token-sharded over that
        # mesh axis instead (sequence parallelism, SURVEY.md §5.7).
        seq_axis = getattr(cfg.coarse, "seq_axis", None)
        # lane-width gate: see the fused-fine gate below (Mosaic reshape
        # fails below the 128-lane width on TPU for scaled-down d_model)
        coarse_lane_ok = (d_c % 128 == 0
                          or jax.default_backend() != "tpu")
        if (cfg.coarse.use_pallas and not train and seq_axis is None
                and pallas_dtype_ok and coarse_lane_ok
                and cfg.coarse.attention == "linear"):
            feat_c0, feat_c1 = FusedCoarseTransformer(
                d_c, cfg.coarse.nhead, cfg.coarse.layer_names,
                batch_packing=pk,
                name="loftr_coarse")(feat_c0, feat_c1, mask_c0, mask_c1)
        else:
            feat_c0, feat_c1 = LocalFeatureTransformer(
                d_c, cfg.coarse.nhead, cfg.coarse.layer_names,
                cfg.coarse.attention, dt,
                fused_heads=getattr(cfg.coarse, "fused_heads", False),
                batch_packing=pk,
                seq_axis=seq_axis,
                name="loftr_coarse")(
                    feat_c0, feat_c1, mask_c0, mask_c1)

        # [4] coarse matching (loftr.py:67 -> coarse_matching.py:87-148)
        mc = cfg.match_coarse
        conf_with_bin = None
        conf = None
        fused_train = (train and cfg.loss.use_pallas and
                       (jax.default_backend() == "tpu"
                        or cfg.loss.force_pallas_cpu) and
                       mc.match_type == "dual_softmax" and
                       not mc.sparse_spvs and cfg.loss.coarse_type == "focal")
        use_pallas = (fused_train or
                      (mc.use_pallas and not train and pallas_dtype_ok
                       and coarse_lane_ok  # same Mosaic lane-width bound
                       and mc.match_type in ("dual_softmax", "sinkhorn")))
        if use_pallas and mc.match_type == "dual_softmax":
            # fused kernel: no [L, S] conf matrix is ever materialized
            cand = M.pallas_mutual_nearest_candidates(
                feat_c0, feat_c1, mc.dsmax_temperature, mc.thr, mc.border_rm,
                hw0_c, hw1_c, inp.mask0, inp.mask1)
        elif use_pallas and mc.match_type == "sinkhorn":
            bin_score = self.param(
                "bin_score", lambda k: jnp.asarray(mc.skh_init_bin_score))
            cand = M.pallas_sinkhorn_candidates(
                feat_c0, feat_c1, bin_score, mc.skh_iters, mc.thr,
                mc.border_rm, hw0_c, hw1_c, inp.mask0, inp.mask1,
                prefilter=mc.skh_prefilter)
        elif mc.match_type == "dual_softmax":
            conf = M.dual_softmax_conf(feat_c0, feat_c1, mc.dsmax_temperature,
                                       mask_c0, mask_c1)
        elif mc.match_type == "sinkhorn":
            bin_score = self.param(
                "bin_score", lambda k: jnp.asarray(mc.skh_init_bin_score))
            conf, assign = M.sinkhorn_conf(
                feat_c0, feat_c1, bin_score, mc.skh_iters, mask_c0, mask_c1,
                prefilter=(not train) and mc.skh_prefilter)
            if mc.sparse_spvs:
                conf_with_bin = assign
        else:
            raise NotImplementedError(mc.match_type)

        if not use_pallas:
            cand = M.mutual_nearest_candidates(
                conf, mc.thr, mc.border_rm, hw0_c, hw1_c,
                inp.mask0, inp.mask1)
        if train:
            assert rng is not None and gt_j is not None, \
                "training selection needs rng + coarse supervision"
            k_train = mc.train_matches or int(
                mc.train_coarse_percent * max(L, S))
            # mask-aware budget: the reference derives the train capacity
            # from the padding masks (coarse_matching.py:46-56,200-204);
            # the static k_train stays the array capacity, over-budget
            # slots are masked out of the losses.
            budget = None
            if inp.mask0 is not None:
                budget = M.mask_match_budget(
                    inp.mask0, inp.mask1, mc.train_coarse_percent)
            matches = M.select_train_matches(
                cand, gt_j, gt_valid, rng, k_train, mc.train_pad_num_gt_min,
                budget=budget, sampling=mc.train_sampling)
        else:
            matches = M.topk_matches(cand, min(mc.max_matches, L))

        mkpts0_c, mkpts1_c = M.matches_to_kpts(
            matches, hw0_c, hw1_c, res_c, inp.scale0, inp.scale1)
        mkpts0_c = jax.lax.stop_gradient(mkpts0_c)
        mkpts1_c = jax.lax.stop_gradient(mkpts1_c)

        # [5] fine preprocess (loftr.py:70 -> fine_preprocess.py:29-59)
        W = cfg.fine.window_size
        d_f = cfg.fine.d_model
        stride = hw0_f[0] // hw0_c[0]
        gmode = cfg.fine.gather
        if gmode == "auto":
            gmode = "unfold" if train else "direct"
        gather = (gather_fine_windows_direct if gmode == "direct"
                  else gather_fine_windows)
        win0 = gather(feat_f0, matches.i_ids, hw0_c, W, stride)
        win1 = gather(feat_f1, matches.j_ids, hw1_c, W, stride)
        if cfg.fine.concat_coarse_feat:
            # coarse context concat (fine_preprocess.py:49-57)
            c0 = jnp.take_along_axis(
                feat_c0, matches.i_ids[:, :, None], axis=1)  # [B, K, d_c]
            c1 = jnp.take_along_axis(
                feat_c1, matches.j_ids[:, :, None], axis=1)
            down = dense(d_f, use_bias=True, name="down_proj", dtype=dt)
            from loftr_tpu.ops.packing import pack_rows, unpack_rows
            cwin = down(pack_rows(c0, c1, pk))  # share weights, one call
            c0w, c1w = unpack_rows(cwin, pk)
            merge = dense(d_f, use_bias=True, name="merge_feat", dtype=dt)
            ww = W * W
            win0 = merge(jnp.concatenate(
                [win0, jnp.broadcast_to(c0w[:, :, None, :], win0.shape[:2] + (ww, d_f))], axis=-1))
            win1 = merge(jnp.concatenate(
                [win1, jnp.broadcast_to(c1w[:, :, None, :], win1.shape[:2] + (ww, d_f))], axis=-1))

        # [6]+[7] fine transformer + fine matching (loftr.py:72-75).
        # Inference takes the fully-fused Pallas path (one kernel for both
        # stages, ops/pallas/fine_stage.py); it declares the SAME param tree
        # as the XLA layer stack, so checkpoints drive either path.
        K = win0.shape[1]
        # lane-width gate: Mosaic cannot lower the kernel's [G, W2, C] ->
        # [G*W2, C] vector reshape when C is below the 128-lane register
        # width (observed: "infer-vector-layout: unsupported shape cast"
        # at C=16 on v5e).  Scaled-down models fall back to the XLA path
        # on TPU; CPU interpret mode is unaffected.
        fine_lane_ok = (d_f % 128 == 0 or jax.default_backend() != "tpu")
        fine_topo_ok = (pallas_dtype_ok and fine_lane_ok
                        and cfg.fine.attention == "linear"
                        and tuple(cfg.fine.layer_names) == ("self", "cross"))
        fuse_fine = fine_topo_ok and (
            cfg.fine.use_pallas_train if train else cfg.fine.use_pallas)
        if fuse_fine:
            expec_f = FusedFineStage(
                d_f, cfg.fine.nhead, cfg.fine.layer_names,
                win_pack=cfg.fine.win_pack, trainable=train,
                name="loftr_fine")(win0, win1)
        else:
            f0 = win0.reshape(B * K, W * W, d_f)
            f1 = win1.reshape(B * K, W * W, d_f)
            # fused_heads engages in TRAINING only (+16.5% step time at
            # B=8: the per-head [25,16] einsums' fwd+bwd are MXU-issue-
            # bound); eval keeps the plain oracle so fp32-parity and
            # golden paths are byte-stable.  Same params either way.
            f0, f1 = LocalFeatureTransformer(
                d_f, cfg.fine.nhead, cfg.fine.layer_names,
                cfg.fine.attention, dt,
                fused_heads=(train and getattr(cfg.fine, "fused_heads",
                                               False)),
                batch_packing=pk,
                name="loftr_fine")(f0, f1)
            f0 = f0.reshape(B, K, W * W, d_f)
            f1 = f1.reshape(B, K, W * W, d_f)
            expec_f = fine_match(f0, f1)
        mkpts0_f, mkpts1_f = fine_kpts(
            jax.lax.stop_gradient(expec_f), mkpts0_c, mkpts1_c, W, res_f,
            inp.scale1)

        return MatchResult(
            coarse=matches,
            mkpts0_c=mkpts0_c, mkpts1_c=mkpts1_c,
            mkpts0_f=mkpts0_f, mkpts1_f=mkpts1_f,
            expec_f=expec_f,
            conf_matrix=conf,
            conf_matrix_with_bin=conf_with_bin,
            feat_c0=feat_c0 if fused_train else None,
            feat_c1=feat_c1 if fused_train else None,
        )
