"""Typed, static-shape pytrees replacing the reference's mutable batch dict.

The reference threads a single mutable ``data: dict`` through every stage
(/root/reference/src/loftr/loftr.py:29-75, SURVEY.md §3.0).  Here every stage
is a pure function over explicit pytrees with fixed capacities:

  MatchInput  -> model -> MatchResult        (inference)
  MatchInput + Supervision -> loss scalars   (training)

Data-dependent match counts M become a fixed capacity K with a validity mask
(`CoarseMatches.mask`), which simultaneously resolves XLA's static-shape
requirement and the reference's DDP-deadlock countermeasures (SURVEY.md §2.6).
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class MatchInput:
    """One batch of image pairs. Images are NHWC grayscale in [0, 1].

    Mirrors the dataset-produced keys (SURVEY.md §3.0):
    image0/1, optional coarse-validity masks (MegaDepth padding,
    megadepth.py:119-125), optional resize scales [w_orig/w_new, h_orig/h_new]
    (dataset.py:94-125), and - for supervision/eval only - depths, relative
    pose, and intrinsics.
    """
    image0: jax.Array                      # [B, H0, W0, 1]
    image1: jax.Array                      # [B, H1, W1, 1]
    mask0: Optional[jax.Array] = None      # [B, H0/8, W0/8] bool
    mask1: Optional[jax.Array] = None      # [B, H1/8, W1/8] bool
    scale0: Optional[jax.Array] = None     # [B, 2] (w, h) resize factor
    scale1: Optional[jax.Array] = None     # [B, 2]
    depth0: Optional[jax.Array] = None     # [B, Hd0, Wd0]
    depth1: Optional[jax.Array] = None     # [B, Hd1, Wd1]
    T_0to1: Optional[jax.Array] = None     # [B, 4, 4]
    T_1to0: Optional[jax.Array] = None     # [B, 4, 4]
    K0: Optional[jax.Array] = None         # [B, 3, 3]
    K1: Optional[jax.Array] = None         # [B, 3, 3]


@flax.struct.dataclass
class CoarseMatches:
    """Static-capacity coarse matches (replaces b_ids/i_ids/j_ids flat lists,
    coarse_matching.py:95-104)."""
    i_ids: jax.Array   # [B, K] int32, coarse cell in image0 (l = y*Wc + x)
    j_ids: jax.Array   # [B, K] int32, coarse cell in image1
    mconf: jax.Array   # [B, K] confidence (0 for GT-padded training slots)
    mask: jax.Array    # [B, K] bool, slot holds a real entry
    gt_mask: jax.Array # [B, K] bool, slot was filled from GT padding (train)


@flax.struct.dataclass
class MatchResult:
    """Full matcher output (replaces the dict keys listed in SURVEY.md §3.0)."""
    coarse: CoarseMatches
    mkpts0_c: jax.Array                 # [B, K, 2] (x, y) in original px
    mkpts1_c: jax.Array                 # [B, K, 2]
    mkpts0_f: jax.Array                 # [B, K, 2] fine-refined
    mkpts1_f: jax.Array                 # [B, K, 2]
    expec_f: jax.Array                  # [B, K, 3] (x, y, std) in window coords
    conf_matrix: Optional[jax.Array] = None           # [B, L, S] (training)
    conf_matrix_with_bin: Optional[jax.Array] = None  # [B, L+1, S+1] (OT sparse)
    feat_c0: Optional[jax.Array] = None  # [B, L, C] (fused-loss training:
    feat_c1: Optional[jax.Array] = None  # conf is never materialized)

    @property
    def valid(self) -> jax.Array:
        """[B, K] slots that are real predicted matches (mconf > 0)."""
        return self.coarse.mask & (self.coarse.mconf > 0)


@flax.struct.dataclass
class Supervision:
    """Coarse+fine ground truth in static shapes
    (replaces conf_matrix_gt / spv_* keys, supervision.py:24-109).

    Row i of image0's coarse grid has at most one GT partner (the
    mutual-nearest construction, supervision.py:67-81), so GT matches are
    stored densely per-row: gt_j[b, i] with gt_valid[b, i].
    """
    gt_j: jax.Array       # [B, L] int32: matched cell in image1 for row i
    gt_valid: jax.Array   # [B, L] bool
    w_pt0_i: jax.Array    # [B, L, 2] warped grid pts of image0, original px
    pt1_i: jax.Array      # [B, S, 2] image1 grid pts, original px

    def conf_matrix_gt(self, S: int) -> jax.Array:
        """Dense [B, L, S] bool GT confidence matrix (built lazily)."""
        cols = jnp.arange(S, dtype=self.gt_j.dtype)
        return (self.gt_j[:, :, None] == cols[None, None, :]) & \
            self.gt_valid[:, :, None]

    @property
    def num_gt(self) -> jax.Array:
        return jnp.sum(self.gt_valid, axis=1)  # [B]
