"""Ground-truth supervision built on-device from depth + pose + intrinsics.

Reimplements /root/reference/src/loftr/utils/supervision.py and
src/loftr/utils/geometry.py in vectorized JAX:

  - :func:`warp_kpts` - unproject with depth, rigid transform, project, with
    nonzero-depth / covisibility / depth-consistency validity masks
    (geometry.py:4-54).
  - :func:`coarse_supervision` - warp the coarse grids bidirectionally, round
    to cells, mutual-nearest by index loop-back, emit per-row GT partners
    (supervision.py:21-109).  Output is the static-shape
    :class:`~loftr_tpu.structs.Supervision` instead of dynamic spv_* lists.
  - :func:`fine_supervision` - GT offsets normalized to the fine window
    (supervision.py:123-143).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from loftr_tpu.structs import CoarseMatches, MatchInput, Supervision


def _sample_depth(depth: jax.Array, pts: jax.Array) -> jax.Array:
    """depth: [B, H, W]; pts: [B, L, 2] (x, y) integer positions (clipped).
    Returns [B, L]."""
    b, h, w = depth.shape
    x = jnp.clip(pts[..., 0], 0, w - 1)
    y = jnp.clip(pts[..., 1], 0, h - 1)
    flat = (y * w + x).astype(jnp.int32)
    return jnp.take_along_axis(depth.reshape(b, h * w), flat, axis=1)


def warp_kpts(kpts0: jax.Array, depth0: jax.Array, depth1: jax.Array,
              T_0to1: jax.Array, K0: jax.Array, K1: jax.Array):
    """Depth-based warp with validity masks (geometry.py:4-54).

    kpts0: [B, L, 2] (x, y) in image0 pixels.
    Returns (valid_mask [B, L], w_kpts0 [B, L, 2]).
    """
    kpts0_long = jnp.round(kpts0).astype(jnp.int32)
    kpts0_depth = _sample_depth(depth0, kpts0_long)          # [B, L]
    nonzero_mask = kpts0_depth != 0

    ones = jnp.ones_like(kpts0[..., :1])
    kpts0_h = jnp.concatenate([kpts0, ones], axis=-1) * kpts0_depth[..., None]
    # 'highest' einsum precision: the TPU default truncates inputs to bf16
    # on the MXU, and bf16 of an ~840px pixel coordinate is ~3px off —
    # enough to scatter GT into the wrong 8px coarse cell.  K=3
    # contractions; the pin costs nothing.
    HI = jax.lax.Precision.HIGHEST
    K0_inv = jnp.linalg.inv(K0)                               # [B, 3, 3]
    kpts0_cam = jnp.einsum("bij,blj->bli", K0_inv, kpts0_h,
                           precision=HI)                      # [B, L, 3]

    R = T_0to1[:, :3, :3]
    t = T_0to1[:, :3, 3]
    w_cam = jnp.einsum("bij,blj->bli", R, kpts0_cam,
                       precision=HI) + t[:, None, :]
    w_depth_computed = w_cam[..., 2]

    w_h = jnp.einsum("bij,blj->bli", K1, w_cam, precision=HI)  # [B, L, 3]
    w_kpts0 = w_h[..., :2] / (w_h[..., 2:3] + 1e-4)

    h, w = depth1.shape[1], depth1.shape[2]
    covisible = (w_kpts0[..., 0] > 0) & (w_kpts0[..., 0] < w - 1) & \
                (w_kpts0[..., 1] > 0) & (w_kpts0[..., 1] < h - 1)
    w_long = w_kpts0.astype(jnp.int32)
    w_long = jnp.where(covisible[..., None], w_long, 0)
    w_depth = _sample_depth(depth1, w_long)
    # division-by-zero in torch yields inf -> fails the <0.2 test; replicate
    consistent = (jnp.abs(
        (w_depth - w_depth_computed) / jnp.where(w_depth == 0, 1.0, w_depth)
    ) < 0.2) & (w_depth != 0)
    valid = nonzero_mask & covisible & consistent
    return valid, w_kpts0


def _grid_pts(hc: int, wc: int, b: int, dtype=jnp.float32) -> jax.Array:
    """[B, hc*wc, 2] (x, y) coarse-cell coordinates, 0-based (kornia
    create_meshgrid(normalized=False) semantics)."""
    ys = jnp.arange(hc, dtype=dtype)
    xs = jnp.arange(wc, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1).reshape(1, hc * wc, 2)
    return jnp.broadcast_to(grid, (b, hc * wc, 2))


def coarse_supervision(inp: MatchInput, resolution: int) -> Supervision:
    """Build coarse GT (supervision.py:21-109).

    resolution: coarse stride (RESOLUTION[0], normally 8).
    """
    B, H0, W0, _ = inp.image0.shape
    _, H1, W1, _ = inp.image1.shape
    h0, w0 = H0 // resolution, W0 // resolution
    h1, w1 = H1 // resolution, W1 // resolution
    L, S = h0 * w0, h1 * w1

    # scale: coarse cell -> original image px (supervision.py:42-44)
    scale0 = resolution if inp.scale0 is None else \
        resolution * inp.scale0[:, None, :]
    scale1 = resolution if inp.scale1 is None else \
        resolution * inp.scale1[:, None, :]

    grid_pt0_c = _grid_pts(h0, w0, B)
    grid_pt1_c = _grid_pts(h1, w1, B)
    grid_pt0_i = grid_pt0_c * scale0
    grid_pt1_i = grid_pt1_c * scale1

    # zero out padded regions so they warp degenerately (supervision.py:54-57)
    if inp.mask0 is not None:
        m0 = inp.mask0.reshape(B, L, 1).astype(bool)
        m1 = inp.mask1.reshape(B, S, 1).astype(bool)
        grid_pt0_i = jnp.where(m0, grid_pt0_i, 0.0)
        grid_pt1_i = jnp.where(m1, grid_pt1_i, 0.0)

    # bidirectional warp; validity masks deliberately unused
    # (supervision.py:59-63 discards them)
    _, w_pt0_i = warp_kpts(grid_pt0_i, inp.depth0, inp.depth1,
                           inp.T_0to1, inp.K0, inp.K1)
    _, w_pt1_i = warp_kpts(grid_pt1_i, inp.depth1, inp.depth0,
                           inp.T_1to0, inp.K1, inp.K0)
    w_pt0_c = w_pt0_i / scale1
    w_pt1_c = w_pt1_i / scale0

    # round to cells; out-of-bounds -> cell 0 (supervision.py:67-77)
    w_pt0_r = jnp.round(w_pt0_c).astype(jnp.int32)
    w_pt1_r = jnp.round(w_pt1_c).astype(jnp.int32)

    def in_bounds(pt, w, h):
        return (pt[..., 0] >= 0) & (pt[..., 0] < w) & \
               (pt[..., 1] >= 0) & (pt[..., 1] < h)

    ok0 = in_bounds(w_pt0_r, w1, h1)
    ok1 = in_bounds(w_pt1_r, w0, h0)
    nearest_index1 = jnp.where(
        ok0, w_pt0_r[..., 0] + w_pt0_r[..., 1] * w1, 0)   # [B, L]
    nearest_index0 = jnp.where(
        ok1, w_pt1_r[..., 0] + w_pt1_r[..., 1] * w0, 0)   # [B, S]

    # mutual check by loop-back (supervision.py:79-81)
    loop_back = jnp.take_along_axis(nearest_index0, nearest_index1, axis=1)
    correct = loop_back == jnp.arange(L)[None, :]
    correct = correct.at[:, 0].set(False)  # ignore top-left corner

    return Supervision(
        gt_j=nearest_index1.astype(jnp.int32),
        gt_valid=correct,
        w_pt0_i=w_pt0_i,
        pt1_i=grid_pt1_i,
    )


def fine_supervision(spv: Supervision, matches: CoarseMatches,
                     inp: MatchInput, resolution_f: int,
                     window: int) -> jax.Array:
    """GT fine offsets for selected matches (supervision.py:123-143).

    Returns expec_f_gt [B, K, 2] normalized to [-1, 1] window coords.
    """
    radius = window // 2
    w_pt0 = jnp.take_along_axis(
        spv.w_pt0_i, matches.i_ids[:, :, None], axis=1)   # [B, K, 2]
    pt1 = jnp.take_along_axis(
        spv.pt1_i, matches.j_ids[:, :, None], axis=1)     # [B, K, 2]
    scale = resolution_f if inp.scale1 is None else \
        resolution_f * inp.scale1[:, None, :]
    return (w_pt0 - pt1) / scale / radius
