"""Fine-level spatial-to-detail matching: center-vs-window soft-argmax.

Reimplements /root/reference/src/loftr/utils/fine_matching.py:15-74 (and the
kornia ``dsnt.spatial_expectation2d`` / ``create_meshgrid`` calls it relies
on) as closed-form JAX: heatmap = softmax(<center0, window1>/sqrt(C)),
coords = E[grid], std = sum_axes sqrt(Var).  Operates on the static [B, K]
match capacity; invalid slots simply produce ignorable values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_grid(w: int) -> jax.Array:
    """[W*W, 2] (x, y) grid normalized to [-1, 1] (kornia create_meshgrid
    with normalized_coordinates=True)."""
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1).reshape(w * w, 2)


def fine_match(feat_f0: jax.Array, feat_f1: jax.Array):
    """Soft-argmax refinement.

    Args:
      feat_f0, feat_f1: [B, K, WW, C] fine windows (post fine-transformer).
    Returns:
      expec_f: [B, K, 3] (x, y, std) - coords normalized to [-1, 1] over the
      window; std as in fine_matching.py:53-54.
    """
    b, k, ww, c = feat_f0.shape
    w = int(round(ww ** 0.5))
    center0 = feat_f0[:, :, ww // 2, :]  # [B, K, C]
    sim = jnp.einsum("bkc,bkrc->bkr", center0, feat_f1,
                     preferred_element_type=jnp.float32)  # [B, K, WW]
    heatmap = jax.nn.softmax(sim.astype(jnp.float32) / c ** 0.5, axis=-1)

    grid = normalized_grid(w).astype(heatmap.dtype)  # [WW, 2]
    coords = jnp.einsum("bkr,rd->bkd", heatmap, grid)  # [B, K, 2]
    e2 = jnp.einsum("bkr,rd->bkd", heatmap, grid ** 2)
    var = e2 - coords ** 2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, min=1e-10)), axis=-1)  # [B, K]
    return jnp.concatenate([coords, std[..., None]], axis=-1)


def fine_kpts(expec_f: jax.Array, mkpts0_c: jax.Array, mkpts1_c: jax.Array,
              window: int, stride_f: int,
              scale1: jax.Array | None = None):
    """Final keypoints (fine_matching.py:62-74):
    mkpts1_f = mkpts1_c + coords * (W//2) * stride_f [* scale1].

    stride_f: image-res / fine-res (RESOLUTION[1], normally 2).
    """
    delta = expec_f[..., :2] * (window // 2) * stride_f
    if scale1 is not None:
        delta = delta * scale1[:, None, :]
    return mkpts0_c, mkpts1_c + delta
