"""Fine-level window extraction by direct gather.

TPU-first replacement for the reference's unfold-then-index pattern
(/root/reference/src/loftr/loftr_module/fine_preprocess.py:39-47), which
materializes [N, L, W*W, C] windows for *every* coarse cell before selecting M
of them.  Here only the K selected windows are gathered: build flat pixel
indices for each (match, window-offset) pair and use a single batched gather -
O(K * W^2 * C) memory instead of O(L * W^2 * C).

Window geometry matches F.unfold(kernel=W, stride=stride, padding=W//2):
the window for coarse cell (y, x) starts at fine-map pixel
(y*stride - W//2, x*stride - W//2); out-of-bounds taps are zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_fine_windows(feat_f: jax.Array, cell_ids: jax.Array,
                        hw_c: tuple, window: int, stride: int) -> jax.Array:
    """Strided-slice unfold + one row-gather (TPU-friendly default).

    XLA:TPU lowers many-small-element gathers poorly; instead build all L
    windows via W*W static shifted strided slices (pure data movement, no
    conv) giving [B, L, W*W*C] wide rows, then gather the K selected rows in
    a single take_along_axis - one big-row gather instead of K*W*W scattered
    element reads.  Same output as :func:`gather_fine_windows_direct`.
    """
    b, hf, wf, c = feat_f.shape
    _, k = cell_ids.shape
    hc, wc = hw_c
    rad = window // 2
    pad = jnp.pad(feat_f, ((0, 0), (rad, rad + stride), (rad, rad + stride),
                           (0, 0)))
    taps = []
    for dy in range(window):
        for dx in range(window):
            # window start for cell (y,x) is (y*stride - rad); with the +rad
            # pad offset, tap (dy,dx) reads pad[y*stride + dy, x*stride + dx]
            sl = jax.lax.slice(
                pad,
                (0, dy, dx, 0),
                (b, dy + (hc - 1) * stride + 1, dx + (wc - 1) * stride + 1, c),
                (1, stride, stride, 1))  # [B, hc, wc, C]
            taps.append(sl)
    allwin = jnp.stack(taps, axis=3)            # [B, hc, wc, WW, C]
    allwin = allwin.reshape(b, hc * wc, window * window * c)
    rows = jnp.take_along_axis(allwin, cell_ids[:, :, None], axis=1)
    return rows.reshape(b, k, window * window, c)


def gather_fine_windows_direct(feat_f: jax.Array, cell_ids: jax.Array,
                               hw_c: tuple, window: int, stride: int
                               ) -> jax.Array:
    """Gather W x W fine-feature windows centered on selected coarse cells.

    Args:
      feat_f: [B, Hf, Wf, C] fine feature map.
      cell_ids: [B, K] int32 flat coarse-cell ids (l = y*Wc + x).
      hw_c: (Hc, Wc) coarse grid shape.
      window: W (odd, reference default 5).
      stride: Hf // Hc (reference: hw0_f/hw0_c, fine_preprocess.py:31).
    Returns: [B, K, W*W, C] with zeros at out-of-bounds taps.
    """
    b, hf, wf, c = feat_f.shape
    _, k = cell_ids.shape
    wc = hw_c[1]
    rad = window // 2

    cy = (cell_ids // wc) * stride  # [B, K] window-start y + rad
    cx = (cell_ids % wc) * stride
    offs = jnp.arange(window) - rad
    # [B, K, W] pixel rows/cols per tap
    rows = cy[:, :, None] + offs[None, None, :]
    cols = cx[:, :, None] + offs[None, None, :]
    in_r = (rows >= 0) & (rows < hf)
    in_c = (cols >= 0) & (cols < wf)
    rows_c = jnp.clip(rows, 0, hf - 1)
    cols_c = jnp.clip(cols, 0, wf - 1)

    # flat index [B, K, W, W] then gather from [B, Hf*Wf, C]
    flat = rows_c[:, :, :, None] * wf + cols_c[:, :, None, :]
    valid = in_r[:, :, :, None] & in_c[:, :, None, :]
    feat_flat = feat_f.reshape(b, hf * wf, c)
    gathered = jnp.take_along_axis(
        feat_flat, flat.reshape(b, k * window * window)[:, :, None], axis=1)
    gathered = gathered.reshape(b, k, window * window, c)
    gathered = jnp.where(
        valid.reshape(b, k, window * window, 1), gathered, 0.0)
    return gathered
