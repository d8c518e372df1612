"""Unit tests: fine-window gather vs torch.F.unfold; align-corners upsample
vs torch.F.interpolate (torch CPU used as an independent oracle only)."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from loftr_tpu.ops.windows import (gather_fine_windows,
                                   gather_fine_windows_direct)
from loftr_tpu.ops.interpolate import upsample2x_align_corners
from loftr_tpu.ops.fine_match import fine_match, normalized_grid


def test_gather_matches_torch_unfold():
    rng = np.random.RandomState(0)
    B, Hf, Wf, C = 2, 16, 20, 6
    W, stride = 5, 4
    hc, wc = Hf // stride, Wf // stride
    feat = rng.randn(B, Hf, Wf, C).astype(np.float32)

    # torch oracle: unfold everything then select
    t = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    unf = F.unfold(t, kernel_size=(W, W), stride=stride, padding=W // 2)
    # [B, C*W*W, L] -> [B, L, W*W, C]
    L = hc * wc
    unf = unf.reshape(B, C, W * W, L).permute(0, 3, 2, 1).numpy()

    cell_ids = rng.randint(0, L, size=(B, 7)).astype(np.int32)
    got = np.asarray(gather_fine_windows(jnp.asarray(feat),
                                         jnp.asarray(cell_ids),
                                         (hc, wc), W, stride))
    for b in range(B):
        for k in range(7):
            np.testing.assert_allclose(got[b, k], unf[b, cell_ids[b, k]],
                                       rtol=1e-6, atol=1e-6)


def test_upsample_matches_torch_align_corners():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, scale_factor=2.0, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fine_match_softargmax():
    """Heatmap peaked at a known tap -> coords point there, std small."""
    B, K, W, C = 1, 3, 5, 8
    WW = W * W
    rng = np.random.RandomState(2)
    f1 = rng.randn(B, K, WW, C).astype(np.float32) * 0.01
    f0 = np.zeros((B, K, WW, C), np.float32)
    # make center of window0 strongly similar to tap (row 1, col 3) of window1
    target = 1 * W + 3
    f1[:, :, target, :] = 3.0
    f0[:, :, WW // 2, :] = 3.0
    out = np.asarray(fine_match(jnp.asarray(f0), jnp.asarray(f1)))
    grid = np.asarray(normalized_grid(W))
    expect_xy = grid[target]
    np.testing.assert_allclose(out[0, 0, :2], expect_xy, atol=0.05)
    assert (out[..., 2] >= 0).all()


def test_fine_match_uniform_heatmap_center():
    """Uniform heatmap -> expectation at 0 (grid is symmetric)."""
    B, K, W, C = 1, 1, 5, 4
    f0 = np.zeros((B, K, W * W, C), np.float32)
    f1 = np.zeros((B, K, W * W, C), np.float32)
    out = np.asarray(fine_match(jnp.asarray(f0), jnp.asarray(f1)))
    np.testing.assert_allclose(out[0, 0, :2], [0.0, 0.0], atol=1e-6)


def test_gather_unfold_equals_direct():
    rng = np.random.RandomState(3)
    B, Hf, Wf, C = 2, 24, 32, 8
    W, stride = 5, 4
    hc, wc = Hf // stride, Wf // stride
    feat = rng.randn(B, Hf, Wf, C).astype(np.float32)
    ids = rng.randint(0, hc * wc, size=(B, 9)).astype(np.int32)
    a = np.asarray(gather_fine_windows(jnp.asarray(feat), jnp.asarray(ids),
                                       (hc, wc), W, stride))
    b = np.asarray(gather_fine_windows_direct(jnp.asarray(feat),
                                              jnp.asarray(ids),
                                              (hc, wc), W, stride))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pallas_upsample_matches_matmul():
    """ops/pallas/upsample.py (experimental, default-off) is exact vs the
    matmul oracle across shapes incl. non-128-multiple channels."""
    import jax.numpy as jnp
    from loftr_tpu.ops.interpolate import upsample2x_matmul
    from loftr_tpu.ops.pallas.upsample import upsample2x_pallas

    r = np.random.RandomState(0)
    for (b, h, w, c) in [(2, 8, 8, 128), (1, 12, 16, 256), (2, 6, 10, 196)]:
        x = jnp.asarray(r.randn(b, h, w, c), jnp.float32)
        want = np.asarray(upsample2x_matmul(x))
        got = np.asarray(upsample2x_pallas(x, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
