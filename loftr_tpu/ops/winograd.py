"""Winograd F(2x2, 3x3) convolution for stride-1 3x3 convs.

MEASURED RESULT (v5e, round 3): **not a win - kept as a validated reference
implementation, default OFF.**  XLA's direct 3x3 conv already sustains
~199 TF/s (~peak MXU) at the backbone's shapes ([16,240,320,256]:
7.3 ms direct vs 70 ms for this XLA-level Winograd - the 2.25x-inflated
V tensor materializes through HBM with transpose-heavy layouts, swamping
the FLOP saving).  A Pallas version that keeps tiles VMEM-resident could
close the traffic gap, but with the MXU already saturated the theoretical
ceiling is only 2.25x minus transform cost; not the current bottleneck
(the backbone's losses are 196-channel lane padding + elementwise glue,
addressed by utils/channel_pad.py instead).

Math: each 2x2 output tile costs 16 multiplies instead of 36 via
Y = A^T [ (G g G^T) .* (B^T d B) ] A  (Lavin & Gray, arXiv:1509.09308);
the inner product becomes 16 batched [tiles, Cin] x [Cin, Cout] GEMMs.
F(2x2,3x3) transform constants are 0/±1/±1/2, so bf16 error stays within
ordinary quantization noise (tests/test_winograd.py); exact in fp32.

``BackboneConfig.winograd`` switches the backbone's stride-1 3x3 convs to
this path at inference (same param tree as nn.Conv); training and the fp32
oracle always keep direct convs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308).
# Y = A^T [ (G g G^T) .* (B^T d B) ] A   per tile, per channel pair.
_B_T = np.array([[1, 0, -1, 0],
                 [0, 1, 1, 0],
                 [0, -1, 1, 0],
                 [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_A_T = np.array([[1, 1, 1, 0],
                 [0, 1, -1, -1]], np.float32)


def winograd_weights(w: jax.Array) -> jax.Array:
    """Transform [3, 3, Cin, Cout] conv weights -> [4, 4, Cin, Cout].

    U = G g G^T per (cin, cout) pair; computed in fp32 regardless of the
    stored dtype (the constants are exactly representable; the products are
    accumulated in fp32 then cast back).
    """
    g = w.astype(jnp.float32)
    G = jnp.asarray(_G)
    u = jnp.einsum("ab,bcio,dc->adio", G, g, G)  # [4,4,Cin,Cout]
    return u.astype(w.dtype)


def winograd_conv3x3(x: jax.Array, w: jax.Array,
                     bias: jax.Array | None = None) -> jax.Array:
    """SAME-padding stride-1 3x3 convolution via Winograd F(2x2, 3x3).

    x: [B, H, W, Cin] (H, W need not be even - odd edges are padded and
    cropped); w: [3, 3, Cin, Cout].  Returns [B, H, W, Cout], numerically a
    regular conv up to bf16 transform rounding (exact in fp32 up to
    reassociation).
    """
    Bn, H, W, Ci = x.shape
    Co = w.shape[-1]
    dt = x.dtype

    # pad: 1 halo on each side (SAME), plus round H, W up to multiples of 2
    Ho = (H + 1) // 2 * 2
    Wo = (W + 1) // 2 * 2
    xp = jnp.pad(x, ((0, 0), (1, 1 + Ho - H), (1, 1 + Wo - W), (0, 0)))
    th, tw = Ho // 2, Wo // 2  # tile grid

    # extract overlapping 4x4 tiles with stride 2:
    # xp[:, 2*i : 2*i+4, 2*j : 2*j+4, :] for tile (i, j)
    # -> gather rows/cols by slicing 4 shifted stride-2 views (cheap slices)
    def tiles_along(arr, axis, n_tiles):
        idx = [jax.lax.slice_in_dim(arr, k, k + 2 * n_tiles - 1, stride=2,
                                    axis=axis) for k in range(4)]
        return jnp.stack(idx, axis=axis)  # inserts the 4-tap dim at `axis`

    t = tiles_along(xp, 1, th)        # [B, 4, th, Wo+2, Ci]
    t = tiles_along(t, 3, tw)         # [B, 4, th, 4, tw, Ci]

    # input transform V = B^T d B over the two 4-dims, in fp32 (the
    # constants are 0/±1: pure adds; doing them in fp32 then rounding once
    # keeps the extra error at a single bf16 quantization step)
    BT = jnp.asarray(_B_T)
    v = jnp.einsum("ab,nbhcwi,dc->nahdwi", BT, t.astype(jnp.float32),
                   BT).astype(dt)  # [B,4,th,4,tw,Ci]

    # batched GEMM over the 16 taps: [16, B*th*tw, Ci] x [16, Ci, Co]
    u = winograd_weights(w)                            # [4, 4, Ci, Co]
    v2 = v.transpose(1, 3, 0, 2, 4, 5).reshape(16, Bn * th * tw, Ci)
    u2 = u.reshape(16, Ci, Co)
    m = jnp.einsum("tnc,tco->tno", v2, u2,
                   preferred_element_type=jnp.float32)  # [16, N, Co]
    m = m.reshape(4, 4, Bn, th, tw, Co)

    # output transform Y = A^T m A -> [2, 2] per tile
    AT = jnp.asarray(_A_T, jnp.float32)
    y = jnp.einsum("ab,bcnhwo,dc->nhawdo", AT, m, AT)  # [B,th,2,tw,2,Co]
    y = y.reshape(Bn, Ho, Wo, Co)[:, :H, :W, :].astype(dt)
    if bias is not None:
        y = y + bias.astype(dt)
    return y
