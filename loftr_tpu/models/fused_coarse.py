"""Flax wrapper for the fused coarse transformer.

Mirrors ``LocalFeatureTransformer(name='loftr_coarse')``'s param tree
exactly (layer_{i}/{q_proj,k_proj,v_proj,merge}/kernel, norm{1,2},
mlp_{0,2}) — see models/fused_fine.py for the shared param-declaration
modules — and runs each layer application through the fused Pallas
encoder layer (ops/pallas/coarse_layer.py) instead of the XLA stack:
'self' batches both images through one call, 'cross' follows the
reference's sequential update order (transformer.py:96-97).

Inference-only (selected by models/matcher.py when
``cfg.coarse.use_pallas and not train``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from loftr_tpu.models.fused_fine import _EncoderLayerParams
from loftr_tpu.ops.pallas.coarse_layer import fused_coarse_layer


class FusedCoarseTransformer(nn.Module):
    """Drop-in inference replacement for the coarse LocalFeatureTransformer."""
    d_model: int
    nhead: int
    layer_names: Sequence[str]
    tile: int = 0  # 0 = auto: largest exact-divisor tile (no pad waste)
    batch_packing: str = "concat"  # 'concat' | 'interleave' (ops/packing.py)

    @nn.compact
    def __call__(self, feat0: jax.Array, feat1: jax.Array,
                 mask0: Optional[jax.Array] = None,
                 mask1: Optional[jax.Array] = None):
        same_shape = feat0.shape == feat1.shape
        masks_same = (mask0 is None) == (mask1 is None)
        tile = self.tile
        if tile == 0:
            L = feat0.shape[1]
            tile = next((t for t in (960, 768, 640, 512, 480, 384, 256)
                         if L % t == 0), 512)
        self_tile = tile  # captured by `layer` below
        for idx, name in enumerate(self.layer_names):
            w = _EncoderLayerParams(self.d_model, name=f"layer_{idx}")()

            def layer(x, src, xm, sm, w=w):
                return fused_coarse_layer(x, src, w, xm, sm,
                                          nheads=self.nhead, tile=self_tile)

            if name == "self":
                if same_shape and masks_same:
                    # packing mode per batch_packing (ops/packing.py)
                    from loftr_tpu.ops.packing import (pack_rows,
                                                       unpack_rows)
                    pk = self.batch_packing
                    feat = pack_rows(feat0, feat1, pk)
                    m = (None if mask0 is None
                         else pack_rows(mask0, mask1, pk))
                    feat = layer(feat, feat, m, m)
                    feat0, feat1 = unpack_rows(feat, pk)
                else:
                    feat0 = layer(feat0, feat0, mask0, mask0)
                    feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                # sequential, matching transformer.py:96-97
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
        return feat0, feat1
