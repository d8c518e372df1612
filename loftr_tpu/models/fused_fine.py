"""Flax wrapper for the fused fine stage.

Declares parameters under the SAME tree as the XLA fine path
(``LocalFeatureTransformer(name='loftr_fine')``: ``layer_{i}/{q_proj,k_proj,
v_proj,merge}/kernel``, ``layer_{i}/norm{1,2}/{scale,bias}``,
``layer_{i}/mlp_{0,2}/kernel``) so converted reference checkpoints and
orbax checkpoints drive both paths interchangeably, then runs the fused
Pallas kernel (ops/pallas/fine_stage.py) instead of the layer stack.

Inference-only; the matcher selects it when ``cfg.fine.use_pallas`` and
``not train`` (models/matcher.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from loftr_tpu.ops.pallas.fine_stage import EncoderWeights, fused_fine_stage


class _Kernel(nn.Module):
    """Declares a Dense 'kernel' param without the Dense compute."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.xavier_uniform(),
                          self.shape)


class _LayerNormParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _EncoderLayerParams(nn.Module):
    """Mirrors LoFTREncoderLayer's param tree (models/transformer.py)."""
    d_model: int

    @nn.compact
    def __call__(self) -> EncoderWeights:
        c = self.d_model
        q = _Kernel((c, c), name="q_proj")()
        k = _Kernel((c, c), name="k_proj")()
        v = _Kernel((c, c), name="v_proj")()
        merge = _Kernel((c, c), name="merge")()
        ln1_s, ln1_b = _LayerNormParams(c, name="norm1")()
        mlp0 = _Kernel((2 * c, 2 * c), name="mlp_0")()
        mlp2 = _Kernel((2 * c, c), name="mlp_2")()
        ln2_s, ln2_b = _LayerNormParams(c, name="norm2")()
        return EncoderWeights(q, k, v, merge, ln1_s, ln1_b, mlp0, mlp2,
                              ln2_s, ln2_b)


class FusedFineStage(nn.Module):
    """Drop-in replacement for fine LocalFeatureTransformer + fine_match.

    Call with gathered windows [B, K, W2, C]; returns expec_f [B, K, 3].
    Only the reference fine topology is supported: layer_names
    ('self','cross'), linear attention.
    """
    d_model: int
    nhead: int
    layer_names: Sequence[str] = ("self", "cross")
    mode: str = "stack"
    block_windows: int = 32
    win_pack: int = 1  # see ops/pallas/fine_stage.py::_attention
    # training: custom-VJP hybrid (Pallas forward + recomputed-XLA
    # backward, ops/fine_stage_hybrid.py) instead of the fwd-only kernel
    trainable: bool = False

    @nn.compact
    def __call__(self, win0: jax.Array, win1: jax.Array) -> jax.Array:
        assert tuple(self.layer_names) == ("self", "cross"), \
            "fused fine stage implements the reference topology only"
        l0 = _EncoderLayerParams(self.d_model, name="layer_0")()
        l1 = _EncoderLayerParams(self.d_model, name="layer_1")()
        b, k, w2, c = win0.shape
        if self.trainable:
            from loftr_tpu.ops.fine_stage_hybrid import \
                fused_fine_stage_hybrid
            expec = fused_fine_stage_hybrid(
                win0.reshape(b * k, w2, c), win1.reshape(b * k, w2, c),
                l0, l1, self.nhead, self.mode, self.block_windows,
                self.win_pack)
        else:
            expec = fused_fine_stage(
                win0.reshape(b * k, w2, c), win1.reshape(b * k, w2, c),
                l0, l1, nheads=self.nhead, mode=self.mode,
                block_windows=self.block_windows, win_pack=self.win_pack)
        return expec.reshape(b, k, 3)
