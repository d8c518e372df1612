"""LoFTR transformer: interleaved self/cross linear-attention layers.

Topology matches /root/reference/src/loftr/loftr_module/transformer.py:
  - LoFTREncoderLayer (:7-58): bias-free Q/K/V projections, multi-head
    linear (or full) attention, bias-free merge, LayerNorm, then a
    concat-style FFN  mlp([x || message]) with a second LayerNorm and
    residual  x + message.
  - LocalFeatureTransformer (:61-101): a named sequence of 'self'/'cross'
    layers; 'self' updates each image against itself, 'cross' against the
    other (both directions per layer).

Unlike the reference, both images' sequences are processed as one batched
call per layer where possible (self-attention stacks feat0/feat1 on the batch
axis), which keeps the MXU fed with larger matmuls.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from loftr_tpu.ops.attention import (full_attention, linear_attention,
                                     linear_attention_fused_heads)


def dense(features: int, use_bias: bool = False, name: str | None = None,
          dtype=None):
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=dtype, name=name)


class LoFTREncoderLayer(nn.Module):
    d_model: int
    nhead: int
    attention: str = "linear"  # ['linear', 'full']
    dtype: object = None
    # fused Pallas per-window attention (fine stage, inference): requires
    # 'linear', no masks, L == S small windows — see
    # ops/pallas/window_attention.py
    fused_window_attn: bool = False
    # head-fused linear attention (XLA, train+eval): exact same math,
    # full-MXU-width matmuls — see ops/attention.py
    fused_heads: bool = False

    @nn.compact
    def __call__(self, x, source,
                 x_mask: Optional[jax.Array] = None,
                 source_mask: Optional[jax.Array] = None):
        """x: [B, L, C]; source: [B, S, C]; masks: [B, L] / [B, S]."""
        b, l, c = x.shape
        h = self.nhead
        d = self.d_model // h

        dt = self.dtype
        q = dense(self.d_model, name="q_proj", dtype=dt)(x)
        k = dense(self.d_model, name="k_proj", dtype=dt)(source)
        v = dense(self.d_model, name="v_proj", dtype=dt)(source)
        if (self.fused_window_attn and self.attention == "linear"
                and x_mask is None and source_mask is None
                and x.shape == source.shape):
            from loftr_tpu.ops.pallas.window_attention import \
                window_linear_attention
            message = window_linear_attention(q, k, v, nheads=h)
        else:
            q = q.reshape(b, l, h, d)
            k = k.reshape(b, -1, h, d)
            v = v.reshape(b, -1, h, d)
            if self.attention == "linear":
                attn = (linear_attention_fused_heads if self.fused_heads
                        else linear_attention)
            else:
                attn = full_attention
            message = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        message = dense(self.d_model, name="merge",
                        dtype=dt)(message.reshape(b, l, c))
        # LayerNorm in fp32 (dtype=float32 promotes internally), cast back
        message = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm1")(message).astype(x.dtype)

        # concat-style FFN (transformer.py:54-57)
        y = jnp.concatenate([x, message], axis=-1)
        y = dense(2 * self.d_model, name="mlp_0", dtype=dt)(y)
        y = nn.relu(y)
        y = dense(self.d_model, name="mlp_2", dtype=dt)(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(y).astype(x.dtype)
        return x + y


def _seq_constrain(x, axis: Optional[str]):
    """Pin the token axis of [B, L, C] (or [B, L] mask) to a mesh axis.

    Sequence parallelism (SURVEY.md §5.7, new capability): with the ambient
    mesh set (``jax.set_mesh``), constraining activations to
    ``P(None, axis, ...)`` makes XLA keep every elementwise/projection op
    token-sharded and auto-insert the psum for linear attention's global
    KV/ksum contractions (the only cross-token quantities) — the GSPMD
    equivalent of parallel/seq_attention.py's explicit shard_map kernel.
    """
    if axis is None or x is None:
        return x
    from jax.sharding import PartitionSpec as P
    spec = P(None, axis) if x.ndim == 2 else P(None, axis, None)
    return jax.lax.with_sharding_constraint(x, spec)


class LocalFeatureTransformer(nn.Module):
    d_model: int
    nhead: int
    layer_names: Sequence[str]
    attention: str = "linear"
    dtype: object = None
    fused_window_attn: bool = False  # see LoFTREncoderLayer
    fused_heads: bool = False        # see LoFTREncoderLayer
    # two-image self-layer packing: 'concat' | 'interleave' (ops/packing.py)
    batch_packing: str = "concat"
    # mesh axis name to shard the token (L/S) axis over, or None.  Requires
    # an ambient mesh (jax.set_mesh) containing that axis.  Capability
    # matrix: 'linear' attention shards with a single tiny psum of the
    # global KV stats (parallel/seq_attention.py); 'full' attention keeps
    # queries token-sharded and lets GSPMD all-gather K/V per layer (the
    # [l_loc, S] score block stays device-local).  An explicit ring K/V
    # exchange (never gathers full K/V) is available as
    # parallel.seq_attention.ring_full_attention for shard_map callers.
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feat0, feat1,
                 mask0: Optional[jax.Array] = None,
                 mask1: Optional[jax.Array] = None):
        """feat0: [B, L, C]; feat1: [B, S, C]."""
        same_shape = feat0.shape == feat1.shape
        masks_same = (mask0 is None) == (mask1 is None)
        if self.seq_axis is not None:
            # both 'linear' and 'full' work under token sharding: linear's
            # cross-token contraction psums tiny KV stats; full's softmax
            # makes GSPMD all-gather K/V while the [l_loc, S] score block
            # stays sharded on the query axis (see class docstring)
            feat0 = _seq_constrain(feat0, self.seq_axis)
            feat1 = _seq_constrain(feat1, self.seq_axis)
            mask0 = _seq_constrain(mask0, self.seq_axis)
            mask1 = _seq_constrain(mask1, self.seq_axis)
        for idx, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(self.d_model, self.nhead,
                                      self.attention, self.dtype,
                                      self.fused_window_attn,
                                      self.fused_heads,
                                      name=f"layer_{idx}")
            if name == "self":
                if same_shape and masks_same:
                    # batch both images through one call (bigger matmuls);
                    # packing mode concat/interleave per batch_packing
                    # (interleave = shard-local under data parallelism)
                    from loftr_tpu.ops.packing import pack_rows, unpack_rows
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
                # NB: sequential, matching transformer.py:96-97 - feat1's
                # update attends to the *already updated* feat0.
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
            if self.seq_axis is not None:
                # re-pin after every layer so XLA never falls back to a
                # replicated layout mid-stack
                feat0 = _seq_constrain(feat0, self.seq_axis)
                feat1 = _seq_constrain(feat1, self.seq_axis)
        return feat0, feat1
