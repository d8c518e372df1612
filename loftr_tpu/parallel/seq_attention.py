"""Sequence-parallel linear attention over a mesh axis.

New capability beyond the reference (SURVEY.md §5.7: the reference scales
sequence length only algorithmically, within one device).  Linear attention's
global quantities are plain sums over the key/value sequence:

    KV   = sum_s phi(K_s) V_s^T      (per head, [D, Dv])
    ksum = sum_s phi(K_s)            ([D])

so sharding the token axis across a 'seq' mesh axis needs exactly one psum
of a tiny [H, D, Dv+1] tensor - no ring permutation, no O(L*S) exchange.
Query rows stay fully local.  This makes very large images / maps (L >> 1e5)
trainable across chips with near-zero communication.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loftr_tpu.ops.attention import elu_feature_map


def _local_kv_stats(k, v, kv_mask):
    """Local shard contributions: (kv [B,H,D,Dv], ksum [B,H,D])."""
    K = elu_feature_map(k)
    if kv_mask is not None:
        m = kv_mask[:, :, None, None].astype(K.dtype)
        K = K * m
        v = v * m
    f32 = jnp.float32
    kv = jnp.einsum("bshd,bshv->bhdv", K, v, preferred_element_type=f32)
    ksum = jnp.sum(K.astype(f32), axis=1)
    return kv, ksum


def seq_parallel_linear_attention(q, k, v,
                                  q_mask=None, kv_mask=None,
                                  axis_name: str = "seq",
                                  total_s: Optional[int] = None,
                                  eps: float = 1e-6):
    """Linear attention with the token axis sharded over `axis_name`.

    Call inside shard_map/pjit with q/k/v local shards [B, l_loc, H, D] /
    [B, s_loc, H, D].  ``total_s`` is the GLOBAL key length (for the
    fp16-guard divide/multiply round trip, linear_attention.py:41-45);
    defaults to s_loc * axis_size.
    Output: local [B, l_loc, H, D] - numerically equal to the single-device
    linear_attention on the gathered sequences.
    """
    n_shards = jax.lax.axis_size(axis_name)
    s_loc = v.shape[1]
    s_total = total_s if total_s is not None else s_loc * n_shards

    kv_local, ksum_local = _local_kv_stats(k, v / s_total, kv_mask)
    kv = jax.lax.psum(kv_local, axis_name)      # [B, H, D, Dv]
    ksum = jax.lax.psum(ksum_local, axis_name)  # [B, H, D]

    Q = elu_feature_map(q)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    f32 = jnp.float32
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q.astype(f32), ksum) + eps)
    qkv = jnp.einsum("blhd,bhdv->blhv", Q, kv.astype(q.dtype),
                     preferred_element_type=f32)
    out = qkv * z[..., None] * s_total
    return out.astype(q.dtype)


def make_sharded_attention(mesh: Mesh, axis_name: str = "seq"):
    """shard_map-wrapped entry: takes GLOBAL [B, L, H, D] arrays sharded on
    the token axis and runs the seq-parallel kernel."""
    from jax import shard_map

    spec = P(None, axis_name, None, None)
    mspec = P(None, axis_name)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec, spec, mspec, mspec),
             out_specs=spec)
    def fn(q, k, v, q_mask, kv_mask):
        return seq_parallel_linear_attention(
            q, k, v, q_mask, kv_mask, axis_name=axis_name,
            total_s=None)

    return fn
