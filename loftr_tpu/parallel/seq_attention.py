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


def ring_full_attention(q, k, v, q_mask=None, kv_mask=None,
                        axis_name: str = "seq"):
    """Softmax (full) attention with the token axis sharded over `axis_name`.

    The sequence-parallel equivalent of the reference's FullAttention
    fallback (/root/reference/src/loftr/loftr_module/linear_attention.py:50-81)
    — SURVEY.md §5.7's "ring-style K/V exchange".  K/V/mask shards rotate
    around the ring via ``ppermute`` while each device folds the visiting
    block into a numerically-stable online softmax (flash-attention
    recurrence: running max / running normalizer / rescaled accumulator).
    Peak per-device score block is [B, l_loc, H, s_loc] — the full [L, S]
    matrix is never materialized anywhere, and the exchange volume is the
    K/V shards themselves (O(S·D), not O(L·S)).

    Call inside shard_map with local shards q [B, l_loc, H, D],
    k/v [B, s_loc, H, D], masks [B, l_loc] / [B, s_loc].
    Output: local [B, l_loc, H, D], numerically equal (up to fp reduction
    order) to single-device :func:`loftr_tpu.ops.attention.full_attention`,
    including its zero-output convention for fully-masked query rows.
    """
    n_shards = jax.lax.axis_size(axis_name)
    B, l_loc, H, D = q.shape
    s_loc = k.shape[1]
    f32 = jnp.float32
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, f32))
    NEG = jnp.asarray(-1e30, f32)  # finite stand-in for -inf (keeps exp/max
    # well-defined when a whole block is masked)

    if kv_mask is None:
        kv_mask = jnp.ones((B, s_loc), bool)
    kv_mask = kv_mask.astype(bool)

    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    def step(_, carry):
        k_c, v_c, m_c, run_max, run_den, acc = carry
        s = jnp.einsum("blhd,bshd->blhs", q, k_c,
                       preferred_element_type=f32) * scale
        s = jnp.where(m_c[:, None, None, :], s, NEG)
        blk_max = jnp.max(s, axis=-1)                       # [B, l, H]
        new_max = jnp.maximum(run_max, blk_max)
        corr = jnp.exp(run_max - new_max)
        p = jnp.exp(s - new_max[..., None])                 # [B, l, H, s]
        # masked columns: s == NEG, and new_max >= any real score, so
        # p == exp(NEG - new_max) == 0 except in the all-masked-so-far case
        # (guarded after the loop via run_max).
        run_den = run_den * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "blhs,bshd->blhd", p.astype(v.dtype), v_c,
            preferred_element_type=f32)
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        m_c = jax.lax.ppermute(m_c, axis_name, perm)
        return (k_c, v_c, m_c, new_max, run_den, acc)

    # derive carry inits from q so they carry the same shard_map
    # varying-axes type as the loop outputs (zeros_like keeps {V:axis})
    init = (k, v, kv_mask,
            jnp.zeros_like(q[..., 0], f32) + NEG,
            jnp.zeros_like(q[..., 0], f32),
            jnp.zeros_like(q, f32))
    *_, run_max, run_den, acc = jax.lax.fori_loop(0, n_shards, step, init)

    # fully-masked rows (max never left NEG): zero output, matching the
    # oracle's nan_to_num(softmax(-inf)) convention
    alive = run_max > (NEG * 0.5)
    out = jnp.where(alive[..., None],
                    acc / jnp.maximum(run_den, 1e-30)[..., None], 0.0)
    if q_mask is not None:
        out = out * q_mask[:, :, None, None].astype(out.dtype)
    return out.astype(q.dtype)


def make_sharded_attention(mesh: Mesh, axis_name: str = "seq",
                           kind: str = "linear"):
    """shard_map-wrapped entry: takes GLOBAL [B, L, H, D] arrays sharded on
    the token axis and runs the seq-parallel kernel.

    kind: 'linear' (psum of tiny KV stats) or 'full' (ring K/V exchange,
    :func:`ring_full_attention`)."""
    from jax import shard_map

    spec = P(None, axis_name, None, None)
    mspec = P(None, axis_name)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec, spec, mspec, mspec),
             out_specs=spec)
    def fn(q, k, v, q_mask, kv_mask):
        if kind == "full":
            return ring_full_attention(q, k, v, q_mask, kv_mask,
                                       axis_name=axis_name)
        return seq_parallel_linear_attention(
            q, k, v, q_mask, kv_mask, axis_name=axis_name,
            total_s=None)

    return fn
