"""Shard-local batch packing for the two-image fast paths.

The reference packs both images through one backbone/self-attention call by
concatenating on the batch axis (loftr.py:45-49, transformer self layers).
A plain ``concatenate([a, b], 0)`` is hostile to data parallelism: with the
batch axis sharded over a mesh, rows of `b` must MOVE to other devices and
back (measured on the GSPMD-compiled 8-way train step: 1.5 GB/step of
all-to-all + collective-permute traffic on full fine-resolution feature
maps — tools/scaling_model.py).

Interleaved packing keeps every pair's two rows on that pair's device:

    pack_rows(a, b)[2*i]     = a[i]
    pack_rows(a, b)[2*i + 1] = b[i]

The merged axis is (sharded-major x 2-minor), which GSPMD reshapes locally
— zero collectives.  All packed ops are row-independent except BatchNorm's
batch statistics, which sum the same elements in a different order (fp
reduction wobble only; identical at B=1, so the golden fixtures are
unaffected).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_rows(a: jax.Array, b: jax.Array,
              mode: str = "interleave") -> jax.Array:
    """[N, ...] x 2 -> [2N, ...].

    mode 'interleave': rows alternate a[0], b[0], a[1], b[1], ... —
    shard-local under a batch-sharded N axis.  mode 'concat': the
    reference's [a; b] layout — measured ~3% faster on ONE chip (better
    XLA layout for the big convs) but reshards activations under data
    parallelism.  The model selects via cfg.batch_packing."""
    if mode == "concat":
        return jnp.concatenate([a, b], axis=0)
    return jnp.stack([a, b], axis=1).reshape((-1,) + tuple(a.shape[1:]))


def unpack_rows(x: jax.Array, mode: str = "interleave"):
    """Inverse of :func:`pack_rows`: [2N, ...] -> ([N, ...], [N, ...])."""
    if mode == "concat":
        a, b = jnp.split(x, 2, axis=0)
        return a, b
    y = x.reshape((-1, 2) + tuple(x.shape[1:]))
    return y[:, 0], y[:, 1]
