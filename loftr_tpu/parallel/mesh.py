"""Device mesh + sharding utilities.

TPU-native replacement for the reference's process-imperative DDP setup
(/root/reference/train.py:104-116, src/utils/comm.py): parallelism is
declared as a `jax.sharding.Mesh` with named axes and `NamedSharding`s;
XLA's GSPMD partitioner inserts the collectives (psum for gradients over
ICI/DCN - the NCCL all-reduce equivalent, SURVEY.md §2.6).

Axes:
  'data' - batch-parallel (the reference's only strategy, DDP).
  'model' - reserved for tensor-parallel sharding of d_model (optional).

Under jit-with-sharding, reductions over the batch axis are *global* by
semantics, so BatchNorm statistics are automatically synchronized - the
GSPMD equivalent of sync_batchnorm (train.py:108), with no side-channel.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh over available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def make_seq_mesh(n_data: Optional[int] = None, n_seq: int = 1,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A ('data', 'seq') mesh for sequence-parallel runs.

    'seq' shards the coarse token axis inside the transformer
    (models/transformer.py::_seq_constrain, cfg.loftr.coarse.seq_axis='seq')
    so very large images (L >> 1e4) fit across chips; communication is one
    psum of the tiny [H, D, Dv+1] linear-attention statistics per layer.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_seq
    grid = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, ("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    sh = batch_sharding(mesh)

    def place(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
