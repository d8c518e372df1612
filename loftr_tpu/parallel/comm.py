"""Cross-process (multi-host) object communication.

TPU-native replacement for the reference's pickled-object gather over a
cached Gloo side group (/root/reference/src/utils/comm.py:83-176): arbitrary
Python objects are pickled to uint8 payloads, padded to the max payload size
(sizes exchanged first), and exchanged with
``jax.experimental.multihost_utils.process_allgather`` - which only supports
same-shape numeric arrays, hence the pad-to-max dance (comm.py:95-130 does
exactly the same over torch.distributed).

Used by the evaluator to merge per-pair metric lists (strings + ragged
arrays) across hosts.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def process_allgather_objects(obj: Any) -> List[Any]:
    """Gather one arbitrary picklable object per process; every process
    returns the full ``[obj_process0, obj_process1, ...]`` list.

    Single-process: returns ``[obj]`` without touching the network.
    """
    import jax

    n = jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))          # [P, 1]
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # [P, max_size]
    return [
        pickle.loads(np.asarray(gathered[i, : int(sizes[i][0])]).tobytes())
        for i in range(n)
    ]
