"""Checkpoint save/restore via orbax.

TPU-native equivalent of the reference's PL ModelCheckpoint + torch.load
(/root/reference/train.py:90-101, src/lightning/lightning_loftr.py:46-49,
SURVEY.md §5.4): params + batch_stats + optimizer state + step are one
pytree; top-k retention by monitored metric (auc@10, mode=max) mirrors
``ModelCheckpoint(monitor='auc@10', save_top_k=5, save_last=True)``.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 5,
                 monitor: str = "auc@10", mode: str = "max"):
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=(lambda m: m.get(monitor, -float("inf"))),
            best_mode=mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._mgr.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot params-only save (library checkpoints, ~ the released 45MB
    ckpts, README.md:60)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
