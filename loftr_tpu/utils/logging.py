"""Structured metrics logging (rank-zero, JSONL + optional figures).

Replaces the reference's loguru/TensorBoard stack (misc.py:31-40,
train.py:89-98, lightning_loftr.py:116-131): metric scalars stream as JSONL
lines (easily tailed/plotted/ingested); match-visualization figures save as
PNGs via utils/plotting.  Everything is muted off process 0.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Mapping, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, echo: bool = True,
                 name: str = "metrics"):
        self.enabled = jax.process_index() == 0
        self.echo = echo
        self._fh: Optional[IO] = None
        self._t0 = time.time()
        if self.enabled and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
        self.log_dir = log_dir

    def log(self, step: int, scalars: Mapping[str, float], **extra) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": round(time.time() - self._t0, 2),
               **{k: float(v) for k, v in scalars.items()}, **extra}
        line = json.dumps(rec)
        if self.echo:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def log_figures(self, step: int, figures, prefix: str = "match") -> None:
        """Save matplotlib figures (utils/plotting output) as PNGs."""
        if not self.enabled or not self.log_dir:
            return
        import matplotlib.pyplot as plt
        fig_dir = os.path.join(self.log_dir, "figures")
        os.makedirs(fig_dir, exist_ok=True)
        for i, fig in enumerate(figures):
            fig.savefig(os.path.join(
                fig_dir, f"{prefix}_step{step:08d}_{i}.png"),
                bbox_inches="tight")
            plt.close(fig)

    def close(self):
        if self._fh:
            self._fh.close()
