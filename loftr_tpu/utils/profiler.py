"""Profiling harness.

TPU-native equivalent of /root/reference/src/utils/profiler.py:
  - :class:`RegionProfiler` replaces InferenceProfiler (profiler.py:7-27):
    wall-clock region timing with a hard device sync (device->host read; the
    axon relay's block_until_ready may not actually block) and a printable
    summary, muted off process 0.
  - :func:`trace` wraps jax.profiler tracing (the PyTorchProfiler analogue,
    profiler.py:34-35) - view with TensorBoard/XProf.
  - region scopes also emit jax.named_scope so ops group in traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def hard_sync(tree=None) -> None:
    """Force device completion by a device->host read."""
    if tree is None:
        jnp.zeros(()).block_until_ready()
        return
    leaves = [x for x in jax.tree.leaves(tree)
              if isinstance(x, jax.Array)]
    if leaves:
        _ = float(jnp.sum(leaves[0].ravel()[0].astype(jnp.float32)))


class RegionProfiler:
    """Named-region wall timing with device sync at region edges."""

    def __init__(self, enabled: bool = True, sync: bool = True):
        self.enabled = enabled and jax.process_index() == 0
        self.sync = sync
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def profile(self, name: str, result=None):
        if not self.enabled:
            with jax.named_scope(name):
                yield
            return
        if self.sync:
            hard_sync()
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if self.sync:
            hard_sync(result)
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        lines = [f"{'region':<32} {'calls':>6} {'mean ms':>10} {'total s':>9}"]
        for name, ts in sorted(self.times.items()):
            lines.append(f"{name:<32} {len(ts):>6} "
                         f"{1000 * sum(ts) / len(ts):>10.2f} "
                         f"{sum(ts):>9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (open with xprof/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def build_profiler(name: Optional[str] = None) -> RegionProfiler:
    """Factory mirroring build_profiler (profiler.py:30-39)."""
    if name == "inference":
        return RegionProfiler(enabled=True, sync=True)
    if name is None:
        return RegionProfiler(enabled=False)
    raise ValueError(f"unknown profiler {name!r} (use 'inference' or the "
                     "trace() context manager for full XProf traces)")
