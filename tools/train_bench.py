#!/usr/bin/env python
"""Training-step benchmark: pairs/s + step time for the full jitted train
step (supervision -> forward -> loss -> grad -> clip -> update) on the real
chip.

Fills the BASELINE.md gap "train-step pairs/s / step-time / MFU" (the
reference publishes only cluster sizes, docs/TRAINING.md:60: 32-64 GPUs for
ScanNet 640x480).  Sweeps the fused Pallas focal-loss path on/off
(config.loss.use_pallas, ops/pallas/focal_loss.py).

Usage:  python tools/train_bench.py [--batch 4] [--iters 12] [--res 640x480]
Writes one JSON line per variant; also saved to perf/train_bench.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--res", default="640x480")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "perf", "train_bench.json"))
    args = p.parse_args()

    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import MatchInput, get_config
    from loftr_tpu.train.trainer import Trainer

    W, H = (int(t) for t in args.res.split("x"))
    B = args.batch
    rng = np.random.RandomState(0)
    K = np.array([[[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]]] * B,
                 np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    batch = MatchInput(
        image0=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        depth0=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        depth1=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
        K0=jnp.asarray(K), K1=jnp.asarray(K))
    example = jax.tree.map(lambda x: x[:1], batch)

    results = []
    for fused_loss in (False, True):
        cfg = get_config("indoor_ds", {
            "loftr": {"dtype": args.dtype,
                      "loss": {"use_pallas": fused_loss}},
            "trainer": {"scheduler_interval": "step",
                        "warmup_step": 100}})
        trainer = Trainer(cfg, world_size=1, batch_size_per_device=B)
        state = trainer.init_state(jax.random.PRNGKey(0), example)
        # warmup: compile + one step; hard sync via host fetch
        state, scalars = trainer.train_step(state, batch)
        _ = float(scalars["loss"])

        t_done = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, scalars = trainer.train_step(state, batch)
            _ = float(scalars["loss"])  # host fetch = hard sync
            t_done.append(time.perf_counter())
        deltas = np.diff([t0] + t_done)
        dt = float(np.median(deltas))
        rec = {
            "metric": f"train_step_{W}x{H}_pairs_per_s",
            "fused_focal_loss": fused_loss,
            "batch": B,
            "step_ms": round(dt * 1e3, 2),
            "pairs_per_s": round(B / dt, 2),
            "p10_pairs_per_s": round(B / float(np.percentile(deltas, 90)), 2),
            "loss_finite": bool(np.isfinite(float(scalars["loss"]))),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"results": results,
                   "note": "per-dispatch median incl. relay latency; "
                           "one TPU v5e chip via axon relay"}, f, indent=1)


if __name__ == "__main__":
    main()
