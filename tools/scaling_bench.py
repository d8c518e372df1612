#!/usr/bin/env python
"""Scaling-efficiency harness: matcher throughput at 1..N devices.

BASELINE.json requires reporting pairs/s scaling efficiency (target >= 0.8
from 1 chip to N).  On this image only one physical chip exists, so the
harness doubles as a sharding-correctness benchmark on fake CPU devices
(--platform cpu --devices 8); on a real slice it measures true ICI scaling.

Usage:
  python tools/scaling_bench.py                 # real chip(s)
  JAX_PLATFORMS=cpu python tools/scaling_bench.py --devices 8 --tiny
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
    p.add_argument("--devices", type=int, default=0,
                   help="max devices to sweep (0 = all available)")
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + 64x64 inputs (CPU fake-device mode)")
    args = p.parse_args()

    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.parallel.mesh import make_mesh, shard_batch

    n_avail = len(jax.devices())
    n_max = min(args.devices or n_avail, n_avail)

    if args.tiny:
        over = {"loftr": {
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"max_matches": 16}}}
        H, W = 64, 64
    else:
        over = {"loftr": {"dtype": "bfloat16",
                          "match_coarse": {"use_pallas": True}}}
        H, W = 480, 640
    cfg = get_config("indoor_ds", over)
    model = LoFTR(cfg.loftr)

    def make_batch(n_pairs, seed=0):
        r = np.random.RandomState(seed)
        return MatchInput(
            image0=jnp.asarray(r.rand(n_pairs, H, W, 1), jnp.float32),
            image1=jnp.asarray(r.rand(n_pairs, H, W, 1), jnp.float32))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), make_batch(1))
    results = {}
    n = 1
    sweep = []
    while n <= n_max:
        sweep.append(n)
        n *= 2
    records = []
    for n_dev in sweep:
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        B = args.batch_per_device * n_dev
        batch = make_batch(B, seed=1)
        with jax.set_mesh(mesh):
            sharded = shard_batch(mesh, batch)
            fwd = jax.jit(lambda v, i: jnp.sum(model.apply(v, i).mkpts0_f))
            float(fwd(variables, sharded))  # warmup + sync
            t0 = time.perf_counter()
            accs = [fwd(variables, sharded) for _ in range(args.iters)]
            _ = float(sum(accs))
            dt = time.perf_counter() - t0
        pps = B * args.iters / dt
        results[n_dev] = pps
        eff = pps / (results[1] * n_dev)
        rec = {"devices": n_dev, "pairs_per_s": round(pps, 2),
               "scaling_efficiency": round(eff, 3)}
        records.append(rec)
        print(json.dumps(rec))

    out = os.path.join(os.path.dirname(__file__), "..", "perf",
                       "scaling_bench.json")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as f:
        json.dump({
            "backend": jax.default_backend(),
            "tiny": bool(args.tiny),
            "note": ("fake CPU devices share the same host cores, so "
                     "efficiency numbers are meaningless there - the sweep "
                     "is a sharding-correctness/throughput harness; on a "
                     "real multi-chip slice it measures true ICI scaling "
                     "(only one physical chip exists in this image)"),
            "results": records}, f, indent=1)


if __name__ == "__main__":
    main()
