"""Benchmark harness: matcher throughput on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference reports ~116 ms/pair (~8.6 pairs/s) for LoFTR-DS at
640x480 on an RTX 2080Ti (paper, arXiv:2104.00680; see BASELINE.md).
vs_baseline = measured pairs/s / 8.62.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_S = 1000.0 / 116.0  # ~8.62, RTX 2080Ti (BASELINE.md)


def main():
    import argparse
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas matching kernel")
    args = ap.parse_args()

    B, H, W = args.batch, 480, 640
    iters, warmup = args.iters, 5

    ap_over = {"loftr": {"dtype": args.dtype,
                         "match_coarse": {"use_pallas": args.pallas}}}
    cfg = get_config("indoor_ds", ap_over)
    model = LoFTR(cfg.loftr)
    rng = np.random.RandomState(0)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return MatchInput(
            image0=jnp.asarray(r.rand(B, H, W, 1), jnp.float32),
            image1=jnp.asarray(r.rand(B, H, W, 1), jnp.float32),
        )

    inp = make_batch(0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)

    # The axon relay has a large, variable per-dispatch latency (~15-150 ms)
    # and consecutive dispatches do not pipeline, so throughput is measured
    # at a serving-realistic batch size to amortize the fixed dispatch cost.
    @jax.jit
    def run(v, b):
        return jnp.sum(model.apply(v, b).mkpts0_f)

    batches = [make_batch(s) for s in range(2)]
    # warmup + hard sync (device->host read; block_until_ready alone may not
    # sync through the relay)
    for i in range(warmup):
        acc = run(variables, batches[i % 2])
    float(acc)

    t0 = time.perf_counter()
    accs = [run(variables, batches[i % 2]) for i in range(iters)]
    _ = float(sum(accs))  # host fetch = hard sync
    dt = time.perf_counter() - t0

    pairs_per_s = B * iters / dt
    result = {
        "metric": "loftr_ds_640x480_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / REFERENCE_PAIRS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
