#!/usr/bin/env python
"""Serving-path latency/throughput benchmark (round-4 verdict item #10).

Drives serve.MatchingService on the attached chip at several concurrency
levels and records p50/p99 request latency + sustained throughput to
perf/serve_bench.json.  The service path adds micro-batching (flush window,
rung rounding, pipelined dispatch) on top of the raw jitted matcher, so its
numbers are the ones a deployment actually sees.

Usage: timeout 1100 python tools/serve_bench.py [--pairs 64] [--out perf/serve_bench.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_level(svc, images, concurrency: int, n_pairs: int) -> dict:
    """Submit n_pairs requests keeping `concurrency` in flight; return
    latency percentiles + throughput."""
    lat = []
    lat_lock = threading.Lock()
    sem = threading.Semaphore(concurrency)
    done = threading.Semaphore(0)

    def submit_one(i):
        img0, img1 = images[i % len(images)]
        t0 = time.perf_counter()
        fut = svc.submit(img0, img1)

        def _cb(f, t0=t0):
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)
            sem.release()
            done.release()

        fut.add_done_callback(_cb)

    t_start = time.perf_counter()
    for i in range(n_pairs):
        sem.acquire()
        submit_one(i)
    for _ in range(n_pairs):
        done.acquire()
    wall = time.perf_counter() - t_start
    lat_ms = np.asarray(sorted(lat)) * 1e3
    return {
        "concurrency": concurrency,
        "n_pairs": n_pairs,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "throughput_pairs_per_s": round(n_pairs / wall, 2),
        "wall_s": round(wall, 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", type=int, default=64,
                    help="requests per concurrency level")
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--out", default="perf/serve_bench.json")
    ap.add_argument("--bucket", type=int, nargs=2, default=[480, 640])
    ap.add_argument("--stack-workers", type=int, nargs="+", default=[0, 2],
                    help="service stack_workers arms to A/B (0 = inline "
                         "round-4 path, 2 = shipped pipelined default)")
    args = ap.parse_args()

    import jax
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.serve import MatchingService

    bh, bw = args.bucket
    cfg = get_config("indoor_ds", {"loftr": {"dtype": "bfloat16"}})
    model = LoFTR(cfg.loftr)
    ex = MatchInput(
        image0=np.zeros((1, bh, bw, 1), np.float32),
        image1=np.zeros((1, bh, bw, 1), np.float32),
        mask0=np.ones((1, bh // 8, bw // 8), bool),
        mask1=np.ones((1, bh // 8, bw // 8), bool),
        scale0=np.ones((1, 2), np.float32),
        scale1=np.ones((1, 2), np.float32))
    variables = model.init(jax.random.PRNGKey(0), ex)

    rng = np.random.RandomState(0)
    images = [(rng.randint(0, 255, (bh, bw), dtype=np.uint8),
               rng.randint(0, 255, (bh, bw), dtype=np.uint8))
              for _ in range(8)]

    # A/B the double-buffered host stacking (stack_workers=2, the shipped
    # default) against inline stacking (stack_workers=0, the round-4
    # configuration) — the measurement behind the serve-vs-raw-loop gap
    # attribution (round-4 verdict weak #5 / ask #8).  Per-level phase
    # means (stack / dispatch / fetch) come from ServiceStats.phase_ms.
    arms = {}
    batch_rungs = flush_ms = None
    for workers in args.stack_workers:
        # default rungs (max 8): measured BEST at concurrency 32 (36.9
        # pairs/s vs 32.9 with rungs up to 32 — bigger rungs add
        # batch-fill latency and reduce queue_depth=2 pipeline overlap)
        svc = MatchingService(variables, buckets=((bh, bw),),
                              stack_workers=workers)
        batch_rungs, flush_ms = list(svc.batch_sizes), svc.flush_s * 1e3
        print(f"warmup stack_workers={workers} "
              "(compiles every rung, cached after the first arm)...",
              flush=True)
        t0 = time.perf_counter()
        svc.warmup()
        print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

        levels = []
        for c in args.levels:
            svc.stats.reset()  # per-level phase means / batch histogram
            r = run_level(svc, images, c, args.pairs)
            snap = svc.stats.snapshot()
            r["phase_ms_mean"] = snap["phase_ms_mean"]
            r["batch_hist"] = snap["batch_hist"]
            print(json.dumps(r), flush=True)
            levels.append(r)
        svc.close()
        arms[f"stack_workers={workers}"] = levels

    out = {
        "bucket": [bh, bw],
        "dtype": "bfloat16",
        "batch_rungs": batch_rungs,
        "flush_ms": flush_ms,
        "device": str(jax.devices()[0]),
        "arms": arms,
        "note": "request latency measured submit->Future-resolution, "
                "including preprocess, micro-batch flush wait, device "
                "dispatch over the axon relay, and postprocess; "
                "phase_ms_mean are per-level per-batch means of host "
                "assembly+H2D (stack), jitted-call return (dispatch), and "
                "device execution + device->host result pull (fetch)",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
