#!/usr/bin/env python
"""Multi-seed statistics for the flagship synthetic-AUC benchmark
(round-5 verdict asks #6 and #9 in one sweep).

For each seed: generate a fresh flagship-config scene set
(tools/synthetic_benchmark.py generator, 6 train / 3 held-out scenes,
63 eval pairs), then train BOTH predicted-slot sampling semantics
(``per_pair`` — the shipped default — and ``global_replacement`` — the
reference's batch-global emulation,
/root/reference/src/loftr/utils/coarse_matching.py:198-236) on identical
data and evaluate through the production test.py CLI.

Outputs per-arm mean +/- spread over seeds for AUC@{5,10,20} and
precision:
  - the ``per_pair`` rows ARE the flagship artifact's noise bars
    (perf/synthetic_auc.json was seed 0 of exactly this config);
  - the paired per-seed deltas decide whether the sampling deviation is
    benign (round-4 single-seed A/B saw auc@20 0.43 vs 0.25 and could
    not tell noise from effect).

Usage (on the chip, ~20 min/seed):
  python tools/seed_sweep.py --seeds 0 1 2 --out perf/seed_sweep.json
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

METRICS = ("auc@5", "auc@10", "auc@20", "prec@1e-04")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", default="/tmp/seedsweep")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--arms", nargs="+",
                    default=["per_pair", "global_replacement"])
    # flagship config (perf/synthetic_auc.json)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--img-resize", type=int, default=256)
    ap.add_argument("--train-scenes", type=int, default=6)
    ap.add_argument("--test-scenes", type=int, default=3)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.synthetic_benchmark import (evaluate_cli, generate_data,
                                           train)

    t0 = time.time()
    runs = []
    for seed in args.seeds:
        wd = osp.join(args.work_dir, f"seed{seed}")
        os.makedirs(wd, exist_ok=True)
        train_npzs, test_idx = generate_data(
            wd, args.train_scenes, args.test_scenes, args.views,
            args.img_size, seed)
        for arm in args.arms:
            print(f"=== seed {seed} arm {arm} ===", flush=True)
            ckpt, losses = train(
                wd, train_npzs, args.img_size, args.img_resize,
                args.steps, args.batch, args.lr, seed,
                train_sampling=arm, ckpt_name=f"ckpt_{arm}")
            res = evaluate_cli(wd, test_idx, ckpt, args.img_resize,
                               extra_env={"JAX_PLATFORMS": "cpu"})
            runs.append({"seed": seed, "arm": arm, **res,
                         "final_loss_per50": round(
                             float(np.mean(losses[-50:])), 4)})
            print(runs[-1], flush=True)

    summary = {}
    for arm in args.arms:
        vals = {m: [r[m] for r in runs if r["arm"] == arm] for m in METRICS}
        summary[arm] = {
            m: {"mean": round(float(np.mean(v)), 4),
                "std": round(float(np.std(v)), 4),
                "min": round(float(np.min(v)), 4),
                "max": round(float(np.max(v)), 4),
                "per_seed": [round(float(x), 4) for x in v]}
            for m, v in vals.items()}
    if all(a in args.arms for a in ("per_pair", "global_replacement")):
        # paired per-seed deltas (per_pair - global_replacement)
        summary["paired_delta"] = {}
        for m in METRICS:
            d = [next(r[m] for r in runs
                      if r["seed"] == s and r["arm"] == "per_pair")
                 - next(r[m] for r in runs
                        if r["seed"] == s
                        and r["arm"] == "global_replacement")
                 for s in args.seeds]
            summary["paired_delta"][m] = {
                "mean": round(float(np.mean(d)), 4),
                "std": round(float(np.std(d)), 4),
                "per_seed": [round(float(x), 4) for x in d]}

    artifact = {"config": vars(args), "runs": runs, "summary": summary,
                "wall_s": round(time.time() - t0, 1)}
    out = args.out or osp.join(REPO, "perf", "seed_sweep.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
