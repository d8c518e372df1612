#!/usr/bin/env python
"""Accuracy-guarded "turbo" preset A/B (round-5 verdict ask #5).

`indoor_ds_turbo` (config.py) trims the two biggest round-4 ledger blocks:
a true-128 middle backbone stage (the shipped 196 is zero-padded to 256
MXU lanes, ~41% wasted FLOPs) and a halved fine capacity (max_matches
1024 -> 512).  Neither is checkpoint-compatible with released weights, so
the preset ships only with BOTH sides of the trade measured:

  throughput: bench.py --preset {indoor_ds, indoor_ds_turbo} at the
      flagship 640x480 B=64 bf16 shape (chip);
  accuracy:   train the FULL-SIZE default and FULL-SIZE turbo models on
      identical synthetic scenes / schedule (tools/synthetic_benchmark.py
      generator + production Trainer, on the chip at 256 px), evaluate
      both through the production test.py CLI, and compare pose AUC.

Usage (on the chip, ~40 min):
  python tools/turbo_ab.py --work-dir /tmp/turboab --steps 1500 \
      --out perf/turbo_ab.json
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# Full-size model overrides: undo tools/synthetic_benchmark.SMALL_MODEL
# back up to the flagship geometry (config.py defaults), parameterized by
# the preset's trims.  train_matches is pinned (not the percent-derived
# 204) so both arms train the fine stage on identical window budgets.
def full_model_overrides(turbo: bool) -> dict:
    return {"loftr": {
        "dtype": "bfloat16",  # shipped training default (round 4)
        "backbone": {"initial_dim": 128,
                     "block_dims": [128, 128, 256] if turbo
                     else [128, 196, 256]},
        "coarse": {"d_model": 256, "nhead": 8,
                   "layer_names": ["self", "cross"] * 4},
        "fine": {"d_model": 128, "nhead": 8,
                 "layer_names": ["self", "cross"]},
        "match_coarse": {"max_matches": 512 if turbo else 1024,
                         "train_matches": 192,
                         "train_pad_num_gt_min": 24,
                         "thr": 0.2},
    }}


def bench_preset(preset: str) -> dict:
    cmd = [sys.executable, osp.join(REPO, "bench.py"), "--preset", preset]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"bench.py --preset {preset} failed:\n"
                           f"{out.stdout}\n{out.stderr}")
    last = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(last)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", default="/tmp/turboab")
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--img-resize", type=int, default=256)
    ap.add_argument("--train-scenes", type=int, default=6)
    ap.add_argument("--test-scenes", type=int, default=3)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-convergence", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.synthetic_benchmark import (evaluate_cli, generate_data,
                                           train)

    t0 = time.time()
    artifact = {"config": vars(args), "arms": {}}

    if not args.skip_bench:
        for arm, preset in (("default", "indoor_ds"),
                            ("turbo", "indoor_ds_turbo")):
            b = bench_preset(preset)
            artifact["arms"].setdefault(arm, {})["bench_640x480_b64"] = b
            print(f"{arm} bench: {b}", flush=True)

    if not args.skip_convergence:
        os.makedirs(args.work_dir, exist_ok=True)
        train_npzs, test_idx = generate_data(
            args.work_dir, args.train_scenes, args.test_scenes, args.views,
            args.img_size, args.seed)
        for arm, turbo in (("default", False), ("turbo", True)):
            ov = full_model_overrides(turbo)
            print(f"=== arm {arm} (turbo={turbo}) ===", flush=True)
            ckpt, losses = train(
                args.work_dir, train_npzs, args.img_size, args.img_resize,
                args.steps, args.batch, args.lr, args.seed,
                extra_overrides=ov, ckpt_name=f"ckpt_{arm}")
            res = evaluate_cli(args.work_dir, test_idx, ckpt,
                               args.img_resize, extra_cfg=ov)
            artifact["arms"].setdefault(arm, {}).update({
                "auc": res,
                "loss_per50": [round(float(np.mean(losses[i:i + 50])), 4)
                               for i in range(0, len(losses), 50)],
            })
            print(arm, res, flush=True)

    artifact["wall_s"] = round(time.time() - t0, 1)
    out = args.out or osp.join(REPO, "perf", "turbo_ab.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
