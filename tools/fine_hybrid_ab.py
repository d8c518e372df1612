#!/usr/bin/env python
"""Convergence + throughput A/B for the training-time hybrid fused fine
stage (ops/fine_stage_hybrid.py; round-5 verdict ask #2).

Arms (identical data, seeds, schedule; bf16, fine d_model=128 so the
kernel's TPU lane gate passes — the shipped flagship fine width):
  A: fine.use_pallas_train = False   (plain XLA fine stage, status quo)
  B: fine.use_pallas_train = True    (Pallas fwd + recomputed-XLA bwd)

Reports per-arm loss curves, held-out pose AUC through the production
test.py CLI, and the measured train-step time at the flagship benchmark
shape (640x480 B=8) for both arms.  Ship gate: B defaults ON only if AUC
is within noise of A AND the step is faster.

Usage (on the chip, ~25 min):
  python tools/fine_hybrid_ab.py --work-dir /tmp/fineab --steps 800 \
      --out perf/fine_hybrid_ab.json
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

# lane-legal fine stage (d_f 128) on top of the synthetic-benchmark model;
# bf16 so the kernel's TPU dtype gate passes (bf16 training validated
# equivalent in round 4, docs/PERFORMANCE.md)
AB_OVERRIDES = {"loftr": {"dtype": "bfloat16",
                          "fine": {"d_model": 128, "nhead": 8}}}


def step_time_bench(use_hybrid: bool, B: int, W: int, H: int,
                    iters: int = 6, n_inner: int = 2) -> dict:
    """Flagship-shape train-step time with the hybrid on/off."""
    import jax

    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer
    from tools.train_bench import make_batch

    cfg = get_config("indoor_ds", {
        "loftr": {"dtype": "bfloat16",
                  "fine": {"use_pallas_train": use_hybrid}},
        "trainer": {"scheduler_interval": "step", "warmup_step": 100}})
    trainer = Trainer(cfg, world_size=1, batch_size_per_device=B)
    batch = make_batch(B, W, H)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jax.tree.map(lambda x: x[:1], batch))

    @jax.jit
    def stepn(state, b):
        sc = None
        for _ in range(n_inner):
            state, sc = trainer._train_step(state, b)
        return state, sc

    state, sc = stepn(state, batch)
    _ = float(sc["loss"])
    t_done = []
    t0 = time.perf_counter()
    for _ in range(iters):
        state, sc = stepn(state, batch)
        _ = float(sc["loss"])
        t_done.append(time.perf_counter())
    deltas = np.diff([t0] + t_done) / n_inner
    dt = float(np.median(deltas))
    return {"step_ms": round(dt * 1e3, 2),
            "pairs_per_s": round(B / dt, 2),
            "loss_finite": bool(np.isfinite(float(sc["loss"])))}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", default="/tmp/fineab")
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--img-resize", type=int, default=256)
    ap.add_argument("--train-scenes", type=int, default=4)
    ap.add_argument("--test-scenes", type=int, default=3)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bench-batch", type=int, default=8)
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-convergence", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.synthetic_benchmark import (evaluate_cli, generate_data,
                                           train)

    t0 = time.time()
    artifact = {"config": vars(args), "arms": {}}

    if not args.skip_convergence:
        os.makedirs(args.work_dir, exist_ok=True)
        train_npzs, test_idx = generate_data(
            args.work_dir, args.train_scenes, args.test_scenes, args.views,
            args.img_size, args.seed)
        for arm, hybrid in (("xla", False), ("hybrid", True)):
            ov = {"loftr": {**AB_OVERRIDES["loftr"],
                            "fine": {**AB_OVERRIDES["loftr"]["fine"],
                                     "use_pallas_train": hybrid}}}
            print(f"=== arm {arm} (use_pallas_train={hybrid}) ===",
                  flush=True)
            ckpt, losses = train(
                args.work_dir, train_npzs, args.img_size, args.img_resize,
                args.steps, args.batch, args.lr, args.seed,
                extra_overrides=ov, ckpt_name=f"ckpt_{arm}")
            res = evaluate_cli(args.work_dir, test_idx, ckpt,
                               args.img_resize,
                               extra_env={"JAX_PLATFORMS": "cpu"},
                               extra_cfg=AB_OVERRIDES)
            artifact["arms"][arm] = {
                "results": res,
                "loss_per40": [round(float(np.mean(losses[i:i + 40])), 4)
                               for i in range(0, len(losses), 40)],
            }
            print(arm, res, flush=True)

    if not args.skip_bench:
        for arm, hybrid in (("xla", False), ("hybrid", True)):
            b = step_time_bench(hybrid, args.bench_batch, 640, 480)
            artifact["arms"].setdefault(arm, {})["flagship_step"] = b
            print(f"{arm} flagship step: {b}", flush=True)

    artifact["wall_s"] = round(time.time() - t0, 1)
    out = args.out or osp.join(REPO, "perf", "fine_hybrid_ab.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
