#!/usr/bin/env python
"""Training-step benchmark: pairs/s, step time, and train-MFU for the full
jitted train step (supervision -> forward -> loss -> grad -> clip -> update)
on the real chip.

Fills the BASELINE.md gap "train-step pairs/s / step-time / MFU" (the
reference publishes only cluster sizes, docs/TRAINING.md:60: 32-64 GPUs for
ScanNet 640x480).  Round-4 (verdict item #4): batch sweep to the HBM
ceiling, gradient-accumulation sweep, fp32-vs-bf16, fused-focal on/off, and
an MFU figure against the 3x-forward analytic roofline (759 GFLOP/pair fwd
-> 2.28 TFLOP/pair train, docs/PERFORMANCE.md).

Methodology: `--n-inner` chained train steps are unrolled inside ONE jitted
program (the relay's 15-150 ms per-dispatch latency does not pipeline;
cf. bench.py).  Within the program, step k+1 consumes step k's state, so
peak HBM is a single step's working set.

Usage:  python tools/train_bench.py            # full sweep -> perf/train_bench.json
        python tools/train_bench.py --quick    # one config
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FWD_GFLOP_PER_PAIR = 759.0     # analytic, tools/flops_analysis.py
TRAIN_FLOP_FACTOR = 3.0        # fwd + ~2x fwd for backward
V5E_PEAK_TFLOPS = 197.0


def make_batch(B, W, H, seed=0):
    import numpy as np
    import jax.numpy as jnp
    from loftr_tpu import MatchInput
    rng = np.random.RandomState(seed)
    K = np.array([[[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]]] * B,
                 np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    return MatchInput(
        image0=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        depth0=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        depth1=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
        K0=jnp.asarray(K), K1=jnp.asarray(K))


def bench_config(name, B, W, H, dtype, fused_loss, accum, n_inner, iters,
                 fused_heads=True, hybrid_fine=None, preset="indoor_ds"):
    import numpy as np
    import jax
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer

    fine_over = {"fused_heads": fused_heads}
    if hybrid_fine is not None:   # None = preset default
        fine_over["use_pallas_train"] = hybrid_fine
    cfg = get_config(preset, {
        "loftr": {"dtype": dtype, "loss": {"use_pallas": fused_loss},
                  "fine": fine_over},
        "trainer": {"scheduler_interval": "step", "warmup_step": 100,
                    "accum_steps": accum}})
    trainer = Trainer(cfg, world_size=1, batch_size_per_device=B)
    batch = make_batch(B, W, H)
    example = jax.tree.map(lambda x: x[:1], batch)

    @jax.jit
    def stepn(state, b):
        sc = None
        for _ in range(n_inner):
            state, sc = trainer._train_step(state, b)
        return state, sc

    state = trainer.init_state(jax.random.PRNGKey(0), example)
    state, scalars = stepn(state, batch)     # compile + warm
    _ = float(scalars["loss"])               # hard sync (host fetch)

    t_done = []
    t0 = time.perf_counter()
    for _ in range(iters):
        state, scalars = stepn(state, batch)
        _ = float(scalars["loss"])
        t_done.append(time.perf_counter())
    deltas = np.diff([t0] + t_done) / n_inner
    dt = float(np.median(deltas))
    pairs_per_s = B / dt
    # per-config analytic forward FLOPs (the turbo preset is lighter than
    # the flagship's 759 GFLOP/pair; MFU must use the config's own count)
    from tools.flops_analysis import analytic_flops
    gflop = analytic_flops(H, W, cfg.loftr)[1] / 1e9
    mfu = (pairs_per_s * gflop * TRAIN_FLOP_FACTOR / 1e3
           / V5E_PEAK_TFLOPS)
    rec = {
        "config": name, "preset": preset,
        "fwd_gflop_per_pair": round(gflop, 1),
        "batch": B, "dtype": dtype, "fused_focal_loss": fused_loss,
        "accum_steps": accum, "n_inner": n_inner,
        "fine_fused_heads": fused_heads,
        "step_ms": round(dt * 1e3, 2),
        "pairs_per_s": round(pairs_per_s, 2),
        "p10_pairs_per_s": round(B / float(np.percentile(deltas, 90)), 2),
        "train_mfu": round(mfu, 3),
        "loss_finite": bool(np.isfinite(float(scalars["loss"]))),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--res", default="640x480")
    p.add_argument("--n-inner", type=int, default=2)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--preset", default="indoor_ds",
                   help="config preset (indoor_ds_turbo = speed preset)")
    p.add_argument("--sweep-only", action="store_true",
                   help="batch sweep with shipped defaults only, no "
                        "ablation arms (e.g. for non-flagship presets)")
    p.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16, 24],
                   help="bf16 batch sweep (stops at the first OOM)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "perf", "train_bench.json"))
    args = p.parse_args()

    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    W, H = (int(t) for t in args.res.split("x"))
    results = []

    def run(name, **kw):
        try:
            results.append(bench_config(
                name, W=W, H=H, n_inner=args.n_inner, iters=args.iters,
                preset=args.preset, **kw))
            return True
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            results.append({"config": name, "error": msg, **kw})
            print(json.dumps(results[-1]), flush=True)
            return False

    if args.quick:
        run("bf16_b4_default", B=4, dtype="bfloat16", fused_loss=True,
            accum=1)
    else:
        # batch sweep to the HBM ceiling with the SHIPPED DEFAULTS
        # (fused focal loss ON, fine fused-heads ON) — these rows are what
        # `train.py` actually runs on TPU
        for B in args.batches:
            if not run(f"bf16_b{B}_default", B=B, dtype="bfloat16",
                       fused_loss=True, accum=1):
                break
        if args.sweep_only:
            _write_out(args, results)
            return
        # best batch = highest measured throughput, NOT the largest batch
        # that compiled (round-4 artifact bug: fused-vs-unfused was benched
        # at the last successful B instead of the best one)
        ok_rows = [r for r in results if "pairs_per_s" in r]
        bb = (max(ok_rows, key=lambda r: r["pairs_per_s"])["batch"]
              if ok_rows else 4)
        # ablations at the best-throughput batch: each shipped default OFF
        run(f"bf16_b{bb}_plain_loss", B=bb, dtype="bfloat16",
            fused_loss=False, accum=1)
        run(f"bf16_b{bb}_plain_fine_heads", B=bb, dtype="bfloat16",
            fused_loss=True, accum=1, fused_heads=False)
        # training-time hybrid fused fine stage, flipped from the shipped
        # default (ops/fine_stage_hybrid.py; A/B'd in tools/fine_hybrid_ab.py)
        from loftr_tpu import get_config as _gc
        hyb_default = _gc("indoor_ds").loftr.fine.use_pallas_train
        run(f"bf16_b{bb}_hybrid_fine_{'off' if hyb_default else 'on'}",
            B=bb, dtype="bfloat16", fused_loss=True, accum=1,
            hybrid_fine=not hyb_default)
        # gradient accumulation (MultiSteps) overhead at the best batch
        run(f"bf16_b{bb}_accum2", B=bb, dtype="bfloat16",
            fused_loss=True, accum=2)
        run(f"bf16_b{bb}_accum4", B=bb, dtype="bfloat16",
            fused_loss=True, accum=4)
        # fp32 comparison (smaller batch; fp32 doubles the activation set;
        # fused kernels are bf16-gated on TPU so fp32 uses the XLA paths)
        run("fp32_b4", B=4, dtype="float32", fused_loss=False, accum=1)
        if bb >= 8:
            run("fp32_b8", B=8, dtype="float32", fused_loss=False, accum=1)

    _write_out(args, results)


def _write_out(args, results):
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "results": results,
            "roofline": {
                "flagship_fwd_gflop_per_pair": FWD_GFLOP_PER_PAIR,
                "train_flop_factor": TRAIN_FLOP_FACTOR,
                "v5e_peak_tflops": V5E_PEAK_TFLOPS,
                "note": "per-row fwd_gflop_per_pair is the row's own "
                        "analytic count (presets differ)"},
            "note": "n-inner chained steps unrolled per dispatch (relay "
                    "latency amortized); one TPU v5e chip via axon relay",
        }, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
