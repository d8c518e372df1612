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
    ap.add_argument("--preset", default="indoor_ds",
                    help="config preset (indoor_ds flagship; "
                         "indoor_ds_turbo = ledger-trimmed speed preset)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=64)  # B=64/live=1 measured
    # 127.9 vs 122.6 pairs/s at B=32/live=2 (round 3, steady deltas); HBM
    # fits it since the fused matcher never materializes [L, S]
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--debug", action="store_true",
                    help="print per-rep completion deltas to stderr")
    ap.add_argument("--res", default="640x480",
                    help="WxH input resolution (640x480 ScanNet flagship; "
                         "840x840 = MegaDepth eval size)")
    ap.add_argument("--n-inner", type=int, default=2,
                    help="distinct batches unrolled inside one jitted "
                         "program (amortizes relay dispatch latency; "
                         "measured negligible overhead at B=64 - device "
                         "busy time is within 0.6%% of end-to-end)")
    ap.add_argument("--live", type=int, default=1,
                    help="max unrolled copies concurrently live: copy k "
                         "takes a data dependency on copy k-live, bounding "
                         "peak HBM to ~live copies while letting XLA "
                         "overlap adjacent ones (1 = fully serialized). "
                         "Measured: the default B=32 live=2 full-model "
                         "program fits the 16 GB v5e HBM (driver-recorded "
                         "BENCH_r01.json ran it rc=0); live=4 at B=32 OOMs.")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas matching kernel")
    ap.add_argument("--fine-pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas per-window fine attention")
    ap.add_argument("--fold-bn", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="fold backbone BatchNorms into conv kernels "
                         "(utils/folding.py; measured perf-neutral on v5e "
                         "- XLA fuses eval BN into the conv epilogue)")
    ap.add_argument("--pad-channels", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="zero-pad the backbone's 196-channel stage to 256 "
                         "(utils/channel_pad.py) - function-preserving, "
                         "XLA's 196-wide convs are ~24%% slower than true "
                         "256-wide ones on v5e")
    args = ap.parse_args()

    W, H = (int(t) for t in args.res.split("x"))
    B = args.batch
    iters, warmup = args.iters, 5

    ap_over = {"loftr": {"dtype": args.dtype,
                         "match_coarse": {"use_pallas": args.pallas},
                         "fine": {"use_pallas": args.fine_pallas}}}
    cfg = get_config(args.preset, ap_over)
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
    if args.fold_bn:
        from loftr_tpu.utils.folding import fold_batchnorm, fold_config
        variables = fold_batchnorm(variables)
        cfg = fold_config(cfg)
        model = LoFTR(cfg.loftr)
    if args.pad_channels:
        from loftr_tpu.utils.channel_pad import (pad_backbone_channels,
                                                 pad_config)
        variables = pad_backbone_channels(variables)
        cfg = pad_config(cfg)
        model = LoFTR(cfg.loftr)

    # The axon relay has a large, variable per-dispatch latency (~15-150 ms)
    # and consecutive dispatches do not pipeline, so sustained throughput is
    # measured by processing N_INNER distinct batches inside ONE jitted
    # program (unrolled; lax.scan-of-model overloads the remote compiler).
    N_INNER = args.n_inner
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[make_batch(s) for s in range(N_INNER)])

    LIVE = max(1, args.live)

    @jax.jit
    def run_many(v, st):
        # Bound live ranges: copy k takes a data dependency on copy k-LIVE's
        # result, so at most LIVE copies are in flight (the full model incl.
        # fine branch at B=32 x 4 fully-concurrent copies OOMs 16 GB HBM),
        # while adjacent copies may still overlap to hide HBM stalls.
        accs = []
        for k in range(N_INNER):
            one = jax.tree.map(lambda x: x[k], st)
            if k >= LIVE:
                # Gate BOTH inputs so the dependency covers the whole copy:
                # gating image0 alone leaves copy k's image1-side backbone
                # free to be scheduled early, breaking the HBM bound.
                gate = (accs[k - LIVE] * 0.0).astype(one.image0.dtype)
                one = one.replace(image0=one.image0 + gate,
                                  image1=one.image1 + gate)
            out = model.apply(v, one)
            # mkpts1_f (not mkpts0_f): mkpts0_f == mkpts0_c, so reducing it
            # alone would let XLA dead-code-eliminate the whole fine stage
            accs.append(jnp.sum(out.mkpts1_f) + jnp.sum(out.coarse.mconf))
        return sum(accs)

    # warmup + hard sync (device->host read; block_until_ready alone may not
    # sync through the relay)
    float(run_many(variables, stacked))

    # Dispatch every rep up front (they queue; the relay executes them
    # serially), then fetch each result in order and record the completion
    # timestamp. The inter-completion deltas are per-dispatch durations;
    # the MEDIAN delta gives sustained throughput robust to the relay's
    # occasional 1s-class latency spikes, which a single total-time window
    # folds straight into the mean (cf. the 89.5 vs ~155 pairs/s spread
    # between driver runs and interactive runs in round 1).
    reps = max(4, iters // N_INNER)
    t0 = time.perf_counter()
    accs = [run_many(variables, stacked) for _ in range(reps)]
    t_done = []
    for a in accs:
        float(a)  # host fetch = hard sync up to this rep
        t_done.append(time.perf_counter())
    deltas = np.diff([t0] + t_done)
    # Discard the first 2 deltas: they absorb residual relay warm-up /
    # queue-fill effects that the warmup call does not always flush.
    steady = deltas[2:] if len(deltas) > 4 else deltas
    dt_med = float(np.median(steady))
    if args.debug:
        print("deltas:", " ".join(f"{d*1e3:.0f}" for d in deltas),
              "ms", file=sys.stderr)

    pairs_per_s = B * N_INNER / dt_med
    tag = "loftr_ds" if args.preset == "indoor_ds" else args.preset
    result = {
        "metric": f"{tag}_{W}x{H}_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / REFERENCE_PAIRS_PER_S, 2),
        # dispersion over steady-state reps (relay latency varies 15-150ms):
        # pairs/s at the 10th/90th percentile completion delta
        "p10": round(B * N_INNER / float(np.percentile(steady, 90)), 2),
        "p90": round(B * N_INNER / float(np.percentile(steady, 10)), 2),
        "n_reps": int(len(steady)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
