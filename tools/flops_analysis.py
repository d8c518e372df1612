"""Speed-of-light analysis: analytic model FLOPs vs measured throughput (MFU).

Counts the matmul/conv FLOPs of the LoFTR forward pass stage by stage from
the config (the reference has no counterpart; its only perf surface is
region timings, /root/reference/src/utils/profiler.py). XLA's own
`cost_analysis()` overcounts on TPU — convs are tallied at lane-padded
channel widths (196 -> 256, the stem's 1 -> 8) and fusion-internal traffic
is included in "bytes accessed" — so an analytic count is the honest
denominator for MFU.

Usage:
    python tools/flops_analysis.py                 # analytic table only
    python tools/flops_analysis.py --xla           # + XLA cost_analysis
    python tools/flops_analysis.py --measure       # + on-device MFU
"""
from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM
V5E_PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 49.0}


def conv_flops(h, w, cin, cout, k, stride=1):
    """Multiply-add FLOPs of one conv layer at input res (h, w)."""
    return (h // stride) * (w // stride) * k * k * cin * cout * 2


def backbone_flops(H, W, initial_dim, block_dims):
    """ResNet-FPN_8_2 analytic FLOPs for ONE image (models/backbone.py)."""
    d0, d1, d2 = block_dims
    f = {}
    f["stem conv7x7/s2"] = conv_flops(H, W, 1, initial_dim, 7, 2)
    h2, w2 = H // 2, W // 2
    # layer1: two stride-1 BasicBlocks at 1/2 (4 convs d0->d0)
    f["layer1 (1/2)"] = 4 * conv_flops(h2, w2, d0, d0, 3)
    # layer2: stride-2 block (conv d0->d1 at stride2 + conv d1->d1 +
    # 1x1 downsample) + stride-1 block (2 convs d1->d1), at 1/4
    h4, w4 = H // 4, W // 4
    f["layer2 (1/4)"] = (conv_flops(h2, w2, d0, d1, 3, 2)
                         + conv_flops(h2, w2, d0, d1, 1, 2)
                         + 3 * conv_flops(h4, w4, d1, d1, 3))
    h8, w8 = H // 8, W // 8
    f["layer3 (1/8)"] = (conv_flops(h4, w4, d1, d2, 3, 2)
                         + conv_flops(h4, w4, d1, d2, 1, 2)
                         + 3 * conv_flops(h8, w8, d2, d2, 3))
    # FPN top-down
    f["fpn out3 1x1"] = conv_flops(h8, w8, d2, d2, 1)
    # align-corners 2x upsample as two dense matmuls (ops/interpolate.py):
    # rows [h4,h8]x[h8, w8*C] then cols [w4,w8] per row
    f["fpn up 1/8->1/4"] = (h4 * h8 * w8 * d2 + h4 * w4 * w8 * d2) * 2
    f["fpn lateral2+fuse2 (1/4)"] = (conv_flops(h4, w4, d1, d2, 1)
                                     + conv_flops(h4, w4, d2, d2, 3)
                                     + conv_flops(h4, w4, d2, d1, 3))
    f["fpn up 1/4->1/2"] = (h2 * h4 * w4 * d1 + h2 * w2 * w4 * d1) * 2
    f["fpn lateral1+fuse1 (1/2)"] = (conv_flops(h2, w2, d0, d1, 1)
                                     + conv_flops(h2, w2, d1, d1, 3)
                                     + conv_flops(h2, w2, d1, d0, 3))
    return f


def encoder_layer_flops(L, S, d, nhead):
    """One LoFTREncoderLayer call (models/transformer.py): bias-free QKV,
    linear attention einsums, merge, concat-FFN (2d->2d->d)."""
    dh = d // nhead
    qkv = (L + 2 * S) * d * d * 2
    # linear attention: KV = sum_S k (x) v per head (S*d*dh mults), then
    # q @ KV (L*d*dh), + O(L*d) normalizer (negligible)
    attn = (S + L) * d * dh * 2
    merge = L * d * d * 2
    ffn = L * (2 * d) * (2 * d) * 2 + L * (2 * d) * d * 2
    return qkv + attn + merge + ffn


def analytic_flops(H, W, cfg=None, max_matches=None):
    """Per-PAIR forward FLOPs by stage. Returns (dict, total)."""
    if cfg is None:
        from loftr_tpu import get_config
        cfg = get_config("indoor_ds").loftr
    bb = cfg.backbone
    f = {}
    per_image = backbone_flops(H, W, bb.initial_dim, tuple(bb.block_dims))
    f["backbone (2 images)"] = 2 * sum(per_image.values())

    L = (H // 8) * (W // 8)
    d_c, h_c = cfg.coarse.d_model, cfg.coarse.nhead
    n_layers = len(cfg.coarse.layer_names)
    # each named layer processes both sequences (self: 2 calls L==S;
    # cross: 2 calls L,S swapped — same count when shapes match)
    f[f"coarse transformer ({n_layers} layers x2 seqs, L={L})"] = \
        n_layers * 2 * encoder_layer_flops(L, L, d_c, h_c)
    f["coarse sim matrix [L,S]@d"] = L * L * d_c * 2

    K = max_matches or cfg.match_coarse.max_matches
    Wf = cfg.fine.window_size
    d_f, h_f = cfg.fine.d_model, cfg.fine.nhead
    n_fine = len(cfg.fine.layer_names)
    ww = Wf * Wf
    f[f"fine transformer (K={K} windows of {ww})"] = \
        n_fine * 2 * encoder_layer_flops(ww, ww, d_f, h_f) * K
    f["fine heatmap+softargmax"] = K * ww * d_f * 2
    return f, sum(f.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="640x480")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--peak-tflops", type=float, default=None)
    ap.add_argument("--xla", action="store_true",
                    help="also compile and print XLA cost_analysis")
    ap.add_argument("--measure", action="store_true",
                    help="run on device and report achieved MFU")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    W, H = (int(t) for t in args.res.split("x"))
    peak = (args.peak_tflops
            or V5E_PEAK_TFLOPS.get(args.dtype, 197.0)) * 1e12

    from loftr_tpu import get_config
    cfg = get_config("indoor_ds", {"loftr": {"dtype": args.dtype}})
    stages, total = analytic_flops(H, W, cfg.loftr)
    print(f"# analytic forward FLOPs per pair @ {W}x{H}")
    for k, v in stages.items():
        print(f"  {k:<48s} {v / 1e9:8.2f} GFLOP  ({100 * v / total:4.1f}%)")
    print(f"  {'TOTAL':<48s} {total / 1e9:8.2f} GFLOP")
    sol = peak / total
    print(f"\nspeed of light @ {peak / 1e12:.0f} TFLOP/s ({args.dtype}): "
          f"{sol:.0f} pairs/s  ({1e3 / sol:.2f} ms/pair)")

    if not (args.xla or args.measure):
        return
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput

    ov = {"loftr": {"dtype": args.dtype,
                    "match_coarse": {"use_pallas": True},
                    "fine": {"use_pallas": True}}}
    cfg = get_config("indoor_ds", ov)
    model = LoFTR(cfg.loftr)
    B = args.batch
    inp = MatchInput(image0=jnp.zeros((B, H, W, 1), jnp.float32),
                     image1=jnp.zeros((B, H, W, 1), jnp.float32))
    v = model.init(jax.random.PRNGKey(0), MatchInput(
        image0=jnp.zeros((1, H, W, 1)), image1=jnp.zeros((1, H, W, 1))))
    jitted = jax.jit(lambda v, i: model.apply(v, i))

    if args.xla:
        comp = jitted.lower(v, inp).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        xf = ca.get("flops", 0.0) / B
        xb = ca.get("bytes accessed", 0.0) / B
        print(f"\nXLA cost_analysis: {xf / 1e9:.1f} GFLOP/pair "
              f"({xf / total:.2f}x analytic; lane-padding overcount), "
              f"{xb / 1e6:.0f} MB/pair accessed (incl. fusion-internal)")

    if args.measure:
        import time
        out = jitted(v, inp)
        np.asarray(out.valid)  # host fetch = true sync through the relay
        t0 = time.time()
        for _ in range(args.iters):
            out = jitted(v, inp)
        np.asarray(out.valid)
        dt = time.time() - t0
        pps = B * args.iters / dt
        mfu = pps * total / peak
        print(f"\nmeasured: {pps:.1f} pairs/s (B={B}, {args.iters} iters, "
              f"dispatch-bound through the axon relay)")
        print(f"MFU vs analytic: {100 * mfu:.1f}% of {peak / 1e12:.0f} "
              f"TFLOP/s peak")
        print(json.dumps({"metric": "mfu", "value": round(mfu, 4),
                          "unit": "fraction", "pairs_per_s": round(pps, 1)}))


if __name__ == "__main__":
    main()
