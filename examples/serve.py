"""Serving example: stand up the micro-batching MatchingService and push a
concurrent burst of requests through it.

Usage:
    python examples/serve.py --weights weights/indoor_ds_new.msgpack \
        img_dir/   # matches consecutive image pairs from a directory

Without --weights, random init is used (expect 0 matches — uniform
confidence is below the 0.2 threshold; the plumbing is what's shown).
"""
import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_dir", help="directory of images; consecutive pairs")
    ap.add_argument("--weights", default=None,
                    help=".msgpack (native) or .ckpt (released torch)")
    ap.add_argument("--preset", default="indoor_ds")
    ap.add_argument("--flush-ms", type=float, default=5.0)
    ap.add_argument("--min-conf", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.serve import MatchingService

    if args.weights:
        from loftr_tpu import load_matcher
        variables = load_matcher(args.weights)
    else:
        cfg = get_config(args.preset)
        model = LoFTR(cfg.loftr)
        inp = MatchInput(image0=jnp.zeros((1, 480, 640, 1)),
                         image1=jnp.zeros((1, 480, 640, 1)))
        variables = model.init(jax.random.PRNGKey(0), inp)

    paths = sorted(sum((glob.glob(os.path.join(args.img_dir, p))
                        for p in ("*.jpg", "*.png", "*.jpeg")), []))
    if len(paths) < 2:
        sys.exit(f"need >=2 images in {args.img_dir}")
    imgs = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths]

    # two rungs only: every (bucket, rung) pair is one XLA compile, so a
    # deployment warms exactly the rungs it serves
    with MatchingService(variables, preset=args.preset,
                         buckets=((480, 640),), batch_sizes=(1, 8),
                         flush_ms=args.flush_ms) as svc:
        print("warming up (compiles one program per batch rung)...")
        svc.warmup()
        t0 = time.time()
        futs = [svc.submit(imgs[i], imgs[i + 1], min_conf=args.min_conf)
                for i in range(len(imgs) - 1)]
        for (i, f) in enumerate(futs):
            r = f.result()
            print(f"{os.path.basename(paths[i])} <-> "
                  f"{os.path.basename(paths[i + 1])}: "
                  f"{len(r['mkpts0'])} matches")
        dt = time.time() - t0
        print(f"\n{len(futs)} pairs in {dt:.2f}s "
              f"({len(futs) / dt:.1f} pairs/s through the service)")
        print("stats:", svc.stats.snapshot())


if __name__ == "__main__":
    main()
