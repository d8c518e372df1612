#!/usr/bin/env python
"""Minimal two-image matching example (the reference's
notebooks/demo_single_pair.ipynb as a script).

Usage:
  python examples/match_pair.py img0.jpg img1.jpg \
      [--ckpt weights/indoor_ds_new.ckpt] [--out matches.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img0")
    p.add_argument("img1")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--preset", default="indoor_ds")
    p.add_argument("--resize", type=int, nargs=2, default=(640, 480))
    p.add_argument("--out", default="matches.png")
    args = p.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config

    g = lambda f: cv2.resize(cv2.imread(f, cv2.IMREAD_GRAYSCALE),
                             tuple(args.resize))
    img0, img1 = g(args.img0), g(args.img1)
    inp = MatchInput(
        image0=jnp.asarray(img0, jnp.float32)[None, :, :, None] / 255.0,
        image1=jnp.asarray(img1, jnp.float32)[None, :, :, None] / 255.0)

    cfg = get_config(args.preset, {"loftr": {
        "dtype": "bfloat16", "match_coarse": {"use_pallas": True}}})
    model = LoFTR(cfg.loftr)
    if args.ckpt:
        from loftr_tpu.utils.weights import load_torch_checkpoint
        variables = load_torch_checkpoint(args.ckpt)
    else:
        print("WARNING: random weights (pass --ckpt for real matching)")
        variables = model.init(jax.random.PRNGKey(0), inp)

    out = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)
    valid = np.asarray(out.valid)[0]
    k0 = np.asarray(out.mkpts0_f)[0][valid]
    k1 = np.asarray(out.mkpts1_f)[0][valid]
    conf = np.asarray(out.coarse.mconf)[0][valid]
    print(f"{len(k0)} matches (mean confidence "
          f"{conf.mean() if len(conf) else 0:.3f})")

    from loftr_tpu.utils.plotting import (dynamic_alpha, error_colormap,
                                          make_matching_figure)
    color = error_colormap(1 - conf, 1.0, alpha=dynamic_alpha(len(k0)))
    make_matching_figure(img0, img1, k0, k1, color,
                         text=[f"loftr_tpu", f"#Matches {len(k0)}"],
                         path=args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
