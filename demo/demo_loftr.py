#!/usr/bin/env python
"""Streaming matching demo.

TPU-native equivalent of /root/reference/demo/demo_loftr.py:30-241: match
every frame of a video / image directory / camera against a reference frame,
visualize matches colored by confidence.  Headless-friendly: writes frames to
--output instead of requiring a display; --ref-frame selects the anchor
(reference uses an interactive hotkey).

Usage:
  python demo/demo_loftr.py --input /path/to/dir_or_video \
      [--ckpt weights/indoor_ds.ckpt] [--output out/] [--resize 640 480]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="image dir, video file, or camera index")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--preset", default="indoor_ds")
    p.add_argument("--output", default="demo_out")
    p.add_argument("--resize", type=int, nargs=2, default=(640, 480))
    p.add_argument("--ref-frame", type=int, default=0,
                   help="index of the anchor frame")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--thr", type=float, default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="bfloat16 = deployment (fused Pallas kernels on "
                        "TPU); float32 = XLA oracle paths (CPU smoke)")
    return p.parse_args()


class FrameSource:
    """Frames from a directory, video file, or camera (demo's VideoStreamer
    equivalent)."""

    def __init__(self, spec: str, resize):
        import cv2
        self.cv2 = cv2
        self.resize = tuple(resize)
        if os.path.isdir(spec):
            exts = ("*.jpg", "*.png", "*.jpeg", "*.JPG")
            files = sorted(sum([glob.glob(os.path.join(spec, e))
                                for e in exts], []))
            self._files = files
            self._cap = None
        else:
            self._files = None
            self._cap = cv2.VideoCapture(int(spec) if spec.isdigit()
                                         else spec)

    def __iter__(self):
        if self._files is not None:
            for f in self._files:
                img = self.cv2.imread(f, self.cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    yield self.cv2.resize(img, self.resize)
        else:
            while True:
                ok, frame = self._cap.read()
                if not ok:
                    return
                gray = self.cv2.cvtColor(frame, self.cv2.COLOR_BGR2GRAY)
                yield self.cv2.resize(gray, self.resize)


def main():
    args = parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.utils.plotting import (dynamic_alpha, error_colormap,
                                          make_matching_figure)

    overrides = {"loftr": {"dtype": args.dtype,
                           "match_coarse": {"use_pallas": True}}}
    if args.thr is not None:
        overrides["loftr"]["match_coarse"]["thr"] = args.thr
    cfg = get_config(args.preset, overrides)
    model = LoFTR(cfg.loftr)

    frames = list(FrameSource(args.input, args.resize))
    if args.max_frames:
        frames = frames[: args.max_frames]
    assert frames, f"no frames found at {args.input}"
    ref = frames[args.ref_frame]

    def to_input(a, b):
        g = lambda x: jnp.asarray(x, jnp.float32)[None, :, :, None] / 255.0
        return MatchInput(image0=g(a), image1=g(b))

    example = to_input(ref, frames[0])
    if args.ckpt:
        from loftr_tpu.utils.weights import load_torch_checkpoint
        variables = load_torch_checkpoint(args.ckpt)
    else:
        print("WARNING: random weights (no --ckpt)")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    fwd = jax.jit(lambda v, i: model.apply(v, i))

    os.makedirs(args.output, exist_ok=True)
    for idx, frame in enumerate(frames):
        if idx == args.ref_frame:
            continue
        out = fwd(variables, to_input(ref, frame))
        valid = np.asarray(out.valid)[0]
        k0 = np.asarray(out.mkpts0_f)[0][valid]
        k1 = np.asarray(out.mkpts1_f)[0][valid]
        conf = np.asarray(out.coarse.mconf)[0][valid]
        # color by confidence (demo_loftr.py visualization flavor)
        a = dynamic_alpha(len(k0))
        color = error_colormap(1.0 - conf, 1.0, alpha=a)
        path = os.path.join(args.output, f"match_{idx:05d}.png")
        make_matching_figure(ref, frame, k0, k1, color,
                             text=[f"frame {idx}", f"#Matches {len(k0)}"],
                             path=path)
        print(f"frame {idx}: {len(k0)} matches -> {path}")


if __name__ == "__main__":
    main()
