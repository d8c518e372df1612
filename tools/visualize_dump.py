#!/usr/bin/env python
"""Render match figures from a test.py --dump file.

Equivalent of /root/reference/notebooks/visualize_dump_results.ipynb as a
script: reads the per-pair npz records, draws each pair's matches colored by
epipolar error, writes PNGs.

Usage: python tools/visualize_dump.py dump.npz --data-root <imgs> --out viz/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dump")
    p.add_argument("--data-root", default=None,
                   help="root for pair_names image paths (omit to plot "
                        "matches on blank canvases)")
    p.add_argument("--out", default="viz")
    p.add_argument("--epi-thr", type=float, default=5e-4)
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()

    from loftr_tpu.utils.plotting import (dynamic_alpha, error_colormap,
                                          make_matching_figure)
    import cv2

    records = np.load(args.dump, allow_pickle=True)["records"]
    os.makedirs(args.out, exist_ok=True)
    for idx, rec in enumerate(records[: args.limit]):
        k0, k1 = rec["mkpts0_f"], rec["mkpts1_f"]
        errs = rec["epi_errs"]
        if args.data_root and rec.get("pair_names"):
            n0, n1 = rec["pair_names"]
            img0 = cv2.imread(os.path.join(args.data_root, n0),
                              cv2.IMREAD_GRAYSCALE)
            img1 = cv2.imread(os.path.join(args.data_root, n1),
                              cv2.IMREAD_GRAYSCALE)
        else:
            img0 = img1 = np.full((480, 640), 255, np.uint8)
        color = error_colormap(errs, args.epi_thr,
                               alpha=dynamic_alpha(len(k0)))
        text = [rec["identifier"],
                f"#Matches {len(k0)}",
                f"R_err {rec['R_err']:.2f}  t_err {rec['t_err']:.2f}"]
        path = os.path.join(args.out, f"pair_{idx:05d}.png")
        make_matching_figure(img0, img1, k0, k1, color, text=text, path=path)
        print(path)


if __name__ == "__main__":
    main()
