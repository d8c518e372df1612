#!/usr/bin/env python
"""Convert a released PyTorch LoFTR checkpoint to an orbax params dir.

Usage: python tools/convert_ckpt.py indoor_ds_new.ckpt weights/indoor_ds_new
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help="torch .ckpt path")
    p.add_argument("out", help="output orbax directory")
    args = p.parse_args()

    from loftr_tpu.utils.weights import load_torch_checkpoint
    from loftr_tpu.train.checkpoint import save_params

    variables = load_torch_checkpoint(args.ckpt)
    n = sum(v.size for v in __import__("jax").tree.leaves(variables))
    save_params(args.out, variables)
    print(f"converted {n} parameters -> {args.out}")


if __name__ == "__main__":
    main()
