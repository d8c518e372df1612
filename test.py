#!/usr/bin/env python
"""Benchmark evaluation entry point (ScanNet-1500 / MegaDepth-1500).

TPU-native equivalent of /root/reference/test.py: load a checkpoint, run the
1500-pair eval, print pose AUC@{5,10,20} + precision.

Usage:
  python test.py --preset scannet_eval --dataset scannet \
      --data-root data/scannet/test \
      --npz-path assets/scannet_test_1500/test.npz \
      --intrinsic-path assets/scannet_test_1500/intrinsics.npz \
      --ckpt weights/indoor_ds.ckpt [--thr 0.2] [--pose-solver opencv|jax|jax5pt|native|5pt]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default=None,
                   help="named preset (default scannet_eval; config files may also set preset:)")
    p.add_argument("--config", action="append", default=[],
                   help="config file(s) (.json/.yaml), merged in order, later wins (reference main-cfg/data-cfg precedence)")
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "megadepth"])
    p.add_argument("--data-root", required=True)
    p.add_argument("--npz-path", default=None,
                   help="single npz (scannet test fixture)")
    p.add_argument("--npz-root", default=None,
                   help="directory of scene npzs (megadepth)")
    p.add_argument("--list-path", default=None)
    p.add_argument("--intrinsic-path", default=None)
    p.add_argument("--ckpt", default=None,
                   help=".ckpt (torch, converted on the fly) or orbax dir")
    p.add_argument("--thr", type=float, default=None,
                   help="override coarse matching threshold")
    p.add_argument("--pose-solver", default="opencv",
                   choices=["opencv", "jax", "jax5pt", "native", "5pt"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--img-resize", type=int, default=840)
    p.add_argument("--max-matches", type=int, default=2048)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype: float32 = parity eval (XLA oracle "
                        "paths on TPU); bfloat16 = deployment speed (fused "
                        "Pallas kernels)")
    p.add_argument("--config-json", default=None,
                   help="JSON dict of nested config overrides")
    p.add_argument("--dump", default=None, help="npz dump path for per-pair "
                   "results (visualization / offline analysis)")
    p.add_argument("--figures-dir", default=None,
                   help="save epi-error-colored match figures (PNG) for the "
                        "first --n-figures pairs")
    p.add_argument("--n-figures", type=int, default=8)
    return p.parse_args()


def load_variables(args, cfg, example):
    import jax
    from loftr_tpu.models.matcher import LoFTR
    if args.ckpt and args.ckpt.endswith(".ckpt"):
        from loftr_tpu.utils.weights import load_torch_checkpoint
        return load_torch_checkpoint(args.ckpt)
    model = LoFTR(cfg.loftr)
    variables = model.init(jax.random.PRNGKey(0), example)
    if args.ckpt:  # orbax params dir
        from loftr_tpu.train.checkpoint import load_params
        restored = load_params(args.ckpt, dict(variables))
        return restored
    print("WARNING: no checkpoint given - random weights")
    return variables


def build_datasets(args, cfg):
    from loftr_tpu.data import MegaDepthDataset, ScanNetDataset
    if args.dataset == "scannet":
        return [ScanNetDataset(
            args.data_root, args.npz_path, args.intrinsic_path, mode="test",
            min_overlap_score=cfg.dataset.min_overlap_score_test)]
    npzs = sorted(glob.glob(os.path.join(args.npz_root, "*.npz")))
    if args.list_path:
        with open(args.list_path) as f:
            wanted = {ln.strip() for ln in f if ln.strip()}
        npzs = [n for n in npzs
                if os.path.basename(n).split(".")[0] in wanted]
    return [MegaDepthDataset(
        args.data_root, n, mode="test", min_overlap_score=0.0,
        img_resize=args.img_resize, df=cfg.dataset.mgdpt_df,
        img_padding=True, depth_padding=False) for n in npzs]


def main():
    args = parse_args()
    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import numpy as np
    from loftr_tpu import MatchInput, get_config
    from loftr_tpu.eval.evaluator import Evaluator

    overrides = {"loftr": {"dtype": args.dtype,
                           "match_coarse":
                           {"max_matches": args.max_matches}}}
    if args.thr is not None:
        overrides["loftr"]["match_coarse"]["thr"] = args.thr
    if args.dataset == "megadepth":
        overrides["trainer"] = {"epi_err_thr": 1e-4}
    from loftr_tpu.config import get_config_from_files
    cfg = get_config_from_files(
        *args.config, preset=args.preset, fallback="scannet_eval",
        overrides=overrides)
    if args.config_json:
        cfg = cfg.replaced(json.loads(args.config_json))

    datasets = build_datasets(args, cfg)
    example_item = datasets[0][0]
    from loftr_tpu.data.loader import collate_matchinput
    example, _ = collate_matchinput([example_item])

    variables = load_variables(args, cfg, example)
    ev = Evaluator(cfg, variables, pose_solver=args.pose_solver)

    from loftr_tpu.data import DataLoader
    from loftr_tpu.data.sampler import ConcatDataset
    concat = ConcatDataset(datasets)
    loader = DataLoader(concat, args.batch_size,
                        num_workers=args.num_workers, drop_last=False)
    figure_sink = None
    if args.figures_dir:
        os.makedirs(args.figures_dir, exist_ok=True)
        counter = {"i": 0}

        def figure_sink(figs):
            import matplotlib.pyplot as plt
            for fig in figs:
                fig.savefig(os.path.join(
                    args.figures_dir, f"pair_{counter['i']:04d}.png"),
                    bbox_inches="tight")
                plt.close(fig)
                counter["i"] += 1

    conf_thr = 1e-4 if args.dataset == "megadepth" else 5e-4
    agg = ev.evaluate_batches(loader, dump_path=args.dump,
                              figure_sink=figure_sink,
                              n_figure_pairs=args.n_figures,
                              figure_conf_thr=conf_thr)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
