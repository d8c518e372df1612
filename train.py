#!/usr/bin/env python
"""Training entry point.

TPU-native equivalent of /root/reference/train.py: config preset + overrides,
LR scaling by world size (train.py:70-77), scene-sharded data, jitted
data-parallel train loop with checkpointing and periodic validation.

Usage:
  python train.py --preset indoor_ds --data-root /data/scannet/train \
      --npz-root /data/scannet/index/scene_data/train \
      --list-path /data/scannet/index/scene_data/train_list/scannet_all.txt \
      --intrinsic-path /data/scannet/intrinsics.npz \
      --batch-size 1 --max-epochs 30
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default=None,
                   help="named preset (default indoor_ds; config files may also set preset:)")
    p.add_argument("--config", action="append", default=[],
                   help="config file(s) (.json/.yaml), merged in order, later wins (reference main-cfg/data-cfg precedence)")
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "megadepth"])
    p.add_argument("--data-root", required=True)
    p.add_argument("--npz-root", required=True)
    p.add_argument("--list-path", required=True)
    p.add_argument("--intrinsic-path", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-epochs", type=int, default=30)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--ckpt-dir", default="logs/ckpt")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation micro-steps per optimizer "
                        "update (recovers the canonical bs=64 recipe on "
                        "small slices; LR scaling counts the effective "
                        "batch)")
    p.add_argument("--img-resize", type=int, default=840)
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="override; default = n_scenes*n_samples/bs")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror scalars/figures into TensorBoard event "
                        "files under <ckpt-dir>/logs/tb")
    p.add_argument("--n-samples-per-subset", type=int, default=0,
                   help="override TRAINER.N_SAMPLES_PER_SUBSET")
    p.add_argument("--config-json", default=None,
                   help="JSON dict of nested config overrides")
    p.add_argument("--val-npz-path", default=None,
                   help="val npz (enables per-epoch val)")
    p.add_argument("--val-dataset", default=None,
                   choices=["scannet", "megadepth"],
                   help="val dataset family (default: same as --dataset)")
    p.add_argument("--val-data-root", default=None)
    p.add_argument("--val-dump", action="store_true",
                   help="save per-pair val records (render with "
                        "tools/visualize_dump.py) - the reference's "
                        "TensorBoard match-figure logging equivalent")
    p.add_argument("--val-pose-solver", default="jax",
                   choices=["jax", "opencv"])
    p.add_argument("--val-figures", type=int, default=8,
                   help="log match figures for the first N val pairs each "
                        "val epoch (PNG under <ckpt-dir>/logs/figures, "
                        "mirrored to TB with --tensorboard; 0 disables) - "
                        "the reference's n_val_pairs_to_plot "
                        "(lightning_loftr.py:194-198)")
    p.add_argument("--val-figures-every", type=int, default=1,
                   help="log val figures every N epochs")
    return p.parse_args()


def build_datasets(args, cfg, world_size, rank):
    from loftr_tpu.data import (MegaDepthDataset, ScanNetDataset,
                                get_local_split)
    from loftr_tpu.data.augment import build_augmentor
    from loftr_tpu.data.sampler import ConcatDataset

    # dataset.augmentation_type -> working DarkAug/MobileAug (the reference
    # declares but disables these, src/utils/augment.py:41-51)
    augment_fn = build_augmentor(cfg.dataset.augmentation_type)

    with open(args.list_path) as f:
        scenes = [ln.strip() for ln in f if ln.strip()]
    local = get_local_split(scenes, world_size, rank, cfg.trainer.seed)
    datasets = []
    for scene in local:
        npz = os.path.join(args.npz_root, f"{scene}.npz")
        if args.dataset == "scannet":
            datasets.append(ScanNetDataset(
                args.data_root, npz, args.intrinsic_path, mode="train",
                min_overlap_score=cfg.dataset.min_overlap_score_train,
                augment_fn=augment_fn))
        else:
            datasets.append(MegaDepthDataset(
                args.data_root, npz, mode="train",
                min_overlap_score=cfg.dataset.min_overlap_score_train,
                img_resize=args.img_resize, df=cfg.dataset.mgdpt_df,
                img_padding=True, depth_padding=True,
                augment_fn=augment_fn))
    return ConcatDataset(datasets)


def build_val_dataset(args, cfg):
    """Validation dataset (ScanNet or MegaDepth), built once.

    The reference validates on either dataset family
    (src/lightning/data.py:106-156); --val-dataset defaults to the train
    dataset family.
    """
    from loftr_tpu.data import MegaDepthDataset, ScanNetDataset
    kind = args.val_dataset or args.dataset
    root = args.val_data_root or args.data_root
    if kind == "scannet":
        return ScanNetDataset(root, args.val_npz_path, args.intrinsic_path,
                              mode="test")
    return MegaDepthDataset(
        root, args.val_npz_path, mode="test",
        min_overlap_score=0.0, img_resize=args.img_resize,
        df=cfg.dataset.mgdpt_df, img_padding=True, depth_padding=True)


def main():
    args = parse_args()
    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import numpy as np
    from loftr_tpu import get_config
    from loftr_tpu.data import DataLoader
    from loftr_tpu.data.sampler import SceneBalancedSampler
    from loftr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from loftr_tpu.train.checkpoint import CheckpointManager
    from loftr_tpu.train.trainer import Trainer

    # multi-host: one process per host, all devices visible via mesh
    if "JAX_COORD_ADDR" in os.environ:
        jax.distributed.initialize()
    world_size = jax.process_count()
    rank = jax.process_index()
    n_dev = len(jax.devices())

    import json as _json
    from loftr_tpu.config import get_config_from_files
    cfg = get_config_from_files(
        *args.config, preset=args.preset, fallback="indoor_ds",
        overrides=_json.loads(args.config_json) if args.config_json else None)
    if n_dev > 1:
        # shard-local two-image packing under data parallelism
        # (ops/packing.py; also covers the Evaluator built from this cfg)
        cfg = cfg.replaced({"loftr": {"batch_packing": "interleave"}})
    dataset = build_datasets(args, cfg, world_size, rank)
    n_samples = args.n_samples_per_subset or cfg.trainer.n_samples_per_subset
    sampler = SceneBalancedSampler(
        dataset, n_samples, cfg.trainer.sb_subset_sample_replacement,
        cfg.trainer.sb_subset_shuffle, cfg.trainer.sb_repeat,
        seed=cfg.trainer.seed + rank)
    # steps_per_epoch counts OPTIMIZER updates (epoch-interval schedules key
    # off it); with accumulation an epoch has micro_steps/accum real updates
    steps_per_epoch = args.steps_per_epoch or max(
        1, len(sampler) // args.batch_size // max(1, args.accum_steps))
    cfg = cfg.replaced({"trainer": {"steps_per_epoch": steps_per_epoch,
                                    "seed": args.seed,
                                    "accum_steps": args.accum_steps}})

    mesh = make_mesh()
    trainer = Trainer(cfg, world_size=n_dev,
                      batch_size_per_device=max(1, args.batch_size // n_dev))
    mgr = CheckpointManager(os.path.abspath(args.ckpt_dir))

    from loftr_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(log_dir=os.path.join(args.ckpt_dir, "logs"),
                           tensorboard=args.tensorboard)

    # preemption-safe checkpointing (SURVEY.md §5.3): on SIGTERM/SIGINT save
    # the current state before exiting so --resume continues seamlessly
    import signal
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        print(f"signal {signum}: checkpoint at next step boundary",
              flush=True)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    loader = DataLoader(dataset, args.batch_size, sampler,
                        num_workers=args.num_workers)
    first = next(iter(loader))[0]
    example = jax.tree.map(
        lambda x: x[:1] if x is not None else None, first,
        is_leaf=lambda x: x is None)

    # val dataset + Evaluator built ONCE (the jitted forward is reused across
    # epochs; only the variables are swapped) - per-epoch reconstruction
    # would recompile and re-read the npz every epoch
    val_ds, evaluator = None, None
    if args.val_npz_path:
        from loftr_tpu.eval.evaluator import Evaluator
        val_ds = build_val_dataset(args, cfg)

    with jax.set_mesh(mesh):
        state = trainer.init_state(jax.random.PRNGKey(cfg.trainer.seed),
                                   example)
        if args.resume and mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"resumed from step {int(state.step)}")
        state = replicate(mesh, state)

        t0 = time.time()
        for epoch in range(args.max_epochs):
            for inp, meta in loader:
                inp = shard_batch(mesh, inp)
                state, scalars = trainer.train_step(state, inp)
                step = int(state.step)
                if step % args.log_every == 0:
                    logger.log(step, scalars, epoch=epoch)
                if preempted["flag"]:
                    if rank == 0:
                        mgr.save(int(state.step), jax.device_get(state))
                        print("preemption checkpoint saved; exiting")
                    mgr.close()
                    logger.close()
                    return
            metrics = {}
            if val_ds is not None:
                host_state = jax.device_get(state)
                variables = {"params": host_state.params,
                             "batch_stats": host_state.batch_stats}
                if evaluator is None:
                    evaluator = Evaluator(cfg, variables,
                                          pose_solver=args.val_pose_solver)
                else:
                    evaluator.variables = variables
                # rank-0 match figures every N val epochs (reference:
                # lightning_loftr.py:194-198 -> logger figure logging)
                figure_sink = None
                if (rank == 0 and args.val_figures > 0
                        and epoch % max(1, args.val_figures_every) == 0):
                    step_now = int(state.step)
                    figure_sink = (lambda figs, _s=step_now:
                                   logger.log_figures(_s, figs, prefix="val"))
                metrics = evaluator.evaluate_dataset(
                    val_ds, batch_size=args.batch_size,
                    num_workers=args.num_workers,
                    world_size=world_size, rank=rank,
                    dump_path=(os.path.join(
                        args.ckpt_dir, "logs", f"val_dump_e{epoch}_r{rank}.npz")
                        if args.val_dump else None),
                    figure_sink=figure_sink,
                    n_figure_pairs=args.val_figures)
                logger.log(int(state.step), metrics, epoch=epoch,
                           phase="val")
            if rank == 0:
                # ModelCheckpoint(monitor='auc@10') equivalent
                mgr.save(int(state.step), jax.device_get(state),
                         metrics=metrics or None)
        mgr.close()
        logger.close()


if __name__ == "__main__":
    main()
