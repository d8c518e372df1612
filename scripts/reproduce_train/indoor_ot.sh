#!/bin/bash -eu
# Equivalent of the reference's scripts/reproduce_train/indoor_ot.sh
# (same preset/schedule; jitted mesh data-parallel loop instead of PL DDP).
# Multi-host: set JAX_COORD_ADDR=<host0>:1234 and run on every host.
cd "$(dirname "$0")/../.."

python train.py --preset indoor_ot --dataset scannet \
    --data-root data/scannet/train \
    --npz-root  data/scannet/index/scene_data/train \
    --list-path data/scannet/index/scene_data/train_list/scannet_all.txt \
    --intrinsic-path data/scannet/intrinsics.npz \
    --batch-size ${BATCH_SIZE:-4} --max-epochs 30 \
    --ckpt-dir logs/indoor_ot "$@"
