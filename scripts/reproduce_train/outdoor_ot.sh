#!/bin/bash -eu
# Equivalent of the reference's scripts/reproduce_train/outdoor_ot.sh
# (same preset/schedule; jitted mesh data-parallel loop instead of PL DDP).
# Multi-host: set JAX_COORD_ADDR=<host0>:1234 and run on every host.
cd "$(dirname "$0")/../.."

python train.py --preset outdoor_ot --dataset megadepth \
    --data-root data/megadepth/train \
    --npz-root  data/megadepth/index/scene_data/train \
    --list-path data/megadepth/index/scene_data/train_list/megadepth_all.txt \
    --img-resize 840 \
    --batch-size ${BATCH_SIZE:-4} --max-epochs 30 \
    --ckpt-dir logs/outdoor_ot "$@"
