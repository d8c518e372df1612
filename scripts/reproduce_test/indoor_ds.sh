#!/bin/bash -eu
# Equivalent of the reference's scripts/reproduce_test/indoor_ds{,_new}.sh:
# ScanNet-1500 eval at BORDER_RM=0 (paper-consistent; expected auc@10=40.8
# with the released indoor-ds checkpoint).
cd "$(dirname "$0")/../.."
python test.py --preset scannet_eval --dataset scannet \
    --data-root data/scannet/test \
    --npz-path assets/scannet_test_1500/test.npz \
    --intrinsic-path assets/scannet_test_1500/intrinsics.npz \
    --ckpt "${CKPT:-weights/indoor_ds_new.ckpt}" "$@"
