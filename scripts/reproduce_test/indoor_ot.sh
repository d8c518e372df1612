#!/bin/bash -eu
# ScanNet-1500 eval of the optimal-transport matcher.
cd "$(dirname "$0")/../.."
python test.py --preset scannet_eval --dataset scannet \
    --config-json '{"loftr": {"match_coarse": {"match_type": "sinkhorn"}}}' \
    --data-root data/scannet/test \
    --npz-path assets/scannet_test_1500/test.npz \
    --intrinsic-path assets/scannet_test_1500/intrinsics.npz \
    --ckpt "${CKPT:-weights/indoor_ot.ckpt}" "$@"
