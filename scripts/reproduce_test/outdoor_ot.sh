#!/bin/bash -eu
# MegaDepth-1500 eval of the optimal-transport matcher.
cd "$(dirname "$0")/../.."
python test.py --preset outdoor_ot --dataset megadepth \
    --data-root data/megadepth/test \
    --npz-root assets/megadepth_test_1500_scene_info \
    --list-path assets/megadepth_test_1500_scene_info/megadepth_test_1500.txt \
    --img-resize 840 --ckpt "${CKPT:-weights/outdoor_ot.ckpt}" "$@"
