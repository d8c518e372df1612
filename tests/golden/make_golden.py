"""Generate the golden end-to-end regression fixture.

Runs the seeded small indoor-DS model (DEFAULT config = the shipped fused
inference path) on the reference's checked-in ScanNet sample pair
(/root/reference/assets/scannet_sample_images, the reference's own smoke-test
data, README.md:57-58 / notebooks/demo_single_pair.ipynb) and records the
outputs.  tests/test_golden.py asserts any future run reproduces them -
pinning end-to-end numerics across refactors so a future round with released
checkpoints can go straight to the AUC gate
(/root/reference/configs/loftr/indoor/scannet/loftr_ds_eval.py:6-8).

Usage:  python tests/golden/make_golden.py   (CPU; overwrites golden.npz)
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SAMPLES = "/root/reference/assets/scannet_sample_images"
OUT = os.path.join(os.path.dirname(__file__), "golden.npz")


def small_cfg():
    from loftr_tpu import get_config
    # DEFAULT preset (fused Pallas inference path) with a small net and a
    # low threshold so the seeded random weights still yield matches
    return get_config("indoor_ds").replaced({"loftr": {
        "backbone": {"initial_dim": 16, "block_dims": (16, 24, 32)},
        "coarse": {"d_model": 32, "nhead": 4,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 16, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 64, "thr": 1e-4}}})


def load_pair():
    g = lambda n: cv2.resize(
        cv2.imread(os.path.join(SAMPLES, n), cv2.IMREAD_GRAYSCALE),
        (160, 128))
    from loftr_tpu import MatchInput
    img0 = g("scene0711_00_frame-001680.jpg")
    img1 = g("scene0711_00_frame-001995.jpg")
    return MatchInput(
        image0=jnp.asarray(img0, jnp.float32)[None, :, :, None] / 255.0,
        image1=jnp.asarray(img1, jnp.float32)[None, :, :, None] / 255.0)


def run(cfg, inp):
    from loftr_tpu import LoFTR
    model = LoFTR(cfg.loftr)
    variables = model.init(jax.random.PRNGKey(0), inp)
    out = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)
    return out


def main():
    cfg = small_cfg()
    inp = load_pair()
    out = run(cfg, inp)
    v = np.asarray(out.valid)[0]
    np.savez_compressed(
        OUT,
        valid=v,
        i_ids=np.asarray(out.coarse.i_ids)[0],
        j_ids=np.asarray(out.coarse.j_ids)[0],
        mconf=np.asarray(out.coarse.mconf)[0],
        mkpts0_f=np.asarray(out.mkpts0_f)[0],
        mkpts1_f=np.asarray(out.mkpts1_f)[0],
        expec_f=np.asarray(out.expec_f)[0],
    )
    print(f"wrote {OUT}: {int(v.sum())} valid matches of {v.size} slots")


if __name__ == "__main__":
    main()
