"""Smoke test on the reference's checked-in real sample images: the full
pipeline (IO -> matcher -> evaluator plumbing) on actual photos."""
import os

import numpy as np
import pytest

SAMPLES = "/root/reference/assets/scannet_sample_images"

pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLES),
                                reason="sample images not mounted")


def test_matcher_on_real_pair():
    import cv2
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config

    g = lambda n: cv2.resize(
        cv2.imread(os.path.join(SAMPLES, n), cv2.IMREAD_GRAYSCALE),
        (160, 128))
    img0 = g("scene0711_00_frame-001680.jpg")
    img1 = g("scene0711_00_frame-001995.jpg")
    inp = MatchInput(
        image0=jnp.asarray(img0, jnp.float32)[None, :, :, None] / 255.0,
        image1=jnp.asarray(img1, jnp.float32)[None, :, :, None] / 255.0)

    cfg = get_config("indoor_ds").replaced({"loftr": {
        "backbone": {"initial_dim": 16, "block_dims": (16, 24, 32)},
        "coarse": {"d_model": 32, "nhead": 4,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 16, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 64, "use_pallas": False}}})
    model = LoFTR(cfg.loftr)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    out = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    # random weights on real images: pipeline runs, finite outputs, kpts in
    # image bounds
    assert np.isfinite(np.asarray(out.mkpts0_f)).all()
    k = np.asarray(out.mkpts1_f)
    assert (k >= 0).all() and (k[..., 0] <= 160).all() and \
        (k[..., 1] <= 128).all()
    assert np.isfinite(np.asarray(out.conf_matrix)).all()
