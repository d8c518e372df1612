"""One-call image-pair matching (the reference's minimal public surface).

The reference is consumed either through three lines of torch
(README.md:84-97) or through kornia's `KF.LoFTR` one-liner (README.md:31-44):
construct, load weights, call on two grayscale images, read
mkpts0/mkpts1/confidence.  :func:`match_pair` is that contract for this
framework: numpy/array images in, numpy keypoints out, jit-compiled and
cached per (shape, preset) so repeated calls at one resolution pay compile
once.

For batched / advanced use, drop to the explicit API:
    model = LoFTR(get_config("indoor_ds").loftr)
    out = jax.jit(model.apply)(variables, MatchInput(...))
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

__all__ = ["match_pair", "load_matcher", "optimize_variables"]


def optimize_variables(variables):
    """Apply the inference-time weight transforms: BatchNorm folding
    (utils/folding.py) and 196->256 channel padding (utils/channel_pad.py,
    function-preserving; ~10% end-to-end on v5e).  The result feeds
    :func:`match_pair` and serve.MatchingService directly - both detect
    the transformed tree and adapt the model config."""
    from loftr_tpu.utils.channel_pad import pad_backbone_channels
    from loftr_tpu.utils.folding import fold_batchnorm
    if "batch_stats" in variables:
        variables = fold_batchnorm(variables)
    return pad_backbone_channels(variables)


def _to_gray_batch(img) -> np.ndarray:
    """HxW / HxWx1 / HxWx3(BGR or RGB: Rec601 gray) uint8/float -> [1,H,W,1]
    float32 in [0, 1]."""
    a = np.asarray(img)
    if a.ndim == 3 and a.shape[-1] == 3:
        a = a @ np.asarray([0.114, 0.587, 0.299], a.dtype)  # cv2 BGR weights
    a = a.reshape(a.shape[:2])
    if a.dtype == np.uint8:
        a = a.astype(np.float32) / 255.0
    return np.asarray(a, np.float32)[None, :, :, None]


@lru_cache(maxsize=8)
def _jitted(preset: str, dtype: str, hw0, hw1, pallas: bool,
            bb_norm: str, bb_dims: tuple):
    import jax
    from loftr_tpu.config import get_config
    from loftr_tpu.models.matcher import LoFTR

    cfg = get_config(preset, {"loftr": {
        "dtype": dtype,
        "match_coarse": {"use_pallas": pallas},
        "fine": {"use_pallas": pallas},
        "backbone": {"norm": bb_norm, "block_dims": bb_dims}}})
    model = LoFTR(cfg.loftr)
    fn = jax.jit(model.apply)
    return model, fn


def load_matcher(weights_path: Optional[str] = None,
                 preset: str = "indoor_ds", seed: int = 0):
    """Variables for :func:`match_pair`: converted-checkpoint msgpack/npz via
    utils/weights.py when a path is given, else random init (0 matches on
    real images — correct for an untrained net, see verify notes)."""
    import jax
    import jax.numpy as jnp
    from loftr_tpu.config import get_config
    from loftr_tpu.models.matcher import LoFTR
    from loftr_tpu.structs import MatchInput

    if weights_path is not None:
        if weights_path.endswith(".ckpt"):  # released torch checkpoint
            from loftr_tpu.utils.weights import load_torch_checkpoint
            return load_torch_checkpoint(weights_path)
        from loftr_tpu.train.checkpoint import load_params
        return load_params(weights_path)
    cfg = get_config(preset)
    model = LoFTR(cfg.loftr)
    dummy = MatchInput(image0=jnp.zeros((1, 64, 64, 1), jnp.float32),
                       image1=jnp.zeros((1, 64, 64, 1), jnp.float32))
    return model.init(jax.random.PRNGKey(seed), dummy)


def match_pair(img0, img1, variables, preset: str = "indoor_ds",
               dtype: str = "bfloat16", use_pallas: bool = True,
               min_conf: float = 0.0):
    """Match two grayscale images; the reference's 3-key output contract.

    img0/img1: HxW (or HxWx1/x3) arrays, uint8 or float; H and W must be
    multiples of the coarse stride (8).  variables: from
    :func:`load_matcher` / utils.weights.
    Returns dict(mkpts0 [M,2], mkpts1 [M,2], mconf [M]) — numpy, valid
    matches only, image-pixel coordinates (x, y), like
    batch['mkpts0_f'|'mkpts1_f'|'mconf'] in the reference
    (demo_loftr.py:160-187).
    """
    import jax.numpy as jnp
    from loftr_tpu.structs import MatchInput

    a0 = _to_gray_batch(img0)
    a1 = _to_gray_batch(img1)
    from loftr_tpu.utils.channel_pad import infer_backbone_overrides
    bb = infer_backbone_overrides(variables)["backbone"]
    _, fn = _jitted(preset, dtype, a0.shape[1:3], a1.shape[1:3], use_pallas,
                    bb["norm"], tuple(bb["block_dims"]))
    out = fn(variables, MatchInput(image0=jnp.asarray(a0),
                                   image1=jnp.asarray(a1)))
    valid = np.asarray(out.valid[0])
    conf = np.asarray(out.coarse.mconf[0], np.float32)
    keep = valid & (conf >= min_conf)
    return {
        "mkpts0": np.asarray(out.mkpts0_f[0], np.float32)[keep],
        "mkpts1": np.asarray(out.mkpts1_f[0], np.float32)[keep],
        "mconf": conf[keep],
    }
