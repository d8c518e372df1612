"""End-to-end learning test: the full training loop (supervision -> forward
-> loss -> optimizer) overfits a synthetic translation pair until the matcher
produces confident, geometrically correct matches.

This is the strongest whole-system check possible without dataset downloads:
it exercises gradients through the backbone, transformer, dual-softmax and
fine refinement together with the static-capacity GT-padding selection.
"""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu import LoFTR, MatchInput, get_config
from loftr_tpu.train.trainer import Trainer


def _textured_pair(H=64, W=64, shift=8, seed=0):
    """image1 is image0 translated by `shift` px with consistent geometry:
    constant depth z, camera translating by tx = shift*z/f."""
    rng = np.random.RandomState(seed)
    tex = rng.rand(H, W).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.5)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    img0 = tex
    img1 = np.roll(tex, -shift, axis=1)  # pixel x in img1 = x+shift in img0

    f, z = 40.0, 2.0
    # point at pixel x0 appears at x1 = x0 - shift?  img1[x] = img0[x+shift]
    # => content at img0 pixel u lands at img1 pixel u - shift.
    # warp: x1 = x0 + f*tx/z  =>  tx = -shift*z/f
    tx = -shift * z / f
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = tx
    depth = np.full((H, W), z, np.float32)
    return MatchInput(
        image0=jnp.asarray(img0)[None, :, :, None],
        image1=jnp.asarray(img1)[None, :, :, None],
        depth0=jnp.asarray(depth)[None],
        depth1=jnp.asarray(depth)[None],
        T_0to1=jnp.asarray(T)[None],
        T_1to0=jnp.asarray(np.linalg.inv(T))[None],
        K0=jnp.asarray(K)[None], K1=jnp.asarray(K)[None],
    ), shift


@pytest.mark.slow
def test_training_learns_to_match():
    batch, shift = _textured_pair()
    cfg = get_config("indoor_ds").replaced({
        "loftr": {
            "backbone": {"initial_dim": 16, "block_dims": (16, 24, 32)},
            "coarse": {"d_model": 32, "nhead": 4,
                       "layer_names": ("self", "cross") * 2},
            "fine": {"d_model": 16, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"train_matches": 24, "train_pad_num_gt_min": 4,
                             "max_matches": 32, "thr": 0.2},
        },
        "trainer": {"canonical_bs": 1, "canonical_lr": 2e-3,
                    "scheduler_interval": "step", "warmup_step": 20,
                    "scheduler": "CosineAnnealing", "cosa_tmax": 400}})
    trainer = Trainer(cfg, world_size=1, batch_size_per_device=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    model = LoFTR(cfg.loftr)
    fwd = jax.jit(lambda v, i: model.apply(v, i))

    def n_matches(state):
        out = fwd({"params": state.params,
                   "batch_stats": state.batch_stats}, batch)
        v = np.asarray(out.valid)[0]
        k0 = np.asarray(out.mkpts0_f)[0][v]
        k1 = np.asarray(out.mkpts1_f)[0][v]
        return int(v.sum()), k0, k1

    n0, _, _ = n_matches(state)
    losses = []
    for i in range(220):
        state, sc = trainer.train_step(state, batch)
        losses.append(float(sc["loss"]))
    n1, k0, k1 = n_matches(state)

    assert np.mean(losses[-20:]) < np.mean(losses[:20]), \
        (np.mean(losses[:20]), np.mean(losses[-20:]))
    assert n1 >= 5, f"matcher learned no confident matches ({n0} -> {n1})"
    # learned matches must follow the planted translation (x1 = x0 - shift)
    dx = k1[:, 0] - k0[:, 0]
    dy = k1[:, 1] - k0[:, 1]
    assert np.median(np.abs(dx + shift)) <= 2.0, dx
    assert np.median(np.abs(dy)) <= 2.0, dy
