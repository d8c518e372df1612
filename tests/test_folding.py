"""BatchNorm folding (loftr_tpu/utils/folding.py): folded inference must
reproduce batch-norm eval output through the backbone and the full matcher."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loftr_tpu import LoFTR, MatchInput, get_config
from loftr_tpu.models.backbone import ResNetFPN_8_2
from loftr_tpu.utils.folding import fold_batchnorm, fold_config


def _randomize_bn(variables, rng):
    """Give BN params/stats non-trivial values so folding isn't the identity."""
    def walk(tree, is_stats):
        out = {}
        for k, v in tree.items():
            if (k == "bn" and isinstance(v, dict)
                    and ("scale" in v or "mean" in v)):
                n = next(iter(v.values())).shape[0]
                if is_stats:
                    out[k] = {"mean": jnp.asarray(rng.randn(n) * 0.5, jnp.float32),
                              "var": jnp.asarray(rng.rand(n) * 2 + 0.1, jnp.float32)}
                else:
                    out[k] = {"scale": jnp.asarray(rng.rand(n) + 0.5, jnp.float32),
                              "bias": jnp.asarray(rng.randn(n) * 0.2, jnp.float32)}
            elif isinstance(v, dict):
                out[k] = walk(v, is_stats)
            else:
                out[k] = v
        return out
    return {"params": walk(variables["params"], False),
            "batch_stats": walk(variables["batch_stats"], True)}


def test_backbone_folding_matches_bn_eval():
    rng = np.random.RandomState(0)
    bn_model = ResNetFPN_8_2(initial_dim=32, block_dims=(32, 48, 64),
                             norm="batch")
    x = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    v = bn_model.init(jax.random.PRNGKey(0), x)
    v = _randomize_bn({"params": {"backbone": v["params"]},
                       "batch_stats": {"backbone": v["batch_stats"]}}, rng)
    ref_c, ref_f = bn_model.apply(
        {"params": v["params"]["backbone"],
         "batch_stats": v["batch_stats"]["backbone"]}, x, train=False)

    folded = fold_batchnorm(v)
    none_model = ResNetFPN_8_2(initial_dim=32, block_dims=(32, 48, 64),
                               norm="none")
    got_c, got_f = none_model.apply(
        {"params": folded["params"]["backbone"]}, x)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.heavy
def test_full_matcher_folding_end_to_end():
    rng = np.random.RandomState(1)
    cfg = get_config("indoor_ds", {"loftr": {"match_coarse": {
        "max_matches": 64, "use_pallas": False},
        "fine": {"use_pallas": False}}})
    model = LoFTR(cfg.loftr)
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32))
    v = model.init(jax.random.PRNGKey(0), inp)
    v = _randomize_bn(v, rng)
    ref = model.apply(v, inp)

    fcfg = fold_config(cfg)
    assert fcfg.loftr.backbone.norm == "none"
    folded = fold_batchnorm(v)
    assert "batch_stats" not in folded
    got = jax.jit(LoFTR(fcfg.loftr).apply)(folded, inp)

    np.testing.assert_allclose(np.asarray(got.conf_matrix),
                               np.asarray(ref.conf_matrix),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.expec_f),
                               np.asarray(ref.expec_f), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.mkpts0_f),
                               np.asarray(ref.mkpts0_f), atol=5e-3)


def test_fold_requires_batch_stats():
    cfg = get_config("indoor_ds")
    with pytest.raises(KeyError):
        fold_batchnorm({"params": {"backbone": {}}})


def test_channel_pad_preserves_function():
    """196->256 zero-padded backbone computes the identical function."""
    import numpy as np
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.utils.channel_pad import (pad_backbone_channels,
                                             pad_config)
    r = np.random.RandomState(0)
    inp = MatchInput(
        image0=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32))
    cfg = get_config("indoor_ds",
                     {"loftr": {"dtype": "float32",
                                "match_coarse": {"max_matches": 16,
                                                 "use_pallas": False},
                                "fine": {"use_pallas": False}}})
    model = LoFTR(cfg.loftr)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(model.apply)(v, inp)

    v2 = pad_backbone_channels(v)
    cfg2 = pad_config(cfg)
    assert cfg2.loftr.backbone.block_dims == (128, 256, 256)
    got = jax.jit(LoFTR(cfg2.loftr).apply)(v2, inp)
    np.testing.assert_allclose(np.asarray(got.coarse.mconf),
                               np.asarray(want.coarse.mconf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.expec_f),
                               np.asarray(want.expec_f), atol=1e-5)


@pytest.mark.heavy
def test_channel_pad_composes_with_fold():
    import numpy as np
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.utils.channel_pad import (pad_backbone_channels,
                                             pad_config)
    r = np.random.RandomState(1)
    inp = MatchInput(
        image0=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32))
    cfg = get_config("indoor_ds",
                     {"loftr": {"dtype": "float32",
                                "match_coarse": {"max_matches": 16,
                                                 "use_pallas": False},
                                "fine": {"use_pallas": False}}})
    model = LoFTR(cfg.loftr)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(model.apply)(v, inp)

    folded = fold_batchnorm(v)
    padded = pad_backbone_channels(folded)
    cfg2 = pad_config(fold_config(cfg))
    got = jax.jit(LoFTR(cfg2.loftr).apply)(padded, inp)
    np.testing.assert_allclose(np.asarray(got.expec_f),
                               np.asarray(want.expec_f), atol=2e-4)
