"""Numerical parity tests against the reference's own PyTorch modules.

The reference implementation at /root/reference is imported (read-only, by
file path - its kornia-dependent modules are avoided) with RANDOM weights;
those weights are converted through loftr_tpu.utils.weights and the two
implementations must agree numerically.  This validates:
  - the weight converter key mapping + layout transposes,
  - backbone conv/BN/FPN numerics incl. align-corners upsampling,
  - position encoding tables (both temp_bug_fix variants),
  - transformer + linear attention stack,
  - dual-softmax confidence + threshold/border/MNN match extraction.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference/src/loftr"


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def refmods():
    pkg = types.ModuleType("refpkg")
    pkg.__path__ = [REF + "/loftr_module"]
    sys.modules["refpkg"] = pkg
    mods = {}
    mods["resnet_fpn"] = _load("ref_resnet_fpn",
                               REF + "/backbone/resnet_fpn.py")
    mods["pos_enc"] = _load("ref_pos_enc",
                            REF + "/utils/position_encoding.py")
    mods["lin_attn"] = _load("refpkg.linear_attention",
                             REF + "/loftr_module/linear_attention.py")
    mods["transformer"] = _load("refpkg.transformer",
                                REF + "/loftr_module/transformer.py")
    mods["coarse_matching"] = _load("ref_coarse_matching",
                                    REF + "/utils/coarse_matching.py")
    return mods


def _to_np_state(torch_module):
    return {k: v.detach().numpy() for k, v in
            torch_module.state_dict().items()}


def test_backbone_parity(refmods):
    from loftr_tpu.models.backbone import ResNetFPN_8_2
    from loftr_tpu.utils.weights import convert_torch_state_dict

    torch.manual_seed(0)
    tref = refmods["resnet_fpn"].ResNetFPN_8_2(
        {"initial_dim": 32, "block_dims": [32, 48, 64]})
    tref.eval()

    state = {f"backbone.{k}": v for k, v in _to_np_state(tref).items()}
    variables = convert_torch_state_dict(state)

    x = np.random.RandomState(0).rand(1, 1, 64, 96).astype(np.float32)
    with torch.no_grad():
        c_ref, f_ref = tref(torch.from_numpy(x))

    model = ResNetFPN_8_2(32, (32, 48, 64))
    got_c, got_f = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False)

    np.testing.assert_allclose(np.asarray(got_c),
                               c_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f),
                               f_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bug_fix", [True, False])
def test_position_encoding_parity(refmods, bug_fix):
    from loftr_tpu.models.position_encoding import _pe_table
    tref = refmods["pos_enc"].PositionEncodingSine(
        64, max_shape=(32, 32), temp_bug_fix=bug_fix)
    want = tref.pe[0].numpy().transpose(1, 2, 0)  # [H, W, C]
    got = _pe_table(64, 32, 32, bug_fix)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_transformer_parity(refmods):
    from loftr_tpu.models.transformer import LocalFeatureTransformer
    from loftr_tpu.utils.weights import convert_torch_state_dict

    torch.manual_seed(1)
    cfg = {"d_model": 64, "nhead": 8,
           "layer_names": ["self", "cross"] * 2, "attention": "linear"}
    tref = refmods["transformer"].LocalFeatureTransformer(cfg)
    tref.eval()

    state = {f"loftr_coarse.{k}": v for k, v in _to_np_state(tref).items()}
    variables = convert_torch_state_dict(state)

    rng = np.random.RandomState(3)
    f0 = rng.randn(2, 40, 64).astype(np.float32)
    f1 = rng.randn(2, 48, 64).astype(np.float32)
    with torch.no_grad():
        r0, r1 = tref(torch.from_numpy(f0), torch.from_numpy(f1))

    model = LocalFeatureTransformer(64, 8, ("self", "cross") * 2, "linear")
    g0, g1 = model.apply({"params": variables["params"]["loftr_coarse"]},
                         jnp.asarray(f0), jnp.asarray(f1))
    np.testing.assert_allclose(np.asarray(g0), r0.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), r1.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_transformer_parity_masked(refmods):
    from loftr_tpu.models.transformer import LocalFeatureTransformer
    from loftr_tpu.utils.weights import convert_torch_state_dict

    torch.manual_seed(2)
    cfg = {"d_model": 32, "nhead": 4,
           "layer_names": ["self", "cross"], "attention": "linear"}
    tref = refmods["transformer"].LocalFeatureTransformer(cfg)
    tref.eval()
    state = {f"loftr_coarse.{k}": v for k, v in _to_np_state(tref).items()}
    variables = convert_torch_state_dict(state)

    rng = np.random.RandomState(4)
    f0 = rng.randn(1, 24, 32).astype(np.float32)
    f1 = rng.randn(1, 24, 32).astype(np.float32)
    m0 = (rng.rand(1, 24) > 0.25)
    m1 = (rng.rand(1, 24) > 0.25)
    with torch.no_grad():
        r0, r1 = tref(torch.from_numpy(f0), torch.from_numpy(f1),
                      torch.from_numpy(m0), torch.from_numpy(m1))
    model = LocalFeatureTransformer(32, 4, ("self", "cross"), "linear")
    g0, g1 = model.apply({"params": variables["params"]["loftr_coarse"]},
                         jnp.asarray(f0), jnp.asarray(f1),
                         jnp.asarray(m0), jnp.asarray(m1))
    # compare only valid rows (masked rows are garbage in both)
    np.testing.assert_allclose(np.asarray(g0)[m0], r0.numpy()[m0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1)[m1], r1.numpy()[m1],
                               rtol=1e-4, atol=1e-4)


def test_coarse_matching_parity(refmods):
    """Dual-softmax conf + thr/border/MNN extraction vs the reference."""
    from loftr_tpu.ops.matching import (dual_softmax_conf,
                                        mutual_nearest_candidates,
                                        topk_matches, matches_to_kpts)

    h0c, w0c = 8, 10
    h1c, w1c = 7, 9
    L, S = h0c * w0c, h1c * w1c
    C = 32
    rng = np.random.RandomState(5)
    # craft features with strong planted correspondences between interior
    # cells (distinct i -> distinct j so MNN keeps them)
    f0 = rng.randn(1, L, C).astype(np.float32)
    f0 /= np.linalg.norm(f0, axis=-1, keepdims=True)
    f1 = rng.randn(1, S, C).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    interior0 = [y * w0c + x for y in range(2, h0c - 2)
                 for x in range(2, w0c - 2)]
    interior1 = [y * w1c + x for y in range(2, h1c - 2)
                 for x in range(2, w1c - 2)]
    n_plant = min(len(interior0), len(interior1), 12)
    for i, j in zip(rng.permutation(interior0)[:n_plant],
                    rng.permutation(interior1)[:n_plant]):
        f1[0, j] = f0[0, i]
    f0 *= 4.0
    f1 *= 4.0

    cm = refmods["coarse_matching"].CoarseMatching({
        "thr": 0.2, "border_rm": 2, "match_type": "dual_softmax",
        "dsmax_temperature": 0.1, "train_coarse_percent": 0.2,
        "train_pad_num_gt_min": 20, "sparse_spvs": False,
        "skh_iters": 3, "skh_init_bin_score": 1.0, "skh_prefilter": False})
    cm.eval()
    data = {"hw0_i": (h0c * 8, w0c * 8), "hw1_i": (h1c * 8, w1c * 8),
            "hw0_c": (h0c, w0c), "hw1_c": (h1c, w1c)}
    with torch.no_grad():
        cm(torch.from_numpy(f0), torch.from_numpy(f1), data)

    conf = dual_softmax_conf(jnp.asarray(f0), jnp.asarray(f1), 0.1)
    np.testing.assert_allclose(np.asarray(conf),
                               data["conf_matrix"].numpy(),
                               rtol=1e-4, atol=1e-6)

    cand = mutual_nearest_candidates(conf, 0.2, 2, (h0c, w0c), (h1c, w1c))
    m = topk_matches(cand, k=L)
    mask = np.asarray(m.mask)[0]
    got_pairs = {(int(i), int(j)) for i, j, ok in
                 zip(np.asarray(m.i_ids)[0], np.asarray(m.j_ids)[0], mask)
                 if ok}
    ref_pairs = {(int(i), int(j)) for i, j in
                 zip(data["i_ids"].numpy(), data["j_ids"].numpy())}
    assert len(ref_pairs) > 3, "test should produce a non-trivial match set"
    assert got_pairs == ref_pairs

    # keypoint conversion parity (coarse_matching.py:241-250)
    k0, k1 = matches_to_kpts(m, (h0c, w0c), (h1c, w1c), 8)
    ref_k0 = {tuple(map(float, p)) for p in data["mkpts0_c"].numpy()}
    got_k0 = {tuple(map(float, p))
              for p, ok in zip(np.asarray(k0)[0], mask) if ok}
    assert got_k0 == ref_k0
