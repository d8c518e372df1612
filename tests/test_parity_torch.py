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


def test_full_pipeline_parity_through_fine_stage(refmods):
    """Compose the reference's own torch modules (backbone -> PE -> coarse
    transformer -> coarse matching -> fine preprocess -> fine transformer)
    with random weights and compare against our full matcher with the
    converted weights on a REAL image pair.  Covers stages [1]-[6]; stage
    [7] (soft-argmax) is pure math tested elsewhere."""
    import os
    import cv2
    import torch.nn.functional as TF
    import jax
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.utils.weights import convert_torch_state_dict

    fp_mod = _load("refpkg.fine_preprocess",
                   REF + "/loftr_module/fine_preprocess.py")
    pe_mod = refmods["pos_enc"]

    torch.manual_seed(3)
    dims = dict(initial_dim=16, block_dims=[16, 24, 32])
    bb = refmods["resnet_fpn"].ResNetFPN_8_2(
        {"initial_dim": 16, "block_dims": [16, 24, 32]})
    pe = pe_mod.PositionEncodingSine(32, temp_bug_fix=True)
    coarse = refmods["transformer"].LocalFeatureTransformer(
        {"d_model": 32, "nhead": 4, "layer_names": ["self", "cross"],
         "attention": "linear"})
    fine = refmods["transformer"].LocalFeatureTransformer(
        {"d_model": 16, "nhead": 2, "layer_names": ["self", "cross"],
         "attention": "linear"})
    fpre = fp_mod.FinePreprocess(
        {"fine_concat_coarse_feat": True, "fine_window_size": 5,
         "coarse": {"d_model": 32}, "fine": {"d_model": 16}})
    for mod in (bb, coarse, fine, fpre):
        mod.eval()

    state = {}
    for prefix, mod in [("backbone", bb), ("loftr_coarse", coarse),
                        ("loftr_fine", fine), ("fine_preprocess", fpre)]:
        for k, v in mod.state_dict().items():
            state[f"{prefix}.{k}"] = v.detach().numpy()
    variables = convert_torch_state_dict(state)

    SAMPLES = "/root/reference/assets/scannet_sample_images"
    g = lambda n: cv2.resize(
        cv2.imread(os.path.join(SAMPLES, n), cv2.IMREAD_GRAYSCALE),
        (128, 96)).astype(np.float32) / 255.0
    img0 = g("scene0711_00_frame-001680.jpg")
    img1 = g("scene0711_00_frame-001995.jpg")

    # ---------------- reference pipeline (loftr.py:29-75 composition)
    with torch.no_grad():
        timg = torch.from_numpy(np.stack([img0, img1]))[:, None]
        feat_c, feat_f = bb(timg)
        fc = pe(feat_c)
        h0c, w0c = fc.shape[2], fc.shape[3]
        fc = fc.flatten(2).transpose(1, 2)  # [2, L, C]
        fc0, fc1 = fc[:1], fc[1:]
        fc0, fc1 = coarse(fc0, fc1)
        # coarse matching (dual softmax, thr low so matches exist)
        cm = refmods["coarse_matching"].CoarseMatching({
            "thr": 1e-6, "border_rm": 0, "match_type": "dual_softmax",
            "dsmax_temperature": 0.1, "train_coarse_percent": 0.2,
            "train_pad_num_gt_min": 20, "sparse_spvs": False,
            "skh_iters": 3, "skh_init_bin_score": 1.0,
            "skh_prefilter": False})
        cm.eval()
        data = {"hw0_i": (96, 128), "hw1_i": (96, 128),
                "hw0_c": (h0c, w0c), "hw1_c": (h0c, w0c),
                "hw0_f": (48, 64), "hw1_f": (48, 64)}
        cm(fc0, fc1, data)
        w0, w1 = fpre(feat_f[:1], feat_f[1:], fc0, fc1, data)
        rf0, rf1 = fine(w0, w1)

    ref_pairs = {(int(i), int(j)) for i, j in
                 zip(data["i_ids"].numpy(), data["j_ids"].numpy())}
    assert len(ref_pairs) >= 3, "need a non-trivial match set"

    # ---------------- our pipeline with the converted weights
    cfg = get_config("default").replaced({"loftr": {
        "backbone": {"initial_dim": 16, "block_dims": (16, 24, 32)},
        "coarse": {"d_model": 32, "nhead": 4,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 16, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"thr": 1e-6, "border_rm": 0,
                         "max_matches": 192}}})
    model = LoFTR(cfg.loftr)
    inp = MatchInput(image0=jnp.asarray(img0)[None, :, :, None],
                     image1=jnp.asarray(img1)[None, :, :, None])
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}, inp)
    v = np.asarray(out.valid)[0]
    got_pairs = {(int(i), int(j)) for i, j in
                 zip(np.asarray(out.coarse.i_ids)[0][v],
                     np.asarray(out.coarse.j_ids)[0][v])}
    assert got_pairs == ref_pairs, (len(got_pairs), len(ref_pairs),
                                    got_pairs ^ ref_pairs)

    # fine-stage features: compare our per-slot windows to the reference's
    # (reference orders by its own match list; build an index)
    ref_order = {pair: k for k, (i, j) in enumerate(
        zip(data["i_ids"].numpy(), data["j_ids"].numpy()))
        for pair in [(int(i), int(j))]}
    # re-run our model capturing fine features via expec_f equivalence:
    # instead compare expec_f against reference fine features run through
    # our soft-argmax math
    from loftr_tpu.ops.fine_match import fine_match
    rf0n = rf0.numpy()[None]  # [1, M, 25, 16]
    rf1n = rf1.numpy()[None]
    ref_expec = np.asarray(fine_match(jnp.asarray(rf0n), jnp.asarray(rf1n)))
    got_expec = np.asarray(out.expec_f)[0]
    ii = np.asarray(out.coarse.i_ids)[0]
    jj = np.asarray(out.coarse.j_ids)[0]
    for k in range(len(v)):
        if not v[k]:
            continue
        rk = ref_order[(int(ii[k]), int(jj[k]))]
        np.testing.assert_allclose(got_expec[k], ref_expec[0, rk],
                                   rtol=1e-3, atol=1e-4)
