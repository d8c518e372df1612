"""Contract tests against the REAL reference eval fixtures.

These pin the 1500-pair readiness claim: the dataset classes must parse the
actual `/root/reference/assets` npz layouts (not a synthesized emulation of
them), and a pair driven through `__getitem__` with synthesized image bytes
must flow end-to-end through the Evaluator.

Format owners in the reference:
  scannet:   /root/reference/src/datasets/scannet.py:43-96
  megadepth: /root/reference/src/datasets/megadepth.py:47-89
"""
import os.path as osp

import numpy as np
import pytest

SCANNET_DIR = "/root/reference/assets/scannet_test_1500"
MEGA_NPZ = ("/root/reference/assets/megadepth_test_1500_scene_info/"
            "0022_0.5_0.7.npz")

pytestmark = pytest.mark.skipif(
    not (osp.isdir(SCANNET_DIR) and osp.isfile(MEGA_NPZ)),
    reason="reference eval fixtures not present in this image")


def _write_jpg(path, h, w, seed):
    import cv2
    path = str(path)
    import os
    os.makedirs(osp.dirname(path), exist_ok=True)
    img = (np.random.RandomState(seed).rand(h, w) * 255).astype(np.uint8)
    assert cv2.imwrite(path, img)
    return img


def test_scannet_1500_fixture_contract(tmp_path):
    from loftr_tpu.data.scannet import ScanNetDataset

    ds = ScanNetDataset(
        root_dir=str(tmp_path), npz_path=osp.join(SCANNET_DIR, "test.npz"),
        intrinsic_path=osp.join(SCANNET_DIR, "intrinsics.npz"), mode="test")
    assert len(ds) == 1500
    # npz-carried relative poses: finite 3x4 rows for every pair
    assert ds.rel_poses is not None and ds.rel_poses.shape == (1500, 12)
    assert np.isfinite(ds.rel_poses).all()
    # every scene named in the pair table has a per-scene intrinsics entry
    scenes = {f"scene{s:04d}_{u:02d}" for s, u, _, _ in ds.data_names}
    assert scenes <= set(ds.intrinsics), sorted(scenes - set(ds.intrinsics))
    for sc in sorted(scenes)[:5]:
        K = np.asarray(ds.intrinsics[sc], np.float32).reshape(3, 3)
        assert np.isfinite(K).all() and K[0, 0] > 0 and K[1, 1] > 0

    # drive __getitem__ at a real pair's path with synthesized image bytes
    scene, sub, s0, s1 = ds.data_names[0]
    scene_name = f"scene{scene:04d}_{sub:02d}"
    _write_jpg(tmp_path / scene_name / "color" / f"{s0}.jpg", 480, 640, 0)
    _write_jpg(tmp_path / scene_name / "color" / f"{s1}.jpg", 480, 640, 1)
    item = ds[0]
    assert item["image0"].shape == (480, 640, 1)
    assert item["image0"].dtype == np.float32
    assert item["K0"].shape == (3, 3) and item["T_0to1"].shape == (4, 4)
    # rel_pose rows are rigid transforms: orthonormal R, det +1
    R = item["T_0to1"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert abs(np.linalg.det(R) - 1.0) < 1e-4
    assert item["scene_id"] == scene_name


def test_megadepth_1500_fixture_contract(tmp_path):
    from loftr_tpu.data.megadepth import MegaDepthDataset

    ds = MegaDepthDataset(
        root_dir=str(tmp_path), npz_path=MEGA_NPZ, mode="test",
        img_resize=128, df=8, img_padding=True)
    # test mode keeps every pair of this scene shard
    assert len(ds) == 300
    # pair_infos decode: ((idx0, idx1), overlap, central_matches)
    (i0, i1), ov, _central = ds.pair_infos[0]
    assert 0 <= i0 < len(ds.image_paths) and 0 <= i1 < len(ds.image_paths)
    assert 0.0 < ov <= 1.0
    for pair in ds.pair_infos[:50]:
        (a, b), _, _ = pair
        assert ds.image_paths[a] is not None and ds.image_paths[b] is not None
        K = np.asarray(ds.intrinsics[a], np.float32)
        assert K.shape == (3, 3) and np.isfinite(K).all()
        T = np.asarray(ds.poses[a], np.float64)
        assert T.shape == (4, 4)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    # drive __getitem__: synthesized jpgs at the real relative paths
    _write_jpg(tmp_path / str(ds.image_paths[i0]), 180, 240, 2)
    _write_jpg(tmp_path / str(ds.image_paths[i1]), 200, 160, 3)
    item = ds[0]
    # longer-edge 128, /8-floored, padded square
    assert item["image0"].shape == (128, 128, 1)
    assert item["image1"].shape == (128, 128, 1)
    assert item["mask0"].shape == (16, 16) and item["mask0"].dtype == bool
    assert item["scale0"].shape == (2,) and (item["scale0"] >= 1.0).all()
    assert np.isfinite(item["T_0to1"]).all()
    assert item["pair_names"] == (str(ds.image_paths[i0]),
                                  str(ds.image_paths[i1]))


def test_megadepth_fixture_pair_through_evaluator(tmp_path):
    """One real-fixture pair end-to-end: __getitem__ -> DataLoader collate ->
    tiny model -> pose metrics (the production eval path of test.py)."""
    from loftr_tpu import get_config
    from loftr_tpu.data.megadepth import MegaDepthDataset
    from loftr_tpu.eval.evaluator import Evaluator
    import jax
    from loftr_tpu import LoFTR, MatchInput
    import jax.numpy as jnp

    ds = MegaDepthDataset(
        root_dir=str(tmp_path), npz_path=MEGA_NPZ, mode="test",
        img_resize=64, df=8, img_padding=True)
    (i0, i1), _, _ = ds.pair_infos[0]
    _write_jpg(tmp_path / str(ds.image_paths[i0]), 120, 160, 4)
    _write_jpg(tmp_path / str(ds.image_paths[i1]), 160, 120, 5)

    cfg = get_config("outdoor_ds", {"loftr": {
        "dtype": "float32",
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 16, "use_pallas": False}}})
    model = LoFTR(cfg.loftr)
    inp = MatchInput(
        image0=jnp.zeros((1, 64, 64, 1)), image1=jnp.zeros((1, 64, 64, 1)),
        mask0=jnp.ones((1, 8, 8), bool), mask1=jnp.ones((1, 8, 8), bool),
        scale0=jnp.ones((1, 2)), scale1=jnp.ones((1, 2)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)

    ev = Evaluator(cfg, variables)

    class _OnePair:
        def __len__(self):
            return 1

        def __getitem__(self, idx):
            return ds[0]

    agg = ev.evaluate_dataset(_OnePair(), batch_size=1, num_workers=1)
    # random weights: no matches above threshold -> pose fails -> inf errors
    # and 0 AUC, but every aggregate key must exist and be finite-typed
    for k in ("auc@5", "auc@10", "auc@20"):
        assert k in agg and 0.0 <= agg[k] <= 1.0
    assert any(k.startswith("prec@") for k in agg)
