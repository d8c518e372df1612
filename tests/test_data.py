"""Data-pipeline tests on synthetic on-disk fixtures (no dataset downloads)."""
import os
import os.path as osp

import cv2
import h5py
import numpy as np
import pytest

from loftr_tpu.data import (DataLoader, MegaDepthDataset, ScanNetDataset,
                            SceneBalancedSampler, collate_matchinput,
                            get_local_split)
from loftr_tpu.data.sampler import ConcatDataset


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    scene = "scene0000_00"
    for sub in ("color", "depth", "pose"):
        os.makedirs(root / scene / sub)
    rng = np.random.RandomState(0)
    for stem in (0, 15, 30):
        img = rng.randint(0, 255, (480, 640), np.uint8)
        cv2.imwrite(str(root / scene / "color" / f"{stem}.jpg"), img)
        depth = rng.randint(500, 3000, (480, 640)).astype(np.uint16)
        cv2.imwrite(str(root / scene / "depth" / f"{stem}.png"), depth)
        pose = np.eye(4)
        pose[:3, 3] = rng.rand(3)
        np.savetxt(str(root / scene / "pose" / f"{stem}.txt"), pose,
                   delimiter=" ")
    np.savez(str(root / "intrinsics.npz"),
             **{scene: np.array([[500.0, 0, 320], [0, 500.0, 240],
                                 [0, 0, 1]])})
    np.savez(str(root / "pairs.npz"),
             name=np.array([[0, 0, 0, 15], [0, 0, 15, 30]], np.uint16),
             score=np.array([0.6, 0.5]))
    return root


def test_scannet_dataset(scannet_root):
    ds = ScanNetDataset(str(scannet_root), str(scannet_root / "pairs.npz"),
                        str(scannet_root / "intrinsics.npz"), mode="train")
    assert len(ds) == 2
    item = ds[0]
    assert item["image0"].shape == (480, 640, 1)
    assert item["depth0"].shape == (480, 640)
    assert item["image0"].dtype == np.float32
    assert 0.0 <= item["image0"].min() and item["image0"].max() <= 1.0
    # relative pose consistency: T_1to0 = inv(T_0to1)
    np.testing.assert_allclose(item["T_0to1"] @ item["T_1to0"], np.eye(4),
                               atol=1e-5)
    # depth /1000 conversion
    assert 0.5 <= item["depth0"].mean() <= 3.0


def test_scannet_rel_pose_npz(scannet_root, tmp_path):
    """Eval fixture path: rel_pose rows in the npz, no pose txt files."""
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    np.savez(str(tmp_path / "test.npz"),
             name=np.array([[0, 0, 0, 15]], np.uint16),
             rel_pose=np.array([T[:3].reshape(-1)]))
    ds = ScanNetDataset(str(scannet_root), str(tmp_path / "test.npz"),
                        str(scannet_root / "intrinsics.npz"), mode="test")
    item = ds[0]
    np.testing.assert_allclose(item["T_0to1"][:3, 3], [1, 2, 3], atol=1e-6)
    assert item["depth0"].size == 0  # test mode loads no depth


@pytest.fixture(scope="module")
def megadepth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("megadepth")
    os.makedirs(root / "imgs")
    os.makedirs(root / "depths")
    rng = np.random.RandomState(1)
    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i, (h, w) in enumerate([(480, 640), (600, 800), (512, 384)]):
        p = f"imgs/im{i}.jpg"
        cv2.imwrite(str(root / p), rng.randint(0, 255, (h, w), np.uint8))
        dp = f"depths/d{i}.h5"
        with h5py.File(str(root / dp), "w") as f:
            f["depth"] = rng.rand(h, w).astype(np.float32) * 5
        image_paths.append(p)
        depth_paths.append(dp)
        K = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]])
        intrinsics.append(K)
        T = np.eye(4)
        T[:3, 3] = rng.rand(3)
        poses.append(T)
    pair_infos = np.array(
        [((0, 1), 0.5, None), ((1, 2), 0.7, None), ((0, 2), 0.1, None)],
        dtype=object)
    np.savez(str(root / "scene.npz"),
             image_paths=np.array(image_paths, object),
             depth_paths=np.array(depth_paths, object),
             intrinsics=np.array(intrinsics, object),
             poses=np.array(poses, object),
             pair_infos=pair_infos)
    return root


def test_megadepth_dataset(megadepth_root):
    ds = MegaDepthDataset(str(megadepth_root),
                          str(megadepth_root / "scene.npz"), mode="train",
                          min_overlap_score=0.4, img_resize=320, df=8,
                          img_padding=True, depth_padding=True)
    assert len(ds) == 2  # overlap 0.1 filtered out
    item = ds[0]
    # square-padded to the resized longer edge, divisible by 8
    assert item["image0"].shape[0] == item["image0"].shape[1]
    assert item["image0"].shape[0] % 8 == 0
    assert item["depth0"].shape == (2000, 2000)
    # coarse mask at 1/8
    assert item["mask0"].shape == (item["image0"].shape[0] // 8,
                                   item["image0"].shape[1] // 8)
    # scale = original / new
    h_orig, w_orig = 480, 640
    sw, sh = item["scale0"]
    assert sw > 1 and sh > 1
    # mask0 marks the valid (non-padded) region
    assert item["mask0"].any() and not item["mask0"].all()


def test_megadepth_mask_matches_torch_nearest(megadepth_root):
    """Coarse-mask downsampling parity with F.interpolate(mode='nearest')."""
    import torch
    import torch.nn.functional as F
    from loftr_tpu.data.megadepth import _downsample_mask_nearest
    rng = np.random.RandomState(2)
    mask = rng.rand(328, 328) > 0.4
    got = _downsample_mask_nearest(mask, 0.125)
    want = F.interpolate(torch.from_numpy(mask)[None, None].float(),
                         scale_factor=0.125, mode="nearest",
                         recompute_scale_factor=False)[0, 0].bool().numpy()
    np.testing.assert_array_equal(got, want)


def test_sampler_balanced_counts(scannet_root):
    ds = ScanNetDataset(str(scannet_root), str(scannet_root / "pairs.npz"),
                        str(scannet_root / "intrinsics.npz"), mode="train")
    concat = ConcatDataset([ds, ds, ds])
    sampler = SceneBalancedSampler(concat, n_samples_per_subset=4,
                                   subset_replacement=True, seed=0)
    idxs = list(sampler)
    assert len(idxs) == 12
    # four draws from each subset's index range
    assert sum(1 for i in idxs if i < 2) == 4
    assert sum(1 for i in idxs if 2 <= i < 4) == 4
    # stateful across epochs: second epoch differs
    assert list(sampler) != idxs or list(sampler) != idxs


def test_get_local_split_partitions():
    scenes = [f"s{i}" for i in range(10)]
    splits = [get_local_split(scenes, 4, r, seed=1) for r in range(4)]
    assert all(len(s) == 3 for s in splits)  # padded 10 -> 12
    # deterministic
    assert splits[0] == get_local_split(scenes, 4, 0, seed=1)
    # union covers all scenes
    assert set().union(*[set(s) for s in splits]) == set(scenes)


def test_loader_batches(scannet_root):
    ds = ScanNetDataset(str(scannet_root), str(scannet_root / "pairs.npz"),
                        str(scannet_root / "intrinsics.npz"), mode="train")
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 1
    inp, meta = batches[0]
    assert inp.image0.shape == (2, 480, 640, 1)
    assert inp.depth0.shape == (2, 480, 640)
    assert inp.T_0to1.shape == (2, 4, 4)
    assert inp.mask0 is None and inp.scale0 is None  # scannet: no masks
    assert meta[0]["scene_id"] == "scene0000_00"


def test_loader_propagates_errors(scannet_root):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failure")

    loader = DataLoader(Broken(), batch_size=2)
    with pytest.raises(RuntimeError, match="decode failure"):
        list(loader)


def test_augmentors():
    from loftr_tpu.data.augment import build_augmentor
    import pytest as _pytest
    rng = np.random.default_rng(0)
    img = (np.random.RandomState(0).rand(64, 80) * 255).astype(np.uint8)
    for method in ("dark", "mobile"):
        aug = build_augmentor(method)
        outs = [aug(img, np.random.default_rng(s)) for s in range(8)]
        assert all(o.shape == img.shape and o.dtype == img.dtype
                   for o in outs)
        # at least one draw changes the image
        assert any(not np.array_equal(o, img) for o in outs)
    assert build_augmentor(None) is None
    with _pytest.raises(ValueError):
        build_augmentor("FDA")


def test_scannet_with_augmentation(scannet_root):
    from loftr_tpu.data.augment import build_augmentor
    ds = ScanNetDataset(str(scannet_root), str(scannet_root / "pairs.npz"),
                        str(scannet_root / "intrinsics.npz"), mode="train",
                        augment_fn=build_augmentor("dark"))
    item = ds[0]
    assert item["image0"].shape == (480, 640, 1)
    assert 0.0 <= item["image0"].min() and item["image0"].max() <= 1.0
