"""Dataset family tests: ImageNet synset/class machinery, label-range
subsets, CLIP embedding join; OpenImages corrupt filtering + bbox
annotations; FFHQ wrapper."""

import os

import numpy as np
import pytest
from PIL import Image

from rdm_tpu.data.base import PatcherDataset
from rdm_tpu.data.faces import FFHQTrainRDM
from rdm_tpu.data.imagenet import ImageNetTrain
from rdm_tpu.data.openimages import (
    FullOpenImagesTrain,
    OpenImagesBBoxTrain,
)


def _write_img(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.default_rng(seed).integers(0, 255, (48, 48, 3),
                                               dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def imagenet_root(tmp_path):
    root = tmp_path / "in"
    rels = []
    for ci, syn in enumerate(["n01440764", "n01443537", "n01484850"]):
        for j in range(2):
            rel = f"{syn}/{syn}_{j}.png"
            _write_img(str(root / rel), seed=ci * 10 + j)
            rels.append(rel)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    (root / "synset_human.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n")
    emb = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    np.savez(root / "clip_embeddings_train.npz", embedding=emb)
    return str(root)


def test_imagenet_labels_and_embeddings(imagenet_root):
    ds = ImageNetTrain(imagenet_root, size=32, load_clip_embeddings=True)
    assert len(ds) == 6
    s = ds[0]
    assert s["class_label"] == 0 and s["human_label"] == "tench"
    assert s["synset"] == "n01440764"
    np.testing.assert_array_equal(s["clip_img_emb"], [0, 1, 2, 3])
    # unknown synset falls back to itself
    assert ds[5]["human_label"] == "n01484850"


def test_imagenet_sub_indices_and_label_range(imagenet_root):
    ds = ImageNetTrain(imagenet_root, size=32, sub_indices=[1, 2])
    assert len(ds) == 4
    assert all(ds[i]["class_label"] in (1, 2) for i in range(4))
    full = ImageNetTrain(imagenet_root, size=32)
    idx = full.get_subset_by_label_range((1, 1))
    assert len(idx) == 2


def test_openimages_corrupt_filter_and_bbox(tmp_path):
    root = tmp_path / "oi"
    rels = [f"imgs/{i}.png" for i in range(4)]
    for i, r in enumerate(rels):
        _write_img(str(root / r), seed=i)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    (root / "corrupts.txt").write_text("imgs/2.png\n")
    ds = FullOpenImagesTrain(str(root), size=32)
    assert len(ds) == 3
    assert all("2.png" not in ds[i]["file_path_"] for i in range(3))

    (root / "boxes_train.csv").write_text(
        "ImageID,XMin,XMax,YMin,YMax,LabelName\n"
        "0,0.1,0.9,0.1,0.9,/m/dog\n0,0.0,0.5,0.0,0.5,/m/cat\n")
    bds = OpenImagesBBoxTrain(str(root), size=48)
    s = bds[0]
    assert len(s["annotations"]) == 2
    assert s["annotations"][0]["label"] == "/m/dog"
    # feeds annotation-mode patch sampling
    patcher = PatcherDataset(bds, patch_size=16,
                             sampling_method="annotation")
    out = patcher[0]
    assert out["patch"].shape[0] == 2
    # image without annotations -> centered fallback patch
    out1 = patcher[1]
    assert out1["patch"].shape == (1, 16, 16, 3)


def test_ffhq_wrapper(tmp_path):
    root = tmp_path / "ffhq"
    rels = [f"images/{i}.png" for i in range(3)]
    for i, r in enumerate(rels):
        _write_img(str(root / r), seed=i)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    ds = FFHQTrainRDM(str(root), size=32)
    assert len(ds) == 3
    assert ds[1]["image"].shape == (32, 32, 3)


def test_semantic_and_superres_openimages(tmp_path):
    from rdm_tpu.data.openimages import (
        SemanticOpenImagesTrain,
        SuperresOpenImagesTrain,
    )

    root = tmp_path / "oi2"
    rels = [f"imgs/{i}.png" for i in range(2)]
    for i, r in enumerate(rels):
        _write_img(str(root / r), seed=i)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    os.makedirs(root / "masks", exist_ok=True)
    mask = np.zeros((48, 48), dtype=np.uint8)
    mask[10:20, 10:20] = 5
    Image.fromarray(mask).save(root / "masks" / "0.png")

    sem = SemanticOpenImagesTrain(str(root), size=32)
    s = sem[0]
    assert s["segmentation"].shape == (32, 32)
    assert set(np.unique(s["segmentation"])) <= {0, 5}
    s1 = sem[1]  # no mask file -> background
    assert (s1["segmentation"] == 0).all()

    sr = SuperresOpenImagesTrain(str(root), size=32, down_factor=4,
                                 noise_level=0.05)
    p = sr[0]
    assert p["image"].shape == (32, 32, 3)
    assert p["LR_image"].shape == (8, 8, 3)
    assert p["LR_image"].min() >= -1.0 and p["LR_image"].max() <= 1.0


def test_semantic_openimages_annotation_mode(tmp_path):
    """Reference protocol (openimages.py:103-254): CSV-driven per-object
    samples with class-labeled masks and one-hot segmentation."""
    from rdm_tpu.data.openimages import SemanticOpenImagesTrain

    root = tmp_path / "oi3"
    os.makedirs(root / "train", exist_ok=True)
    for i in range(2):
        _write_img(str(root / "train" / f"img{i}.jpg"), seed=i)
        mask = np.zeros((48, 48), dtype=np.uint8)
        mask[8 * i:30, 12:40] = 255  # binary instance mask
        Image.fromarray(mask).save(root / "train" / f"img{i}_m0.png")
    (root / "segmentation_classes.txt").write_text("/m/cat\n/m/dog\n")
    (root / "class-descriptions-boxable.csv").write_text(
        "/m/cat,Cat\n/m/dog,Dog\n")
    (root / "train-annotations-object-segmentation.csv").write_text(
        "MaskPath,ImageID,LabelName\n"
        "img0_m0.png,img0,/m/dog\n"
        "img1_m0.png,img1,/m/cat\n"
        "img1_m0.png,img1,/m/unknown\n")  # unknown class is skipped

    ds = SemanticOpenImagesTrain(str(root), size=32, random_crop=False)
    assert ds.annotation_mode
    assert len(ds) == 2  # unknown-class row dropped
    assert ds.num_classes == 3
    s = ds[0]
    assert s["class_name"] == "Dog" and s["class_label"] == 2
    assert s["image"].shape == (32, 32, 3)
    assert s["mask"].shape == (32, 32)
    assert set(np.unique(s["mask"])) <= {0, 2}
    assert s["segmentation"].shape == (32, 32, 3)
    assert s["segmentation"].dtype == np.float32
    # one-hot consistency with the integer mask
    assert (s["segmentation"].argmax(-1) == s["mask"]).all()
    s1 = ds[1]
    assert s1["class_label"] == 1 and s1["class_name"] == "Cat"
    # random-crop path keeps image/mask aligned shapes
    ds_rc = SemanticOpenImagesTrain(str(root), size=24, random_crop=True,
                                    seed=3)
    r = ds_rc[0]
    assert r["image"].shape == (24, 24, 3) and r["mask"].shape == (24, 24)


def test_video_builder(tmp_path):
    from rdm_tpu.retrieval.video_builder import (
        VideoClipSampler,
        VideoDatasetBuilder,
    )

    class _Videos:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {"video": rng.standard_normal(
                (10, 24, 24, 3)).astype(np.float32)}

    sampler = VideoClipSampler(_Videos(), clip_len=4, patch_size=16,
                               clips_per_video=3, seed=0)
    item = sampler[0]
    assert item["clip"].shape == (3, 4, 16, 16, 3)
    assert item["frame_ranges"].shape == (3, 2)

    def embedder(frames):
        return frames.reshape(len(frames), -1)[:, :8]

    builder = VideoDatasetBuilder(sampler, embedder=embedder,
                                  save_dir=str(tmp_path / "vdb"))
    pool = builder.build_data_pool()
    assert pool.size == 6  # 2 videos x 3 clips
    assert pool.embeddings.shape == (6, 8)
    assert builder.frame_ranges.shape == (6, 2)
    assert os.path.isfile(tmp_path / "vdb" / "frame_ranges.npy")


def test_biggan_imagenet_variant(imagenet_root):
    from rdm_tpu.data.imagenet import BigGANImageNetTrain

    ds = BigGANImageNetTrain(imagenet_root, size=32)
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["class_label"] == 0


def test_bsr_degradation_pipeline():
    """BSR degradation components + full pipeline: right shapes/range, and
    it actually degrades (differs from plain bicubic downscale)."""
    from rdm_tpu.data.base import _resize
    from rdm_tpu.data.degradation import (add_gaussian_noise,
                                          anisotropic_gaussian_kernel,
                                          degradation_bsr, jpeg_compress,
                                          random_blur)

    rng = np.random.default_rng(0)
    hr = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    k = anisotropic_gaussian_kernel(1.5, 0.4, 0.7)
    assert abs(float(k.sum()) - 1.0) < 1e-5 and k.shape == (21, 21)
    blurred = random_blur(hr, rng)
    assert blurred.shape == hr.shape
    assert blurred.std() < hr.std()  # blur reduces variance
    noisy = add_gaussian_noise(hr, rng)
    assert not np.allclose(noisy, hr)
    jpg = jpeg_compress(hr, rng)
    assert jpg.shape == hr.shape and jpg.min() >= 0 and jpg.max() <= 1

    lr = degradation_bsr(hr, sf=4, rng=np.random.default_rng(1))
    assert lr.shape == (16, 16, 3)
    assert lr.min() >= 0.0 and lr.max() <= 1.0
    clean = (_resize(hr * 2 - 1, (16, 16)) + 1) / 2
    assert float(np.abs(lr - clean).mean()) > 0.01
    # light variant is closer to the clean downscale on average
    dists = []
    for light in (False, True):
        d = [float(np.abs(degradation_bsr(
            hr, 4, np.random.default_rng(100 + i), light=light)
            - clean).mean()) for i in range(8)]
        dists.append(np.mean(d))
    assert dists[1] <= dists[0]


def test_superres_openimages_bsr(tmp_path):
    from PIL import Image

    from rdm_tpu.data.openimages import SuperresOpenImagesTrain

    root = tmp_path / "oi"
    root.mkdir()
    rng = np.random.default_rng(0)
    rels = []
    for i in range(2):
        rel = f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (80, 70, 3),
                                     dtype=np.uint8)).save(root / rel)
        rels.append(rel)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    ds = SuperresOpenImagesTrain(str(root), size=64, down_factor=4)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["LR_image"].shape == (16, 16, 3)
    assert -1.0 <= s["LR_image"].min() and s["LR_image"].max() <= 1.0
    # interpolation fallback still works
    ds2 = SuperresOpenImagesTrain(str(root), size=64, down_factor=4,
                                  degradation="bicubic", noise_level=0.05)
    assert ds2[0]["LR_image"].shape == (16, 16, 3)


def test_augmentation_varies_per_epoch(tmp_path):
    # per-item RNG folds (seed, epoch, worker, index): the same sample
    # must draw a different degradation each epoch, reproducibly
    from PIL import Image

    from rdm_tpu.data.base import DataLoader
    from rdm_tpu.data.openimages import SuperresOpenImagesTrain

    root = tmp_path / "oi"
    root.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (80, 70, 3),
                                 dtype=np.uint8)).save(root / "a.png")
    (root / "train_filelist.txt").write_text("a.png")
    ds = SuperresOpenImagesTrain(str(root), size=64, down_factor=4)
    e0 = ds[0]["LR_image"]
    ds.set_epoch(1)
    e1 = ds[0]["LR_image"]
    assert not np.array_equal(e0, e1)
    ds.set_epoch(0)
    np.testing.assert_array_equal(ds[0]["LR_image"], e0)

    # the loader propagates its pass number into the dataset
    ds.set_epoch(0)
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    b0 = next(iter(loader))["LR_image"][0]
    b1 = next(iter(loader))["LR_image"][0]
    np.testing.assert_array_equal(b0, e0)
    assert not np.array_equal(b0, b1)


def test_epoch_propagates_through_wrappers(tmp_path):
    # SubsetShard (sampler configs / host sharding) wraps the augmenting
    # dataset; the loader's epoch must reach it through the chain
    from PIL import Image

    from rdm_tpu.data.base import DataLoader, SubsetShard, propagate_epoch
    from rdm_tpu.data.openimages import SuperresOpenImagesTrain

    root = tmp_path / "oi"
    root.mkdir()
    rng = np.random.default_rng(2)
    Image.fromarray(rng.integers(0, 255, (80, 70, 3),
                                 dtype=np.uint8)).save(root / "a.png")
    (root / "train_filelist.txt").write_text("a.png")
    inner = SuperresOpenImagesTrain(str(root), size=64, down_factor=4)
    shard = SubsetShard(inner, rank=0, world_size=1)
    e0 = shard[0]["LR_image"]
    propagate_epoch(shard, 1)
    assert inner._epoch == 1
    assert not np.array_equal(shard[0]["LR_image"], e0)
    # and the loader wires it automatically
    propagate_epoch(shard, 0)
    loader = DataLoader(shard, batch_size=1, shuffle=False,
                        drop_last=False)
    b0 = next(iter(loader))["LR_image"][0]
    np.testing.assert_array_equal(b0, e0)
    assert inner._epoch == 0
    next(iter(loader))
    assert inner._epoch == 1
