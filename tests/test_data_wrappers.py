"""Dataset combinator tests (parity: /root/reference/rdm/data/base.py
:106-140, :1051-1217)."""

import numpy as np

from rdm_tpu.data.wrappers import (
    CachedDataset,
    ConcatDatasetWithIndex,
    MixDataset,
    PatchShuffleWrapper,
    WrapForFID,
)


class _Toy:
    def __init__(self, n, tag):
        self.n, self.tag = n, tag
        self.reads = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.reads += 1
        return {"v": i, "tag": self.tag,
                "image": np.full((4, 4, 3), i / 10, dtype=np.float32),
                "patches": np.arange(3)[:, None] + i * 10}


def test_concat_with_index():
    ds = ConcatDatasetWithIndex([_Toy(3, "a"), _Toy(2, "b")])
    assert len(ds) == 5
    assert ds[0]["tag"] == "a" and ds[0]["dataset_idx"] == 0
    assert ds[3]["tag"] == "b" and ds[3]["dataset_idx"] == 1
    assert ds[3]["v"] == 0  # local index


def test_mix_dataset_ratios():
    a, b = _Toy(100, "a"), _Toy(100, "b")
    ds = MixDataset([a, b], ratios=[0.8, 0.2], seed=0)
    tags = [ds[i]["tag"] for i in range(len(ds))]
    frac_a = tags.count("a") / len(tags)
    assert 0.75 < frac_a < 0.85


def test_cached_dataset():
    toy = _Toy(5, "a")
    ds = CachedDataset(toy)
    ds[2]; ds[2]; ds[2]
    assert toy.reads == 1
    assert ds[2]["v"] == 2


def test_patch_shuffle():
    ds = PatchShuffleWrapper(_Toy(4, "a"), keys=("patches",), seed=1)
    outs = {tuple(ds[0]["patches"][:, 0]) for _ in range(10)}
    assert len(outs) > 1  # order varies across reads
    for o in outs:
        assert sorted(o) == [0, 1, 2]


def test_wrap_for_fid():
    ds = WrapForFID(_Toy(2, "a"))
    out = ds[1]
    assert out.shape == (3, 4, 4) and out.dtype == np.uint8
