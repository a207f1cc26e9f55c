"""Dataset combinators and adapters.

Equivalents of the reference's misc data utilities
(/root/reference/rdm/data/base.py:1051-1217 MixDataset / CachedDataset /
ConcatDatasetWithIndex / PatchShuffleWrapper, and :106-140 WrapForFID).
"""

from __future__ import annotations

import bisect
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class ConcatDatasetWithIndex:
    """Concatenate datasets; each sample is tagged with its source index
    (base.py ConcatDatasetWithIndex semantics)."""

    def __init__(self, datasets: Sequence):
        assert datasets
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cum[-1]

    def __getitem__(self, idx: int):
        ds_idx = bisect.bisect_right(self.cum, idx)
        base = self.cum[ds_idx - 1] if ds_idx else 0
        out = dict(self.datasets[ds_idx][idx - base])
        out["dataset_idx"] = ds_idx
        return out


class MixDataset:
    """Sample proportionally from several datasets (base.py MixDataset):
    one epoch = sum of lengths; index maps to a dataset by the configured
    ratios, item chosen by a per-epoch-stable shuffle."""

    def __init__(self, datasets: Sequence,
                 ratios: Optional[Sequence[float]] = None, seed: int = 0):
        self.datasets = list(datasets)
        n = len(self.datasets)
        ratios = list(ratios) if ratios is not None else [1.0 / n] * n
        total = sum(ratios)
        self.ratios = [r / total for r in ratios]
        self._len = sum(len(d) for d in self.datasets)
        counts = [int(round(r * self._len)) for r in self.ratios]
        counts[-1] = self._len - sum(counts[:-1])
        rng = np.random.default_rng(seed)
        owner = np.repeat(np.arange(n), counts)
        rng.shuffle(owner)
        self.owner = owner
        self.inner = [rng.integers(0, len(d), size=self._len)
                      for d in self.datasets]

    def __len__(self):
        return self._len

    def __getitem__(self, idx: int):
        ds = int(self.owner[idx])
        return self.datasets[ds][int(self.inner[ds][idx])]


class CachedDataset:
    """Memoize samples on first access (base.py CachedDataset) — for small
    validation sets re-read every image-log interval."""

    def __init__(self, dataset, max_items: Optional[int] = None):
        self.data = dataset
        self.max_items = max_items
        self.cache: Dict[int, Any] = {}

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int):
        if idx in self.cache:
            return self.cache[idx]
        item = self.data[idx]
        if self.max_items is None or len(self.cache) < self.max_items:
            self.cache[idx] = item
        return item


class PatchShuffleWrapper:
    """Shuffle the order of the per-image patch axis (base.py
    PatchShuffleWrapper) — augmentation for multi-patch conditioning."""

    def __init__(self, dataset, keys: Sequence[str] = ("patches",),
                 seed: int = 0):
        self.data = dataset
        self.keys = keys
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int):
        out = dict(self.data[idx])
        perm = None
        for key in self.keys:
            if key not in out:
                continue
            arr = out[key]
            if perm is None or len(perm) != arr.shape[0]:
                perm = self.rng.permutation(arr.shape[0])
            out[key] = arr[perm]
        return out


class WrapForFID:
    """uint8 CHW adapter for external FID tooling (base.py:106-140)."""

    def __init__(self, dataset, key: str = "image"):
        self.data = dataset
        self.key = key

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = self.data[idx][self.key]
        img = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return np.transpose(img, (2, 0, 1))
