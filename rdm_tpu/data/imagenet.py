"""ImageNet dataset family.

Reimplements the behavior of /root/reference/rdm/data/imagenet.py (435 LoC)
without the academictorrents auto-download (this environment and typical
TPU pods are egress-free; data is expected pre-staged):

- filelist-driven train/val splits with synset → class-index mapping
  (imagenet.py:115-158) and human-readable labels.
- `sub_indices` class filtering (imagenet.py:59-75) and
  `get_subset_by_label_range` for SubsetShard (imagenet.py:85-92).
- optional preloaded per-image CLIP embeddings exposed as `clip_img_emb`
  (imagenet.py:146-169) — the RDM `query_key`.

Expected layout (matching the reference's prepared dirs):
  <root>/<split>_filelist.txt     relative image paths, one per line
  <root>/synset_human.txt         "n01440764 tench, Tinca tinca" lines
  <root>/clip_embeddings_<split>.npz   optional, key 'embedding' [N, 512]
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from rdm_tpu.data.base import load_image


class ImageNetBase:
    split = "train"

    def __init__(self, root: str, size: int = 256,
                 sub_indices: Optional[Sequence[int]] = None,
                 load_clip_embeddings: bool = False):
        self.root = root
        self.size = size
        filelist = os.path.join(root, f"{self.split}_filelist.txt")
        if not os.path.isfile(filelist):
            raise FileNotFoundError(
                f"{filelist} missing — stage ImageNet and write the "
                "filelist (one relative path per line)")
        with open(filelist) as f:
            self.rel_paths = [l.strip() for l in f if l.strip()]
        # synset is the leading directory of each relative path
        self.synsets = [p.split("/")[0] for p in self.rel_paths]
        unique = sorted(set(self.synsets))
        self.synset_to_idx = {s: i for i, s in enumerate(unique)}
        self.class_labels = np.asarray(
            [self.synset_to_idx[s] for s in self.synsets], dtype=np.int64)
        self.human_labels = self._load_human_labels(unique)

        self.indices = np.arange(len(self.rel_paths))
        if sub_indices is not None:
            mask = np.isin(self.class_labels, np.asarray(sub_indices))
            self.indices = self.indices[mask]

        self.clip_embeddings = None
        if load_clip_embeddings:
            path = os.path.join(root, f"clip_embeddings_{self.split}.npz")
            if os.path.isfile(path):
                self.clip_embeddings = np.load(path)["embedding"]
            else:
                raise FileNotFoundError(
                    f"{path} missing — precompute with "
                    "scripts/precompute_clip_embeddings.py")

    def _load_human_labels(self, synsets: List[str]) -> Dict[str, str]:
        path = os.path.join(self.root, "synset_human.txt")
        table: Dict[str, str] = {}
        if os.path.isfile(path):
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(maxsplit=1)
                    if len(parts) == 2:
                        table[parts[0]] = parts[1]
        return {s: table.get(s, s) for s in synsets}

    def get_subset_by_label_range(self, label_range) -> np.ndarray:
        lo, hi = label_range
        mask = (self.class_labels[self.indices] >= lo) & (
            self.class_labels[self.indices] <= hi)
        return self.indices[mask]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        idx = int(self.indices[i])
        rel = self.rel_paths[idx]
        out = {
            "image": load_image(os.path.join(self.root, rel),
                                size=self.size),
            "file_path_": rel,
            "class_label": int(self.class_labels[idx]),
            "synset": self.synsets[idx],
            "human_label": self.human_labels[self.synsets[idx]],
        }
        if self.clip_embeddings is not None:
            out["clip_img_emb"] = np.asarray(
                self.clip_embeddings[idx], dtype=np.float32)
        return out


class ImageNetTrain(ImageNetBase):
    split = "train"


class ImageNetValidation(ImageNetBase):
    split = "val"


class BigGANImageNetBase(ImageNetBase):
    """BigGAN-style preprocessing variant (reference imagenet.py:310-382):
    center-crop the largest square FIRST, then resize — preserves
    composition instead of smallest-max-size scaling."""

    def __getitem__(self, i: int):
        from PIL import Image as _Image

        idx = int(self.indices[i])
        rel = self.rel_paths[idx]
        img = _Image.open(os.path.join(self.root, rel)).convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        h, w = arr.shape[:2]
        side = min(h, w)
        y, x = (h - side) // 2, (w - side) // 2
        arr = arr[y:y + side, x:x + side]
        arr = np.asarray(
            _Image.fromarray(arr).resize((self.size, self.size),
                                         _Image.BICUBIC))
        out = {
            "image": (arr.astype(np.float32) / 127.5) - 1.0,
            "file_path_": rel,
            "class_label": int(self.class_labels[idx]),
            "synset": self.synsets[idx],
            "human_label": self.human_labels[self.synsets[idx]],
        }
        if self.clip_embeddings is not None:
            out["clip_img_emb"] = np.asarray(
                self.clip_embeddings[idx], dtype=np.float32)
        return out


class BigGANImageNetTrain(BigGANImageNetBase):
    split = "train"


class BigGANImageNetValidation(BigGANImageNetBase):
    split = "val"


# class-range presets used by the RARM configs
# (/root/reference/models/rarm/imagenet/*/config.yaml label ranges)
IMAGENET_DOGS = (151, 268)
IMAGENET_MAMMALS = (118, 383)
IMAGENET_ANIMALS = (0, 397)
