"""OpenImages dataset family.

Reimplements the behavior of /root/reference/rdm/data/openimages.py
(683 LoC) for pre-staged data:

- FullOpenImages*: filelist-driven ~9M-image reader with corrupt-file
  removal (openimages.py:31-101, 469-491).
- OpenImagesBBox*: images + per-image bbox annotation lists for
  annotation-mode patch sampling (openimages.py:494-516 + the bbox-helper
  lineage). Annotations load from a CSV of
  ImageID,XMin,XMax,YMin,YMax[,LabelName] rows (the official boxes CSV
  schema, subset of columns).

Layout:
  <root>/<split>_filelist.txt       relative paths
  <root>/corrupts.txt               optional, one relative path per line
  <root>/boxes_<split>.csv          optional, bbox annotations
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from rdm_tpu.data.base import load_image


class FullOpenImagesBase:
    split = "train"

    def __init__(self, root: str, size: Optional[int] = 256,
                 max_images: Optional[int] = None):
        self.root = root
        self.size = size
        filelist = os.path.join(root, f"{self.split}_filelist.txt")
        if not os.path.isfile(filelist):
            raise FileNotFoundError(f"{filelist} missing")
        with open(filelist) as f:
            paths = [l.strip() for l in f if l.strip()]
        corrupts = os.path.join(root, "corrupts.txt")
        if os.path.isfile(corrupts):
            with open(corrupts) as f:
                bad = {l.strip() for l in f if l.strip()}
            paths = [p for p in paths if p not in bad]
        if max_images:
            paths = paths[:max_images]
        self.rel_paths = paths

    def __len__(self):
        return len(self.rel_paths)

    def __getitem__(self, i: int):
        rel = self.rel_paths[i]
        return {"image": load_image(os.path.join(self.root, rel),
                                    size=self.size),
                "file_path_": rel}


class FullOpenImagesTrain(FullOpenImagesBase):
    split = "train"


class FullOpenImagesValidation(FullOpenImagesBase):
    split = "validation"


class OpenImagesBBoxBase(FullOpenImagesBase):
    """Adds per-image annotation lists for PatcherDataset('annotation').

    Each annotation: {'bbox': (x, y, w, h) fractional, 'label': str}.
    """

    def __init__(self, root: str, size: Optional[int] = None,
                 max_images: Optional[int] = None):
        super().__init__(root, size=size, max_images=max_images)
        self.annotations: Dict[str, List[dict]] = defaultdict(list)
        csv_path = os.path.join(root, f"boxes_{self.split}.csv")
        if os.path.isfile(csv_path):
            with open(csv_path, newline="") as f:
                for row in csv.DictReader(f):
                    x1 = float(row["XMin"])
                    y1 = float(row["YMin"])
                    w = float(row["XMax"]) - x1
                    h = float(row["YMax"]) - y1
                    self.annotations[row["ImageID"]].append(
                        {"bbox": (x1, y1, w, h),
                         "label": row.get("LabelName", "")})

    @staticmethod
    def _image_id(rel_path: str) -> str:
        return os.path.splitext(os.path.basename(rel_path))[0]

    def __getitem__(self, i: int):
        out = super().__getitem__(i)
        out["annotations"] = self.annotations.get(
            self._image_id(out["file_path_"]), [])
        return out


class OpenImagesBBoxTrain(OpenImagesBBoxBase):
    split = "train"


class OpenImagesBBoxValidation(OpenImagesBBoxBase):
    split = "validation"
