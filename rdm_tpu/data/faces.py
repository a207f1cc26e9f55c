"""FFHQ wrappers (reference /root/reference/rdm/data/faces.py — thin
wrappers over the taming FFHQ datasets). Filelist-driven:
  <root>/<split>_filelist.txt with relative paths (e.g. images1024x1024/...).
"""

from __future__ import annotations

import os
from typing import Optional

from rdm_tpu.data.base import load_image


class FFHQBase:
    split = "train"

    def __init__(self, root: str, size: int = 256):
        self.root = root
        self.size = size
        filelist = os.path.join(root, f"{self.split}_filelist.txt")
        if not os.path.isfile(filelist):
            raise FileNotFoundError(f"{filelist} missing")
        with open(filelist) as f:
            self.rel_paths = [l.strip() for l in f if l.strip()]

    def __len__(self):
        return len(self.rel_paths)

    def __getitem__(self, i: int):
        rel = self.rel_paths[i]
        return {"image": load_image(os.path.join(self.root, rel),
                                    size=self.size),
                "file_path_": rel}


class FFHQTrainRDM(FFHQBase):
    split = "train"


class FFHQValidationRDM(FFHQBase):
    split = "validation"
