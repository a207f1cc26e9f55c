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

from rdm_tpu.data.base import center_crop, load_image, smallest_max_size


def _per_item_rng(seed: int, index: int,
                  epoch: int = 0) -> np.random.Generator:
    """Crop/degradation RNG derived from (seed, epoch, sample index).

    A dataset-member Generator created in __init__ is inherited with
    identical state by every forked DataLoader worker, duplicating
    augmentation sequences across workers (round-2 advisor). The sample
    index alone already gives every item a distinct stream regardless of
    which worker serves it — deliberately NO worker id in the key, so the
    augmentation sequence is identical at any num_workers (reproducible
    across loader configs). Folding the loader epoch (base.DataLoader
    propagates `set_epoch` through wrapper chains before each pass;
    respawned workers inherit it) makes the augmentation vary across
    epochs.
    """
    return np.random.default_rng((seed, epoch, index))


class FullOpenImagesBase:
    split = "train"
    _epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Fold the loader epoch into per-item augmentation streams.

        base.DataLoader calls this at the start of every pass; forked
        torch workers (persistent_workers=False) inherit the value."""
        self._epoch = int(epoch)

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
    """Adds per-image annotation lists for PatcherDataset('annotation')
    and, when a token builder is configured, bbox→token conditioning
    sequences (reference openimages_bbox_helpers, see
    rdm_tpu.data.bbox_tokens).

    Each annotation: {'bbox': (x, y, w, h) fractional, 'label': str,
    'IsGroupOf'/... flags when present in the CSV}. With
    `token_builder` in {'bbox', 'center', 'scene_graph'}, samples carry
    'bbox_tokens' [embedding_dim] int64; categories map through a
    CategoryMapping built from <root>/class-descriptions.csv (restricted
    to the top `top_k_categories` by box count when set — the reference's
    selected top-300 list).
    """

    _FLAGS = ("IsGroupOf", "IsOccluded", "IsDepiction", "IsInside")

    def __init__(self, root: str, size: Optional[int] = None,
                 max_images: Optional[int] = None,
                 token_builder: Optional[str] = None,
                 no_tokens: int = 1024, no_max_objects: int = 30,
                 use_group_parameter: bool = False,
                 top_k_categories: Optional[int] = None, seed: int = 0):
        super().__init__(root, size=size, max_images=max_images)
        self.annotations: Dict[str, List[dict]] = defaultdict(list)
        counts: Dict[str, int] = defaultdict(int)
        csv_path = os.path.join(root, f"boxes_{self.split}.csv")
        if os.path.isfile(csv_path):
            with open(csv_path, newline="") as f:
                for row in csv.DictReader(f):
                    x1 = float(row["XMin"])
                    y1 = float(row["YMin"])
                    w = float(row["XMax"]) - x1
                    h = float(row["YMax"]) - y1
                    ann = {"bbox": (x1, y1, w, h),
                           "label": row.get("LabelName", "")}
                    for flag in self._FLAGS:
                        if flag in row:
                            ann[flag] = row[flag] == "1"
                    self.annotations[row["ImageID"]].append(ann)
                    counts[ann["label"]] += 1
        self.token_builder = None
        self.categories = None
        if token_builder is not None:
            from rdm_tpu.data.bbox_tokens import (BoundingBoxTokenBuilder,
                                                  CategoryMapping,
                                                  CenterPointTokenBuilder,
                                                  SceneGraphTokenBuilder)

            desc = os.path.join(root, "class-descriptions.csv")
            if os.path.isfile(desc):
                self.categories = CategoryMapping.from_csv(
                    desc, counts=counts, top_k=top_k_categories)
            else:
                self.categories = CategoryMapping(
                    {cid: cid for cid in sorted(counts)})
            cls = {"bbox": BoundingBoxTokenBuilder,
                   "center": CenterPointTokenBuilder,
                   "scene_graph": SceneGraphTokenBuilder}.get(token_builder)
            if cls is None:
                raise ValueError(f"unknown token_builder '{token_builder}'")
            kw = dict(no_object_classes=len(self.categories),
                      no_tokens=no_tokens,
                      use_group_parameter=use_group_parameter, seed=seed)
            if cls is SceneGraphTokenBuilder:
                kw["no_max_relations"] = no_max_objects
            else:
                kw["no_max_objects"] = no_max_objects
            self.token_builder = cls(**kw)

    @staticmethod
    def _image_id(rel_path: str) -> str:
        return os.path.splitext(os.path.basename(rel_path))[0]

    def _to_builder_annotations(self, anns: List[dict]):
        from rdm_tpu.data.bbox_tokens import Annotation

        out = []
        for a in anns:
            no = self.categories.category_no(a["label"])
            if no is None:
                continue
            out.append(Annotation(
                category_no=no, bbox=tuple(a["bbox"]),
                is_group_of=a.get("IsGroupOf", False),
                is_occluded=a.get("IsOccluded", False),
                is_depiction=a.get("IsDepiction", False),
                is_inside=a.get("IsInside", False)))
        return out

    def __getitem__(self, i: int):
        out = super().__getitem__(i)
        anns = self.annotations.get(
            self._image_id(out["file_path_"]), [])
        out["annotations"] = anns
        if self.token_builder is not None:
            builder_anns = self._to_builder_annotations(anns)
            if builder_anns:
                out["bbox_tokens"] = self.token_builder.build(builder_anns)
            else:
                out["bbox_tokens"] = np.full(
                    (self.token_builder.embedding_dim,),
                    self.token_builder.none, dtype=np.int64)
        return out


class OpenImagesBBoxTrain(OpenImagesBBoxBase):
    split = "train"


class OpenImagesBBoxValidation(OpenImagesBBoxBase):
    split = "validation"


class SemanticOpenImagesBase(FullOpenImagesBase):
    """Images + class-labeled segmentation (reference openimages.py:103-254).

    Two layouts:

    **Annotation mode** (the reference protocol) — used when
    `<root>/<split>-annotations-object-segmentation.csv` exists (the
    official OpenImages segmentation CSV: MaskPath,ImageID,LabelName,...).
    One sample per *object annotation*: the binary instance mask PNG at
    `<root>/<split>/<MaskPath>` is labeled with the class id from
    `<root>/segmentation_classes.txt` (line i → class i+1; 0 = background),
    names from `<root>/class-descriptions-boxable.csv`; images load from
    `<root>/<split>/<ImageID>.jpg` (or `image_root` when given). Returns
    {'image', 'mask' [H,W] int, 'segmentation' [H,W,num_classes] one-hot,
    'class_label', 'class_name'} — matching the reference sample keys.
    Cropping: smallest-max-size rescale (image bicubic, mask nearest) then
    random/center square crop applied to both; the reference's
    `crop_around_roi` is an unimplemented stub there
    (`crop_img_and_mask_around_roi` → `pass`, openimages.py:173-174) and
    is not reproduced.

    **Filelist mode** (fallback) — per-image class-id masks under
    `<root>/masks/<stem>.png`; samples without a mask get an all-zero
    (background) map. Returns {'image', 'segmentation' [H,W] int32}.
    """

    def __init__(self, root: str, size: Optional[int] = 256,
                 max_images: Optional[int] = None,
                 image_root: Optional[str] = None,
                 random_crop: bool = True,
                 segmentation_to_float: bool = True, seed: int = 0):
        self.root = root
        self.size = size
        self.seg_to_float = segmentation_to_float
        self.seed = seed
        self.random_crop = random_crop
        ann_csv = os.path.join(
            root, f"{self.split}-annotations-object-segmentation.csv")
        self.annotation_mode = os.path.isfile(ann_csv)
        if not self.annotation_mode:
            super().__init__(root, size=size, max_images=max_images)
            self.mask_dir = os.path.join(root, "masks")
            return
        self.image_root = os.path.join(image_root or root, self.split)
        self.mask_root = os.path.join(root, self.split)
        cls_txt = os.path.join(root, "segmentation_classes.txt")
        with open(cls_txt) as f:
            # id 0 is background, hence i+1 (reference openimages.py:124-125)
            self.classid2label = {l.strip(): i + 1
                                  for i, l in enumerate(f) if l.strip()}
        self.num_classes = len(self.classid2label) + 1
        self.classid2text = {}
        desc = os.path.join(root, "class-descriptions-boxable.csv")
        if os.path.isfile(desc):
            with open(desc, newline="") as f:
                for row in csv.reader(f):
                    if len(row) >= 2:
                        self.classid2text[row[0]] = row[1]
        self.samples = []
        with open(ann_csv, newline="") as f:
            for row in csv.DictReader(f):
                label = row["LabelName"]
                if label not in self.classid2label:
                    continue
                self.samples.append(
                    (row["ImageID"], row["MaskPath"], label))
                if max_images and len(self.samples) >= max_images:
                    break

    def __len__(self):
        if self.annotation_mode:
            return len(self.samples)
        return super().__len__()

    def _crop_pair(self, image: np.ndarray, seg: np.ndarray,
                   rng: np.random.Generator):
        from PIL import Image as _Image

        image = smallest_max_size(image, self.size)
        sh, sw = image.shape[:2]
        seg_img = _Image.fromarray(seg.astype(np.int32), mode="I")
        seg = np.asarray(seg_img.resize((sw, sh), _Image.NEAREST))
        if self.random_crop:
            y = int(rng.integers(0, max(sh - self.size, 0) + 1))
            x = int(rng.integers(0, max(sw - self.size, 0) + 1))
            image = image[y:y + self.size, x:x + self.size]
            seg = seg[y:y + self.size, x:x + self.size]
        else:
            image = center_crop(image, self.size, self.size)
            seg = center_crop(seg, self.size, self.size)
        return image, seg

    def __getitem__(self, i: int):
        from PIL import Image as _Image

        if not self.annotation_mode:
            out = super().__getitem__(i)
            stem = os.path.splitext(os.path.basename(out["file_path_"]))[0]
            mask_path = os.path.join(self.mask_dir, stem + ".png")
            h, w = out["image"].shape[:2]
            if os.path.isfile(mask_path):
                m = _Image.open(mask_path).convert("L")
                m = m.resize((w, h), _Image.NEAREST)
                out["segmentation"] = np.asarray(m, dtype=np.int32)
            else:
                out["segmentation"] = np.zeros((h, w), dtype=np.int32)
            return out

        image_id, mask_path, label = self.samples[i]
        class_label = self.classid2label[label]
        img = _Image.open(
            os.path.join(self.image_root, image_id + ".jpg")).convert("RGB")
        image = np.asarray(img, dtype=np.uint8)
        mask = np.asarray(_Image.open(
            os.path.join(self.mask_root, mask_path)))
        if mask.ndim == 3:
            mask = mask[..., 0]
        seg = np.where(mask != 0, class_label, 0).astype(np.int32)
        if self.size is not None:
            image, seg = self._crop_pair(image, seg, _per_item_rng(self.seed, i, self._epoch))
        onehot = np.eye(self.num_classes, dtype=np.float32)[seg]
        if not self.seg_to_float:
            onehot = onehot.astype(np.int64)
        return {
            "image": (image.astype(np.float32) / 127.5) - 1.0,
            "mask": seg,
            "segmentation": onehot,
            "class_label": class_label,
            "class_name": self.classid2text.get(label, label),
            "file_path_": os.path.join(self.image_root, image_id + ".jpg"),
        }


class SemanticOpenImagesTrain(SemanticOpenImagesBase):
    split = "train"


class SemanticOpenImagesValidation(SemanticOpenImagesBase):
    split = "validation"


class SuperresOpenImagesBase(FullOpenImagesBase):
    """LR/HR super-resolution pairs (reference openimages.py:257-466):
    HR crop + degraded LR, returned as {'image' (HR), 'LR_image'}.

    degradation: "bsrgan" (default, the reference's BSR practical
    degradation model — see rdm_tpu.data.degradation), "bsrgan_light",
    or a plain interpolation name ("bicubic"/"bilinear"/"nearest", with
    optional additive noise_level) matching the reference's
    albumentations fallback (openimages.py:321-331).
    """

    def __init__(self, root: str, size: int = 256, down_factor: int = 4,
                 degradation: str = "bsrgan", noise_level: float = 0.0,
                 max_images: Optional[int] = None, seed: int = 0):
        super().__init__(root, size=size, max_images=max_images)
        self.down_factor = down_factor
        self.degradation = degradation
        self.noise_level = noise_level
        self.seed = seed

    def __getitem__(self, i: int):
        from PIL import Image as _Image

        from rdm_tpu.data.base import _resize

        out = super().__getitem__(i)
        hr = out["image"]  # float [-1, 1]
        h, w = hr.shape[:2]
        rng = _per_item_rng(self.seed, i, self._epoch)
        if self.degradation in ("bsrgan", "bsrgan_light"):
            from rdm_tpu.data.degradation import degradation_bsr

            lr01 = degradation_bsr(
                (hr + 1.0) / 2.0, sf=self.down_factor, rng=rng,
                light=self.degradation == "bsrgan_light")
            lr = lr01 * 2.0 - 1.0
        else:
            method = {"nearest": _Image.NEAREST,
                      "bilinear": _Image.BILINEAR,
                      "bicubic": _Image.BICUBIC,
                      "lanczos": _Image.LANCZOS}[self.degradation]
            lr = _resize(hr, (h // self.down_factor,
                              w // self.down_factor), method)
            if self.noise_level > 0:
                lr = lr + self.noise_level * rng.standard_normal(
                    lr.shape).astype(np.float32)
        out["LR_image"] = np.clip(lr, -1.0, 1.0).astype(np.float32)
        return out


class SuperresOpenImagesTrain(SuperresOpenImagesBase):
    split = "train"


class SuperresOpenImagesValidation(SuperresOpenImagesBase):
    split = "validation"
