"""Bounding-box → token-sequence conditioning builders.

Re-implementation of the reference's openimages_bbox_helpers capability
(/root/reference/rdm/data/openimages_bbox_helpers/openimages_builder.py:
35-533, openimages_builderutils.py) without networkx/torch_geometric: the
builders turn a set of per-image box annotations into fixed-length integer
token sequences a transformer can condition on, and can invert/plot them.

Builders (reference class in parentheses):
- CenterPointTokenBuilder (CoordinatesCenterPointsConditionalBuilder):
  [class_token, center_coord_token, (sep)] per object.
- BoundingBoxTokenBuilder (CoordinatesBoundingBoxConditionalBuilder):
  [class_token, tl_coord_token, br_coord_token, (sep)] per object.
- SceneGraphTokenBuilder (ThreeTokenSceneGraphBuilder over the sparse
  asymmetric digraph builder): object table-of-contents + (subject,
  relation, object) triples using the six spatial relations.

Coordinates are tokenized on a sqrt(no_tokens) x sqrt(no_tokens) grid;
object tokens optionally fold the OpenImages IsGroupOf/IsOccluded/
IsDepiction/IsInside flags into the class id (bit modifiers x
no_object_classes). Bboxes are (x0, y0, w, h) fractions of the image.
"""

from __future__ import annotations

import dataclasses
import math
from enum import IntEnum
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

BoundingBox = Tuple[float, float, float, float]  # x0, y0, w, h
FULL_CROP: BoundingBox = (0.0, 0.0, 1.0, 1.0)


def _clamp(x: float) -> float:
    return max(min(x, 1.0), 0.0)


@dataclasses.dataclass
class Annotation:
    """One box annotation (the subset of the reference Annotation fields
    the builders consume)."""

    category_no: int
    bbox: BoundingBox
    is_group_of: bool = False
    is_occluded: bool = False
    is_depiction: bool = False
    is_inside: bool = False


class SixRelation(IntEnum):
    """Spatial relation vocabulary (builderutils GraphSixRelation)."""

    surrounding = 0
    inside = 1
    above = 2
    below = 3
    right_of = 4
    left_of = 5

    def horizontal_flip(self) -> "SixRelation":
        if self is SixRelation.right_of:
            return SixRelation.left_of
        if self is SixRelation.left_of:
            return SixRelation.right_of
        return self


def bbox_six_relation(first: BoundingBox, second: BoundingBox,
                      rng: Optional[np.random.Generator] = None
                      ) -> SixRelation:
    """Relation of `first` w.r.t. `second` (builderutils
    get_bbox_six_relation): containment first, else by center angle."""
    if tuple(first) == tuple(second):
        rng = rng or np.random.default_rng()
        return SixRelation(int(rng.choice([0, 1])))
    ax0, ay0, ax1, ay1 = first[0], first[1], first[0] + first[2], \
        first[1] + first[3]
    bx0, by0, bx1, by1 = second[0], second[1], second[0] + second[2], \
        second[1] + second[3]
    if ax0 < bx0 and ay0 < by0 and ax1 > bx1 and ay1 > by1:
        return SixRelation.surrounding
    if ax0 > bx0 and ay0 > by0 and ax1 < bx1 and ay1 < by1:
        return SixRelation.inside
    theta = math.atan2((ay0 + ay1) - (by0 + by1), (ax0 + ax1) - (bx0 + bx1))
    if -math.pi / 4 <= theta < math.pi / 4:
        return SixRelation.right_of
    if math.pi / 4 <= theta < 3 / 4 * math.pi:
        return SixRelation.below
    if theta >= 3 / 4 * math.pi or theta <= -3 / 4 * math.pi:
        return SixRelation.left_of
    return SixRelation.above


def intersection_area(a: BoundingBox, b: BoundingBox) -> float:
    w = min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0])
    h = min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1])
    return max(w, 0.0) * max(h, 0.0)


def filter_annotations(annotations: Sequence[Annotation],
                       crop: BoundingBox,
                       min_area: float) -> List[Annotation]:
    """Keep boxes retaining >= min_area of themselves inside the crop, or
    covering >= 15% of the crop (builderutils filter_annotations)."""
    kept = []
    for a in annotations:
        box_area = a.bbox[2] * a.bbox[3]
        crop_area = crop[2] * crop[3]
        if box_area <= 0 or crop_area <= 0:
            continue
        inter = intersection_area(a.bbox, crop)
        if inter / box_area >= min_area or inter / crop_area >= 0.15:
            kept.append(a)
    return kept


def rescale_annotations(annotations: Sequence[Annotation],
                        crop: BoundingBox,
                        flip: bool) -> List[Annotation]:
    """Express bboxes relative to the crop, optionally h-flipped."""
    out = []
    for a in annotations:
        x0 = _clamp((a.bbox[0] - crop[0]) / crop[2])
        y0 = _clamp((a.bbox[1] - crop[1]) / crop[3])
        w = min(a.bbox[2] / crop[2], 1 - x0)
        h = min(a.bbox[3] / crop[3], 1 - y0)
        if flip:
            x0 = 1 - (x0 + w)
        out.append(dataclasses.replace(a, bbox=(x0, y0, w, h)))
    return out


class _TokenizerBase:
    """Coordinate-grid tokenization + object-class/flag packing
    (reference TokenSceneGraphBuilder:151-236)."""

    def __init__(self, no_object_classes: int, no_tokens: int,
                 use_group_parameter: bool = False,
                 use_additional_parameters: bool = False,
                 random_object_order: bool = False,
                 crop_coordinates_min_area: float = 0.4,
                 seed: Optional[int] = None):
        self.no_object_classes = no_object_classes
        self.no_tokens = no_tokens
        self.no_sections = int(math.sqrt(no_tokens))
        self.use_group_parameter = use_group_parameter
        self.use_additional_parameters = use_additional_parameters
        self.random_object_order = random_object_order
        self.crop_coordinates_min_area = crop_coordinates_min_area
        self.rng = np.random.default_rng(seed)
        needed = no_object_classes + 2
        if use_group_parameter:
            needed = 2 * no_object_classes + 2
        if use_additional_parameters:
            needed = 16 * no_object_classes + 2
        if no_tokens < needed:
            raise ValueError(
                f"no_tokens={no_tokens} cannot represent "
                f"{no_object_classes} classes with the requested flags")

    @property
    def separator(self) -> int:
        return self.no_tokens - 2

    @property
    def none(self) -> int:
        return self.no_tokens - 1

    def object_representation(self, a: Annotation) -> int:
        modifier = 0
        if self.use_group_parameter:
            modifier |= 1 * bool(a.is_group_of)
        if self.use_additional_parameters:
            modifier |= 2 * bool(a.is_occluded)
            modifier |= 4 * bool(a.is_depiction)
            modifier |= 8 * bool(a.is_inside)
        return a.category_no + self.no_object_classes * modifier

    def representation_to_annotation(self, rep: int) -> Annotation:
        category_no = rep % self.no_object_classes
        modifier = rep // self.no_object_classes
        return Annotation(
            category_no=category_no, bbox=(0, 0, 0, 0),
            is_group_of=bool((modifier & 1) and self.use_group_parameter),
            is_occluded=bool((modifier & 2)
                             and self.use_additional_parameters),
            is_depiction=bool((modifier & 4)
                              and self.use_additional_parameters),
            is_inside=bool((modifier & 8)
                           and self.use_additional_parameters))

    def tokenize_coordinates(self, x: float, y: float) -> int:
        xd = int(round(_clamp(x) * (self.no_sections - 1)))
        yd = int(round(_clamp(y) * (self.no_sections - 1)))
        return yd * self.no_sections + xd

    def coordinates_from_token(self, token: int) -> Tuple[float, float]:
        return ((token % self.no_sections) / (self.no_sections - 1),
                (token // self.no_sections) / (self.no_sections - 1))

    def _token_pair_from_bbox(self, bbox: BoundingBox) -> Tuple[int, int]:
        return (self.tokenize_coordinates(bbox[0], bbox[1]),
                self.tokenize_coordinates(bbox[0] + bbox[2],
                                          bbox[1] + bbox[3]))

    def _bbox_from_token_pair(self, t1: int, t2: int) -> BoundingBox:
        x0, y0 = self.coordinates_from_token(t1)
        x1, y1 = self.coordinates_from_token(t2)
        return x0, y0, x1 - x0, y1 - y0

    @staticmethod
    def _pad(list_, pad_element, n):
        return list(list_) + [pad_element] * (n - len(list_))


class CenterPointTokenBuilder(_TokenizerBase):
    """[class, center-coord, (sep)] per object
    (CoordinatesCenterPointsConditionalBuilder, builder.py:335-480)."""

    def __init__(self, no_object_classes: int, no_tokens: int,
                 no_max_objects: int = 30, use_separator: bool = False,
                 encode_crop: bool = False, **kw):
        super().__init__(no_object_classes, no_tokens, **kw)
        self.no_max_objects = no_max_objects
        self.use_separator = use_separator
        self.encode_crop = encode_crop

    @property
    def entry_length(self) -> int:
        return 2 + int(self.use_separator)

    @property
    def embedding_dim(self) -> int:
        return (self.no_max_objects * self.entry_length
                + (2 if self.encode_crop else 0))

    def _object_entry(self, a: Annotation) -> Tuple[int, ...]:
        return (self.object_representation(a),
                self.tokenize_coordinates(a.bbox[0] + a.bbox[2] / 2,
                                          a.bbox[1] + a.bbox[3] / 2))

    def _empty_entry(self) -> Tuple[int, ...]:
        return (self.none,) * (self.entry_length - int(self.use_separator))

    def build(self, annotations: Sequence[Annotation],
              crop_coordinates: Optional[BoundingBox] = None,
              horizontal_flip: bool = False) -> np.ndarray:
        if not annotations:
            raise ValueError("no annotations")
        annotations = list(annotations)
        crop = crop_coordinates or FULL_CROP
        if self.random_object_order:
            self.rng.shuffle(annotations)
        if self.encode_crop:
            annotations = rescale_annotations(
                annotations[: self.no_max_objects], FULL_CROP,
                horizontal_flip)
            if horizontal_flip:
                crop = (1 - (crop[0] + crop[2]), crop[1], crop[2], crop[3])
            extra = list(self._token_pair_from_bbox(crop))
        else:
            kept = filter_annotations(annotations, crop,
                                      self.crop_coordinates_min_area)
            annotations = (kept or annotations[:1])[: self.no_max_objects]
            annotations = rescale_annotations(annotations, crop,
                                              horizontal_flip)
            extra = []
        entries = [self._object_entry(a) for a in annotations]
        entries = self._pad(entries, self._empty_entry(),
                            self.no_max_objects)
        if self.use_separator:
            entries = [e + (self.separator,) for e in entries]
        tokens = [t for e in entries for t in e] + extra
        assert len(tokens) == self.embedding_dim
        assert all(0 <= t < self.no_tokens for t in tokens)
        return np.asarray(tokens, dtype=np.int64)

    def inverse_build(self, tokens: np.ndarray):
        tokens = list(np.asarray(tokens).tolist())
        crop = None
        if self.encode_crop:
            crop = self._bbox_from_token_pair(tokens[-2], tokens[-1])
            tokens = tokens[:-2]
        n = self.entry_length
        entries = [tuple(tokens[i:i + n]) for i in range(0, len(tokens), n)]
        return [(e[0], self.coordinates_from_token(e[1]))
                for e in entries if e[0] != self.none], crop


class BoundingBoxTokenBuilder(CenterPointTokenBuilder):
    """[class, top-left coord, bottom-right coord, (sep)] per object
    (CoordinatesBoundingBoxConditionalBuilder, builder.py:485-533)."""

    @property
    def entry_length(self) -> int:
        return 3 + int(self.use_separator)

    def _object_entry(self, a: Annotation) -> Tuple[int, ...]:
        return (self.object_representation(a),
                *self._token_pair_from_bbox(a.bbox))

    def inverse_build(self, tokens: np.ndarray):
        tokens = list(np.asarray(tokens).tolist())
        crop = None
        if self.encode_crop:
            crop = self._bbox_from_token_pair(tokens[-2], tokens[-1])
            tokens = tokens[:-2]
        n = self.entry_length
        entries = [tuple(tokens[i:i + n]) for i in range(0, len(tokens), n)]
        return [(e[0], self._bbox_from_token_pair(e[1], e[2]))
                for e in entries if e[0] != self.none], crop


class SceneGraphTokenBuilder(_TokenizerBase):
    """Sparse scene-graph triples (ThreeTokenSceneGraphBuilder over
    SparseAsymmetricDigraphSceneGraphBuilder, builder.py:40-333): a
    table-of-contents of object tokens followed by padded (subject,
    class_offset+relation, object) triples; each node draws ONE random
    partner, random direction, relation from the six spatial relations.
    """

    NO_RELATIONS = 6

    def __init__(self, no_object_classes: int, no_tokens: int,
                 no_max_relations: int = 30, use_separator: bool = False,
                 table_of_contents_type: int = 1, **kw):
        super().__init__(no_object_classes, no_tokens, **kw)
        if table_of_contents_type not in (1, 2):
            raise ValueError("table_of_contents_type must be 1 or 2")
        self.no_max_relations = no_max_relations
        self.use_separator = use_separator
        self.table_of_contents_type = table_of_contents_type

    @property
    def separator(self) -> int:
        return self.no_object_classes + self.NO_RELATIONS + 1

    @property
    def none(self) -> int:
        return self.no_object_classes + self.NO_RELATIONS + 2

    @property
    def embedding_dim(self) -> int:
        toc = self.table_of_contents_type + int(self.use_separator)
        rel = 3 + int(self.use_separator)
        return self.no_max_relations * (toc + rel)

    def _edges(self, annotations: List[Annotation],
               horizontal_flip: bool) -> List[Tuple[int, int, int]]:
        edges = []
        seen = set()
        for this_id in range(len(annotations)):
            others = [j for j in range(len(annotations)) if j != this_id]
            other_id = int(self.rng.choice(others))
            if (this_id, other_id) in seen or (other_id, this_id) in seen:
                continue
            u, v = this_id, other_id
            if self.rng.random() > 0.5:
                u, v = v, u
            rel = bbox_six_relation(annotations[u].bbox,
                                    annotations[v].bbox, self.rng)
            if horizontal_flip:
                rel = rel.horizontal_flip()
            seen.add((u, v))
            edges.append((u, int(rel), v))
        return edges

    def build(self, annotations: Sequence[Annotation],
              crop_coordinates: Optional[BoundingBox] = None,
              horizontal_flip: bool = False) -> np.ndarray:
        if not annotations:
            raise ValueError("no annotations")
        annotations = list(annotations)[: self.no_max_relations]
        if crop_coordinates:
            kept = filter_annotations(annotations, crop_coordinates,
                                      self.crop_coordinates_min_area)
            annotations = kept or annotations
        if self.random_object_order:
            self.rng.shuffle(annotations)
        reps = [self.object_representation(a) for a in annotations]
        if self.table_of_contents_type == 1:
            toc = [(r,) for r in reps]
            empty_toc = (self.none,)
        else:
            toc = [(i, r) for i, r in enumerate(reps)]
            empty_toc = (self.none, self.none)
        toc = self._pad(toc, empty_toc, self.no_max_relations)
        edges = ([] if len(annotations) < 2
                 else self._edges(annotations, horizontal_flip))
        rels = [(u, self.no_object_classes + rel, v)
                for u, rel, v in edges]
        rels = self._pad(rels, (self.none,) * 3, self.no_max_relations)
        if self.use_separator:
            toc = [t + (self.separator,) for t in toc]
            rels = [t + (self.separator,) for t in rels]
        tokens = [t for tup in toc + rels for t in tup]
        assert len(tokens) == self.embedding_dim
        return np.asarray(tokens, dtype=np.int64)


def plot_conditional(builder, tokens: np.ndarray,
                     label_for_category_no: Callable[[int], str],
                     figure_size: Tuple[int, int] = (256, 256)
                     ) -> np.ndarray:
    """Render a coordinate-builder conditional to a uint8 RGB image
    (diagnostics; the reference draws boxes/centers with PIL the same
    way, builder.py:434-480, 518-533)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", figure_size, (255, 255, 255))
    draw = ImageDraw.Draw(img)
    w, h = figure_size
    desc, crop = builder.inverse_build(tokens)
    palette = [(31, 119, 180), (255, 127, 14), (44, 160, 44),
               (214, 39, 40), (148, 103, 189), (140, 86, 75)]
    for i, (rep, geom) in enumerate(desc):
        color = palette[i % len(palette)]
        ann = builder.representation_to_annotation(rep)
        label = label_for_category_no(ann.category_no)
        if isinstance(geom[0], tuple) or len(geom) == 4:  # bbox
            x0, y0, bw, bh = geom
            box = (int(x0 * w), int(y0 * h), int((x0 + bw) * w),
                   int((y0 + bh) * h))
            draw.rectangle(box, outline=color, width=3)
            draw.text((box[0] + 3, box[1] + 3), label, fill=(0, 0, 0))
        else:  # center point
            x, y = geom
            r = 3
            draw.ellipse((x * w - r, y * h - r, x * w + r, y * h + r),
                         fill=color)
            draw.text((x * w, y * h), label, fill=(0, 0, 0))
    if crop is not None:
        draw.rectangle((int(crop[0] * w), int(crop[1] * h),
                        int((crop[0] + crop[2]) * w),
                        int((crop[1] + crop[3]) * h)),
                       outline=(191, 191, 191), width=3)
    return np.asarray(img)


class CategoryMapping:
    """OpenImages category-id <-> contiguous index mapping with optional
    top-k restriction (category_mappings.py / selected_categories.py
    equivalent, derived from the class-descriptions CSV instead of a
    hardcoded list)."""

    def __init__(self, id_to_name: dict,
                 selected_ids: Optional[Sequence[str]] = None):
        ids = list(selected_ids) if selected_ids else sorted(id_to_name)
        self.id_to_name = {i: id_to_name.get(i, i) for i in ids}
        self.id_to_no = {cid: i for i, cid in enumerate(ids)}
        self.no_to_id = {i: cid for cid, i in self.id_to_no.items()}

    def __len__(self):
        return len(self.id_to_no)

    def category_no(self, category_id: str) -> Optional[int]:
        return self.id_to_no.get(category_id)

    def name_for_no(self, no: int) -> str:
        return self.id_to_name[self.no_to_id[no]]

    @classmethod
    def from_csv(cls, descriptions_csv: str,
                 counts: Optional[dict] = None,
                 top_k: Optional[int] = None) -> "CategoryMapping":
        """descriptions_csv rows: '<category_id>,<human name>'. With
        `counts` ({category_id: n_boxes}) and top_k, keep the top-k most
        frequent categories (the reference's selected top-300 list)."""
        id_to_name = {}
        with open(descriptions_csv) as f:
            for line in f:
                parts = line.rstrip("\n").split(",", 1)
                if len(parts) == 2 and parts[0].strip():
                    id_to_name[parts[0].strip()] = parts[1].strip()
        selected = None
        if counts and top_k:
            ranked = sorted((cid for cid in id_to_name if cid in counts),
                            key=lambda c: -counts[c])
            selected = ranked[:top_k]
        return cls(id_to_name, selected)
