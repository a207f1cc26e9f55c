"""bbox→token conditioning builder tests (parity targets:
/root/reference/rdm/data/openimages_bbox_helpers/openimages_builder.py
and openimages_builderutils.py)."""

import numpy as np
import pytest

from rdm_tpu.data.bbox_tokens import (
    Annotation,
    BoundingBoxTokenBuilder,
    CategoryMapping,
    CenterPointTokenBuilder,
    SceneGraphTokenBuilder,
    SixRelation,
    bbox_six_relation,
    filter_annotations,
    plot_conditional,
    rescale_annotations,
)


def _anns():
    return [Annotation(0, (0.1, 0.1, 0.2, 0.2)),
            Annotation(3, (0.5, 0.5, 0.3, 0.3)),
            Annotation(7, (0.0, 0.6, 0.4, 0.3), is_group_of=True)]


def test_six_relation_geometry_and_flip():
    big = (0.0, 0.0, 1.0, 1.0)
    small = (0.4, 0.4, 0.2, 0.2)
    assert bbox_six_relation(big, small) is SixRelation.surrounding
    assert bbox_six_relation(small, big) is SixRelation.inside
    left = (0.0, 0.4, 0.1, 0.1)
    right = (0.8, 0.4, 0.1, 0.1)
    assert bbox_six_relation(left, right) is SixRelation.left_of
    assert bbox_six_relation(right, left) is SixRelation.right_of
    above = (0.4, 0.0, 0.1, 0.1)
    below = (0.4, 0.8, 0.1, 0.1)
    assert bbox_six_relation(above, below) is SixRelation.above
    assert bbox_six_relation(below, above) is SixRelation.below
    assert SixRelation.left_of.horizontal_flip() is SixRelation.right_of
    assert SixRelation.inside.horizontal_flip() is SixRelation.inside


def test_filter_and_rescale():
    crop = (0.0, 0.0, 0.5, 0.5)
    kept = filter_annotations(_anns(), crop, min_area=0.4)
    assert [a.category_no for a in kept] == [0]
    res = rescale_annotations(kept, crop, flip=False)
    np.testing.assert_allclose(res[0].bbox, (0.2, 0.2, 0.4, 0.4))
    flipped = rescale_annotations(kept, crop, flip=True)
    np.testing.assert_allclose(flipped[0].bbox, (0.4, 0.2, 0.4, 0.4))


def test_bbox_builder_roundtrip():
    b = BoundingBoxTokenBuilder(no_object_classes=10, no_tokens=1024,
                                no_max_objects=4)
    tokens = b.build(_anns())
    assert tokens.shape == (b.embedding_dim,) == (12,)
    assert (tokens >= 0).all() and (tokens < 1024).all()
    desc, crop = b.inverse_build(tokens)
    assert crop is None and len(desc) == 3
    reps = [d[0] for d in desc]
    assert reps == [0, 3, 7]
    # the recovered boxes quantize to the 32x32 grid: within 1/31
    for (rep, bbox), a in zip(desc, _anns()):
        np.testing.assert_allclose(bbox, a.bbox, atol=1.5 / 31)
    # flag packing
    bg = BoundingBoxTokenBuilder(no_object_classes=10, no_tokens=1024,
                                 no_max_objects=4,
                                 use_group_parameter=True)
    t2 = bg.build(_anns())
    reps2 = bg.inverse_build(t2)[0]
    assert reps2[2][0] == 7 + 10  # is_group_of modifier
    ann = bg.representation_to_annotation(17)
    assert ann.category_no == 7 and ann.is_group_of


def test_center_builder_with_crop_encoding():
    b = CenterPointTokenBuilder(no_object_classes=10, no_tokens=256,
                                no_max_objects=3, use_separator=True,
                                encode_crop=True)
    crop = (0.25, 0.25, 0.5, 0.5)
    tokens = b.build(_anns()[:2], crop_coordinates=crop)
    assert tokens.shape == (b.embedding_dim,) == (3 * 3 + 2,)
    desc, crop_out = b.inverse_build(tokens)
    assert len(desc) == 2
    np.testing.assert_allclose(crop_out, crop, atol=1.5 / 15)
    # padding entries are `none`
    raw = tokens[:-2].reshape(3, 3)
    assert raw[2, 0] == b.none and raw[2, 2] == b.separator


def test_scene_graph_builder():
    b = SceneGraphTokenBuilder(no_object_classes=10, no_tokens=32,
                               no_max_relations=4, seed=0)
    tokens = b.build(_anns())
    assert tokens.shape == (b.embedding_dim,) == (4 * (1 + 3),)
    toc, rels = tokens[:4], tokens[4:].reshape(4, 3)
    assert list(toc[:3]) == [0, 3, 7] and toc[3] == b.none
    real = rels[rels[:, 0] != b.none]
    assert len(real) >= 1
    for u, rel_tok, v in real:
        assert 0 <= u < 3 and 0 <= v < 3 and u != v
        assert 10 <= rel_tok < 10 + 6  # class-offset relation tokens
    with pytest.raises(ValueError):
        b.build([])


def test_plot_and_category_mapping(tmp_path):
    b = BoundingBoxTokenBuilder(no_object_classes=10, no_tokens=1024,
                                no_max_objects=4)
    img = plot_conditional(b, b.build(_anns()), lambda n: f"c{n}",
                           (128, 128))
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    assert (img != 255).any()  # something was drawn

    csv = tmp_path / "class-descriptions.csv"
    csv.write_text("/m/01,Cat\n/m/02,Dog\n/m/03,Tree\n")
    counts = {"/m/01": 5, "/m/02": 50, "/m/03": 2}
    m = CategoryMapping.from_csv(str(csv), counts=counts, top_k=2)
    assert len(m) == 2
    assert m.category_no("/m/02") == 0  # most frequent first
    assert m.category_no("/m/03") is None
    assert m.name_for_no(0) == "Dog"


def test_openimages_bbox_dataset_tokens(tmp_path):
    from PIL import Image

    from rdm_tpu.data.openimages import OpenImagesBBoxTrain

    root = tmp_path / "oi"
    root.mkdir()
    rng = np.random.default_rng(0)
    rels = []
    for i in range(2):
        rel = f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                     dtype=np.uint8)).save(root / rel)
        rels.append(rel)
    (root / "train_filelist.txt").write_text("\n".join(rels))
    (root / "boxes_train.csv").write_text(
        "ImageID,LabelName,XMin,XMax,YMin,YMax,IsGroupOf\n"
        "im0,/m/01,0.1,0.3,0.1,0.3,0\n"
        "im0,/m/02,0.5,0.9,0.5,0.9,1\n"
        "im1,/m/02,0.2,0.8,0.2,0.8,0\n")
    (root / "class-descriptions.csv").write_text("/m/01,Cat\n/m/02,Dog\n")
    ds = OpenImagesBBoxTrain(str(root), size=32, token_builder="bbox",
                             no_tokens=1024, no_max_objects=3)
    s = ds[0]
    assert s["bbox_tokens"].shape == (9,)
    assert s["bbox_tokens"].dtype == np.int64
    assert len(s["annotations"]) == 2
    # image with no parseable annotations -> all-none tokens
    (root / "train_filelist.txt").write_text("\n".join(rels + ["im2.png"]))
    Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                 dtype=np.uint8)).save(root / "im2.png")
    ds2 = OpenImagesBBoxTrain(str(root), size=32, token_builder="bbox")
    s2 = ds2[2]
    assert (s2["bbox_tokens"] == ds2.token_builder.none).all()
