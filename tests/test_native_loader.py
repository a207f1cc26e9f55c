"""Native C++ batch image loader vs the PIL reference path.

Parity target: rdm_tpu.data.base.load_image (smallest-max-size bicubic
+ center crop + [-1,1] normalize) — the loader reimplements Pillow's
antialiased bicubic resampling in C++ (native/image_loader.cpp), so
outputs must agree to ~1/255 per channel.
"""

import os

import numpy as np
import pytest
from PIL import Image

from rdm_tpu.data.base import load_image
from rdm_tpu.data import native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w, ext) in enumerate([(120, 200, "png"), (64, 48, "png"),
                                     (256, 192, "jpg"), (80, 80, "jpg")]):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        arr = (arr.astype(np.float32) * 0.2 + 100).astype(np.uint8)
        p = str(d / f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_loader_matches_pil(image_dir):
    if not native_loader.available():
        pytest.skip("native loader unavailable (no g++/libjpeg/libpng)")
    size = 64
    out, status = native_loader.load_batch(image_dir, size)
    assert out.shape == (len(image_dir), size, size, 3)
    assert (status == 0).all()
    for i, p in enumerate(image_dir):
        ref = load_image(p, size)
        # <= ~1/255 per channel: identical libjpeg decode, float vs
        # fixed-point Pillow resampling
        assert np.abs(out[i] - ref).max() * 127.5 < 2.0, p
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_native_loader_error_slots(image_dir):
    if not native_loader.available():
        pytest.skip("native loader unavailable")
    out, status = native_loader.load_batch(
        [image_dir[0], image_dir[0] + ".missing"], 32)
    assert status[0] == 0 and status[1] != 0
    assert np.all(out[1] == 0.0)
