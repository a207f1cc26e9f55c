"""ctypes bindings for the native batch image loader
(native/image_loader.cpp).

The host-IO counterpart of the reference's OpenCV/PIL data path
(/root/reference/rdm/data/base.py image loading): one call decodes a
batch of JPEG/PNG files on a C++ thread pool (no GIL) and applies the
canonical preprocessing of `rdm_tpu.data.base.load_image` —
smallest-max-size bicubic resize (Pillow kernel incl. downscale
antialias support scaling), center crop, float32 [-1, 1] NHWC.

Auto-builds the shared library with g++ on first use; callers fall back
to the PIL path when unavailable (`available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libimageloader.so")

_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR,
                            "libimageloader.so"],
                           check=True, capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.il_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.il_load_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: Sequence[str], size: int, *,
               n_threads: int = 0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + preprocess a batch of image files natively.

    Returns (images [N, size, size, 3] float32 in [-1, 1],
    status [N] int32 — 0 = ok; failed slots are zero-filled). Raises
    RuntimeError when the native library is unavailable (callers should
    check `available()` and fall back to `data.base.load_image`).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native image loader unavailable "
                           "(g++/libjpeg/libpng missing?)")
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.float32)
    status = np.zeros((n,), dtype=np.int32)
    arr = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    lib.il_load_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(n_threads))
    return out, status
