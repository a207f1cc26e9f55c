"""ctypes bindings for the native host-side exact kNN (native/host_knn.cpp).

The CPU-host counterpart of the device engine: the offline neighbor
pipeline and CPU-only deployments search through this multithreaded C++
core (the ScaNN role in the reference stack) instead of a device matmul.
Auto-builds the shared library with g++ on first use; falls back to a
numpy implementation if no compiler is available.

Contract (identical to rdm_tpu.retrieval.engine.knn_search): inputs
L2-normalized, dot-product scores, results sorted descending with ties
broken by lower id.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhostknn.so")

_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.knn_search_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    lib.knn_search_f32.restype = None
    lib.l2_normalize_rows_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    lib.l2_normalize_rows_f32.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _as_f32c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    x = _as_f32c(x).copy()
    lib = _load()
    if lib is not None:
        lib.l2_normalize_rows_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0], x.shape[1])
        return x
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def knn_search_host(db_norm: np.ndarray, queries_norm: np.ndarray, k: int,
                    n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k over normalized host arrays → (scores [Q,k],
    ids [Q,k])."""
    db = _as_f32c(db_norm)
    q = _as_f32c(queries_norm)
    nq = q.shape[0]
    k_eff = min(k, db.shape[0])
    lib = _load()
    if lib is None:
        scores = q @ db.T
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k_eff]
        return np.take_along_axis(scores, idx, axis=1), idx.astype(np.int64)
    out_scores = np.empty((nq, k_eff), dtype=np.float32)
    out_ids = np.empty((nq, k_eff), dtype=np.int64)
    lib.knn_search_f32(
        db.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        db.shape[0], db.shape[1],
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nq, k_eff, n_threads,
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out_scores, out_ids


class HostRetrievalEngine:
    """Drop-in host-side searcher with the device engine's `search` surface
    (rdm_tpu.retrieval.engine.RetrievalEngine)."""

    def __init__(self, pool, n_threads: int = 0):
        self.pool = pool
        self.n_threads = n_threads
        self.db_norm = l2_normalize_rows(pool.embeddings)

    @property
    def size(self) -> int:
        return self.pool.size

    def search(self, query_embeddings, k: int,
               *, gather_embeddings: bool = True) -> dict:
        q = l2_normalize_rows(np.asarray(query_embeddings))
        scores, ids = knn_search_host(self.db_norm, q, k, self.n_threads)
        out = {"nns": ids, "scores": scores}
        if gather_embeddings:
            out["embeddings"] = self.pool.embeddings[ids]
            if self.pool.img_ids is not None:
                out["img_ids"] = self.pool.img_ids[ids]
            if self.pool.patch_coords is not None:
                out["patch_coords"] = self.pool.patch_coords[ids]
        return out
