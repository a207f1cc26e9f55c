"""Native host kNN tests: build, exactness vs numpy oracle, tie-breaking,
agreement with the device engine, threading."""

import numpy as np
import pytest

from rdm_tpu.retrieval.database import DataPool
from rdm_tpu.retrieval.host_knn import (
    HostRetrievalEngine,
    knn_search_host,
    l2_normalize_rows,
    native_available,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_native_builds():
    assert native_available(), "g++ build of native/host_knn.cpp failed"


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    db = _norm(rng.standard_normal((500, 24)).astype(np.float32))
    q = _norm(rng.standard_normal((7, 24)).astype(np.float32))
    scores, ids = knn_search_host(db, q, k=5)
    ref = q @ db.T
    ref_ids = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(scores,
                               np.take_along_axis(ref, ref_ids, axis=1),
                               atol=1e-5)


def test_tie_breaking_prefers_lower_id():
    db = np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (6, 1))
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    _, ids = knn_search_host(db, q, k=3)
    np.testing.assert_array_equal(ids[0], [0, 1, 2])


def test_threading_consistent():
    rng = np.random.default_rng(1)
    db = _norm(rng.standard_normal((300, 16)).astype(np.float32))
    q = _norm(rng.standard_normal((9, 16)).astype(np.float32))
    s1, i1 = knn_search_host(db, q, k=4, n_threads=1)
    s4, i4 = knn_search_host(db, q, k=4, n_threads=4)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_allclose(s1, s4, atol=1e-6)


def test_l2_normalize_rows():
    x = np.random.default_rng(2).standard_normal((5, 8)).astype(np.float32)
    out = l2_normalize_rows(x)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_host_engine_matches_device_engine():
    import jax.numpy as jnp

    from rdm_tpu.retrieval.engine import RetrievalEngine

    rng = np.random.default_rng(3)
    pool = DataPool(embeddings=rng.standard_normal(
        (400, 16)).astype(np.float32), img_ids=np.arange(400))
    host = HostRetrievalEngine(pool)
    dev = RetrievalEngine(pool, dtype=jnp.float32)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    h = host.search(q, k=4)
    d = dev.search(jnp.asarray(q), k=4)
    np.testing.assert_array_equal(h["nns"], np.asarray(d["nns"]))
    np.testing.assert_allclose(h["embeddings"], d["embeddings"], atol=1e-5)
