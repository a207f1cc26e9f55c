"""Retrieval engine tests: exact-kNN correctness vs a numpy oracle, sharded
vs single-device equality on an 8-device CPU mesh, npz round-trip in the
reference's database format, and nn-memory sampling semantics.

Parity targets: dsetbuilder.py:478-518 (search), :199-259 (pool IO),
ddpm.py:847-875 (top-M qid sampling).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdm_tpu.parallel.mesh import DB_AXIS, make_mesh
from rdm_tpu.retrieval.database import DataPool, NNMemory
from rdm_tpu.retrieval.engine import RetrievalEngine, knn_search, l2_normalize


def _oracle_knn(db, q, k):
    dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = qn @ dbn.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def _random_pool(n=1000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    return DataPool(embeddings=emb,
                    img_ids=np.arange(n, dtype=np.int64),
                    patch_coords=rng.integers(0, 256, (n, 4)))


def test_knn_single_device_matches_oracle():
    pool = _random_pool()
    q = np.random.default_rng(1).standard_normal((5, 32)).astype(np.float32)
    eng = RetrievalEngine(pool, mesh=None, dtype=jnp.float32)
    out = eng.search(jnp.asarray(q), k=4)
    ref_scores, ref_idx = _oracle_knn(pool.embeddings, q, 4)
    np.testing.assert_array_equal(np.asarray(out["nns"]), ref_idx)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_scores,
                               atol=1e-4)
    np.testing.assert_allclose(out["embeddings"],
                               pool.embeddings[ref_idx], atol=1e-6)
    np.testing.assert_array_equal(out["img_ids"], ref_idx)


def test_knn_sharded_matches_single_device():
    mesh = make_mesh(data=1, db=8)
    pool = _random_pool(n=1024, d=32, seed=2)
    q = np.random.default_rng(3).standard_normal((7, 32)).astype(np.float32)
    ref_scores, ref_idx = _oracle_knn(pool.embeddings, q, 5)
    eng = RetrievalEngine(pool, mesh=mesh, dtype=jnp.float32)
    out = eng.search(jnp.asarray(q), k=5)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_scores,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["nns"]), ref_idx)


def test_knn_sharded_with_padding():
    """Pool size not divisible by shards*128 exercises the pad path."""
    mesh = make_mesh(data=1, db=8)
    pool = _random_pool(n=1000, d=32, seed=4)
    q = np.random.default_rng(5).standard_normal((3, 32)).astype(np.float32)
    ref_scores, ref_idx = _oracle_knn(pool.embeddings, q, 4)
    eng = RetrievalEngine(pool, mesh=mesh, dtype=jnp.float32)
    out = eng.search(jnp.asarray(q), k=4)
    np.testing.assert_array_equal(np.asarray(out["nns"]), ref_idx)


def test_pool_npz_roundtrip(tmp_path):
    pool = _random_pool(n=300, d=16)
    files = pool.save(str(tmp_path), chunk_size=128)
    assert len(files) == 3  # 128+128+44
    # reference-format keys present
    data = np.load(files[0])
    assert set(data.files) >= {"embedding", "img_id", "patch_coords"}
    loaded = DataPool.load(str(tmp_path))
    assert loaded.size == 300
    np.testing.assert_allclose(
        np.sort(loaded.embeddings.sum(1)), np.sort(pool.embeddings.sum(1)),
        atol=1e-5)


def test_nn_memory_build_and_sample(tmp_path):
    neighbor_ids = np.array([[1, 2], [1, 3], [1, 2], [4, 2]])
    mem = NNMemory.build(neighbor_ids)
    # id 1 and 2 are most frequent (3 each)
    assert set(mem.ids[:2]) == {1, 2}
    assert mem.id_count[1] == 3 and mem.id_count[4] == 1
    p = str(tmp_path / "mem.p")
    mem.save(p)
    mem2 = NNMemory.load(p)
    np.testing.assert_array_equal(mem.ids, mem2.ids)
    rng = np.random.default_rng(0)
    qids = mem2.sample_qids(100, memsize=2, rng=rng)
    assert set(qids) <= {1, 2}
    qids_w = mem2.sample_qids(100, memsize=1.0, use_weights=True, rng=rng)
    assert set(qids_w) <= set(mem.ids.tolist())
    # frequency weighting: id 4 (count 1) should be rarest
    counts = {i: int((qids_w == i).sum()) for i in set(qids_w)}
    assert counts.get(4, 0) <= max(counts.values())


def test_l2_normalize_handles_zero():
    x = jnp.zeros((2, 4))
    out = l2_normalize(x)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_knn_kernel_matches_oracle():
    """Pallas streamed top-k (interpret mode) vs the numpy oracle,
    including cross-block merge and tie-breaking."""
    from jax.experimental.pallas import tpu as pltpu

    from rdm_tpu.ops.knn_kernel import knn_search_fused

    rng = np.random.default_rng(7)
    db = rng.standard_normal((512, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[:6]
    ref = q @ db.T
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    with pltpu.force_tpu_interpret_mode():
        s, i = knn_search_fused(jnp.asarray(db), jnp.asarray(q), 5,
                                block_n=128)
    np.testing.assert_array_equal(np.asarray(i), ref_idx)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(ref, ref_idx, 1), atol=1e-5)
    # duplicate rows -> ties resolve to lower ids across blocks
    dup = np.tile(db[:1], (10, 1))
    with pltpu.force_tpu_interpret_mode():
        _, ti = knn_search_fused(jnp.asarray(dup), jnp.asarray(dup[:1]),
                                 4, block_n=4)
    np.testing.assert_array_equal(np.asarray(ti)[0], [0, 1, 2, 3])


def test_gather_returns_unnormalized_scale_bf16():
    """The device-side gather must return pool-scale (UNNORMALIZED)
    embeddings even though the scoring table is L2-normalized bf16 —
    conditioning on unit-norm rows would be out-of-distribution."""
    from rdm_tpu.retrieval.engine import gather_unnormalized

    pool = _random_pool(n=256, d=32, seed=6)
    eng = RetrievalEngine(pool, mesh=None)  # default bf16 table
    q = pool.embeddings[:4]
    out = eng.search(jnp.asarray(q), k=3)
    got = np.asarray(out["embeddings"])
    ref = pool.embeddings[np.asarray(out["nns"])]
    # bf16 storage => ~0.4% relative error, but the SCALE must match the
    # raw pool embeddings (norm ~ sqrt(32) ~ 5.6, not 1.0)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1),
                               np.linalg.norm(ref, axis=-1), rtol=1e-2)
    # direct gather helper
    emb = gather_unnormalized(eng.db_norm, eng.row_norms,
                              jnp.asarray([[0, 5], [9, 1]]))
    np.testing.assert_allclose(np.asarray(emb),
                               pool.embeddings[np.array([[0, 5], [9, 1]])],
                               rtol=2e-2, atol=2e-2)


def test_search_gather_is_single_program():
    """search(gather_embeddings=True) returns device arrays from one jitted
    program — no host numpy round-trip for the embeddings."""
    pool = _random_pool(n=256, d=32, seed=8)
    eng = RetrievalEngine(pool, mesh=None, dtype=jnp.float32)
    out = eng.search(jnp.ones((2, 32)), k=2)
    assert isinstance(out["embeddings"], jax.Array)
    assert out["embeddings"].dtype == jnp.float32
