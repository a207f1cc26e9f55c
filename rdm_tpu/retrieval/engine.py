"""Exact k-NN retrieval over an HBM-resident sharded embedding table.

Replaces ScaNN (the reference's only native compute dependency,
/root/reference/rdm/data/retrieval_dataset/dsetbuilder.py:534-619) with exact
search: at reference database scales (1.28M-20.9M x 512-d) the whole table
fits in the HBM of a small pod slice in bf16, and one [B,512]x[512,N] matmul
on the MXU plus `lax.top_k` is faster than approximate CPU search — and
exact, so retrieval quality can only improve (SURVEY.md §7 hard part (d)).

Scoring semantics match the reference: both table and queries L2-normalized,
dot-product scores (dsetbuilder.py:574,506-508); returned embeddings are the
UNNORMALIZED originals (dsetbuilder.py:510).

Distribution: table rows sharded over the mesh `db` axis via shard_map.
Each shard computes its local [B, N/s] scores and top-k, then the (value,
global-id) pairs are all-gathered over ICI (k·s tiny rows, not the score
matrix) and merged with a second top-k. Ties broken by lower global id to
make the merge deterministic across shard counts.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rdm_tpu.parallel.mesh import DB_AXIS


def _topk_local(scores: jnp.ndarray, k: int,
                offset: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    v, i = jax.lax.top_k(scores, k)  # [B, k]
    return v, (i + offset).astype(jnp.int32)


def knn_search(
    db_norm: jax.Array,
    queries: jnp.ndarray,
    k: int,
    *,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k dot-product search.

    Args:
      db_norm: [N, D] L2-normalized table. If `mesh` is given, sharded
        (or shardable) over the `db` axis; N must divide evenly by the axis
        size (pad with -inf-scoring rows via `DataPool.device_table`).
      queries: [B, D] L2-normalized queries (replicated).
      k: neighbors to return.
    Returns:
      (scores [B, k] float32, ids [B, k] int32), globally sorted desc.
    """
    if mesh is None or mesh.shape.get(DB_AXIS, 1) == 1:
        scores = _score(queries, db_norm)
        return jax.lax.top_k(scores, k)

    n_shards = mesh.shape[DB_AXIS]
    shard_rows = db_norm.shape[0] // n_shards

    def shard_fn(db_shard, q):
        # db_shard: [N/s, D]; q replicated [B, D]
        scores = _score(q, db_shard)
        shard_idx = jax.lax.axis_index(DB_AXIS)
        v, i = _topk_local(scores, k, shard_idx * shard_rows)
        # all-gather the tiny candidate lists over ICI, merge everywhere
        v_all = jax.lax.all_gather(v, DB_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DB_AXIS, axis=1, tiled=True)
        vm, sel = jax.lax.top_k(v_all, k)
        im = jnp.take_along_axis(i_all, sel, axis=1)
        return vm, im

    # queries replicated over BOTH axes; table sharded over db only
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(DB_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(db_norm, queries)


def _score(q: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """[B, D] x [N, D] -> [B, N] dot scores, fp32 accumulation on the MXU."""
    return jax.lax.dot_general(
        q.astype(db.dtype), db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def gather_unnormalized(db_norm: jax.Array, row_norms: jax.Array,
                        ids: jnp.ndarray) -> jnp.ndarray:
    """Gather UNNORMALIZED f32 embeddings by id from the normalized scoring
    table: db_norm[id] * row_norms[id]. This is the conditioning scale the
    models were trained on (reference dsetbuilder.py:510) — gathering raw
    rows of db_norm would feed out-of-distribution unit-norm contexts."""
    rows = jnp.take(db_norm, ids, axis=0).astype(jnp.float32)
    return rows * jnp.take(row_norms, ids)[..., None]


class RetrievalEngine:
    """Device-side searcher bound to a data pool.

    The jitted search closure is cached per (k, batch-shape) by jax.jit;
    `search` normalizes queries, searches, and gathers the unnormalized
    neighbor embeddings — the `search_k_nearest` surface of the reference
    DatasetBuilder (dsetbuilder.py:478-518) minus host round-trips.
    """

    def __init__(self, pool: "DataPool", mesh: Optional[Mesh] = None,
                 dtype=jnp.bfloat16):
        from rdm_tpu.retrieval.database import DataPool  # circular-safe
        assert isinstance(pool, DataPool)
        self.pool = pool
        self.mesh = mesh
        self.db_norm = pool.device_table(mesh=mesh, dtype=dtype,
                                         normalized=True)
        # Per-row L2 norms (f32, padded to the table) let neighbor gathers
        # reconstruct the UNNORMALIZED embeddings the model was trained on
        # (reference dsetbuilder.py:510) without a second full-size device
        # table: gathered rows are db_norm[id] * norm[id], exact up to the
        # table's storage dtype.
        norms = np.linalg.norm(
            pool.embeddings.astype(np.float32), axis=1)
        pad = self.db_norm.shape[0] - norms.shape[0]
        if pad:
            norms = np.concatenate([norms, np.ones(pad, np.float32)])
        self.row_norms = jnp.asarray(norms, dtype=jnp.float32)
        self._search = jax.jit(
            functools.partial(knn_search, mesh=mesh),
            static_argnames=("k",))

        size = pool.size

        def _fused(db_norm, row_norms, q, *, k):
            qn = l2_normalize(q.astype(jnp.float32))
            scores, nns = knn_search(db_norm, qn, k, mesh=mesh)
            nns = jnp.minimum(nns, size - 1)
            emb = gather_unnormalized(db_norm, row_norms, nns)
            return scores, nns, emb

        # search + neighbor gather in ONE compiled program — no host
        # round-trip between kNN and conditioning assembly
        self._search_gather = jax.jit(_fused, static_argnames=("k",))

    @property
    def size(self) -> int:
        return self.pool.size

    def search(self, query_embeddings: jnp.ndarray, k: int,
               *, gather_embeddings: bool = True) -> dict:
        """query_embeddings: [B, D] unnormalized. Returns dict with
        'nns' [B,k], 'scores' [B,k], and (optionally) 'embeddings'
        [B,k,D] float32, 'img_ids' [B,k], 'patch_coords' [B,k,4]."""
        q = jnp.asarray(query_embeddings, dtype=jnp.float32)
        if gather_embeddings:
            scores, nns, emb = self._search_gather(
                self.db_norm, self.row_norms, q, k=k)
            out = {"nns": nns, "scores": scores, "embeddings": emb}
        else:
            scores, nns = self._search(self.db_norm, l2_normalize(q), k=k)
            # clamp padded rows — only reachable when k > pool size
            nns = jnp.minimum(nns, self.pool.size - 1)
            out = {"nns": nns, "scores": scores}
        if gather_embeddings and (self.pool.img_ids is not None
                                  or self.pool.patch_coords is not None):
            ids = np.asarray(nns)
            if self.pool.img_ids is not None:
                out["img_ids"] = self.pool.img_ids[ids]
            if self.pool.patch_coords is not None:
                out["patch_coords"] = self.pool.patch_coords[ids]
        return out
