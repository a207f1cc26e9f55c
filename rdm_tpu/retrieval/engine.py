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
        self._search = jax.jit(
            functools.partial(knn_search, mesh=mesh),
            static_argnames=("k",))

    @property
    def size(self) -> int:
        return self.pool.size

    def search(self, query_embeddings: jnp.ndarray, k: int,
               *, gather_embeddings: bool = True) -> dict:
        """query_embeddings: [B, D] unnormalized. Returns dict with
        'nns' [B,k], 'scores' [B,k], and (optionally) 'embeddings'
        [B,k,D] float32, 'img_ids' [B,k], 'patch_coords' [B,k,4]."""
        q = l2_normalize(jnp.asarray(query_embeddings, dtype=jnp.float32))
        scores, nns = self._search(self.db_norm, q, k=k)
        # clamp padded rows (score -inf) — only reachable when k > pool size
        nns = jnp.minimum(nns, self.pool.size - 1)
        out = {"nns": nns, "scores": scores}
        if gather_embeddings:
            ids = np.asarray(nns)
            out["embeddings"] = self.pool.embeddings[ids]
            if self.pool.img_ids is not None:
                out["img_ids"] = self.pool.img_ids[ids]
            if self.pool.patch_coords is not None:
                out["patch_coords"] = self.pool.patch_coords[ids]
        return out
