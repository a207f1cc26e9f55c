"""Retrieval data pool: npz-chunk IO, device table construction, nn-memory.

File-format compatible with the reference's released databases
(/root/reference/scripts/download_databases.sh): one or more ``.npz`` files
with keys ``embedding [N,512] float``, ``img_id [N]``, ``patch_coords
[N,4]`` (dsetbuilder.py:238-259 save, :199-236 load), and nn-memory pickles
``{'nn_memory': int array, 'id_count': {id: count}}`` (ddpm.py:168-176).

TPU-side layout: the scoring table is L2-normalized bf16, padded to a
multiple of (db-shards x 128) rows so every shard is MXU-tile aligned; pad
rows score -inf and can never win top-k.
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import os
import pickle
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdm_tpu.parallel.mesh import DB_AXIS


@dataclasses.dataclass
class DataPool:
    """Host-side pool: unnormalized embeddings + provenance metadata."""

    embeddings: np.ndarray  # [N, D] float32/float16
    img_ids: Optional[np.ndarray] = None  # [N]
    patch_coords: Optional[np.ndarray] = None  # [N, 4]

    @property
    def size(self) -> int:
        return self.embeddings.shape[0]

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    # ---------- IO ----------

    @classmethod
    def load(cls, path: str) -> "DataPool":
        """Load from one npz file or a directory of npz chunks."""
        if os.path.isfile(path):
            files = [path]
        elif os.path.isdir(path):
            files = sorted(globlib.glob(os.path.join(path, "*.npz")))
            if not files:
                raise FileNotFoundError(f"no npz chunks under {path}")
        else:
            raise FileNotFoundError(path)
        embs, ids, coords = [], [], []
        for f in files:
            data = np.load(f)
            embs.append(np.asarray(data["embedding"]))
            if "img_id" in data:
                ids.append(np.asarray(data["img_id"]))
            if "patch_coords" in data:
                coords.append(np.asarray(data["patch_coords"]))
        return cls(
            embeddings=np.concatenate(embs, axis=0),
            img_ids=np.concatenate(ids, axis=0) if ids else None,
            patch_coords=np.concatenate(coords, axis=0) if coords else None,
        )

    def save(self, path: str, chunk_size: int = 2_000_000) -> Sequence[str]:
        """Chunked compressed save, reference format (2M rows/chunk,
        dsetbuilder.py chunk_size)."""
        os.makedirs(path, exist_ok=True)
        written = []
        for start in range(0, self.size, chunk_size):
            end = min(start + chunk_size, self.size)
            payload: Dict[str, np.ndarray] = {
                "embedding": self.embeddings[start:end]}
            if self.img_ids is not None:
                payload["img_id"] = self.img_ids[start:end]
            if self.patch_coords is not None:
                payload["patch_coords"] = self.patch_coords[start:end]
            fname = os.path.join(
                path, f"{end - start}x{self.dim}-part{start // chunk_size:04d}.npz")
            np.savez_compressed(fname, **payload)
            written.append(fname)
        return written

    # ---------- device table ----------

    def device_table(self, mesh: Optional[Mesh] = None,
                     dtype=jnp.bfloat16, normalized: bool = True) -> jax.Array:
        """Normalized, padded scoring table, placed/sharded on device."""
        table = self.embeddings.astype(np.float32)
        if normalized:
            norms = np.linalg.norm(table, axis=1, keepdims=True)
            table = table / np.maximum(norms, 1e-12)
        shards = mesh.shape.get(DB_AXIS, 1) if mesh is not None else 1
        align = shards * 128
        padded = ((self.size + align - 1) // align) * align
        if padded != self.size:
            # zero rows score 0 against any query; RetrievalEngine clamps
            # returned ids to the real pool size as a belt-and-braces guard
            pad = np.zeros((padded - self.size, self.dim), dtype=np.float32)
            table = np.concatenate([table, pad], axis=0)
        arr = jnp.asarray(table, dtype=dtype)
        if mesh is not None and mesh.shape.get(DB_AXIS, 1) > 1:
            arr = jax.device_put(arr, NamedSharding(mesh, P(DB_AXIS, None)))
        return arr


@dataclasses.dataclass
class NNMemory:
    """Top-M most-frequent database ids used for unconditional sampling
    (reference ddpm.py:847-875 `get_qids`)."""

    ids: np.ndarray  # [M] int, sorted by decreasing frequency
    id_count: Optional[Dict[int, int]] = None

    @classmethod
    def load(cls, path: str) -> "NNMemory":
        with open(path, "rb") as f:
            data = pickle.load(f)
        return cls(ids=np.asarray(data["nn_memory"], dtype=np.int64),
                   id_count=data.get("id_count"))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"nn_memory": self.ids, "id_count": self.id_count}, f)

    def sample_qids(self, n: int, memsize=0.01, *, use_weights: bool = False,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Sample n query ids from the top-`memsize` of the memory.

        memsize: fraction (0,1] of the memory, or an absolute int count.
        use_weights: proposal ∝ observed neighbor frequency.
        """
        rng = rng or np.random.default_rng()
        if isinstance(memsize, float):
            if not 0.0 < memsize <= 1.0:
                raise ValueError("fractional memsize must be in (0,1]")
            memsize = int(memsize * len(self.ids))
        memsize = max(1, min(memsize, len(self.ids)))
        pool = self.ids[:memsize]
        p = None
        if use_weights:
            if not self.id_count:
                raise ValueError("use_weights requires id_count")
            freqs = np.asarray([self.id_count[int(i)] for i in pool],
                               dtype=np.float64)
            p = freqs / freqs.sum()
        return rng.choice(pool, size=n, p=p)

    @classmethod
    def build_from_queries(cls, engine, query_embeddings: np.ndarray,
                           k: int = 20, batch_size: int = 256,
                           top_m: Optional[int] = None,
                           max_retries: int = 3) -> "NNMemory":
        """Build the memory by searching a query set against an engine —
        the NNMemoryDataset job (reference base.py:43-104), with the
        retry-on-bad-batch loop collapsed to a skip."""
        all_ids = []
        n = len(query_embeddings)
        for start in range(0, n, batch_size):
            chunk = np.asarray(query_embeddings[start:start + batch_size],
                               dtype=np.float32)
            for attempt in range(max_retries):
                try:
                    out = engine.search(chunk, k=k,
                                        gather_embeddings=False)
                    all_ids.append(np.asarray(out["nns"]))
                    break
                except Exception:
                    if attempt == max_retries - 1:
                        print(f"skipping bad query batch at {start}")
        return cls.build(np.concatenate(all_ids, axis=0), top_m=top_m)

    @classmethod
    def build(cls, neighbor_ids: np.ndarray, top_m: Optional[int] = None
              ) -> "NNMemory":
        """Construct from a [num_queries, k] (or flat) array of retrieved
        neighbor ids — the offline pipeline's aggregation step."""
        flat = np.asarray(neighbor_ids).reshape(-1)
        ids, counts = np.unique(flat, return_counts=True)
        order = np.argsort(-counts)
        ids, counts = ids[order], counts[order]
        if top_m is not None:
            ids, counts = ids[:top_m], counts[:top_m]
        return cls(ids=ids.astype(np.int64),
                   id_count={int(i): int(c) for i, c in zip(ids, counts)})
