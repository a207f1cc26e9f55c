"""Offline retrieval-database construction — the DatasetBuilder equivalent.

Re-designs /root/reference/rdm/data/retrieval_dataset/dsetbuilder.py
(1153 LoC driving C++ ScaNN) for TPU:

- **build**: stream PatcherDataset batches through a frozen embedder on
  device, accumulate {embedding, img_id, patch_coords}, chunked
  npz save in the reference's on-disk format (dsetbuilder.py:238-259).
  Restartable: on resume, finished rows are counted from the saved chunks
  and skipped (RestartSampler semantics, dsetbuilder.py:26-35, 320-346).
- **index**: no ScaNN training stage — the "searcher" IS the HBM table +
  matmul top-k (rdm_tpu.retrieval.engine), so train_searcher() reduces to
  uploading the normalized table. Pool-size-dependent ANN config
  (dsetbuilder.py:534-619) is obsolete by design: exact search is
  affordable at reference scales on the MXU.
- **query**: search_k_nearest with the same output dict surface
  (embeddings / img_ids / patch_coords / nns / exec_time,
  dsetbuilder.py:478-518), plus get_nn_patches re-cropping pixels from the
  source dataset (dsetbuilder.py:439-459).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from rdm_tpu.data.base import DataLoader, PatcherDataset
from rdm_tpu.retrieval.database import DataPool
from rdm_tpu.retrieval.engine import RetrievalEngine


class DatasetBuilder:
    def __init__(self,
                 patcher: Optional[PatcherDataset] = None,
                 embedder: Optional[Callable] = None,
                 save_dir: Optional[str] = None,
                 batch_size: int = 100,
                 chunk_size: int = 2_000_000,
                 num_workers: int = 0,
                 k: int = 20,
                 mesh=None):
        self.patcher = patcher
        self.embedder = embedder
        self.save_dir = save_dir
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.num_workers = num_workers
        self.k = k
        self.mesh = mesh
        self.pool: Optional[DataPool] = None
        self.engine: Optional[RetrievalEngine] = None
        if save_dir and os.path.isdir(save_dir) and any(
                f.endswith(".npz") for f in os.listdir(save_dir)):
            self.pool = DataPool.load(save_dir)

    # ---------- build ----------

    def _resume_rows(self) -> int:
        return self.pool.size if self.pool is not None else 0

    def build_data_pool(self, log_every: int = 20) -> DataPool:
        """Embed every patch of every image; restartable mid-way."""
        if self.pool is not None and self.patcher is not None:
            # count images already covered (img_id is per-source-image)
            done_imgs = (int(self.pool.img_ids.max()) + 1
                         if self.pool.img_ids is not None
                         and self.pool.size else 0)
            if done_imgs >= len(self.patcher):
                print(f"pool complete ({self.pool.size} rows)")
                return self.pool
            print(f"resuming embedding extraction at image {done_imgs}")
            start_img = done_imgs
        else:
            start_img = 0
        assert self.patcher is not None and self.embedder is not None

        embs, ids, coords = [], [], []
        if self.pool is not None:
            embs.append(self.pool.embeddings)
            ids.append(self.pool.img_ids)
            coords.append(self.pool.patch_coords)

        class _Tail:
            def __init__(s, data, start):
                s.data, s.start = data, start

            def __len__(s):
                return len(s.data) - s.start

            def __getitem__(s, i):
                return s.data[s.start + i]

        loader = DataLoader(_Tail(self.patcher, start_img),
                            batch_size=self.batch_size,
                            num_workers=self.num_workers, drop_last=False)
        t0 = time.time()
        for bi, batch in enumerate(loader):
            patches = np.asarray(batch["patch"])  # [B, n, ps, ps, 3]
            b, n = patches.shape[:2]
            flat = patches.reshape(b * n, *patches.shape[2:])
            emb = np.asarray(self.embedder(flat), dtype=np.float32)
            embs.append(emb)
            ids.append((np.asarray(batch["img_id"]) + start_img
                        ).reshape(-1))
            coords.append(np.asarray(batch["patch_coords"]
                                     ).reshape(b * n, -1))
            if bi % log_every == 0:
                rows = sum(e.shape[0] for e in embs)
                rate = rows / max(time.time() - t0, 1e-9)
                print(f"embedded {rows} rows ({rate:.1f} rows/s)")
        self.pool = DataPool(
            embeddings=np.concatenate(embs, axis=0),
            img_ids=np.concatenate(ids, axis=0),
            patch_coords=np.concatenate(coords, axis=0))
        if self.save_dir:
            self.pool.save(self.save_dir, chunk_size=self.chunk_size)
            print(f"saved pool ({self.pool.size} rows) to {self.save_dir}")
        return self.pool

    # ---------- index / query ----------

    def train_searcher(self, dtype=jnp.bfloat16, backend: str = "device"):
        """Bind the searcher. backend "device": normalized table in HBM,
        matmul top-k (default). backend "host": the native C++ searcher
        (rdm_tpu.retrieval.host_knn) for CPU-only hosts."""
        assert self.pool is not None, "build or load the pool first"
        if backend == "host":
            from rdm_tpu.retrieval.host_knn import HostRetrievalEngine
            self.engine = HostRetrievalEngine(self.pool)
        else:
            self.engine = RetrievalEngine(self.pool, mesh=self.mesh,
                                          dtype=dtype)
        return self.engine

    def search_k_nearest(self, query_embeddings: np.ndarray,
                         k: Optional[int] = None) -> Dict[str, np.ndarray]:
        if self.engine is None:
            self.train_searcher()
        k = k or self.k
        t0 = time.time()
        out = self.engine.search(np.asarray(query_embeddings,
                                            dtype=np.float32), k=k)
        out["exec_time"] = time.time() - t0
        out["nns"] = np.asarray(out["nns"])
        return out

    def get_nn_patches(self, nns: np.ndarray,
                       source_dataset=None) -> np.ndarray:
        """Re-crop neighbor pixels by (img_id, patch_coords)
        (dsetbuilder.py:439-459). source_dataset must yield
        {'image': HWC float}; defaults to the patcher's base dataset."""
        assert self.pool is not None
        src = source_dataset or (self.patcher.data if self.patcher else None)
        assert src is not None, "need a source dataset for pixel re-crop"
        b, k = nns.shape
        out = []
        for row in nns:
            row_patches = []
            for nn_id in row:
                img_id = int(self.pool.img_ids[nn_id])
                x1, y1, x2, y2 = [int(v) for v in
                                  self.pool.patch_coords[nn_id]]
                img = src[img_id]["image"]
                row_patches.append(img[y1:y2, x1:x2])
            out.append(np.stack(row_patches))
        return np.stack(out)  # [B, k, h, w, 3]
