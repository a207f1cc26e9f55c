"""Tar-shard streaming datasets (webdataset-format reader, no external dep).

Replaces the reference's webdataset pipeline
(/root/reference/rdm/data/base.py:516-705 WebDataModuleFromConfig):

- shard URL brace expansion `path/{00000..00099}.tar`
  (base.py:594-634 shard-range parsing).
- samples grouped by basename stem inside each tar; `.png/.jpg/.jpeg/.webp`
  decoded to float [-1,1] HWC, `.json/.txt/.cls` parsed, `.npy/.npz` loaded
  (the `.decode('pil').map_dict()` stage, base.py:671-681).
- multi-host shard split by `jax.process_index()` (split_by_node,
  base.py:645) + per-worker interleaving.
- infinite `.repeat()` + `.batched()` semantics via `loader()`.
"""

from __future__ import annotations

import io
import json
import re
import tarfile
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from rdm_tpu.data.base import dict_collation_fn

_IMG_EXT = {"png", "jpg", "jpeg", "webp", "ppm"}


def expand_shards(url: str) -> List[str]:
    """`a/{00000..00009}.tar` → ten paths; plain paths pass through."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", url)
    if not m:
        return [url]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [url[:m.start()] + str(i).zfill(width) + url[m.end():]
            for i in range(int(lo), int(hi) + 1)]


def _decode(name: str, payload: bytes) -> Any:
    ext = name.rsplit(".", 1)[-1].lower()
    if ext in _IMG_EXT:
        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return (np.asarray(img, dtype=np.float32) / 127.5) - 1.0
    if ext == "json":
        return json.loads(payload)
    if ext in ("txt", "text", "caption"):
        return payload.decode("utf-8")
    if ext == "cls":
        return int(payload.decode("utf-8"))
    if ext == "npy":
        return np.load(io.BytesIO(payload), allow_pickle=False)
    if ext == "npz":
        return dict(np.load(io.BytesIO(payload)))
    return payload


def iter_tar_samples(path: str) -> Iterator[Dict[str, Any]]:
    """Group tar members by stem → {'__key__', '<ext>': decoded}."""
    with tarfile.open(path, "r|*") as tf:
        current_key: Optional[str] = None
        sample: Dict[str, Any] = {}
        for member in tf:
            if not member.isfile():
                continue
            base = member.name.split("/")[-1]
            if "." not in base:
                continue
            stem, ext = base.split(".", 1)
            if current_key is not None and stem != current_key:
                if sample:
                    yield sample
                sample = {}
            current_key = stem
            payload = tf.extractfile(member).read()
            sample["__key__"] = stem
            sample[ext.lower()] = _decode(base, payload)
        if sample:
            yield sample


class WebDataset:
    """Streaming dataset over tar shards with per-host splitting."""

    def __init__(self, urls: str, *,
                 transforms: Optional[Dict[str, Callable]] = None,
                 rename: Optional[Dict[str, str]] = None,
                 shard_shuffle_seed: Optional[int] = None,
                 split_by_host: bool = True):
        self.shards = expand_shards(urls)
        self.transforms = transforms or {}
        self.rename = rename or {}
        self.shard_shuffle_seed = shard_shuffle_seed
        self.split_by_host = split_by_host

    def _host_shards(self) -> List[str]:
        shards = list(self.shards)
        if self.shard_shuffle_seed is not None:
            np.random.default_rng(self.shard_shuffle_seed).shuffle(shards)
        if self.split_by_host:
            try:
                import jax
                rank = jax.process_index()
                world = jax.process_count()
            except Exception:
                rank, world = 0, 1
            shards = shards[rank::world]
        return shards

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for shard in self._host_shards():
            for sample in iter_tar_samples(shard):
                out = {}
                for k, v in sample.items():
                    key = self.rename.get(k, k)
                    fn = self.transforms.get(key)
                    out[key] = fn(v) if fn else v
                yield out

    def loader(self, batch_size: int, *, repeat: bool = True
               ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite (or single-epoch) batched iterator."""
        while True:
            buf: List[Dict[str, Any]] = []
            for sample in self:
                buf.append(sample)
                if len(buf) == batch_size:
                    yield dict_collation_fn(buf)
                    buf = []
            if not repeat:
                if buf:
                    yield dict_collation_fn(buf)
                return


class NeighborReconstructor:
    """'nn_indices.npy' transform: neighbor-ID arrays stored in the tars
    are reconstructed into UNNORMALIZED embedding sequences by gathering
    from the retrieval DataPool.

    The reference does this with a faiss direct map
    (base.py:549-556,579-588 + util.py:24-41 reconstruct_nns); here the
    npz DataPool IS the id→embedding table, so reconstruction is one
    numpy gather. Optional k-slice matches the QueryDataset contract.
    """

    def __init__(self, pool, k: Optional[int] = None):
        from rdm_tpu.retrieval.database import DataPool

        if isinstance(pool, str):
            pool = DataPool.load(pool)
        self.pool = pool
        self.k = k

    def __call__(self, ids) -> np.ndarray:
        ids = np.asarray(ids)
        if self.k is not None:
            ids = ids[..., : self.k]
        emb = np.asarray(self.pool.embeddings)[ids.reshape(-1)]
        return emb.reshape(ids.shape + (self.pool.dim,)) \
            .astype(np.float32)


class WebDataModule:
    """Config-driven tar-shard data module — the surface of the
    reference's WebDataModuleFromConfig (base.py:516-705): per-split
    configs {shards, n_examples, image_key, nn_key, k}, an `index_path`
    whose pool reconstructs 'nn_indices.npy' entries into neighbor
    embeddings, and repeat+batched loaders with n_examples-derived epoch
    length.
    """

    def __init__(self, tar_base: str, batch_size: int, *,
                 train: Optional[dict] = None,
                 validation: Optional[dict] = None,
                 test: Optional[dict] = None,
                 index_path: Optional[str] = None):
        import os

        self.tar_base = tar_base
        self.batch_size = batch_size
        self.splits = {"train": train, "validation": validation,
                       "test": test}
        self.pool = None
        if index_path is not None:
            from rdm_tpu.retrieval.database import DataPool

            self.pool = DataPool.load(index_path)
        self._join = lambda s: (s if os.path.isabs(s)
                                else os.path.join(tar_base, s))

    def make_loader(self, split: str, *, repeat: Optional[bool] = None):
        """→ (batched iterator, steps_per_epoch)."""
        cfg = self.splits.get(split)
        if cfg is None:
            raise ValueError(f"split '{split}' not configured")
        transforms: Dict[str, Callable] = {}
        rename = dict(cfg.get("rename", {}))
        nn_key = cfg.get("nn_key", "nn_indices.npy")
        if self.pool is not None:
            transforms[nn_key] = NeighborReconstructor(
                self.pool, k=cfg.get("k"))
            rename.setdefault(nn_key, nn_key)
        img_key = cfg.get("image_key")
        if img_key and img_key != "image":
            rename[img_key] = "image"
        ds = WebDataset(self._join(cfg["shards"]), transforms=transforms,
                        rename=rename,
                        shard_shuffle_seed=cfg.get("shuffle"),
                        split_by_host=cfg.get("split_by_host", True))
        if repeat is None:
            repeat = split == "train"
        n_examples = int(cfg.get("n_examples", 0))
        steps = n_examples // self.batch_size if n_examples else None
        return ds.loader(self.batch_size, repeat=repeat), steps

    def train_dataloader(self):
        return self.make_loader("train")[0]

    def val_dataloader(self):
        return self.make_loader("validation", repeat=False)[0]

    def test_dataloader(self):
        return self.make_loader("test", repeat=False)[0]
