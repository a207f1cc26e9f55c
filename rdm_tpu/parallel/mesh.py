"""Device mesh construction and sharding helpers.

The framework uses ONE global mesh with two named axes (SURVEY.md §5.8):

- ``data``: data parallelism — replaces the reference's PyTorch-Lightning DDP
  (/root/reference/main.py:784-785). Params are replicated, batches sharded;
  gradient all-reduce is inserted by XLA and rides ICI.
- ``db``: retrieval-database sharding — the embedding table's rows are
  sharded over this axis; kNN is a per-shard matmul + top-k with a cross-
  shard merge (rdm_tpu.retrieval.engine), replacing ScaNN.

On a pod slice both axes map onto ICI; across slices the data axis spans DCN
(gradient reduction tolerates DCN latency, retrieval does not).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DB_AXIS = "db"


def make_mesh(
    data: Optional[int] = None,
    db: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global (data, db) mesh.

    data=None uses all remaining devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % db:
            raise ValueError(f"{n} devices not divisible by db={db}")
        data = n // db
    if data * db > n:
        raise ValueError(f"mesh ({data},{db}) needs {data*db} devices, "
                         f"have {n}")
    grid = np.asarray(devices[: data * db]).reshape(data, db)
    return Mesh(grid, (DATA_AXIS, DB_AXIS))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data, replicated over db."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def db_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the db axis (the embedding table layout)."""
    return NamedSharding(mesh, P(DB_AXIS))


def fsdp_spec(shape: Sequence[int], n_shards: int,
              axis: str = DATA_AXIS,
              min_size: int = 16384) -> P:
    """ZeRO-style param sharding spec: shard the largest divisible dim.

    Leaves smaller than `min_size` elements (biases, norm scales, scalar
    optimizer counters) stay replicated — a per-leaf all-gather for a few
    hundred bytes costs more in collective latency than it saves in HBM.
    Beyond the reference (its DDP always replicates): this is the TPU
    path to models whose params + Adam moments exceed one chip's HBM —
    GSPMD all-gathers each sharded leaf just before use and
    reduce-scatters its gradient into the sharded optimizer update.
    """
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[d] % n_shards == 0 and shape[d] >= n_shards:
            spec: list = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis: str = DATA_AXIS,
                   min_size: int = 16384):
    """Pytree of NamedShardings: fsdp_spec per leaf (see fsdp_spec)."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda l: NamedSharding(mesh, fsdp_spec(l.shape, n, axis,
                                                min_size)), tree)


def shard_train_state(state, mesh: Mesh, axis: str = DATA_AXIS,
                      min_size: int = 16384):
    """device_put a TrainState with FSDP leaf shardings (params, Adam
    moments, and EMA shadows all sharded over `axis`)."""
    return jax.device_put(state, fsdp_shardings(state, mesh, axis,
                                                min_size))
