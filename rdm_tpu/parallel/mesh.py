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
