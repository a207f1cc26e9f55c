"""Multi-host orchestration.

The reference's multi-node story is PyTorch-Lightning env plumbing + NCCL
(/root/reference/main.py:784-785, rdm/data/base.py:174-182). Here:

- `initialize()`: `jax.distributed.initialize` wrapper (no-op when
  single-process or already initialized) — after it, `jax.devices()` spans
  the pod slice and one Mesh covers all chips; XLA routes collectives over
  ICI within a slice and DCN across slices.
- `host_info()`: the rank/world introspection surface samplers use.
- `shard_for_host(n)`: contiguous per-host range of a global batch — the
  input-pipeline contract: every host feeds its local slice of the global
  batch, `jax.make_array_from_process_local_data` assembles the global
  array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed init. With no args, relies on the TPU
    environment's auto-discovery; explicit args support GPU/CPU clusters.

    Must run before any backend-touching jax call — probing with
    jax.process_count() here would itself initialize the local backend
    and make the real distributed init impossible (round-4 fix; the
    multiprocess dryrun executes this path for real). CPU clusters get
    gloo collectives (the only cross-process CPU implementation)."""
    if jax.distributed.is_initialized():
        return
    try:
        # harmless for TPU backends; required for CPU cross-process
        # collectives (psum/all_gather over the distributed client)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jax without the option
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif num_processes is not None:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-process run


def host_info() -> Tuple[int, int]:
    """(process_index, process_count) — the dist.get_rank/world surface."""
    return jax.process_index(), jax.process_count()


def shard_for_host(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's contiguous slice of a global batch."""
    rank, world = host_info()
    if global_batch % world:
        raise ValueError(
            f"global batch {global_batch} not divisible by {world} hosts")
    per = global_batch // world
    return rank * per, per


def global_array_from_local(local: np.ndarray, mesh, pspec):
    """Assemble a globally-sharded jax.Array from per-host local data."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), local)
