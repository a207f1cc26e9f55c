"""AOT-lowering helpers shared by the benchmark entry points.

Tracing a jit call with CONCRETE remote (axon-tunnel) arrays costs
~0.75 s of RPC per pytree leaf — a "407 s compile" measured in round 2
was 613 s of tracing around a 14 s persistent-cache hit. Lowering from
ShapeDtypeStructs keeps tracing host-side and leaves only the (cached)
compile; every bench (bench.py, scripts/bench_rarm.py,
scripts/bench_train.py) lowers through this one helper.
"""

from __future__ import annotations

import jax


def abstract(tree):
    """Map a pytree of arrays to ShapeDtypeStructs for jit(...).lower()."""
    return jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), tree)
