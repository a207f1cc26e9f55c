"""Batch partitioning for Pallas kernels under jit-with-shardings.

GSPMD/Shardy cannot see inside a `pallas_call` custom call: without help
the partitioner assigns it a replicated sharding, ALL-GATHERS the
batch-sharded operands, runs the full-batch kernel on EVERY device, and
dynamic-slices the result back out. Measured on the 8-device CPU mesh: a
trivially batch-parallel kernel under `jit(in_shardings=P("data"))` gets
4 all-gathers + 4 dynamic-slices — i.e. data-parallel serving would give
~no speedup (and n_data x redundant FLOPs) for the Pallas portions of
the program, silently.

`call_batch_partitioned` wraps a kernel entry with
`jax.experimental.custom_partitioning` and an einsum-like Shardy
sharding rule that marks the batch dimension of each operand/result as
one shared elementwise factor: each device then runs the kernel on its
LOCAL batch shard only, with no collectives. Every non-batch dimension
is forced replicated by the partition callback (the kernels assume whole
rows/sequences per device).

custom_partitioning requires a const-free jaxpr, but the kernel wrappers
create np-derived constant matrices (head segment/group-sum tables)
while tracing. Those consts are hoisted into explicit REPLICATED
operands for the outer op (a jaxpr replay), and the per-shard lowering
simply re-traces the original fn at local shapes — valid because the
internal constants depend only on static config (heads/dims/context
length), never on the batch size.

Single-device processes bypass the wrapper entirely (`jax.device_count()
== 1`), so the single-chip TPU bench path is byte-identical to the
unwrapped call. `RDM_TPU_PARTITION_KERNELS=0` disables the wrapper
everywhere (debug escape hatch).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _enabled() -> bool:
    return (os.environ.get("RDM_TPU_PARTITION_KERNELS", "1") != "0"
            and jax.device_count() > 1)


def call_batch_partitioned(
    fn: Callable[..., Any],
    args: Tuple[Any, ...],
    batch_dims: Sequence[Optional[int]],
    out_batch_dims: Sequence[int] = (0,),
):
    """Invoke `fn(*args)` such that it partitions over the mesh along the
    batch dimension.

    `batch_dims` has one entry per positional arg: the index of that
    arg's batch dimension, or None for args (or whole weight pytrees)
    that are batch-free and must be replicated. `fn` must derive all its
    internal sizes/constants from argument shapes and static config only
    — it is re-traced with the per-device LOCAL batch inside the
    partitioner.

    `out_batch_dims` has one entry per result: the batch dimension index
    of that result. With one entry `fn` must return a single array (and
    so does the wrapper); with several, a tuple.
    """
    multi = len(out_batch_dims) != 1
    if not _enabled():
        return fn(*args)

    flat_args, treedef = jax.tree.flatten(tuple(args))
    leaf_dims: list = []
    for a, bd in zip(args, batch_dims):
        leaf_dims.extend([bd] * len(jax.tree.leaves(a)))

    def flat_fn(*flat):
        return fn(*jax.tree.unflatten(treedef, flat))

    # hoist trace-time constants (np-derived segment matrices etc.) into
    # explicit replicated operands — custom_partitioning rejects jaxprs
    # with consts
    closed = jax.make_jaxpr(flat_fn)(*flat_args)
    if len(closed.jaxpr.outvars) != len(out_batch_dims):
        raise ValueError(
            f"fn returned {len(closed.jaxpr.outvars)} arrays but "
            f"out_batch_dims names {len(out_batch_dims)}")
    consts = list(closed.consts)
    n_c = len(consts)
    all_flat = consts + list(flat_args)
    all_dims = [None] * n_c + leaf_dims

    def replay(*operands):
        outs = jax.core.eval_jaxpr(closed.jaxpr, operands[:n_c],
                                   *operands[n_c:])
        return tuple(outs) if multi else outs[0]

    def local_fn(*operands):
        # per-shard lowering: retrace at local shapes; fn regenerates its
        # (batch-independent) constants, the passed consts are unused
        return flat_fn(*operands[n_c:])

    # ---- einsum-like Shardy rule: one shared factor "b" for every batch
    # dim, a fresh factor for everything else ----
    nf = 0

    def term_for(ndim: int, bd: Optional[int]) -> str:
        nonlocal nf
        assert ndim > 0, "scalar operands unsupported"
        dims = []
        for d in range(ndim):
            if bd is not None and d == bd:
                dims.append("b")
            else:
                dims.append(f"f{nf}")
                nf += 1
        return " ".join(dims)

    terms = [term_for(x.ndim, bd) for x, bd in zip(all_flat, all_dims)]
    out_terms = [term_for(ov.aval.ndim, obd)
                 for ov, obd in zip(closed.jaxpr.outvars, out_batch_dims)]
    rule = ", ".join(terms) + " -> " + ", ".join(out_terms)

    def _batch_axis(arg_shapes):
        """The mesh axis (name or tuple) the batch is sharded over, from
        the first batched operand that carries one."""
        for leaf, bd in zip(arg_shapes, all_dims):
            if bd is None:
                continue
            spec = getattr(getattr(leaf, "sharding", None), "spec", None)
            if spec and len(spec) > bd and spec[bd] is not None:
                return spec[bd]
        return None

    def _spec(ax, ndim: int, bd: Optional[int]) -> P:
        if ax is None or bd is None:
            return P()
        s: list = [None] * ndim
        s[bd] = ax
        return P(*s)

    def partition(mesh, arg_shapes, result_shape):
        ax = _batch_axis(arg_shapes)
        arg_sh = tuple(
            NamedSharding(mesh, _spec(ax, leaf.ndim, bd))
            for leaf, bd in zip(arg_shapes, all_dims))
        if multi:
            out_sh = tuple(
                NamedSharding(mesh, _spec(ax, r.ndim, obd))
                for r, obd in zip(result_shape, out_batch_dims))
        else:
            out_sh = NamedSharding(
                mesh, _spec(ax, result_shape.ndim, out_batch_dims[0]))
        return mesh, local_fn, out_sh, arg_sh

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        # GSPMD (non-Shardy) fallback; under Shardy the rule is used
        ax = _batch_axis(arg_shapes)
        if multi:
            return tuple(NamedSharding(mesh, _spec(ax, r.ndim, obd))
                         for r, obd in zip(shape, out_batch_dims))
        return NamedSharding(mesh, _spec(ax, shape.ndim, out_batch_dims[0]))

    wrapped = custom_partitioning(replay)
    wrapped.def_partition(
        partition=partition, sharding_rule=rule,
        infer_sharding_from_operands=infer_sharding_from_operands)
    return wrapped(*all_flat)
