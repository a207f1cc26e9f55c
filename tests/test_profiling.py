"""Tests for the profiling harness (SURVEY.md §5.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.utils.profiling import (benchmark, trace, trace_op_breakdown)


def test_benchmark_returns_stats():
    f = jax.jit(lambda a: a @ a)
    x = jnp.ones((64, 64))
    stats = benchmark(f, x, warmup=1, iters=3)
    assert stats["iters"] == 3
    assert 0 < stats["min_s"] <= stats["mean_s"] <= stats["max_s"]


def test_trace_op_breakdown(tmp_path):
    """The trace parser must surface the matmul from a traced jitted fn
    on the CPU backend (thunk events under /host:CPU)."""
    f = jax.jit(lambda a, b: jnp.tanh(a @ b) @ b)
    x = jnp.ones((256, 256))
    y = jnp.ones((256, 256))
    np.asarray(f(x, y))  # compile outside the trace
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        out = f(x, y)
        np.asarray(out)
    summary = trace_op_breakdown(logdir)
    assert summary["total_ms"] > 0
    names = [row["name"] for row in summary["ops"]]
    assert any("dot" in n or "fusion" in n for n in names), names
    # runtime noise is filtered out of the table
    assert not any(n.startswith(("end: ", "PjRt")) for n in names)
    fracs = [row["frac"] for row in summary["ops"]]
    assert abs(sum(fracs) - 1.0) < 1e-6
