"""Profiling / timing harness (SURVEY.md §5.1).

The reference's observability is ad-hoc wall-clock prints
(/root/reference/rdm/data/retrieval_dataset/dsetbuilder.py:353-437,
main.py:658-678). Here:

- `trace(logdir)`: context manager around `jax.profiler` — produces a
  TensorBoard-loadable trace of device execution (the real tool for
  finding HBM-bandwidth or MXU-underutilization problems on TPU).
- `Timer` / `benchmark`: block_until_ready-correct wall timing for jitted
  callables (compile excluded via warmup).
- `device_memory_stats`: per-device HBM usage (the CUDACallback peak-memory
  analog, main.py:658-678).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall timer with block_until_ready semantics."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def time(self, result_to_block: Any = None):
        start = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.total += time.perf_counter() - start
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def benchmark(fn: Callable, *args, warmup: int = 1, iters: int = 5,
              **kwargs) -> Dict[str, float]:
    """Time a (typically jitted) callable; returns seconds statistics.
    Warmup runs absorb compilation."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"mean_s": sum(times) / len(times), "min_s": times[0],
            "p50_s": times[len(times) // 2], "max_s": times[-1],
            "iters": iters}


def device_memory_stats(device: Optional[jax.Device] = None
                        ) -> Dict[str, int]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {k: int(v) for k, v in stats.items()
            if isinstance(v, (int, float))}
