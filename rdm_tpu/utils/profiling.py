"""Profiling / timing harness (SURVEY.md §5.1).

The reference's observability is ad-hoc wall-clock prints
(/root/reference/rdm/data/retrieval_dataset/dsetbuilder.py:353-437,
main.py:658-678). Here:

- `trace(logdir)`: context manager around `jax.profiler` — produces a
  TensorBoard-loadable trace of device execution (the real tool for
  finding HBM-bandwidth or MXU-underutilization problems on TPU).
- `trace_op_breakdown(logdir)`: parse that trace into a per-op time
  table without TensorBoard — the workhorse behind every kernel
  decision in this repo (the round-2 "pointwise 50%" misread was
  corrected by exactly this breakdown, COVERAGE.md "performance").
- `Timer` / `benchmark`: block_until_ready-correct wall timing for jitted
  callables (compile excluded via warmup).
- `device_memory_stats`: per-device HBM usage (the CUDACallback peak-memory
  analog, main.py:658-678).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Any, Callable, Dict, List, Optional

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


# Runtime/wrapper events that are not compute ops. TPU device lanes emit
# fused-op names directly; the CPU backend interleaves thunk events with
# PjRt runtime bookkeeping and paired "end: <op>" markers.
_TRACE_NOISE = re.compile(
    r"^(jit_|while|end: |PjRt|Pjit|CommonPjRt|ParseArguments|"
    r"Handle inputs|ThreadpoolListener|ThunkExecutor|XLA launch)")
_DEVICE_PIDS = re.compile(r"TPU|GPU|/device:|/host:")


def trace_op_breakdown(logdir: str,
                       device_pattern: str = "",
                       top: int = 0) -> Dict[str, Any]:
    """Summarize the newest trace under `logdir` into per-op device time.

    Groups `ph == "X"` events from device process lanes by base op name
    (trailing HLO instance ids stripped), so e.g. all `fusion.123` variants
    aggregate into one `fusion` row. Returns
    `{"total_ms", "ops": [{name, ms, count, frac}, ...], "trace_path"}`,
    ops sorted by time; `top > 0` also pretty-prints that many rows.

    Works on both TPU traces (device lanes carry fused-op names) and the
    CPU backend (thunk events under /host:CPU), so breakdown-based tests
    and offline analysis run without TPU access.
    """
    paths = sorted(
        glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    dev_pat = re.compile(device_pattern) if device_pattern else _DEVICE_PIDS
    pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and dev_pat.search(e["args"].get("name", ""))
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e["name"]
        if _TRACE_NOISE.match(name):
            continue
        d = e.get("dur", 0)
        total += d
        base = re.sub(r"[.\d]+$", "", name)
        dur[base] += d
        cnt[base] += 1
    ops: List[Dict[str, Any]] = [
        {"name": n, "ms": us / 1e3, "count": cnt[n],
         "frac": (us / total if total else 0.0)}
        for n, us in dur.most_common()
    ]
    out = {"total_ms": total / 1e3, "ops": ops, "trace_path": paths[-1]}
    if top:
        print(f"total device op time {out['total_ms']:.2f} ms "
              f"({paths[-1]})")
        for row in ops[:top]:
            print(f"{row['frac'] * 100:6.2f}%  {row['ms']:9.3f} ms  "
                  f"n={row['count']:6d}  {row['name']}")
    return out


def device_memory_stats(device: Optional[jax.Device] = None
                        ) -> Dict[str, int]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {k: int(v) for k, v in stats.items()
            if isinstance(v, (int, float))}
