"""Backend-availability gate for benchmark entry points.

The axon TPU tunnel can be FULLY down for an hour or more
(`Unable to initialize backend 'axon': UNAVAILABLE` — observed 3 h on
2026-08-17). A bench that touches a device op during such a window dies
with a traceback and the driver records nothing for the round. This gate
runs BEFORE any in-process device op:

- probes in a SUBPROCESS (a failed backend init inside this process is
  cached by jax's xla_bridge, so an in-process retry can never recover);
- bounded wait (`BENCH_BACKEND_WAIT_S`, default 2 h) with a fixed sleep
  between attempts;
- returns a self-describing dict the caller can fold into its JSON line
  (`ok`, `attempts`, `waited_s`) so a capture that had to wait is
  distinguishable from one that ran immediately.

The probe itself is backend-agnostic: it only requires that jax can
initialize *some* platform and run a tiny matmul to completion. Under the
axon sitecustomize hook that means the tunnel is up; under an explicit
`JAX_PLATFORMS=cpu` run it succeeds immediately (same behavior as having
no gate).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Any, Callable, Dict, Optional

# One matmul, forced device->host copy: completes only if the backend
# initializes AND executes (tunnel half-up states hang on execute, which
# the subprocess timeout converts into a failed attempt).
_PROBE_SRC = """
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
np.asarray(jax.jit(lambda a: a @ a)(x))
print(jax.devices()[0].platform)
"""

# Health-thresholded probe: the tunnel has DEGRADED windows where it is
# "up" (init + tiny ops complete) but device->host transfers crawl for
# minutes (observed 2026-08-18: a 2048^2 matmul round trip took 50 s in a
# window where the same probe normally completes in ~6 s incl. backend
# init). A bench started in such a window wedges mid-capture, so callers
# that are about to run a LONG capture should gate on executed-op wall
# time, not mere availability. The timed section excludes backend init
# AND compilation: the tanh jit is warmed before t0 (a slow server-side
# compile is not tunnel degradation), and the persistent compile cache is
# wired via env so repeated probes hit it.
_HEALTH_PROBE_SRC = """
import os, time, jax, numpy as np, jax.numpy as jnp
os.makedirs("/tmp/rdm_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rdm_tpu_jax_cache")
x = jnp.ones((2048, 2048), jnp.bfloat16)
f = jax.jit(lambda a: jnp.tanh(a @ a))
np.asarray(f(x)[0, 0])  # init + compile + warm
t0 = time.monotonic()
np.asarray(f(x)[0, 0])  # timed: execute + transfer only
print(time.monotonic() - t0)
"""


def _backend_already_up() -> bool:
    """True if THIS process already holds the initialized jax backend it
    will actually use.

    Checks xla_bridge's backend cache without triggering initialization —
    calling jax.devices() here would be wrong twice over: during an outage
    the failed init gets cached for the life of the process, and a later
    in-process retry can never recover (the whole reason this gate probes
    in a subprocess).

    A cached CPU backend alone must NOT count when an accelerator plugin
    is registered: jax caches every platform that initializes even when
    the preferred one (axon) fails, so "some backend exists" would wave a
    TPU bench straight into a tunnel outage."""
    try:
        if "jax" not in sys.modules:
            return False
        import jax
        from jax._src import xla_bridge
        if not xla_bridge._backends:
            return False
        plats = jax.config.jax_platforms
        if plats:  # explicit platform choice (e.g. tests force "cpu")
            return plats.split(",")[0] in xla_bridge._backends
        if any(p != "cpu" for p in xla_bridge._backends):
            return True  # a real accelerator is up
        # cpu-only cache: fine only if cpu is the only registered
        # platform. Fail CLOSED if the private attr disappears in a jax
        # upgrade — falling through to the subprocess probe is just
        # slower, while waving a TPU bench into an outage loses the run.
        factories = getattr(xla_bridge, "_backend_factories", None)
        if factories is None:
            return False
        return set(factories) <= {"cpu"}
    except Exception:
        return False


def _subprocess_probe(timeout_s: float) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _subprocess_health_probe(timeout_s: float,
                             max_op_s: float) -> bool:
    """True only if an executed matmul round trip (excl. init) beats
    `max_op_s` — rejects degraded-but-up tunnel windows."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _HEALTH_PROBE_SRC],
            timeout=timeout_s, capture_output=True, text=True)
        if r.returncode != 0:
            return False
        op_s = float(r.stdout.strip().splitlines()[-1])
        if op_s > max_op_s:
            print(f"# backend degraded: probe op {op_s:.2f}s > "
                  f"{max_op_s:.2f}s", flush=True)
            return False
        return True
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return False


def wait_for_backend(
    max_wait_s: Optional[float] = None,
    probe_timeout_s: float = 240.0,
    sleep_s: float = 120.0,
    max_op_s: Optional[float] = None,
    _probe: Optional[Callable[[float], bool]] = None,
) -> Dict[str, Any]:
    """Block until the jax backend can execute, or the budget runs out.

    Returns {"ok", "attempts", "waited_s"}. `max_wait_s` defaults to
    env `BENCH_BACKEND_WAIT_S` (seconds, default 7200). `_probe` is a
    test seam; production uses the subprocess probe above.

    `max_op_s` additionally requires an executed 2048^2-matmul round trip
    (excluding backend init) to beat that wall time, so callers about to
    start a long capture can wait out DEGRADED windows (tunnel up, but
    transfers crawling — observed 50 s for the ~0.1 s-good-state probe),
    not just total outages. Note: with `max_op_s` the in-process
    fast-path is skipped — a cached backend says nothing about current
    tunnel speed.
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_BACKEND_WAIT_S", 7200))
    if _probe is None and max_op_s is None and _backend_already_up():
        return {"ok": True, "attempts": 0, "waited_s": 0.0}
    if _probe is None and max_op_s is not None:
        probe = lambda t: _subprocess_health_probe(t, max_op_s)
    else:
        probe = _probe or _subprocess_probe
    start = time.monotonic()
    attempts = 0
    while True:
        attempts += 1
        if probe(probe_timeout_s):
            return {"ok": True, "attempts": attempts,
                    "waited_s": round(time.monotonic() - start, 1)}
        waited = time.monotonic() - start
        if waited + sleep_s > max_wait_s:
            return {"ok": False, "attempts": attempts,
                    "waited_s": round(waited, 1)}
        print(f"# backend unavailable (attempt {attempts}, "
              f"{waited:.0f}s/{max_wait_s:.0f}s); retrying in "
              f"{sleep_s:.0f}s", flush=True)
        time.sleep(sleep_s)
