"""wait_for_backend: bounded retry through total backend outages."""

import time

from rdm_tpu.utils.device_gate import wait_for_backend


def test_immediate_success_single_probe():
    calls = []
    out = wait_for_backend(max_wait_s=10.0, sleep_s=0.01,
                           _probe=lambda t: calls.append(t) or True)
    assert out["ok"] and out["attempts"] == 1
    assert calls == [240.0]  # default probe timeout forwarded


def test_recovers_after_outage():
    state = {"n": 0}

    def probe(_):
        state["n"] += 1
        return state["n"] >= 3

    out = wait_for_backend(max_wait_s=10.0, sleep_s=0.0, _probe=probe)
    assert out["ok"] and out["attempts"] == 3


def test_gives_up_within_budget():
    t0 = time.monotonic()
    out = wait_for_backend(max_wait_s=0.05, sleep_s=0.02,
                           _probe=lambda t: False)
    assert not out["ok"]
    assert out["attempts"] >= 1
    # never sleeps past the budget (the final sleep is skipped)
    assert time.monotonic() - t0 < 1.0


def test_fast_path_is_platform_specific(monkeypatch):
    # The in-process fast path must only trigger for the platform the
    # process will actually use: a cached CPU backend during an axon
    # tunnel outage must not wave a TPU bench through.
    import jax
    import jax.numpy as jnp
    from jax._src import xla_bridge

    from rdm_tpu.utils import device_gate as dg

    _ = jnp.zeros(1) + 1  # ensure the cpu backend is initialized
    assert dg._backend_already_up()  # conftest pins jax_platforms="cpu"
    out = wait_for_backend(max_wait_s=10.0)
    assert out["ok"] and out["attempts"] == 0

    # auto-select with an accelerator plugin registered but only cpu
    # initialized (= outage): no fast path
    jax.config.update("jax_platforms", None)
    try:
        monkeypatch.setitem(xla_bridge._backend_factories, "fake_tpu",
                            None)
        assert not dg._backend_already_up()
    finally:
        jax.config.update("jax_platforms", "cpu")
    assert dg._backend_already_up()


def test_health_threshold_skips_fast_path_and_gates_on_speed(monkeypatch):
    # max_op_s must (a) bypass the in-process cached-backend fast path —
    # a cached backend says nothing about current tunnel speed — and
    # (b) reject windows where the executed-op probe is slower than the
    # threshold.
    from rdm_tpu.utils import device_gate as dg

    # fast path would return attempts==0; with max_op_s we must probe
    op_times = iter([9.9, 9.9, 0.1])  # two degraded windows, then healthy

    def fake_health(timeout_s, max_op_s):
        return next(op_times) <= max_op_s

    monkeypatch.setattr(dg, "_subprocess_health_probe", fake_health)
    out = dg.wait_for_backend(max_wait_s=10.0, sleep_s=0.0, max_op_s=2.0)
    assert out["ok"] and out["attempts"] == 3


def test_health_probe_parses_and_thresholds(monkeypatch):
    # the real subprocess health probe on CPU: succeeds with a generous
    # threshold, fails closed with an impossible one (op time > 0).
    monkeypatch.setenv("PYTHONPATH", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from rdm_tpu.utils.device_gate import _subprocess_health_probe
    assert _subprocess_health_probe(180.0, max_op_s=120.0)
    assert not _subprocess_health_probe(180.0, max_op_s=0.0)


def test_real_probe_succeeds_on_cpu(monkeypatch):
    # the production subprocess probe must pass in the CPU test env —
    # the gate only asserts "jax can execute", not "platform is tpu".
    # Force the child onto CPU: the axon sitecustomize hook (PYTHONPATH)
    # would otherwise route it at a possibly-down tunnel.
    monkeypatch.setenv("PYTHONPATH", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from rdm_tpu.utils.device_gate import _subprocess_probe
    assert _subprocess_probe(120.0)
