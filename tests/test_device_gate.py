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


def test_real_probe_succeeds_on_cpu(monkeypatch):
    # the production subprocess probe must pass in the CPU test env —
    # the gate only asserts "jax can execute", not "platform is tpu".
    # Force the child onto CPU: the axon sitecustomize hook (PYTHONPATH)
    # would otherwise route it at a possibly-down tunnel.
    monkeypatch.setenv("PYTHONPATH", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from rdm_tpu.utils.device_gate import _subprocess_probe
    assert _subprocess_probe(120.0)
