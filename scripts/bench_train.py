#!/usr/bin/env python
"""Training-step throughput for the flagship RDM (395M-param U-Net).

Measures samples/sec of the full jitted train step (fwd + bwd + AdamW +
EMA) at the released operating point (64x64x3 latents, k=4 neighbors).

    python scripts/bench_train.py [--batch 16] [--remat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get("JAX_COMPILE_CACHE_DIR", "/tmp/rdm_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="rdm",
                   choices=["rdm", "rarm"],
                   help="rdm: 395M U-Net diffusion step; rarm: 170M AR "
                        "transformer CE step")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--remat", action="store_true", default=True)
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--policy", type=str, default="dots",
                   choices=["dots", "nothing", "dots_no_batch",
                            "save_lowres"])
    p.add_argument("--mu_dtype", type=str, default=None,
                   choices=[None, "bfloat16"],
                   help="Adam first-moment storage dtype")
    p.add_argument("--fused_opt", action="store_true",
                   help="flattened single-vector Adam/EMA update "
                        "(optax.flatten — see make_optimizer)")
    p.add_argument("--pipelined", action="store_true",
                   help="sync once at the end (steady-state trainer "
                        "shape) instead of per step")
    opt = p.parse_args()

    # bounded wait through total tunnel outages (bench.py rationale)
    from rdm_tpu.utils.device_gate import wait_for_backend
    gate = wait_for_backend()
    if not gate["ok"]:
        print(json.dumps({"metric": "rdm_train_samples_per_sec_per_chip",
                          "value": None, "unit": "samples/sec",
                          "degraded": True,
                          "error": "tpu backend unavailable",
                          "backend_wait_s": gate["waited_s"]}))
        return

    from rdm_tpu.training.optim import make_optimizer
    from rdm_tpu.training.train_state import (
        init_train_state,
        make_rarm_train_step,
        make_train_step,
    )

    B = opt.batch
    rng = np.random.default_rng(0)

    def synth(shapes):
        return jax.tree.map(
            lambda s: jnp.asarray(
                ((rng.random(s.shape, dtype=np.float32) - 0.5) * 0.05
                 if s.ndim >= 2 else np.zeros(s.shape, np.float32)),
                dtype=s.dtype), shapes)

    tx = make_optimizer(1e-4, warm_up_steps=100, mu_dtype=opt.mu_dtype,
                        fused_update=opt.fused_opt)
    if opt.model == "rdm":
        from rdm_tpu.models.rdm import RDM, RDMConfig
        from rdm_tpu.ops.schedules import DiffusionSchedule

        cfg = RDMConfig.imagenet()
        model = RDM(cfg, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 64, 64, 3))
        params = synth(jax.eval_shape(
            model.init, jax.random.PRNGKey(0), x,
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, 512))))
        schedule = DiffusionSchedule.create(
            cfg.timesteps, cfg.beta_schedule, cfg.linear_start,
            cfg.linear_end)
        step = make_train_step(model, tx, schedule, remat=opt.remat,
                               remat_policy=opt.policy)
        z = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 3))
        nns = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 4, 512))
    else:
        from rdm_tpu.models.rarm import RARM, RARMConfig

        cfg = RARMConfig.imagenet_dogs()
        model = RARM(cfg, dtype=jnp.bfloat16)
        params = synth(jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.seq_len), jnp.int32),
            jnp.zeros((1, 4, cfg.context_dim))))
        step = make_rarm_train_step(model, tx, p_mask_max=0.1)
        z = jax.random.randint(jax.random.PRNGKey(1), (B, cfg.seq_len),
                               0, cfg.out_vocab)
        nns = jax.random.normal(jax.random.PRNGKey(2),
                                (B, 4, cfg.context_dim))
    state = init_train_state(params, tx)
    key = jax.random.PRNGKey(3)

    print("compiling train step...", flush=True)
    t0 = time.perf_counter()
    from rdm_tpu.utils.aot import abstract

    exe = step.lower(abstract(state), abstract(z), abstract(nns),
                     abstract(key)).compile()
    step = exe
    state, metrics = step(state, z, nns, key)
    np.asarray(metrics["loss"])
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)

    # BENCH_DUMP_HLO=<path>: compiled post-optimization HLO of the exact
    # benched step, for scripts/analyze_trace_hlo.py fusion-id mapping
    hlo_path = os.environ.get("BENCH_DUMP_HLO")
    if hlo_path:
        try:
            with open(hlo_path, "w") as f:
                f.write(exe.as_text())
            print(f"# compiled HLO -> {hlo_path}", flush=True)
        except OSError as e:
            print(f"# BENCH_DUMP_HLO write failed ({e}); continuing",
                  flush=True)

    # BENCH_PROFILE_DIR: trace ONE warm train step and print the per-op
    # device-time breakdown (same hook as bench.py — runs on the exact
    # benched path, standalone profile scripts have wedged the tunnel)
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, metrics = step(state, z, nns, key)
            np.asarray(metrics["loss"])
        from rdm_tpu.utils.profiling import trace_op_breakdown
        res = trace_op_breakdown(profile_dir, top=30)
        print(f"# trace total_ms={res['total_ms']} -> {profile_dir}",
              flush=True)

    # >=3 independent windows, best reported; extra windows retried on a
    # transient sag so one tunnel hiccup doesn't poison the capture (same
    # contract as bench.py).
    windows = int(os.environ.get("BENCH_WINDOWS", 3))
    trials = []

    def time_window():
        nonlocal state
        t0 = time.perf_counter()
        if opt.pipelined:
            # steady-state trainer shape: async dispatch runs ahead (the
            # train loop keeps a host-side step counter, no per-step
            # sync); one sync at the end amortizes dispatch latency
            for _ in range(opt.iters):
                state, metrics = step(state, z, nns, key)
            np.asarray(metrics["loss"])
        else:
            for _ in range(opt.iters):
                state, metrics = step(state, z, nns, key)
                np.asarray(metrics["loss"])  # forced sync per step
        dt = (time.perf_counter() - t0) / opt.iters
        trials.append(round(B / dt, 3))
        print(f"# window {len(trials)}: {trials[-1]} samples/s", flush=True)

    def best_n_spread():
        # top-2 minimum so BENCH_WINDOWS=1 can't zero out the retry loop
        # and the degraded verdict (advisor fix)
        top = sorted(trials, reverse=True)[:max(windows, 2)]
        return round((max(top) - min(top)) / max(top), 4)

    for _ in range(windows):
        time_window()
    extra = 0
    while best_n_spread() > 0.25 and extra < 2:
        time_window()
        extra += 1
    best = max(trials)

    # MFU: XLA cost-analysis FLOPs of the compiled step (fwd + bwd + AdamW
    # + EMA, CFG-free training forward) against the v5e bf16 peak. With
    # remat the executed-FLOPs count includes the recomputation, so MFU is
    # over EXECUTED work (same convention as bench.py serving MFU).
    mfu = flops_per_sample = None
    try:
        step_flops = exe.cost_analysis()["flops"]
        flops_per_sample = step_flops / B
        mfu = best * flops_per_sample / 197e12
        print(f"# flops/sample={flops_per_sample:.3e} v5e_mfu={mfu:.2%}",
              flush=True)
    except Exception as e:  # remote cost analysis can transiently drop
        print(f"# cost analysis unavailable: {e}", flush=True)
    print(json.dumps({
        "metric": f"{opt.model}_train_samples_per_sec_per_chip",
        "value": best,
        "unit": "samples/sec",
        "step_ms": round(B / best * 1e3, 2),
        "batch": B,
        "remat": opt.remat,
        "pipelined": opt.pipelined,
        "fused_opt": opt.fused_opt,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_sample": flops_per_sample,
        "trials": trials,
        "spread": best_n_spread(),
        "spread_all": round((max(trials) - min(trials)) / max(trials), 4),
        "degraded": best_n_spread() > 0.25,
    }))


if __name__ == "__main__":
    main()
