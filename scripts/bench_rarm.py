#!/usr/bin/env python
"""RARM decode throughput: flagship transformer (depth 18, width 768,
256 tokens) with the KV-cached scan, vs the reference's full-prefix
re-forward cost model (transformer.py:241-268 recomputes every position
every step — ~129x the attention/MLP positions of a cached decode).

    python scripts/bench_rarm.py [--batch 16] [--cfg]
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
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--k_nn", type=int, default=4)
    p.add_argument("--cfg", action="store_true",
                   help="guidance 2.0 (doubles the decode batch)")
    p.add_argument("--approx_top_k", action="store_true",
                   help="approx_max_k top-k threshold (skips the full sort)")
    p.add_argument("--int8_weights", action="store_true",
                   help="int8 weight-only serving mode (fused path only)")
    p.add_argument("--int8_kv", action="store_true",
                   help="int8 KV-cache serving mode (fused path only)")
    opt = p.parse_args()

    # bounded wait through total tunnel outages (bench.py rationale)
    from rdm_tpu.utils.device_gate import wait_for_backend
    gate = wait_for_backend()
    if not gate["ok"]:
        print(json.dumps({"metric": "rarm_decode_images_per_sec_per_chip",
                          "value": None, "unit": "images/sec",
                          "degraded": True,
                          "error": "tpu backend unavailable",
                          "backend_wait_s": gate["waited_s"]}))
        return

    from rdm_tpu.models.rarm import (RARM, RARMConfig, sample_tokens,
                                     sample_tokens_fused,
                                     use_fused_decode_default)
    from rdm_tpu.pipeline import cast_params_for_inference

    cfg = RARMConfig.imagenet_dogs()
    model = RARM(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, opt.k_nn, cfg.context_dim)))
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            ((rng.random(s.shape, dtype=np.float32) - 0.5) * 0.05
             if s.ndim >= 2 else np.zeros(s.shape, np.float32)),
            dtype=s.dtype), shapes)
    params = cast_params_for_inference(params)

    neighbors = jnp.asarray(
        rng.random((opt.batch, opt.k_nn, cfg.context_dim),
                   dtype=np.float32))
    guidance = 2.0 if opt.cfg else 1.0

    sampler = (sample_tokens_fused if use_fused_decode_default()
               else sample_tokens)
    extra = {}
    if opt.int8_weights:
        assert sampler is sample_tokens_fused, "int8 needs the fused path"
        extra["int8_weights"] = True
    if opt.int8_kv:
        assert sampler is sample_tokens_fused, "int8_kv needs the fused path"
        extra["int8_kv"] = True
    jitted = jax.jit(lambda p, n, r: sampler(
        model, p, n, r, guidance_scale=guidance,
        approx_top_k=opt.approx_top_k, **extra))
    print(f"decode path: {sampler.__name__}", flush=True)
    print("compiling decode loop...", flush=True)
    t0 = time.perf_counter()
    from rdm_tpu.utils.aot import abstract

    key0 = jax.random.PRNGKey(1)
    exe = jitted.lower(abstract(params), abstract(neighbors),
                       abstract(key0)).compile()
    fn = exe
    np.asarray(fn(params, neighbors, key0))
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)

    # device->host copy per run forces a true sync: block_until_ready has
    # been observed to return early through the remote-dispatch tunnel.
    # >=3 independent windows, best reported (peak capability); one extra
    # window retried per transient sag so a single tunnel hiccup doesn't
    # poison the capture (same contract as bench.py).
    runs = 3
    windows = int(os.environ.get("BENCH_WINDOWS", 3))
    max_extra = 2
    trials = []

    def time_window(w):
        t0 = time.perf_counter()
        for i in range(runs):
            np.asarray(fn(params, neighbors,
                          jax.random.PRNGKey(2 + w * runs + i)))
        trials.append(round(opt.batch * runs / (time.perf_counter() - t0), 3))
        print(f"# window {w + 1}: {trials[-1]} img/s", flush=True)

    def best_n_spread():
        # top-2 minimum so BENCH_WINDOWS=1 can't zero out the retry loop
        # and the degraded verdict (advisor fix)
        top = sorted(trials, reverse=True)[:max(windows, 2)]
        return round((max(top) - min(top)) / max(top), 4)

    for w in range(windows):
        time_window(w)
    # `extra_used` — NOT `extra`, which is the int8 kwargs dict still
    # captured by the jitted sampler lambda (advisor fix: rebinding it
    # would crash any future retrace with a non-mapping **)
    extra_used = 0
    while best_n_spread() > 0.25 and extra_used < max_extra:
        time_window(windows + extra_used)
        extra_used += 1
    imgs_per_sec = max(trials)
    tok_per_sec = imgs_per_sec * cfg.seq_len
    print(json.dumps({
        "metric": "rarm_ar256_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "tokens_per_sec": round(tok_per_sec, 1),
        "batch": opt.batch,
        "cfg": opt.cfg,
        "int8_weights": opt.int8_weights,
        "int8_kv": opt.int8_kv,
        "approx_top_k": opt.approx_top_k,
        "trials": trials,
        "spread": best_n_spread(),
        "spread_all": round((max(trials) - min(trials)) / max(trials), 4),
        "degraded": best_n_spread() > 0.25,
    }))


if __name__ == "__main__":
    main()
