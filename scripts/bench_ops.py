#!/usr/bin/env python
"""Op-level microbenchmarks on the current backend: attention (XLA vs the
fused Pallas flash kernel) at the U-Net's hot shapes, and exact-kNN search
throughput at reference database scales.

    python scripts/bench_ops.py [--knn_rows 1281280]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_attention(batch: int, seq: int, heads: int, head_dim: int,
                    dtype=jnp.bfloat16) -> dict:
    from rdm_tpu.ops.attention import dot_product_attention
    from rdm_tpu.utils.profiling import benchmark

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((batch, seq, heads, head_dim)), dtype=dtype)
    q, k, v = mk(), mk(), mk()
    out = {}
    for impl in ("xla", "pallas"):
        try:
            fn = jax.jit(lambda q, k, v, impl=impl: dot_product_attention(
                q, k, v, impl=impl))
            stats = benchmark(fn, q, k, v, warmup=2, iters=10)
            flops = 4 * batch * heads * seq * seq * head_dim
            out[impl] = {
                "ms": round(stats["min_s"] * 1e3, 4),
                "tflops": round(flops / stats["min_s"] / 1e12, 2),
            }
        except Exception as e:  # pallas unsupported on this backend
            out[impl] = {"error": str(e)[:120]}
    return out


def bench_knn(rows: int, dim: int, batch: int, k: int) -> dict:
    from rdm_tpu.retrieval.database import DataPool
    from rdm_tpu.retrieval.engine import RetrievalEngine, l2_normalize
    from rdm_tpu.utils.profiling import benchmark

    emb = np.random.default_rng(0).standard_normal(
        (rows, dim)).astype(np.float32)
    pool = DataPool(embeddings=emb)
    eng = RetrievalEngine(pool)
    q = l2_normalize(jnp.asarray(emb[:batch]))
    fn = jax.jit(lambda q: eng._search(eng.db_norm, q, k=k))
    stats = benchmark(fn, q, warmup=1, iters=5)
    return {
        "ms": round(stats["min_s"] * 1e3, 3),
        "queries_per_sec": round(batch / stats["min_s"], 1),
        "gb_scanned_per_sec": round(
            rows * dim * 2 / stats["min_s"] / 1e9, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--knn_rows", type=int, default=1_281_280)
    p.add_argument("--skip_knn", action="store_true")
    opt = p.parse_args()
    results = {"device": str(jax.devices()[0])}
    # the U-Net's hottest self-attention: 32x32 latent grid, 6 heads of 32
    # at ch=192 (ds=2 level of the ImageNet RDM config)
    results["attn_1024tok_h6_d32_b16"] = bench_attention(16, 1024, 6, 32)
    results["attn_256tok_h18_d32_b16"] = bench_attention(16, 256, 18, 32)
    if not opt.skip_knn:
        results["knn_imagenet_db_b8_k4"] = bench_knn(
            opt.knn_rows, 512, 8, 4)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
