"""Quality gate for approximate serving modes: int8 U-Net and
encoder-reuse.

Runs the exact bf16 sampler and each requested approximate mode on
IDENTICAL seeds/noise, then reports per-step pred_x0 cosine, final
latent/image PSNR, and (with CLIP weights) perceptual similarity —
the data users need to choose a mode (VERDICT r3 #1/#5). Also writes a
side-by-side PNG grid (exact row on top, one row per mode).

The reference has no approximate serving modes to gate
(/root/reference/rdm/models/diffusion/ddim.py is one fp32 path);
this harness exists because the TPU framework adds them.

Examples (real checkpoints):
  python scripts/quality_eval.py --model_path models/rdm/imagenet \
      --database db/imagenet --modes int8,reuse2,reuse3,reuse5
Air-gapped smoke (random weights — mechanics + relative envelopes only;
quality numbers on random weights are NOT release evidence, re-run on a
converted checkpoint):
  python scripts/quality_eval.py --model_path models/rdm/imagenet \
      --random_init --database <synth db> --modes int8,reuse2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--database", type=str, default=None)
    p.add_argument("--nn_memory", type=str, default=None)
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="adds CLIP image-image similarity to the report")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--randomize_head", action="store_true",
                   help="with --random_init: replace the zero-init eps "
                        "head with random values so every serving mode "
                        "produces non-degenerate trajectories (zero "
                        "eps makes all modes trivially bit-identical)")
    p.add_argument("--modes", type=str, default="int8,reuse2,reuse3,reuse5",
                   help="comma list: int8, reuseN, int8+reuseN")
    p.add_argument("-bs", "--batch_size", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--k_nn", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="out/quality_eval",
                   help="report JSON + PNG grid directory")
    return p.parse_args()


def main():
    opt = parse_args()
    os.makedirs(opt.out, exist_ok=True)
    import jax.numpy as jnp

    from rdm_tpu.eval.fidelity import compare_runs
    from rdm_tpu.pipeline import RDMPipeline

    pipe = RDMPipeline.from_model_dir(
        opt.model_path, database=opt.database, nn_memory=opt.nn_memory,
        clip_ckpt=opt.clip_ckpt, random_init=opt.random_init)
    if opt.randomize_head:
        # zero-init modules by NAME (numeric zero-checks would sync one
        # device read per leaf through the tunnel): the eps head and the
        # residual/proj zero-convs, so every block contributes and the
        # serving modes produce non-degenerate trajectories
        import jax
        import jax.tree_util as jtu

        zero_named = ("out_conv", "conv2", "proj_out")

        def randomize(path, p):
            names = {getattr(k, "key", None) for k in path}
            if getattr(p, "ndim", 0) < 2 or not names & set(zero_named) \
                    or "bias" in {getattr(k, "key", None) for k in path}:
                return p
            key = jax.random.PRNGKey(hash(str(path)) % (2 ** 31))
            return (jax.random.normal(key, p.shape) * 0.02).astype(p.dtype)

        pipe.params = jax.jit(lambda t: jtu.tree_map_with_path(
            randomize, t))(pipe.params)
    if pipe.retrieval is None:
        raise SystemExit("quality_eval needs a database (fixed neighbor "
                         "batch)")
    rng = np.random.default_rng(opt.seed)
    q_emb = pipe.retrieval.sample_query_embeddings(
        opt.batch_size, 0.01, False, rng)
    found = pipe.retrieval.engine.search(jnp.asarray(q_emb), k=opt.k_nn)
    neighbors = np.asarray(found["embeddings"], np.float32)

    common = dict(steps=opt.steps, guidance_scale=opt.guidance_scale,
                  seed=opt.seed)
    print("running exact bf16 baseline...", flush=True)
    exact = pipe.fidelity_run(neighbors, **common)

    report = {
        "model_path": opt.model_path,
        "random_init": opt.random_init,
        "weights": "random-synthetic" if opt.random_init else "checkpoint",
        "batch": opt.batch_size, "steps": opt.steps,
        "guidance_scale": opt.guidance_scale, "seed": opt.seed,
        "modes": {},
    }
    rows = [exact["images"]]
    row_names = ["exact_bf16"]
    for mode in [m.strip() for m in opt.modes.split(",") if m.strip()]:
        print(f"running mode {mode}...", flush=True)
        # modes: "int8", "reuseN", or combined "int8+reuseN"
        parts = set(mode.split("+"))
        int8 = "int8" in parts
        parts.discard("int8")
        reuse = 1
        if parts:
            (r,) = parts
            if not r.startswith("reuse"):
                raise SystemExit(f"unknown mode '{mode}'")
            reuse = int(r[5:])
        var = pipe.fidelity_run(neighbors, int8=int8,
                                encoder_reuse=reuse, **common)
        report["modes"][mode] = compare_runs(
            exact, var, clip_model=pipe.clip, clip_params=pipe.clip_params)
        rows.append(var["images"])
        row_names.append(mode)
        print(f"# {mode}: {json.dumps({k: v for k, v in report['modes'][mode].items() if k != 'pred_x0_cosine_per_step'})}",
              flush=True)

    with open(os.path.join(opt.out, "quality_report.json"), "w") as f:
        json.dump(report, f, indent=2)

    # side-by-side grid: one row per mode, exact on top
    from PIL import Image
    grid = np.concatenate(
        [np.concatenate(list(r), axis=1) for r in rows], axis=0)
    Image.fromarray(grid).save(os.path.join(opt.out, "quality_grid.png"))
    print(f"report + grid written to {opt.out}", flush=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "pred_x0_cosine_per_step"}
                      for k, v in report["modes"].items()}))


if __name__ == "__main__":
    main()
