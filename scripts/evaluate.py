#!/usr/bin/env python
"""Evaluation CLI: FID + precision/recall between two image directories.

    # paper-protocol Inception-feature FID (torch-fidelity semantics):
    python scripts/evaluate.py --real real_dir --generated sample_dir \\
        --features inception --inception_ckpt pt_inception-2015-12-05.pth
    # CLIP-feature FID (the reference's FFHQ rows, README.md:155-157):
    python scripts/evaluate.py --real real_dir --generated sample_dir \\
        --features clip --clip_ckpt models/clip/ViT-B-32.pt

--features inception uses the FID InceptionV3 pool3 trunk (pytorch-fid's
pt_inception weights convert directly) so numbers are comparable to the
reference's published ImageNet FIDs; any embedder importable as
`module:function` can be substituted via --embedder.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--real", type=str, required=True)
    p.add_argument("--generated", type=str, required=True)
    p.add_argument("--features", type=str, default="clip",
                   choices=("clip", "inception"),
                   help="feature space: CLIP image tower (FFHQ protocol) "
                        "or Inception pool3 (paper ImageNet protocol)")
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="pytorch-fid pt_inception-2015-12-05 weights")
    p.add_argument("--embedder", type=str, default=None,
                   help="module:function custom embedder")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--nhood", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--out", type=str, default=None,
                   help="write metrics json here")
    return p.parse_args()


def iter_images(directory: str, size: int, limit=None):
    from rdm_tpu.data.base import load_image

    exts = ("*.png", "*.jpg", "*.jpeg", "*.JPEG", "*.webp")
    files = sorted(sum((glob.glob(os.path.join(directory, e))
                        for e in exts), []))
    if limit:
        files = files[:limit]
    if not files:
        raise SystemExit(f"no images found under {directory}")

    # native batched decode (C++ thread pool, no GIL) for jpeg/png; the
    # PIL path covers the rest (webp) and any decode failures
    from rdm_tpu.data import native_loader

    if native_loader.available() and not any(
            f.endswith(".webp") for f in files):
        chunk = 64
        for i in range(0, len(files), chunk):
            batch = files[i:i + chunk]
            imgs, status = native_loader.load_batch(batch, size)
            for j, f in enumerate(batch):
                yield (imgs[j] if status[j] == 0
                       else load_image(f, size=size))
        return
    for f in files:
        yield load_image(f, size=size)


def main():
    opt = parse_args()
    from rdm_tpu.eval.metrics import evaluate_features, features_from_images

    if opt.embedder:
        mod, fn = opt.embedder.split(":")
        import importlib

        embedder = getattr(importlib.import_module(mod), fn)
    elif opt.features == "inception":
        if not opt.inception_ckpt:
            raise SystemExit("--features inception needs --inception_ckpt")
        from rdm_tpu.models.inception import InceptionEmbedder
        from rdm_tpu.utils.torch_convert import (
            convert_inception, load_torch_state_dict)
        embedder = InceptionEmbedder(
            convert_inception(load_torch_state_dict(opt.inception_ckpt)))
    elif opt.clip_ckpt:
        from rdm_tpu.models.retrievers import ClipImageRetriever
        from rdm_tpu.utils.torch_convert import (
            convert_clip, load_torch_state_dict)
        params, cfg = convert_clip(load_torch_state_dict(opt.clip_ckpt))
        embedder = ClipImageRetriever(params, cfg)
    else:
        raise SystemExit("need --clip_ckpt, --inception_ckpt, or "
                         "--embedder")

    real = features_from_images(
        iter_images(opt.real, opt.size, opt.max_images), embedder,
        opt.batch_size)
    gen = features_from_images(
        iter_images(opt.generated, opt.size, opt.max_images), embedder,
        opt.batch_size)
    metrics = evaluate_features(real, gen, nhood_size=opt.nhood)
    print(json.dumps(metrics))
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
