#!/usr/bin/env python
"""Precompute per-image CLIP embeddings for a dataset split — the
reference's `rdm/data/imagenet.py.__main__` job (imagenet.py:385-435).

Writes <root>/clip_embeddings_<split>.npz with key 'embedding' [N, 512],
row-aligned with <root>/<split>_filelist.txt, which ImageNet* datasets
expose as the `clip_img_emb` query key.

    python scripts/precompute_clip_embeddings.py --root /data/imagenet \\
        --split train --clip_ckpt models/clip/ViT-B-32.pt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--clip_ckpt", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--resume", action="store_true",
                   help="continue a partial run from <out>.partial.npz")
    opt = p.parse_args()

    from rdm_tpu.data.base import load_image
    from rdm_tpu.models.retrievers import ClipImageRetriever
    from rdm_tpu.utils.torch_convert import (
        convert_clip,
        load_torch_state_dict,
    )

    with open(os.path.join(opt.root, f"{opt.split}_filelist.txt")) as f:
        rels = [l.strip() for l in f if l.strip()]
    params, cfg = convert_clip(load_torch_state_dict(opt.clip_ckpt))
    retriever = ClipImageRetriever(params, cfg)

    out_path = os.path.join(opt.root,
                            f"clip_embeddings_{opt.split}.npz")
    partial = out_path + ".partial.npz"
    chunks, done = [], 0
    if opt.resume and os.path.isfile(partial):
        prev = np.load(partial)["embedding"]
        chunks.append(prev)
        done = prev.shape[0]
        print(f"resuming at row {done}")

    from rdm_tpu.data import native_loader

    use_native = native_loader.available()
    if use_native:
        print("using the native batch image loader")

    def load_paths(paths):
        if use_native:
            imgs, status = native_loader.load_batch(paths, opt.size)
            if status.any():  # per-file PIL fallback for failures
                for j in np.nonzero(status)[0]:
                    imgs[j] = load_image(paths[j], size=opt.size)
            return imgs
        return np.stack([load_image(p, size=opt.size) for p in paths])

    batch = []
    for i, rel in enumerate(rels[done:], start=done):
        batch.append(os.path.join(opt.root, rel))
        if len(batch) == opt.batch_size or i == len(rels) - 1:
            emb = np.asarray(retriever(load_paths(batch)),
                             dtype=np.float32)
            chunks.append(emb)
            batch = []
            if (i + 1) % (opt.batch_size * 50) == 0:
                np.savez(partial,
                         embedding=np.concatenate(chunks, axis=0))
                print(f"{i + 1}/{len(rels)} embedded (checkpointed)")

    embedding = np.concatenate(chunks, axis=0)
    assert embedding.shape[0] == len(rels)
    np.savez(out_path, embedding=embedding)
    if os.path.isfile(partial):
        os.remove(partial)
    print(f"wrote {embedding.shape} -> {out_path}")


if __name__ == "__main__":
    main()
