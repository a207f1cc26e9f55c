#!/usr/bin/env python
"""Offline neighbor precompute — the reference search_neighbors.py job
(/root/reference/scripts/search_neighbors.py:380-599) on the TPU stack.

Phases:
 1. build (or load) the retrieval database: patchify db images, CLIP-embed
    on device, chunked npz save (restartable).
 2. for each n_patches_per_side in {1 .. 2^log_max_np}: iterate the query
    dataset, embed its patches, exact-kNN search, write one pickle per
    query image {n: {embeddings, img_ids, patch_coords, nn_ids}} — the
    format QueryDataset consumes at training time.
 3. write nn_paths_p<part>.p metafile + corrupts.txt + (optionally) the
    nn_memory pickle aggregated from all retrieved ids.

Job-array splitting via --parts/--part_no (reference :519-527).

    python scripts/search_neighbors.py --query_filelist q.txt \\
        --database db/ --clip_ckpt ViT-B-32.pt --out nns/ --k 20
"""

from __future__ import annotations

import argparse
import glob as globlib
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-rc", "--rconfig", type=str, default=None,
                   help="reference-schema dataset_builder YAML "
                        "(configs/dataset_builder/*.yaml): retrieval "
                        "dataset + retriever + db dir, replaces "
                        "--database/--build_filelist/--clip_ckpt")
    p.add_argument("-qc", "--qconfig", type=str, default=None,
                   help="reference-schema query_datasets YAML "
                        "(configs/query_datasets/*.yaml), replaces "
                        "--query_filelist")
    p.add_argument("--split", type=str, default="train",
                   help="which data.params split of --qconfig to query")
    p.add_argument("--query_filelist", type=str, default=None,
                   help="one image path per line (or use --qconfig)")
    p.add_argument("--query_size", type=int, default=256)
    p.add_argument("--database", type=str, default=None,
                   help="npz dir (existing db) or target dir for --build "
                        "(or use --rconfig)")
    p.add_argument("--build_filelist", type=str, default=None,
                   help="build the db from these images first")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--n_db_patches", type=int, default=2)
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="OpenAI CLIP checkpoint (required for embedding)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--log_max_np", type=int, default=0,
                   help="n_patches_per_side up to 2**log_max_np")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--parts", type=int, default=1)
    p.add_argument("--part_no", type=int, default=0)
    p.add_argument("--mode", choices=["img", "text"], default="img")
    p.add_argument("--captions", type=str, default=None,
                   help="text mode: one caption per line, aligned with "
                        "query_filelist")
    p.add_argument("--build_nn_memory", type=str, default=None,
                   help="also aggregate an nn_memory pickle here")
    p.add_argument("--random_embedder", action="store_true",
                   help="random projection instead of CLIP (smoke tests)")
    p.add_argument("--backend", choices=["device", "host"],
                   default="device",
                   help="kNN backend: TPU matmul top-k or the native C++ "
                        "host searcher")
    p.add_argument("--save_patches", action="store_true",
                   help="pass 2 (reference search_neighbors.py:564-599): "
                        "crop every retrieved neighbor from the db images "
                        "and save as PNGs + nns-{n}_patches.p metafile, so "
                        "QueryDataset(load_patches=True) needs no live "
                        "re-crop")
    return p.parse_args()


def save_nn_patches(out_dir: str, rset, n_values, k: int) -> None:
    """Pass 2: save each retrieved neighbor's pixels once as a PNG under
    nn_patches/ and write nns-{n}_patches.p mapping query idx → the k·p²
    relative paths (reference PatchSaverDataset semantics, single-process:
    grouped by retrieval image so each source image is decoded once)."""
    shards = sorted(globlib.glob(os.path.join(out_dir, "nn_paths_p*.p")))
    nn_paths = {}
    for s in shards:
        with open(s, "rb") as f:
            nn_paths.update(pickle.load(f))
    patch_dir = os.path.join(out_dir, "nn_patches")
    os.makedirs(patch_dir, exist_ok=True)
    for n in n_values:
        by_img = {}
        meta = {qid: np.full((n * n * k,), "", dtype=object)
                for qid in nn_paths}
        for qid, rel in nn_paths.items():
            with open(os.path.join(out_dir, rel), "rb") as f:
                payload = pickle.load(f)[n]
            ids = np.asarray(payload["img_ids"]).reshape(n * n, k)
            pcs = np.asarray(payload["patch_coords"]).reshape(n * n, k, -1)
            for patch_id in range(n * n):
                for nn_id in range(k):
                    by_img.setdefault(int(ids[patch_id, nn_id]), []).append(
                        (qid, patch_id, nn_id, pcs[patch_id, nn_id]))
        for img_id, uses in by_img.items():
            image = rset[img_id]["image"]
            for qid, patch_id, nn_id, coords in uses:
                x1, y1, x2, y2 = [int(v) for v in coords]
                name = (f"{img_id:09d}-patch_"
                        + "-".join(f"{c:04d}" for c in (x1, y1, x2, y2))
                        + ".png")
                relname = "nn_patches/" + name
                savepath = os.path.join(patch_dir, name)
                if not os.path.isfile(savepath):
                    patch = image[y1:y2, x1:x2]
                    arr = np.clip((patch + 1.0) * 127.5, 0, 255
                                  ).astype(np.uint8)
                    Image.fromarray(arr).save(savepath)
                meta[qid][patch_id * k + nn_id] = relname
        metafile = os.path.join(out_dir, f"nns-{n * n}_patches.p")
        with open(metafile, "wb") as f:
            pickle.dump(meta, f)
        print(f"nn patches for n={n} -> {metafile}")


def make_embedder(opt):
    if opt.random_embedder:
        rng = np.random.default_rng(0)
        projs = {}

        def embed(images):
            flat = np.asarray(images).reshape(len(images), -1)
            d = flat.shape[1]
            if d not in projs:
                projs[d] = rng.standard_normal((d, 512)
                                               ).astype(np.float32) * 0.02
            return flat @ projs[d]

        def embed_text(captions):
            out = rng.standard_normal((len(captions), 512))
            return out.astype(np.float32)

        return embed, embed_text
    if not opt.clip_ckpt:
        raise SystemExit("--clip_ckpt required (or --random_embedder)")
    from rdm_tpu.models.retrievers import ClipImageRetriever, \
        ClipTextRetriever
    from rdm_tpu.utils.torch_convert import convert_clip, \
        load_torch_state_dict
    params, cfg = convert_clip(load_torch_state_dict(opt.clip_ckpt))
    img_r = ClipImageRetriever(params, cfg)
    txt_r = ClipTextRetriever(params, cfg)
    return (lambda images: np.asarray(img_r(images))), \
        (lambda captions: np.asarray(txt_r(captions)))


def main():
    opt = parse_args()
    os.makedirs(opt.out, exist_ok=True)
    from rdm_tpu.data.base import ImagePaths, PatcherDataset
    from rdm_tpu.retrieval.builder import DatasetBuilder
    from rdm_tpu.retrieval.database import NNMemory

    embed_img, embed_txt = make_embedder(opt)

    # phase 1: database — from a reference dataset_builder YAML (-rc) or
    # from the filelist flags
    if opt.rconfig:
        from rdm_tpu.retrieval.yaml_config import builder_from_config
        builder, _ = builder_from_config(
            opt.rconfig, cli_ckpt=opt.clip_ckpt,
            embedder_override=embed_img if opt.random_embedder else None)
        if builder.pool is None and builder.patcher is None:
            raise SystemExit(f"{opt.rconfig}: no existing database at "
                             "builder.params.saved_embeddings and no "
                             "builder.params.data source to build one")
        if builder.patcher is not None:
            builder.build_data_pool()
        opt.k = builder.k  # reference searches builder.params.k neighbors
    elif opt.build_filelist:
        if not opt.database:
            raise SystemExit("--database required with --build_filelist")
        with open(opt.build_filelist) as f:
            db_paths = [l.strip() for l in f if l.strip()]
        patcher = PatcherDataset(
            ImagePaths(db_paths, size=None), patch_size=opt.patch_size,
            n_patches=opt.n_db_patches, seed=0)
        builder = DatasetBuilder(patcher, embed_img,
                                 save_dir=opt.database,
                                 batch_size=opt.batch_size, k=opt.k)
        builder.build_data_pool()
    else:
        if not opt.database:
            raise SystemExit("pass --rconfig or --database")
        builder = DatasetBuilder(save_dir=opt.database, k=opt.k)
        if builder.pool is None:
            raise SystemExit(f"no database at {opt.database}; pass "
                             "--build_filelist to create one")
    builder.train_searcher(backend=opt.backend)

    # phase 2: queries — from a reference query_datasets YAML (-qc) or a
    # filelist
    captions = None
    if opt.qconfig:
        from rdm_tpu.retrieval.yaml_config import query_dataset_from_config
        qset, cfg_k = query_dataset_from_config(opt.qconfig, opt.split)
        if cfg_k:
            opt.k = cfg_k
        n_queries = len(qset)
        if opt.mode == "text":
            raise SystemExit("--mode text needs --query_filelist + "
                             "--captions (query YAMLs are image datasets)")
    else:
        if not opt.query_filelist:
            raise SystemExit("pass --qconfig or --query_filelist")
        with open(opt.query_filelist) as f:
            q_paths = [l.strip() for l in f if l.strip()]
        if opt.mode == "text":
            assert opt.captions, "--captions required in text mode"
            with open(opt.captions) as f:
                captions = [l.rstrip("\n") for l in f]
            assert len(captions) == len(q_paths)
        qset = ImagePaths(q_paths, size=opt.query_size)
        n_queries = len(q_paths)

    indices = np.array_split(np.arange(n_queries), opt.parts)[opt.part_no]

    nn_paths = {}
    corrupts = []
    all_nn_ids = []
    n_values = [2 ** i for i in range(opt.log_max_np + 1)]
    for start in range(0, len(indices), opt.batch_size):
        idx_chunk = indices[start:start + opt.batch_size]
        per_image = {int(i): {} for i in idx_chunk}
        for n in n_values:
            patches, owners = [], []
            for i in idx_chunk:
                try:
                    img = qset[int(i)]["image"]
                except Exception:
                    corrupts.append(int(i))
                    continue
                ps = img.shape[0] // n
                for r in range(n):
                    for c in range(n):
                        patches.append(img[r * ps:(r + 1) * ps,
                                           c * ps:(c + 1) * ps])
                        owners.append(int(i))
            if not patches:
                continue
            if opt.mode == "text" and n == 1:
                embs = embed_txt([captions[o] for o in owners])
            else:
                embs = embed_img(np.stack(patches))
            found = builder.search_k_nearest(embs, k=opt.k)
            embs_nn = np.asarray(found["embeddings"])
            ids_nn = np.asarray(found.get("img_ids", found["nns"]))
            pcs_nn = np.asarray(found.get(
                "patch_coords", np.zeros((len(owners), opt.k, 4), int)))
            nns_ids = np.asarray(found["nns"])
            row = 0
            for i in idx_chunk:
                if int(i) in corrupts:
                    continue
                sl = slice(row, row + n * n)
                per_image[int(i)][n] = {
                    "embeddings": embs_nn[sl].reshape(n * n, opt.k, -1),
                    "img_ids": ids_nn[sl].reshape(n * n, opt.k),
                    "patch_coords": pcs_nn[sl].reshape(n * n, opt.k, -1),
                    "nn_ids": nns_ids[sl].reshape(n * n, opt.k),
                }
                row += n * n
            if n == 1:
                all_nn_ids.append(nns_ids)
        for i, payload in per_image.items():
            if not payload:
                continue
            rel = f"nns_img{i:09d}.p"
            with open(os.path.join(opt.out, rel), "wb") as f:
                pickle.dump(payload, f)
            nn_paths[i] = rel
        print(f"processed {min(start + opt.batch_size, len(indices))}"
              f"/{len(indices)} queries")

    with open(os.path.join(opt.out, f"nn_paths_p{opt.part_no}.p"),
              "wb") as f:
        pickle.dump(nn_paths, f)
    if corrupts:
        with open(os.path.join(opt.out, "corrupts.txt"), "a") as f:
            f.writelines(f"{c}\n" for c in corrupts)
    if opt.build_nn_memory and all_nn_ids:
        mem = NNMemory.build(np.concatenate(all_nn_ids, axis=0))
        mem.save(opt.build_nn_memory)
        print(f"nn_memory ({len(mem.ids)} ids) -> {opt.build_nn_memory}")
    if opt.save_patches:
        rset = builder.patcher.data if builder.patcher is not None else None
        if rset is None:
            raise SystemExit("--save_patches needs the db source images; "
                             "pass --build_filelist")
        save_nn_patches(opt.out, rset, n_values, opt.k)
    print(f"Done: {len(nn_paths)} query images, {len(corrupts)} corrupt")


if __name__ == "__main__":
    main()
