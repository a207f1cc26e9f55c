"""Config-driven offline retrieval pipeline (reference -rc/-qc YAMLs).

The reference invokes scripts/search_neighbors.py with OmegaConf YAMLs
(reference scripts/search_neighbors.py:456-470,
configs/dataset_builder/openimages.yaml,
configs/query_datasets/imagenet.yaml). These tests prove a user's
builder/query YAMLs drive the TPU pipeline end-to-end: database build,
kNN search, nn_paths output consumable by QueryDataset.
"""

import importlib
import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image


def _write_images(d, n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = os.path.join(d, f"img{i:03d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _filelist(path, paths):
    with open(path, "w") as f:
        f.writelines(p + "\n" for p in paths)
    return path


@pytest.fixture
def tiny_configs(tmp_path):
    db_paths = _write_images(tmp_path / "dbimg", 6, seed=1)
    q_paths = _write_images(tmp_path / "qimg", 4, seed=2)
    db_list = _filelist(tmp_path / "db.txt", db_paths)
    q_list = _filelist(tmp_path / "q.txt", q_paths)

    rconfig = tmp_path / "builder.yaml"
    rconfig.write_text(f"""
builder:
  target: rdm.data.retrieval_dataset.dsetbuilder.DatasetBuilder
  params:
    patch_size: 16
    n_patches: 2
    batch_size: 8
    k: 3
    chunk_size: 1e3
    gpu: True            # reference CUDA params: accepted, ignored
    num_workers: 24
    saved_embeddings: {tmp_path / 'db'}
    retriever_config:
      target: rdm.modules.retrievers.ClipImageRetriever
      params:
        model: ViT-B/32
    data:
      target: rdm_tpu.data.base.ImagePaths
      params:
        filelist: {db_list}
""")
    qconfig = tmp_path / "query.yaml"
    qconfig.write_text(f"""
data:
  target: main.DataModuleFromConfig
  params:
    num_workers: 0
    batch_size: 5
    train:
      target: rdm.data.base.QueryDataset
      params:
        k: 3
        dset_config:
          target: rdm_tpu.data.base.ImagePaths
          params:
            filelist: {q_list}
            size: 32
    validation:
      target: rdm.data.base.QueryDataset
      params:
        k: 2
        dset_config:
          target: rdm_tpu.data.base.ImagePaths
          params:
            filelist: {q_list}
            size: 32
""")
    return rconfig, qconfig, tmp_path


def test_builder_from_config_builds_pool(tiny_configs):
    rconfig, _, tmp_path = tiny_configs
    from rdm_tpu.retrieval.yaml_config import builder_from_config

    rng = np.random.default_rng(0)
    proj = {}

    def embed(images):
        flat = np.asarray(images).reshape(len(images), -1)
        if flat.shape[1] not in proj:
            proj[flat.shape[1]] = rng.standard_normal(
                (flat.shape[1], 16)).astype(np.float32) * 0.05
        return flat @ proj[flat.shape[1]]

    builder, name = builder_from_config(str(rconfig),
                                        embedder_override=embed)
    assert name == "random"
    assert builder.k == 3
    pool = builder.build_data_pool()
    assert pool.size == 6 * 2  # 6 db images x n_patches
    # reloading from saved_embeddings alone (no rebuild) works
    builder2, _ = builder_from_config(str(rconfig),
                                      embedder_override=embed)
    assert builder2.pool is not None and builder2.pool.size == 12


def test_query_dataset_from_config_splits(tiny_configs):
    _, qconfig, _ = tiny_configs
    from rdm_tpu.retrieval.yaml_config import query_dataset_from_config

    dset, k = query_dataset_from_config(str(qconfig), "train")
    assert k == 3 and len(dset) == 4
    assert dset[0]["image"].shape == (32, 32, 3)
    dset_v, k_v = query_dataset_from_config(str(qconfig), "validation")
    assert k_v == 2 and len(dset_v) == 4
    with pytest.raises(KeyError):
        query_dataset_from_config(str(qconfig), "test")


def test_clip_retriever_requires_local_ckpt(tiny_configs):
    rconfig, _, _ = tiny_configs
    from rdm_tpu.retrieval.yaml_config import builder_from_config

    with pytest.raises(ValueError, match="local CLIP checkpoint"):
        builder_from_config(str(rconfig))


def test_search_neighbors_config_driven_end_to_end(tiny_configs):
    """The full CLI with -rc/-qc YAMLs: build db, search, and the output
    must load back through QueryDataset (the training-time consumer)."""
    rconfig, qconfig, tmp_path = tiny_configs
    out = tmp_path / "nns"
    mod = importlib.import_module("scripts.search_neighbors")
    argv = sys.argv
    sys.argv = ["prog", "-rc", str(rconfig), "-qc", str(qconfig),
                "--split", "validation", "--out", str(out),
                "--random_embedder", "--log_max_np", "1"]
    try:
        mod.main()
    finally:
        sys.argv = argv

    with open(out / "nn_paths_p0.p", "rb") as f:
        nn_paths = pickle.load(f)
    assert sorted(nn_paths) == [0, 1, 2, 3]
    with open(out / nn_paths[0], "rb") as f:
        payload = pickle.load(f)
    # k comes from the qconfig split (validation: k=2); n in {1, 2}
    assert sorted(payload) == [1, 2]
    assert payload[1]["embeddings"].shape[:2] == (1, 2)
    assert payload[2]["embeddings"].shape[:2] == (4, 2)

    # training-time consumer round-trip
    from rdm_tpu.data.base import ImagePaths, QueryDataset
    q_paths = [str(tmp_path / "qimg" / f"img{i:03d}.png") for i in range(4)]
    qd = QueryDataset(ImagePaths(q_paths, size=32), nns=str(out), k=2)
    sample = qd[1]
    assert sample["nn_embeddings"].shape[1] == 2
