"""Config-target dataset registry tests: released-YAML data sections
(`target: rdm.data.*`) instantiate this framework's datasets, including the
nested QueryDataset join, sampler_config filtering, and a train.py CLI run
driven purely from the config (reference main.py:777-799 contract).
"""

import json
import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def imagenet_root(tmp_path):
    """Tiny staged ImageNet layout: 2 synsets x 3 images + filelists."""
    rng = np.random.default_rng(0)
    root = tmp_path / "imagenet"
    rels = []
    for s, synset in enumerate(["n01440764", "n01443537"]):
        d = root / synset
        d.mkdir(parents=True)
        for i in range(3):
            rel = f"{synset}/img{i}.png"
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(root / rel)
            rels.append(rel)
    for split in ("train", "val"):
        (root / f"{split}_filelist.txt").write_text("\n".join(rels))
    return str(root)


@pytest.fixture
def nn_dir(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "nns"
    d.mkdir()
    paths = {}
    for i in range(6):
        payload = {1: {"embeddings":
                       rng.standard_normal((1, 3, 16)).astype(np.float32)}}
        with open(d / f"nn{i}.p", "wb") as f:
            pickle.dump(payload, f)
        paths[i] = f"nn{i}.p"
    with open(d / "nn_paths_p0.p", "wb") as f:
        pickle.dump(paths, f)
    return str(d)


def test_released_yaml_data_section_instantiates(imagenet_root, nn_dir):
    """The exact target/params shape of configs/rdm/imagenet.yaml:108-138
    (incl. the `config:` nesting and the '<compute ...>' nns placeholder)."""
    from rdm_tpu.data.base import QueryDataset
    from rdm_tpu.data.registry import instantiate_dataset

    cfg = {
        "target": "rdm.data.base.QueryDataset",
        "params": {
            "k": 2,
            "nns": nn_dir,
            "n_patches_per_side": 1,
            "load_patches": False,
            "dset_config": {
                "target": "rdm.data.imagenet.ImageNetTrain",
                "params": {"root": imagenet_root,
                           "config": {"size": 32}},
            },
        },
    }
    ds = instantiate_dataset(cfg)
    assert isinstance(ds, QueryDataset)
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["nn_embeddings"].shape == (1, 2, 16)
    assert "class_label" in s
    # placeholder nns string is treated as absent
    cfg["params"]["nns"] = "<compute nearest neighbor, see README>"
    ds2 = instantiate_dataset(cfg)
    assert "nn_embeddings" not in ds2[0]


def test_registry_root_from_env(imagenet_root, monkeypatch):
    from rdm_tpu.data.registry import instantiate_dataset

    monkeypatch.setenv("RDM_TPU_DATA_ROOT",
                       os.path.dirname(imagenet_root))
    ds = instantiate_dataset({
        "target": "rdm.data.imagenet.ImageNetValidation",
        "params": {"config": {"size": 32}}})
    assert len(ds) == 6


def test_sampler_config_label_range(imagenet_root, nn_dir):
    """SubsetSampler equivalent: label-range filtering through the
    QueryDataset join (reference configs/rarm/dogs.yaml sampler_config)."""
    from rdm_tpu.data.registry import (apply_sampler_config,
                                       instantiate_dataset)

    ds = instantiate_dataset({
        "target": "rdm.data.base.QueryDataset",
        "params": {"k": 2, "nns": nn_dir,
                   "dset_config": {
                       "target": "rdm.data.imagenet.ImageNetTrain",
                       "params": {"root": imagenet_root, "size": 32}}}})
    sub = apply_sampler_config(
        ds, {"target": "rdm.data.base.SubsetSampler",
             "params": {"label_key": "class_label",
                        "label_range": [1, 1]}})
    assert len(sub) == 3
    assert all(sub[i]["class_label"] == 1 for i in range(len(sub)))


def test_unknown_target_raises():
    from rdm_tpu.data.registry import instantiate_dataset

    with pytest.raises(KeyError):
        instantiate_dataset({"target": "some.unknown.Thing", "params": {}})
    # wrapper fallback by class name
    inner = instantiate_dataset({
        "target": "rdm_tpu.data.base.ImagePaths",
        "params": {"paths": []}})
    assert len(inner) == 0


TRAIN_YAML = """
model:
  base_learning_rate: 1.0e-3
  target: rdm.models.diffusion.ddpm.MinimalRETRODiffusion
  params:
    k_nn: 2
    timesteps: 20
    image_size: 8
    channels: 3
    unet_config:
      params:
        in_channels: 3
        out_channels: 3
        model_channels: 8
        attention_resolutions: [1]
        num_res_blocks: 1
        channel_mult: [1]
        num_head_channels: 4
        context_dim: 16
    first_stage_config:
      params:
        embed_dim: 3
        n_embed: 16
        ddconfig:
          z_channels: 3
          resolution: 32
          in_channels: 3
          out_ch: 3
          ch: 8
          ch_mult: [1, 2, 4]
          num_res_blocks: 1
          attn_resolutions: []
data:
  target: main.DataModuleFromConfig
  params:
    batch_size: 2
    train:
      target: rdm.data.base.QueryDataset
      params:
        k: 2
        nns: {nns}
        n_patches_per_side: 1
        dset_config:
          target: rdm.data.imagenet.ImageNetTrain
          params:
            root: {root}
            config:
              size: 32
    test:
      target: rdm.data.base.QueryDataset
      params:
        k: 2
        nns: {nns}
        n_patches_per_side: 1
        dset_config:
          target: rdm.data.imagenet.ImageNetTrain
          params:
            root: {root}
            config:
              size: 32
"""


def test_train_cli_from_config_targets(imagenet_root, nn_dir, tmp_path):
    """`python scripts/train.py -t --base <released-shape yaml>` builds its
    datasets from the config alone (VERDICT #4 done criterion)."""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(TRAIN_YAML.format(nns=nn_dir, root=imagenet_root))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"), "-t",
         "--base", str(cfg_path), "--max_steps", "2",
         "--logdir", str(tmp_path / "logs")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    runs = os.listdir(tmp_path / "logs")
    assert len(runs) == 1
    metrics = tmp_path / "logs" / runs[0] / "metrics.jsonl"
    assert metrics.exists() and metrics.read_text().strip()
    # post-fit held-out test pass (reference main.py:1024-1031): the
    # configured data.params.test split is evaluated after fit
    test_metrics = tmp_path / "logs" / runs[0] / "test_metrics.json"
    assert test_metrics.exists(), proc.stdout[-2000:]
    res = json.loads(test_metrics.read_text())
    assert np.isfinite(res["test/loss_simple_ema"])
