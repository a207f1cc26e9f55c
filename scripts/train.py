#!/usr/bin/env python
"""Training CLI — the reference `main.py` surface
(/root/reference/main.py:30-129) on the TPU-native stack.

    python scripts/train.py -t --base configs/rdm/ffhq.yaml \\
        [--logdir logs/] [nested.key=value ...]

Reference semantics kept: multiple --base YAMLs merged left→right then CLI
dotlist overrides; run dir logs/<timestamp>_<name>; config snapshot into
<rundir>/configs; -r resumes a run dir; LR scaling rule
accumulate x n_devices x batch x base_lr.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-b", "--base", nargs="*", default=[],
                   help="config yaml(s), merged left-to-right")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="resume from run dir")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel axis size (default: all devices)")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--param_sharding", choices=("replicated", "fsdp"),
                   default="replicated",
                   help="fsdp shards params/moments/EMA over the data "
                        "axis for models that outgrow one chip's HBM")
    p.add_argument("--no-test", dest="no_test", action="store_true",
                   help="skip the post-fit held-out test pass "
                        "(reference main.py:1024-1031 runs trainer.test "
                        "after fit unless --no-test)")
    return p.parse_known_args()


def main():
    opt, unknown = parse_args()
    import yaml

    from rdm_tpu.config import (
        first_stage_config_from_yaml,
        load_config,
        model_config_from_yaml,
    )

    if opt.resume:
        rundir = opt.resume.rstrip("/")
        base_cfgs = sorted(
            os.path.join(rundir, "configs", f)
            for f in os.listdir(os.path.join(rundir, "configs"))
            if f.endswith(".yaml"))
        cfg = load_config(list(base_cfgs) + opt.base, unknown)
    else:
        if not opt.base:
            raise SystemExit("need --base config(s) or --resume")
        cfg = load_config(opt.base, unknown)
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = opt.name or os.path.splitext(
            os.path.basename(opt.base[0]))[0]
        rundir = os.path.join(opt.logdir, f"{now}_{name}")
        os.makedirs(os.path.join(rundir, "configs"), exist_ok=True)
        with open(os.path.join(rundir, "configs", "merged.yaml"),
                  "w") as f:
            yaml.safe_dump(cfg, f)

    import jax
    import jax.numpy as jnp

    from rdm_tpu.data.base import DataLoader, ImagePaths, QueryDataset
    from rdm_tpu.models.autoencoder import VQModel
    from rdm_tpu.models.rarm import RARMConfig
    from rdm_tpu.parallel.mesh import make_mesh
    from rdm_tpu.training.trainer import (
        RARMTrainer,
        RDMTrainer,
        TrainerConfig,
    )

    model_cfg = model_config_from_yaml(cfg)
    fs_cfg = first_stage_config_from_yaml(cfg)
    is_rarm = isinstance(model_cfg, RARMConfig)

    from rdm_tpu.data.registry import (apply_sampler_config,
                                       instantiate_dataset)
    from rdm_tpu.parallel.distributed import host_info

    data_cfg = cfg.get("data", {}).get("params", {})
    batch_size = data_cfg.get("batch_size", 4)
    train_node = data_cfg.get("train", {}) or {}
    train_cfg = train_node.get("params", {})
    sampler_cfg = data_cfg.get("sampler_config")
    k_nn = getattr(model_cfg, "k_nn", 4)
    npp = getattr(model_cfg, "n_patches_per_side", 1)

    def build_split(node):
        """config-target datasets (reference main.py:777-799, released
        YAMLs like configs/rdm/imagenet.yaml) or the filelist shortcut."""
        params = node.get("params", {})
        if "target" in node:
            ds = instantiate_dataset(node)
            rank, world = host_info()
            return apply_sampler_config(ds, sampler_cfg, rank=rank,
                                        world_size=world)
        filelist = params.get("filelist")
        if filelist and os.path.isfile(filelist):
            with open(filelist) as f:
                paths = [l.strip() for l in f if l.strip()]
            base = ImagePaths(paths, size=params.get("size", 256))
            return QueryDataset(base, nns=params.get("nns"), k=k_nn,
                                n_patches_per_side=npp)
        return None

    dataset = build_split(train_node)
    if dataset is None:
        raise SystemExit(
            "data.params.train needs a `target:` dataset config "
            "(reference YAML) or params.filelist (one image path per "
            "line; neighbor pickles via params.nns)")

    from rdm_tpu.data.base import PrefetchLoader

    loader = PrefetchLoader(
        DataLoader(dataset, batch_size=batch_size, shuffle=True,
                   num_workers=opt.num_workers, seed=opt.seed))

    val_loader = None
    val_ds = build_split(data_cfg.get("validation", {}) or {})
    if val_ds is not None:
        val_loader = DataLoader(val_ds, batch_size=batch_size,
                                shuffle=False)

    import math

    n_dev = len(jax.devices())
    data_axis = opt.mesh_data or n_dev
    if batch_size % data_axis:
        data_axis = math.gcd(batch_size, data_axis)
        print(f"WARNING: batch_size {batch_size} not divisible by "
              f"{opt.mesh_data or n_dev} devices — using data axis "
              f"{data_axis} (idle devices: "
              f"{(opt.mesh_data or n_dev) - data_axis})")
    mesh = make_mesh(data=data_axis, db=1,
                     devices=jax.devices()[:data_axis])

    # first-stage weights: converted checkpoint beside the config, or
    # random (debug only)
    fs_ckpt = cfg.get("model", {}).get("params", {}).get(
        "first_stage_ckpt")
    fs = VQModel(fs_cfg)
    if fs_ckpt and os.path.isfile(fs_ckpt):
        from rdm_tpu.utils.torch_convert import (
            convert_autoencoder, load_torch_state_dict)
        fs_params = convert_autoencoder(load_torch_state_dict(fs_ckpt),
                                        fs_cfg)
    else:
        print("WARNING: no first_stage_ckpt — random first stage")
        fs_params = jax.jit(fs.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, fs_cfg.resolution, fs_cfg.resolution, 3)))

    base_lr = cfg.get("model", {}).get("base_learning_rate", 1e-4)
    lightning = cfg.get("lightning", {}).get("trainer", {})
    tcfg = TrainerConfig(
        logdir=rundir,
        base_lr=base_lr,
        accumulate_grad_batches=lightning.get(
            "accumulate_grad_batches", 1),
        max_steps=opt.max_steps or lightning.get("max_steps", 100_000),
        seed=opt.seed,
        param_sharding=opt.param_sharding,
    )
    cls = RARMTrainer if is_rarm else RDMTrainer
    trainer = cls(model_cfg, tcfg, fs_cfg, fs_params, mesh=mesh,
                  batch_size=batch_size)
    if is_rarm:
        state = trainer.fit(loader)
    else:
        state = trainer.fit(loader, val_loader=val_loader)

    # post-fit held-out test pass (reference main.py:1024-1031: trainer
    # runs .test after fit unless --no-test; the data module's `test`
    # split supplies the loader, falling back nowhere — no split, no pass)
    if not opt.no_test:
        test_ds = build_split(data_cfg.get("test", {}) or {})
        if test_ds is None:
            print("no data.params.test split configured — skipping "
                  "post-fit test pass")
        else:
            test_loader = DataLoader(test_ds, batch_size=batch_size,
                                     shuffle=False)
            res = trainer.validate(state, test_loader)
            res = {k.replace("val/", "test/"): v for k, v in res.items()}
            print("post-fit test pass: " + json.dumps(res))
            with open(os.path.join(rundir, "test_metrics.json"),
                      "w") as f:
                json.dump(res, f)


if __name__ == "__main__":
    main()
