"""Trainer + checkpoint tests: a few real train steps over a QueryDataset
(reference pickle format), loss logging, orbax save/restore round trip,
resume continuity, image logging.
"""

import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from rdm_tpu.data.base import DataLoader, ImagePaths, QueryDataset
from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
from rdm_tpu.models.rdm import RDMConfig
from rdm_tpu.models.unet import UNetConfig
from rdm_tpu.training.trainer import RDMTrainer, TrainerConfig


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    nn_dir = tmp_path / "nns"
    img_dir.mkdir()
    nn_dir.mkdir()
    paths = {}
    for i in range(8):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        payload = {1: {"embeddings":
                       rng.standard_normal((1, 2, 16)).astype(np.float32)}}
        with open(nn_dir / f"nn{i}.p", "wb") as f:
            pickle.dump(payload, f)
        paths[i] = f"nn{i}.p"
    with open(nn_dir / "nn_paths.p", "wb") as f:
        pickle.dump(paths, f)
    files = sorted(str(img_dir / f"{i}.png") for i in range(8))
    return tmp_path, files, str(nn_dir / "nn_paths.p")


def _mk_trainer(tmp_path, logname="run"):
    unet = UNetConfig(in_channels=4, out_channels=4, model_channels=8,
                      num_res_blocks=1, attention_resolutions=(1,),
                      channel_mult=(1,), num_head_channels=4,
                      context_dim=16)
    cfg = RDMConfig(unet=unet, image_size=8, channels=4, timesteps=20,
                    context_dim=16, k_nn=2)
    fs_cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 4), num_res_blocks=1,
                               resolution=32, z_channels=4, embed_dim=4,
                               n_embed=16)
    fs = VQModel(fs_cfg)
    fs_params = fs.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))
    tcfg = TrainerConfig(logdir=str(tmp_path / logname), base_lr=1e-3,
                         max_steps=4, log_every=1, ckpt_every=2,
                         image_log_every=3, image_log_steps=2,
                         warm_up_steps=1)
    return RDMTrainer(cfg, tcfg, fs_cfg, fs_params,
                      batch_size=2), tcfg


def test_fit_logs_checkpoints_and_images(workspace):
    tmp_path, files, nns = workspace
    ds = QueryDataset(ImagePaths(files, size=32), nns=nns, k=2)
    loader = DataLoader(ds, batch_size=2, shuffle=True)
    trainer, tcfg = _mk_trainer(tmp_path)
    state = trainer.fit(loader)
    assert int(state.step) == 4
    metrics = [json.loads(l) for l in
               open(os.path.join(tcfg.logdir, "metrics.jsonl"))]
    assert len(metrics) >= 3
    assert all(np.isfinite(m["loss"]) for m in metrics)
    # checkpoints exist
    trainer.ckpt.wait()
    assert trainer.ckpt.latest_step() == 4
    # image log written at step 3
    imgs = os.listdir(os.path.join(tcfg.logdir, "images", "train"))
    assert any("gs-000003" in f or "gs-000000" in f for f in imgs)


def test_resume_continues_from_checkpoint(workspace):
    tmp_path, files, nns = workspace
    ds = QueryDataset(ImagePaths(files, size=32), nns=nns, k=2)
    loader = DataLoader(ds, batch_size=2)
    trainer, tcfg = _mk_trainer(tmp_path, "resume_run")
    state = trainer.fit(loader, max_steps=2)
    trainer.ckpt.wait()
    # new trainer over the same logdir resumes at step 2
    trainer2, _ = _mk_trainer(tmp_path, "resume_run")
    resumed = trainer2.resume_or_init()
    assert int(resumed.step) == 2
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(resumed.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-6)
    state3 = trainer2.fit(loader, state=resumed, max_steps=4)
    assert int(state3.step) == 4


def test_rarm_trainer_steps(workspace, tmp_path):
    from rdm_tpu.models.rarm import RARMConfig
    from rdm_tpu.training.trainer import RARMTrainer

    tmp_root, files, nns = workspace
    ds = QueryDataset(ImagePaths(files, size=32), nns=nns, k=2)
    loader = DataLoader(ds, batch_size=2, shuffle=True)
    fs_cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 4), num_res_blocks=1,
                               resolution=32, z_channels=4, embed_dim=4,
                               n_embed=16)
    fs = VQModel(fs_cfg)
    fs_params = fs.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # 32px f4 -> 8x8 = 64 tokens
    rcfg = RARMConfig(vocab_size=18, out_vocab=16, heads=2, head_dim=8,
                      depth=1, context_dim=16, seq_len=64, sos_token=17,
                      mask_token=16, code_side=8)
    tcfg = TrainerConfig(logdir=str(tmp_path / "rarm_run"), base_lr=1e-3,
                         max_steps=3, log_every=1, ckpt_every=10,
                         image_log_every=0, warm_up_steps=1)
    trainer = RARMTrainer(rcfg, tcfg, fs_cfg, fs_params, batch_size=2)
    state = trainer.fit(loader)
    assert int(state.step) == 3
    metrics = [json.loads(l) for l in
               open(os.path.join(tcfg.logdir, "metrics.jsonl"))]
    assert all(np.isfinite(m["loss"]) for m in metrics)
    # held-out EMA CE (backs train.py's post-fit test pass)
    val = trainer.validate(state, loader, max_batches=2)
    assert np.isfinite(val["val/loss_ema"])


def test_validation_loop(workspace):
    tmp_root, files, nns = workspace
    ds = QueryDataset(ImagePaths(files, size=32), nns=nns, k=2)
    loader = DataLoader(ds, batch_size=2)
    trainer, tcfg = _mk_trainer(tmp_root, "val_run")
    state = trainer.resume_or_init()
    val = trainer.validate(state, loader, max_batches=2)
    assert "val/loss_simple_ema" in val
    assert np.isfinite(val["val/loss_simple_ema"])
    # fit with validation wired at checkpoint steps
    state = trainer.fit(loader, state=state, max_steps=2,
                        val_loader=loader)
    assert int(state.step) == 2


def test_rarm_log_images(workspace, tmp_path):
    from rdm_tpu.diagnostics import log_images_rarm
    from rdm_tpu.models.rarm import RARM, RARMConfig

    tmp_root, files, nns_path = workspace
    ds = QueryDataset(ImagePaths(files, size=32), nns=nns_path, k=2)
    batch = ds[0]
    batch = {k: np.stack([v, v]) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}
    fs_cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 4), num_res_blocks=1,
                               resolution=32, z_channels=4, embed_dim=4,
                               n_embed=16)
    fs = VQModel(fs_cfg)
    fs_params = fs.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rcfg = RARMConfig(vocab_size=18, out_vocab=16, heads=2, head_dim=8,
                      depth=1, context_dim=16, seq_len=64, sos_token=17,
                      mask_token=16, code_side=8)
    model = RARM(rcfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1, 2, 16)))
    grids = log_images_rarm(model, params, fs, fs_params, batch,
                            jax.random.PRNGKey(2), top_k=8,
                            masking_probs=(1.0,))
    assert set(grids) == {"inputs", "reconstruction", "samples_full",
                          "samples_half", "samples_full_p_1.00"}
    for g in grids.values():
        assert g.dtype == np.uint8 and g.ndim == 3


def test_fsdp_trainer_init_is_sharded(tmp_path):
    # param_sharding="fsdp": init_state jits the whole init with fsdp
    # out_shardings (no replicated full state on one device) and the
    # resulting leaves carry the data-axis sharding
    from rdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8, db=1)
    tr, _ = _mk_trainer(tmp_path, logname="fsdp_run")
    tr.mesh = mesh
    tr.tcfg.param_sharding = "fsdp"
    state = tr.resume_or_init()
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # tiny model: leaves below fsdp_spec's min_size stay replicated, but
    # placement went through the sharded-init path without error
    specs = {str(l.sharding.spec) for l in leaves}
    assert specs  # all leaves placed with explicit shardings
