"""Config system tests: YAML merge, dotlist overrides, and translation of
reference-format model configs (target/params convention of
/root/reference/main.py:777-799) into typed configs."""

import os
import textwrap

import pytest

from rdm_tpu.config import (
    apply_dotlist,
    deep_merge,
    first_stage_config_from_yaml,
    load_config,
    model_config_from_yaml,
)
from rdm_tpu.models.rarm import RARMConfig
from rdm_tpu.models.rdm import RDMConfig

RDM_YAML = textwrap.dedent("""
model:
  base_learning_rate: 0.0001
  target: rdm.models.diffusion.ddpm.MinimalRETRODiffusion
  params:
    k_nn: 4
    linear_start: 0.0015
    linear_end: 0.0195
    timesteps: 1000
    image_size: 64
    channels: 3
    unet_config:
      target: rdm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 64
        in_channels: 3
        out_channels: 3
        model_channels: 192
        attention_resolutions: [8, 4, 2]
        num_res_blocks: 2
        channel_mult: [1, 2, 3, 5]
        num_head_channels: 32
        transformer_depth: 1
        context_dim: 512
    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 8192
        ddconfig:
          double_z: false
          z_channels: 3
          resolution: 256
          in_channels: 3
          out_ch: 3
          ch: 128
          ch_mult: [1, 2, 4]
          num_res_blocks: 2
          attn_resolutions: []
""")

RARM_YAML = textwrap.dedent("""
model:
  target: rdm.models.autoregression.transformer.LatentImageRETRO
  params:
    mask_token: 16384
    sos_token: 16385
    p_mask_max: 0.0
    transformer_config:
      target: rdm.modules.attention.RetrievalPatchTransformer
      params:
        in_channels: 16386
        n_heads: 12
        d_head: 64
        depth: 18
        context_dim: 512
        positional_encodings: true
        sequence_length: 256
        out_channels: 16384
        cross_attend: true
        causal: true
        continuous: false
    first_stage_config:
      target: taming.models.vqgan.VQModel
      params:
        embed_dim: 256
        n_embed: 16384
        ddconfig:
          double_z: false
          z_channels: 256
          resolution: 256
          in_channels: 3
          out_ch: 3
          ch: 128
          ch_mult: [1, 1, 2, 2, 4]
          num_res_blocks: 2
          attn_resolutions: [16]
""")


def test_rdm_reference_yaml_translation(tmp_path):
    p = tmp_path / "rdm.yaml"
    p.write_text(RDM_YAML)
    cfg = load_config([str(p)])
    mc = model_config_from_yaml(cfg)
    assert isinstance(mc, RDMConfig)
    assert mc.unet.model_channels == 192
    assert mc.unet.channel_mult == (1, 2, 3, 5)
    assert mc.unet.attention_resolutions == (8, 4, 2)
    assert mc.unet.context_dim == 512
    assert mc.k_nn == 4 and mc.image_size == 64
    fs = first_stage_config_from_yaml(cfg)
    assert fs.n_embed == 8192 and fs.ch_mult == (1, 2, 4)
    assert fs.downsample_factor == 4  # VQ-f4


def test_rarm_reference_yaml_translation(tmp_path):
    p = tmp_path / "rarm.yaml"
    p.write_text(RARM_YAML)
    mc = model_config_from_yaml(load_config([str(p)]))
    assert isinstance(mc, RARMConfig)
    assert mc.depth == 18 and mc.heads == 12 and mc.head_dim == 64
    assert mc.vocab_size == 16386 and mc.out_vocab == 16384
    assert mc.seq_len == 256 and mc.code_side == 16
    fs_cfg = first_stage_config_from_yaml(load_config([str(p)]))
    assert fs_cfg.n_embed == 16384 and fs_cfg.downsample_factor == 16


def test_merge_and_dotlist(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("model:\n  params:\n    k_nn: 4\n    timesteps: 1000\n")
    b.write_text("model:\n  params:\n    k_nn: 8\n")
    cfg = load_config([str(a), str(b)],
                      dotlist=["model.params.timesteps=500",
                               "data.batch_size=16"])
    assert cfg["model"]["params"]["k_nn"] == 8  # right wins
    assert cfg["model"]["params"]["timesteps"] == 500
    assert cfg["data"]["batch_size"] == 16


def test_dotlist_value_types():
    cfg = apply_dotlist({}, ["a.f=1.5", "a.b=true", "a.s=hello",
                             "a.l=[1,2]"])
    assert cfg["a"]["f"] == 1.5 and cfg["a"]["b"] is True
    assert cfg["a"]["s"] == "hello" and cfg["a"]["l"] == [1, 2]


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not present")
def test_released_reference_configs_load():
    """The actual released model-zoo configs must translate cleanly."""
    cfg = load_config(["/root/reference/models/rdm/imagenet/config.yaml"])
    mc = model_config_from_yaml(cfg)
    assert mc.unet.model_channels == 192
    cfg = load_config(["/root/reference/models/rarm/imagenet/dogs/config.yaml"])
    mc = model_config_from_yaml(cfg)
    assert mc.depth == 18
