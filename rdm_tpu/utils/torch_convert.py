"""PyTorch checkpoint → JAX pytree weight conversion.

Converts the reference ecosystem's released checkpoints into this
framework's flax parameter trees (SURVEY.md §7 step 2 — "the converter is on
the critical path for everything"):

- taming/ldm first-stage autoencoders (VQ-f4, VQ-f16, KL-f*) →
  rdm_tpu.models.autoencoder.{VQModel, AutoencoderKL}
- ADM U-Net state dicts (reference rdm/modules/diffusionmodules/
  openaimodel.py layout) → rdm_tpu.models.unet.UNet
- OpenAI CLIP (jit-archive state dict) → rdm_tpu.models.clip.CLIP
- full RDM checkpoints (model.diffusion_model.* + first_stage_model.* +
  unconditional_guidance_vex) → (RDM params, first-stage params)

Layout rules:
  torch Conv2d  [O, I, kh, kw]  →  flax NHWC kernel [kh, kw, I, O]
  torch Linear  [O, I]          →  flax Dense kernel [I, O]
  torch GroupNorm/LayerNorm weight → scale (nested under the f32-norm
  wrapper scopes GroupNorm_0 / LayerNorm_0)
  embeddings / projections used as `x @ W` are copied untransposed.

All functions take a flat {name: np.ndarray} state dict — use
`load_torch_state_dict` for .ckpt/.pt files (torch CPU is available in the
image; checkpoints are never needed on the TPU host path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from rdm_tpu.models.autoencoder import AutoencoderConfig
from rdm_tpu.models.clip import ClipConfig
from rdm_tpu.models.unet import UNetConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, dtype=np.float32)


class _Mapper:
    """Collects torch→flax assignments and reports unconsumed keys."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.tree: Dict[str, Any] = {}
        self.used: set = set()

    def has(self, tkey: str) -> bool:
        return self.prefix + tkey in self.sd

    def raw(self, tkey: str) -> np.ndarray:
        full = self.prefix + tkey
        self.used.add(full)
        return self.sd[full]

    def copy(self, tkey: str, fpath: str) -> None:
        _set(self.tree, fpath, self.raw(tkey))

    def conv(self, tmod: str, fmod: str) -> None:
        _set(self.tree, f"{fmod}/kernel", _conv_kernel(self.raw(f"{tmod}.weight")))
        if self.has(f"{tmod}.bias"):
            _set(self.tree, f"{fmod}/bias", self.raw(f"{tmod}.bias"))

    def linear(self, tmod: str, fmod: str) -> None:
        _set(self.tree, f"{fmod}/kernel",
             _linear_kernel(self.raw(f"{tmod}.weight")))
        if self.has(f"{tmod}.bias"):
            _set(self.tree, f"{fmod}/bias", self.raw(f"{tmod}.bias"))

    def groupnorm(self, tmod: str, fmod: str) -> None:
        _set(self.tree, f"{fmod}/GroupNorm_0/scale", self.raw(f"{tmod}.weight"))
        _set(self.tree, f"{fmod}/GroupNorm_0/bias", self.raw(f"{tmod}.bias"))

    def layernorm(self, tmod: str, fmod: str) -> None:
        _set(self.tree, f"{fmod}/LayerNorm_0/scale", self.raw(f"{tmod}.weight"))
        _set(self.tree, f"{fmod}/LayerNorm_0/bias", self.raw(f"{tmod}.bias"))

    def unconsumed(self, scope_prefix: str = "") -> list:
        return [k for k in self.sd
                if k.startswith(self.prefix + scope_prefix)
                and k not in self.used]


# ---------------------------------------------------------------------------
# first-stage autoencoders (taming VQModel / ldm AutoencoderKL layout)
# ---------------------------------------------------------------------------

def _convert_resnet_block(m: _Mapper, tmod: str, fmod: str) -> None:
    m.groupnorm(f"{tmod}.norm1", f"{fmod}/norm1")
    m.conv(f"{tmod}.conv1", f"{fmod}/conv1")
    m.groupnorm(f"{tmod}.norm2", f"{fmod}/norm2")
    m.conv(f"{tmod}.conv2", f"{fmod}/conv2")
    if m.has(f"{tmod}.nin_shortcut.weight"):
        m.conv(f"{tmod}.nin_shortcut", f"{fmod}/nin_shortcut")


def _convert_ae_attn(m: _Mapper, tmod: str, fmod: str) -> None:
    m.groupnorm(f"{tmod}.norm", f"{fmod}/norm")
    for p in ("q", "k", "v", "proj_out"):
        m.conv(f"{tmod}.{p}", f"{fmod}/{p}")


def _convert_ae_trunk(m: _Mapper, cfg: AutoencoderConfig, side: str) -> None:
    """side: 'encoder' (down path) or 'decoder' (up path)."""
    m.conv(f"{side}.conv_in", f"{side}/conv_in")
    levels = range(cfg.num_resolutions)
    if side == "encoder":
        cur_res = cfg.resolution
        for L in levels:
            for i in range(cfg.num_res_blocks):
                _convert_resnet_block(
                    m, f"{side}.down.{L}.block.{i}",
                    f"{side}/down_{L}_block_{i}")
                if cur_res in cfg.attn_resolutions:
                    _convert_ae_attn(m, f"{side}.down.{L}.attn.{i}",
                                     f"{side}/down_{L}_attn_{i}")
            if L != cfg.num_resolutions - 1:
                m.conv(f"{side}.down.{L}.downsample.conv",
                       f"{side}/down_{L}_downsample/conv")
                cur_res //= 2
    else:
        cur_res = cfg.resolution // cfg.downsample_factor
        for L in reversed(list(levels)):
            for i in range(cfg.num_res_blocks + 1):
                _convert_resnet_block(
                    m, f"{side}.up.{L}.block.{i}", f"{side}/up_{L}_block_{i}")
                if cur_res in cfg.attn_resolutions:
                    _convert_ae_attn(m, f"{side}.up.{L}.attn.{i}",
                                     f"{side}/up_{L}_attn_{i}")
            if L != 0:
                m.conv(f"{side}.up.{L}.upsample.conv",
                       f"{side}/up_{L}_upsample/conv")
                cur_res *= 2
    for blk in ("block_1", "block_2"):
        _convert_resnet_block(m, f"{side}.mid.{blk}", f"{side}/mid_{blk}")
    _convert_ae_attn(m, f"{side}.mid.attn_1", f"{side}/mid_attn_1")
    m.groupnorm(f"{side}.norm_out", f"{side}/norm_out")
    m.conv(f"{side}.conv_out", f"{side}/conv_out")


def convert_autoencoder(
    sd: Dict[str, np.ndarray],
    cfg: AutoencoderConfig,
    prefix: str = "",
) -> Dict[str, Any]:
    """taming VQModel / ldm AutoencoderKL state dict → flax params."""
    m = _Mapper(sd, prefix)
    _convert_ae_trunk(m, cfg, "encoder")
    _convert_ae_trunk(m, cfg, "decoder")
    m.conv("quant_conv", "quant_conv")
    m.conv("post_quant_conv", "post_quant_conv")
    if cfg.n_embed:
        m.copy("quantize.embedding.weight", "quantize/embedding")
    return {"params": m.tree}


# ---------------------------------------------------------------------------
# ADM U-Net
# ---------------------------------------------------------------------------

def _convert_adm_resblock(m: _Mapper, tmod: str, fmod: str) -> None:
    m.groupnorm(f"{tmod}.in_layers.0", f"{fmod}/norm1")
    m.conv(f"{tmod}.in_layers.2", f"{fmod}/conv1")
    m.linear(f"{tmod}.emb_layers.1", f"{fmod}/emb_proj")
    m.groupnorm(f"{tmod}.out_layers.0", f"{fmod}/norm2")
    m.conv(f"{tmod}.out_layers.3", f"{fmod}/conv2")
    if m.has(f"{tmod}.skip_connection.weight"):
        m.conv(f"{tmod}.skip_connection", f"{fmod}/skip")


def _convert_spatial_transformer(m: _Mapper, tmod: str, fmod: str,
                                 depth: int) -> None:
    m.groupnorm(f"{tmod}.norm", f"{fmod}/norm")
    m.conv(f"{tmod}.proj_in", f"{fmod}/proj_in")
    for d in range(depth):
        tb, fb = f"{tmod}.transformer_blocks.{d}", f"{fmod}/block_{d}"
        for n in (1, 2, 3):
            m.layernorm(f"{tb}.norm{n}", f"{fb}/norm{n}")
        for a in ("attn1", "attn2"):
            for p in ("to_q", "to_k", "to_v"):
                m.linear(f"{tb}.{a}.{p}", f"{fb}/{a}/{p}")
            m.linear(f"{tb}.{a}.to_out.0", f"{fb}/{a}/to_out")
        m.linear(f"{tb}.ff.net.0.proj", f"{fb}/ff/proj_in")
        m.linear(f"{tb}.ff.net.2", f"{fb}/ff/proj_out")
    m.conv(f"{tmod}.proj_out", f"{fmod}/proj_out")


def convert_unet(
    sd: Dict[str, np.ndarray],
    cfg: UNetConfig,
    prefix: str = "model.diffusion_model.",
) -> Dict[str, Any]:
    """ADM U-Net state dict → rdm_tpu UNet params. Mirrors the block
    enumeration of rdm_tpu.models.unet.UNet.__call__ exactly."""
    m = _Mapper(sd, prefix)
    m.linear("time_embed.0", "time_dense1")
    m.linear("time_embed.2", "time_dense2")
    if m.has("label_emb.weight"):
        m.copy("label_emb.weight", "label_emb/embedding")

    m.conv("input_blocks.0.0", "conv_in")
    tn, ds = 1, 1
    for level in range(len(cfg.channel_mult)):
        for i in range(cfg.num_res_blocks):
            _convert_adm_resblock(m, f"input_blocks.{tn}.0",
                                  f"down_{level}_{i}_res")
            if ds in cfg.attention_resolutions:
                _convert_spatial_transformer(
                    m, f"input_blocks.{tn}.1", f"down_{level}_{i}_attn",
                    cfg.transformer_depth)
            tn += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                _convert_adm_resblock(m, f"input_blocks.{tn}.0",
                                      f"down_{level}_down")
            else:
                m.conv(f"input_blocks.{tn}.0.op", f"down_{level}_down/conv")
            tn += 1
            ds *= 2

    _convert_adm_resblock(m, "middle_block.0", "mid_res1")
    _convert_spatial_transformer(m, "middle_block.1", "mid_attn",
                                 cfg.transformer_depth)
    _convert_adm_resblock(m, "middle_block.2", "mid_res2")

    tn = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            _convert_adm_resblock(m, f"output_blocks.{tn}.0",
                                  f"up_{level}_{i}_res")
            sub = 1
            if ds in cfg.attention_resolutions:
                _convert_spatial_transformer(
                    m, f"output_blocks.{tn}.{sub}", f"up_{level}_{i}_attn",
                    cfg.transformer_depth)
                sub += 1
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    _convert_adm_resblock(m, f"output_blocks.{tn}.{sub}",
                                          f"up_{level}_up")
                else:
                    m.conv(f"output_blocks.{tn}.{sub}.conv",
                           f"up_{level}_up/conv")
                ds //= 2
            tn += 1

    m.groupnorm("out.0", "out_norm")
    m.conv("out.2", "out_conv")
    return {"params": m.tree}


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def clip_config_from_state_dict(sd: Dict[str, np.ndarray]) -> ClipConfig:
    """Infer architecture from a jit-exported CLIP state dict (the loader
    logic of reference custom_clip/model.py:363-399, re-derived)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    return ClipConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_patch_size=patch,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks.")}),
    )


def _convert_clip_block(m: _Mapper, tmod: str, fmod: str) -> None:
    m.layernorm(f"{tmod}.ln_1", f"{fmod}/ln_1")
    m.layernorm(f"{tmod}.ln_2", f"{fmod}/ln_2")
    _set(m.tree, f"{fmod}/attn/in_proj/kernel",
         _linear_kernel(m.raw(f"{tmod}.attn.in_proj_weight")))
    _set(m.tree, f"{fmod}/attn/in_proj/bias",
         m.raw(f"{tmod}.attn.in_proj_bias"))
    m.linear(f"{tmod}.attn.out_proj", f"{fmod}/attn/out_proj")
    m.linear(f"{tmod}.mlp.c_fc", f"{fmod}/mlp_fc")
    m.linear(f"{tmod}.mlp.c_proj", f"{fmod}/mlp_proj")


def convert_clip(sd: Dict[str, np.ndarray],
                 cfg: Optional[ClipConfig] = None
                 ) -> Tuple[Dict[str, Any], ClipConfig]:
    """OpenAI CLIP (ViT) state dict → (flax params, config)."""
    if cfg is None:
        cfg = clip_config_from_state_dict(sd)
    m = _Mapper(sd)
    # vision tower
    _set(m.tree, "visual/conv1/kernel",
         _conv_kernel(m.raw("visual.conv1.weight")))
    m.copy("visual.class_embedding", "visual/class_embedding")
    m.copy("visual.positional_embedding", "visual/positional_embedding")
    m.layernorm("visual.ln_pre", "visual/ln_pre")
    for i in range(cfg.vision_layers):
        _convert_clip_block(m, f"visual.transformer.resblocks.{i}",
                            f"visual/block_{i}")
    m.layernorm("visual.ln_post", "visual/ln_post")
    m.copy("visual.proj", "visual/proj")
    # text tower
    m.copy("token_embedding.weight", "text/token_embedding/embedding")
    m.copy("positional_embedding", "text/positional_embedding")
    for i in range(cfg.transformer_layers):
        _convert_clip_block(m, f"transformer.resblocks.{i}",
                            f"text/block_{i}")
    m.layernorm("ln_final", "text/ln_final")
    m.copy("text_projection", "text/text_projection")
    m.copy("logit_scale", "logit_scale")
    return {"params": m.tree}, cfg


def _convert_bn(m: _Mapper, tmod: str, fmod: str, stats: Dict[str, Any]
                ) -> None:
    """torch BatchNorm2d → flax BatchNorm (params + batch_stats)."""
    _set(m.tree, f"{fmod}/scale", m.raw(f"{tmod}.weight"))
    _set(m.tree, f"{fmod}/bias", m.raw(f"{tmod}.bias"))
    _set(stats, f"{fmod}/mean", m.raw(f"{tmod}.running_mean"))
    _set(stats, f"{fmod}/var", m.raw(f"{tmod}.running_var"))
    if m.has(f"{tmod}.num_batches_tracked"):
        m.raw(f"{tmod}.num_batches_tracked")  # consume


def convert_clip_resnet_visual(
    sd: Dict[str, np.ndarray],
    layers: Tuple[int, ...] = (3, 4, 6, 3),
    prefix: str = "visual.",
) -> Dict[str, Any]:
    """OpenAI CLIP ModifiedResNet tower → rdm_tpu.models.clip.ModifiedResNet
    variables ({'params', 'batch_stats'} for the visual scope)."""
    m = _Mapper(sd, prefix)
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        m.conv(f"conv{i}", f"conv{i}")
        _convert_bn(m, f"bn{i}", f"bn{i}", stats)
    for stage, blocks in enumerate(layers):
        for blk in range(blocks):
            t = f"layer{stage + 1}.{blk}"
            f = f"layer{stage + 1}_{blk}"
            for c in (1, 2, 3):
                m.conv(f"{t}.conv{c}", f"{f}/conv{c}")
                _convert_bn(m, f"{t}.bn{c}", f"{f}/bn{c}", stats)
            if m.has(f"{t}.downsample.0.weight"):
                m.conv(f"{t}.downsample.0", f"{f}/downsample_conv")
                _convert_bn(m, f"{t}.downsample.1", f"{f}/downsample_bn",
                            stats)
    m.copy("attnpool.positional_embedding",
           "attnpool/positional_embedding")
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        m.linear(f"attnpool.{p}", f"attnpool/{p}")
    return {"params": m.tree, "batch_stats": stats}


# ---------------------------------------------------------------------------
# RARM (RetrievalPatchTransformer) checkpoint
# ---------------------------------------------------------------------------

def convert_rarm_transformer(sd: Dict[str, np.ndarray], depth: int,
                             prefix: str = "transformer."
                             ) -> Dict[str, Any]:
    """RetrievalPatchTransformer (continuous=False) state dict →
    rdm_tpu.models.rarm.RARM params. proj_in is an Embedding, proj_out a
    Conv1d-k1 (≡ linear); positional_encoding is stored [inner, seq] and
    transposed here."""
    m = _Mapper(sd, prefix)
    _set(m.tree, "token_emb/embedding", m.raw("proj_in.weight"))
    _set(m.tree, "positional_encoding",
         np.transpose(m.raw("positional_encoding")))
    for d in range(depth):
        tb, fb = f"transformer_blocks.{d}", f"block_{d}"
        for n in (1, 2, 3):
            m.layernorm(f"{tb}.norm{n}", f"{fb}/norm{n}")
        for a in ("attn1", "attn2"):
            for p in ("to_q", "to_k", "to_v"):
                m.linear(f"{tb}.{a}.{p}", f"{fb}/{a}/{p}")
            m.linear(f"{tb}.{a}.to_out.0", f"{fb}/{a}/to_out")
        m.linear(f"{tb}.ff.net.0.proj", f"{fb}/ff/proj_in")
        m.linear(f"{tb}.ff.net.2", f"{fb}/ff/proj_out")
    w = m.raw("proj_out.weight")  # Conv1d [out_vocab, inner, 1]
    _set(m.tree, "proj_out/kernel", np.transpose(w[..., 0]))
    if m.has("proj_out.bias"):
        _set(m.tree, "proj_out/bias", m.raw("proj_out.bias"))
    return {"params": m.tree}


def convert_rarm(
    sd: Dict[str, np.ndarray],
    config,
    first_stage_cfg: AutoencoderConfig,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full released RARM checkpoint → (RARM params, first-stage params)."""
    params = convert_rarm_transformer(sd, config.depth)
    fs = convert_autoencoder(sd, first_stage_cfg,
                             prefix="first_stage_model.")
    return params, fs


# ---------------------------------------------------------------------------
# full RDM checkpoint
# ---------------------------------------------------------------------------

def convert_rdm(
    sd: Dict[str, np.ndarray],
    unet_cfg: UNetConfig,
    first_stage_cfg: AutoencoderConfig,
    *,
    use_ema: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Released RDM checkpoint → (RDM params, first-stage params).

    use_ema swaps in the model_ema.* weights (LitEma stores them with dots
    stripped from parameter names — matched positionally by sorted order is
    unsafe, so we match by the punctuation-stripped key).
    """
    if use_ema:
        sd = dict(sd)
        ema = {k[len("model_ema."):]: v for k, v in sd.items()
               if k.startswith("model_ema.") and k not in
               ("model_ema.num_updates", "model_ema.decay")}
        flat_to_orig = {}
        for k in list(sd):
            if k.startswith("model."):
                flat_to_orig[k[len("model."):].replace(".", "")] = k
        for flat, v in ema.items():
            orig = flat_to_orig.get(flat)
            if orig is not None:
                sd[orig] = v
    unet = convert_unet(sd, unet_cfg,
                        prefix="model.diffusion_model.")["params"]
    fs = convert_autoencoder(sd, first_stage_cfg,
                             prefix="first_stage_model.")
    rdm_params: Dict[str, Any] = {"unet": unet}
    if "unconditional_guidance_vex" in sd:
        rdm_params["unconditional_guidance_vex"] = np.asarray(
            sd["unconditional_guidance_vex"], dtype=np.float32)
    if "logvar" in sd:
        rdm_params["logvar"] = np.asarray(sd["logvar"], dtype=np.float32)
    return {"params": rdm_params}, fs


# ---------------------------------------------------------------------------
# FID InceptionV3 (pytorch-fid pt_inception-2015-12-05 layout)
# ---------------------------------------------------------------------------

def convert_inception(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """FID InceptionV3 state dict → rdm_tpu.models.inception.InceptionV3
    variables. Flax submodule names mirror the torch dotted paths
    (Mixed_5b.branch1x1.conv → Mixed_5b/branch1x1/conv), so the walk is
    mechanical; the fc head and AuxLogits are dropped (pool3 features only).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for k in sd:
        if k.startswith(("fc.", "AuxLogits.")):
            continue
        if k.endswith(".conv.weight"):
            mod = k[: -len(".conv.weight")]
            f = mod.replace(".", "/")
            _set(params, f"{f}/conv/kernel", _conv_kernel(sd[k]))
            _set(params, f"{f}/bn/scale", sd[mod + ".bn.weight"])
            _set(params, f"{f}/bn/bias", sd[mod + ".bn.bias"])
            _set(stats, f"{f}/bn/mean", sd[mod + ".bn.running_mean"])
            _set(stats, f"{f}/bn/var", sd[mod + ".bn.running_var"])
    if not params:
        raise ValueError("no InceptionV3 conv weights found in state dict")
    return {"params": params, "batch_stats": stats}
