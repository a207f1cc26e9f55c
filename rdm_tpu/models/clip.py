"""CLIP (ViT-B/32) image and text towers in flax — the retrieval embedder.

TPU-first reimplementation of the behavior of the reference's vendored CLIP
(/root/reference/rdm/modules/custom_clip/model.py:151-335): both towers share
one 512-d embedding space, which is what makes text-query retrieval and
text-as-pseudo-neighbor sampling work (README.md:48-53).

Design notes:
- NHWC patchify conv (32x32, stride 32) feeds the MXU directly; the token
  sequence is 50 (49 patches + CLS), so plain XLA attention is optimal
  (flash kernel thresholds exclude it on purpose).
- LayerNorms run in float32; matmuls in the configured compute dtype.
- Text tower takes pre-tokenized int32 [B, 77] (rdm_tpu.utils.tokenizer) and
  reads the embedding at the EOT position (argmax of token ids, reference
  model.py:313-317).
- Weights come from the released OpenAI checkpoints via
  rdm_tpu.utils.torch_convert (jit-archive state dict → pytree).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdm_tpu.models.layers import LayerNormF32
from rdm_tpu.ops.attention import dot_product_attention

Dtype = Any

# CLIP preprocessing constants (OpenAI released values)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch_size: int = 32
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12
    head_dim: int = 64  # OpenAI convention: heads = width / 64
    # RN50-style tower instead of the ViT (reference clip.py:20-23 ships
    # both ViT-B/32 and RN50): vision_layers becomes the stage depths
    resnet_layers: Optional[Tuple[int, ...]] = None  # e.g. (3, 4, 6, 3)

    @property
    def vision_heads(self) -> int:
        return self.vision_width // self.head_dim

    @property
    def transformer_heads(self) -> int:
        return self.transformer_width // self.head_dim

    @classmethod
    def vit_b32(cls) -> "ClipConfig":
        return cls()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible layout (biased qkv + out)."""

    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        head_dim = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, head_dim)
        k = k.reshape(b, s, self.heads, head_dim)
        v = v.reshape(b, s, self.heads, head_dim)
        out = dot_product_attention(q, k, v, causal=self.causal)
        out = out.reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = x + MultiheadAttention(self.heads, self.causal, self.dtype,
                                   name="attn")(LayerNormF32(name="ln_1")(x))
        h = nn.Dense(4 * d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc")(LayerNormF32(name="ln_2")(x))
        h = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_proj")(quick_gelu(h))
        return x + h


class VisionTransformer(nn.Module):
    config: ClipConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, 224, 224, 3] preprocessed NHWC → [B, embed_dim]."""
        cfg = self.config
        p = cfg.vision_patch_size
        w = cfg.vision_width
        x = nn.Conv(w, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x.astype(self.dtype))
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, w)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (w,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, w)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (gh * gw + 1, w), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = LayerNormF32(name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(cfg.vision_heads, dtype=self.dtype,
                                       name=f"block_{i}")(x)
        x = LayerNormF32(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (w, cfg.embed_dim), jnp.float32)
        return (x @ proj.astype(x.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    config: ClipConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: int32 [B, 77] → [B, embed_dim]."""
        cfg = self.config
        w = cfg.transformer_width
        x = nn.Embed(cfg.vocab_size, w, param_dtype=jnp.float32,
                     name="token_embedding")(tokens).astype(self.dtype)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, w), jnp.float32)
        x = x + pos[: x.shape[1]].astype(x.dtype)
        for i in range(cfg.transformer_layers):
            x = ResidualAttentionBlock(cfg.transformer_heads, causal=True,
                                       dtype=self.dtype,
                                       name=f"block_{i}")(x)
        x = LayerNormF32(name="ln_final")(x)
        # embedding at the EOT token (highest token id in each row)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (w, cfg.embed_dim), jnp.float32)
        return (x @ proj.astype(x.dtype)).astype(jnp.float32)


class Bottleneck(nn.Module):
    """CLIP ModifiedResNet bottleneck: 1x1 → 3x3 → (avgpool if stride>1)
    → 1x1(4x), with an avgpool+1x1 downsample shortcut (anti-aliased —
    reference custom_clip/model.py:9-50 semantics)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        out_ch = self.planes * 4
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME", use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name)
        h = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        h = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(h)))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride, self.stride),
                            strides=(self.stride, self.stride))
        h = bn("bn3")(conv(out_ch, 1, "conv3")(h))
        if self.stride > 1 or inp != out_ch:
            sc = x
            if self.stride > 1:
                sc = nn.avg_pool(sc, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
            sc = bn("downsample_bn")(conv(out_ch, 1, "downsample_conv")(sc))
        else:
            sc = x
        return nn.relu(h + sc)


class AttentionPool2d(nn.Module):
    """Mean-token query attention pool (reference model.py:52-79)."""

    heads: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        q = dense(c, "q_proj")(tokens[:, :1])
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)
        hd = c // self.heads
        q = q.reshape(b, 1, self.heads, hd)
        k = k.reshape(b, -1, self.heads, hd)
        v = v.reshape(b, -1, self.heads, hd)
        out = dot_product_attention(q, k, v).reshape(b, c)
        return dense(self.out_dim, "c_proj")(out).astype(jnp.float32)


class ModifiedResNet(nn.Module):
    """CLIP's RN50-style image tower (reference model.py:82-149): 3-conv
    stem with avgpool, 4 bottleneck stages, attention pooling."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    heads: int = 32
    out_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name)
        x = x.astype(self.dtype)
        # Stride-2 k=3 stem conv: torch pads (1,1) but XLA "SAME" pads (0,1)
        # at stride 2, shifting every output window by one input pixel — pad
        # explicitly and convolve VALID (same trap as layers.Downsample).
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.relu(bn("bn1")(nn.Conv(
            w // 2, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)))
        x = nn.relu(bn("bn2")(conv(w // 2, 3, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(w, 3, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        planes = w
        for stage, blocks in enumerate(self.layers):
            for blk in range(blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x)
            planes *= 2
        return AttentionPool2d(self.heads, self.out_dim, self.dtype,
                               name="attnpool")(x)


class CLIP(nn.Module):
    """Both towers + logit scale. encode_image / encode_text return
    *unnormalized* 512-d embeddings (reference model.py:304-320); retrieval
    normalizes queries explicitly (dsetbuilder.py:506)."""

    config: ClipConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.config.resnet_layers is not None:
            self.visual = ModifiedResNet(
                layers=self.config.resnet_layers,
                width=self.config.vision_width,
                heads=self.config.vision_width // 2,
                out_dim=self.config.embed_dim, dtype=self.dtype)
        else:
            self.visual = VisionTransformer(self.config, self.dtype)
        self.text = TextTransformer(self.config, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1.0 / 0.07),
                                                 dtype=jnp.float32))

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


def preprocess(images: jnp.ndarray, resolution: int = 224,
               input_range: str = "minus1_1") -> jnp.ndarray:
    """Resize (bicubic) + CLIP-normalize, NHWC.

    input_range: "minus1_1" ([-1,1], the framework's canonical image range,
    matching reference retrievers.py:84-88) or "unit" ([0,1]).
    """
    if input_range == "minus1_1":
        images = images * 0.5 + 0.5
    elif input_range != "unit":
        raise ValueError(input_range)
    b, h, w, c = images.shape
    if (h, w) != (resolution, resolution):
        images = jax.image.resize(
            images, (b, resolution, resolution, c), method="bicubic")
    images = jnp.clip(images, 0.0, 1.0)
    return (images - CLIP_MEAN) / CLIP_STD
