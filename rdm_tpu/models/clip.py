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
from typing import Any, Optional

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


class CLIP(nn.Module):
    """Both towers + logit scale. encode_image / encode_text return
    *unnormalized* 512-d embeddings (reference model.py:304-320); retrieval
    normalizes queries explicitly (dsetbuilder.py:506)."""

    config: ClipConfig
    dtype: Dtype = jnp.float32

    def setup(self):
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
