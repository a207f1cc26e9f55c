"""Frozen query/database embedders — the retriever zoo.

TPU-native equivalents of /root/reference/rdm/modules/retrievers.py:
- ClipImageRetriever (retrievers.py:67-95): [-1,1] NHWC images → resize 224
  bicubic → CLIP normalize → image tower → 512-d.
- CLIPTextEmbedder / ClipTxt2ImageRetriever (retrievers.py:98-127):
  captions → BPE tokenize → text tower → 512-d.
- VQGANRetriever / VAERetriever (retrievers.py:18-64): first-stage encode
  + flatten, for retrieval in autoencoder latent space.

Each retriever is a thin jitted closure over frozen params; the embedding
call is a pure device function so the offline builder can pipeline
host decode against device embedding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.models.autoencoder import AutoencoderKL, VQModel
from rdm_tpu.models.clip import CLIP, ClipConfig, preprocess
from rdm_tpu.utils.tokenizer import tokenize


class ClipImageRetriever:
    """images float [-1,1] NHWC (any size) → CLIP image embeddings."""

    def __init__(self, clip_params, config: Optional[ClipConfig] = None,
                 dtype=jnp.bfloat16):
        self.config = config or ClipConfig.vit_b32()
        self.model = CLIP(self.config, dtype=dtype)
        self.params = clip_params
        res = self.config.image_resolution

        @jax.jit
        def embed(params, images):
            x = preprocess(images, resolution=res)
            return self.model.apply(params, x, method=CLIP.encode_image)

        self._embed = embed

    @property
    def embed_dim(self) -> int:
        return self.config.embed_dim

    def __call__(self, images) -> jnp.ndarray:
        return self._embed(self.params, jnp.asarray(images,
                                                    dtype=jnp.float32))


class ClipTextRetriever:
    """captions → CLIP text embeddings (query-side for text-to-image)."""

    def __init__(self, clip_params, config: Optional[ClipConfig] = None,
                 dtype=jnp.bfloat16):
        self.config = config or ClipConfig.vit_b32()
        self.model = CLIP(self.config, dtype=dtype)
        self.params = clip_params
        self._embed = jax.jit(
            lambda params, toks: self.model.apply(params, toks,
                                                  method=CLIP.encode_text))

    @property
    def embed_dim(self) -> int:
        return self.config.embed_dim

    def __call__(self, captions: Sequence[str]) -> jnp.ndarray:
        toks = jnp.asarray(tokenize(list(captions),
                                    self.config.context_length))
        return self._embed(self.params, toks)


class VQGANRetriever:
    """images → flattened VQ latent (retrievers.py:18-40 semantics:
    resize to `size`, encode pre-quant, flatten)."""

    def __init__(self, vq: VQModel, params, size: int = 256):
        self.size = size

        @jax.jit
        def embed(p, images):
            b = images.shape[0]
            x = jax.image.resize(
                images, (b, size, size, images.shape[-1]), method="bicubic")
            z = vq.apply(p, x, method=VQModel.encode_prequant)
            return z.reshape(b, -1)

        self._embed = embed
        self.params = params

    def __call__(self, images) -> jnp.ndarray:
        return self._embed(self.params,
                           jnp.asarray(images, dtype=jnp.float32))


class VAERetriever:
    """images → flattened sampled KL posterior (retrievers.py:43-64)."""

    def __init__(self, vae: AutoencoderKL, params, size: int = 256,
                 seed: int = 0):
        self.size = size
        self.rng = jax.random.PRNGKey(seed)

        @jax.jit
        def embed(p, images, rng):
            b = images.shape[0]
            x = jax.image.resize(
                images, (b, size, size, images.shape[-1]), method="bicubic")
            posterior = vae.apply(p, x, method=AutoencoderKL.encode)
            return posterior.sample(rng).reshape(b, -1)

        self._embed = embed
        self.params = params

    def __call__(self, images) -> jnp.ndarray:
        self.rng, sub = jax.random.split(self.rng)
        return self._embed(self.params,
                           jnp.asarray(images, dtype=jnp.float32), sub)
