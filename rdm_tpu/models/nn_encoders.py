"""Neighbor-encoder zoo: retrieved neighbors → conditioning sequences.

TPU-native equivalents of /root/reference/rdm/modules/encoders/
nn_encoders.py (415 LoC). Released configs only ever use the CLIP path
(CLIPEmbeddingReshaper + IdentityEncoder — nn_encoders.py:127-145), but the
zoo's VQ-patch encoders and learned aggregators are part of the component
surface, so they are re-implemented here over this framework's VQModel.

Shape glossary: neighbors arrive as [B, n, k, ...] (n = patches per query
image, k = neighbors per patch); conditioning leaves as [B, S, D].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdm_tpu.models.autoencoder import VQModel
from rdm_tpu.models.layers import LayerNormF32, TransformerBlock

Dtype = Any


class CLIPEmbeddingReshaper:
    """[B, n, k, d] → [B, n*k, d] (nn_encoders.py:127-130)."""

    def __call__(self, nns: jnp.ndarray) -> jnp.ndarray:
        b, n, k, d = nns.shape
        return nns.reshape(b, n * k, d)


class IdentityEncoder:
    """Pass-through; flattens leading neighbor axes to one sequence axis
    (nn_encoders.py:133-145)."""

    def encode(self, nns: jnp.ndarray) -> jnp.ndarray:
        if nns.ndim == 4:
            b, n, k, d = nns.shape
            return nns.reshape(b, n * k, d)
        return nns

    __call__ = encode


class DummyEncoder:
    """Zeros of the right shape (nn_encoders.py:244-252) — ablation tool."""

    def __init__(self, out_dim: int = 512):
        self.out_dim = out_dim

    def encode(self, nns: jnp.ndarray) -> jnp.ndarray:
        b = nns.shape[0]
        s = nns.shape[1] * nns.shape[2] if nns.ndim >= 3 else nns.shape[1]
        return jnp.zeros((b, s, self.out_dim), dtype=jnp.float32)

    __call__ = encode


# ---------------------------------------------------------------------------
# VQ-patch encoders: neighbors given as pixel patches [B, n, k, h, w, 3]
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _VQBase:
    """Shared plumbing: flatten neighbor patches through a frozen VQ
    encoder. Each subclass picks the latent representation + layout."""

    vq: VQModel
    params: Any

    def _encode_z(self, patches: jnp.ndarray) -> jnp.ndarray:
        """[N, h, w, 3] → pre-quant latents [N, h', w', c]."""
        return self.vq.apply(self.params, patches,
                             method=VQModel.encode_prequant)

    def _encode_codes(self, patches: jnp.ndarray) -> jnp.ndarray:
        """[N, h, w, 3] → code ids [N, h', w']."""
        _, _, idx = self.vq.apply(self.params, patches,
                                  method=VQModel.encode)
        return idx


@dataclasses.dataclass
class ClassicVQEncoder(_VQBase):
    """Continuous latents, spatial tokens: [B,n,k,h,w,3] →
    [B, n*k*h'*w', c] (nn_encoders.py:13-24 semantics)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        _, hp, wp, c = z.shape
        return z.reshape(b, n * k * hp * wp, c)

    __call__ = encode


@dataclasses.dataclass
class CodebookNNEncoder(_VQBase):
    """Code ids as the conditioning sequence: [B,n,k,h,w,3] →
    int [B, n*k*h'*w'] (nn_encoders.py:27-42)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        idx = self._encode_codes(flat)
        return idx.reshape(b, -1)

    __call__ = encode


@dataclasses.dataclass
class SpatioTemporalZNNEncoder(_VQBase):
    """Neighbors stacked along channels per spatial site: [B,n,k,h,w,3] →
    [B, n*h'*w', k*c] (the 'spatio-temporal concat' family,
    nn_encoders.py:45-84,148-186)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        _, hp, wp, c = z.shape
        z = z.reshape(b, n, k, hp * wp, c)
        z = jnp.transpose(z, (0, 1, 3, 2, 4))  # [b, n, hw, k, c]
        return z.reshape(b, n * hp * wp, k * c)

    __call__ = encode


@dataclasses.dataclass
class SpatioTemporalCodeNNEncoder(_VQBase):
    """Code ids, spatial tokens: [B,n,k,h,w,3] → int [B, n*k*h'*w']
    (nn_encoders.py:77-84) — the downstream transformer learns its own
    code embedding."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        return self._encode_codes(flat).reshape(b, -1)

    __call__ = encode


@dataclasses.dataclass
class TemporalNNCodeEncoder(_VQBase):
    """Per-neighbor code sequences: [B,n,k,h,w,3] → int [B, n*k, h'*w']
    (nn_encoders.py:87-105)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        idx = self._encode_codes(flat)
        return idx.reshape(b, n * k, -1)

    __call__ = encode


@dataclasses.dataclass
class TemporalNNZEncoder(_VQBase):
    """One flattened latent vector per neighbor: [B,n,k,h,w,3] →
    [B, n*k, h'*w'*c] (nn_encoders.py:108-126)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        return z.reshape(b, n * k, -1)

    __call__ = encode


@dataclasses.dataclass
class SpatioTemporalConcatZNNEncoder(_VQBase):
    """Neighbors concatenated along CHANNELS, spatial map kept —
    channel-concat conditioning for the U-Net concat/hybrid keys:
    [B,n,k,h,w,3] → [B, h', w', n*k*c] (nn_encoders.py:148-180, NHWC)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        _, hp, wp, c = z.shape
        z = z.reshape(b, n * k, hp, wp, c)
        z = jnp.transpose(z, (0, 2, 3, 1, 4))  # [b, h, w, nk, c]
        return z.reshape(b, hp, wp, n * k * c)

    __call__ = encode


@dataclasses.dataclass
class SpatioTemporalConcatCodeNNEncoder(_VQBase):
    """Code-id maps per neighbor: [B,n,k,h,w,3] → int [B, n*k, h', w']
    (nn_encoders.py:180-186)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        idx = self._encode_codes(flat)
        return idx.reshape(b, n * k, *idx.shape[1:])

    __call__ = encode


@dataclasses.dataclass
class VQConcatNNEncoder(_VQBase):
    """List of n*k pre-quant latent maps [B, h', w', c] — per-depth context
    lists for SpatialTransformer (nn_encoders.py:188-201)."""

    def encode(self, patches: jnp.ndarray) -> list:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        _, hp, wp, c = z.shape
        z = z.reshape(b, n * k, hp, wp, c)
        return [z[:, i] for i in range(n * k)]

    __call__ = encode


@dataclasses.dataclass
class DimensionStackerVQEncoder(_VQBase):
    """Spatial sites as tokens, neighbors stacked in the feature dim:
    [B,n,k,h,w,3] → [B, h'*w', n*k*c] (nn_encoders.py:224-241)."""

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        z = self._encode_z(flat)
        _, hp, wp, c = z.shape
        z = z.reshape(b, n * k, hp * wp, c)
        z = jnp.transpose(z, (0, 2, 1, 3))  # [b, hw, nk, c]
        return z.reshape(b, hp * wp, n * k * c)

    __call__ = encode


@dataclasses.dataclass
class PixelNNEncoderUnetConcatenator:
    """Arbitrary per-neighbor encoder + a spatial backbone over the
    channel-concat of all neighbor features (nn_encoders.py:204-222):
    [B,n,k,h,w,3] → encoder per neighbor → [B, h', w', n*k*c] → backbone.

    encoder: [N, h, w, 3] → [N, h', w', c] (e.g. a frozen VQ encode_prequant
    closure); backbone: [B, h', w', n*k*c] → spatial conditioning map.
    """

    encoder: Any
    backbone: Any

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        b, n, k = patches.shape[:3]
        flat = patches.reshape((b * n * k,) + patches.shape[3:])
        feats = self.encoder(flat)
        _, hp, wp, c = feats.shape
        feats = feats.reshape(b, n * k, hp, wp, c)
        feats = jnp.transpose(feats, (0, 2, 3, 1, 4))
        return self.backbone(feats.reshape(b, hp, wp, n * k * c))

    __call__ = encode


class VQGANAggregator(nn.Module):
    """Learned per-neighbor pooling: spatial VQ tokens + a CLS token
    through a small transformer; the CLS outputs become the neighbor
    sequence (nn_encoders.py:255-312 BERT-style pooling).

    __call__(z_tokens [B*k, T, c]) → [B, k, out_dim] via k passed in.
    """

    out_dim: int = 512
    depth: int = 2
    heads: int = 8
    head_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, k: int) -> jnp.ndarray:
        bk, t, c = tokens.shape
        inner = self.heads * self.head_dim
        x = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_in")(tokens)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (inner,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (bk, 1, inner)), x],
            axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (t + 1, inner), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = TransformerBlock(
                heads=self.heads, head_dim=self.head_dim, has_cross=False,
                dtype=self.dtype, name=f"block_{i}")(x)
        pooled = LayerNormF32(name="norm_out")(x[:, 0])
        out = nn.Dense(self.out_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="proj_out")(pooled)
        return out.reshape(bk // k, k, self.out_dim)


# The reference distinguishes VQGANAggregator (code-id input, learned token
# embedding, nn_encoders.py:255-312) from ContinuousVQGANAggregator (raw VQ
# latents + Linear proj_in, :315-391). This module's Dense proj_in IS the
# continuous variant; alias it and add the code-id front end below.
ContinuousVQGANAggregator = VQGANAggregator


class CodeVQGANAggregator(nn.Module):
    """Code-id neighbors → learned token embedding → BERT-style CLS pooling
    (the reference's *discrete* VQGANAggregator, nn_encoders.py:255-312).

    __call__(ids int [B*k, T], k) → [B, k, out_dim].
    """

    num_tokens: int
    embed_dim: int = 512
    out_dim: int = 512
    depth: int = 2
    heads: int = 8
    head_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, k: int) -> jnp.ndarray:
        tokens = nn.Embed(self.num_tokens, self.embed_dim,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="token_emb")(ids)
        return VQGANAggregator(
            out_dim=self.out_dim, depth=self.depth, heads=self.heads,
            head_dim=self.head_dim, dtype=self.dtype,
            name="aggregator")(tokens, k)


class VQGANNNAttender(nn.Module):
    """Cross-neighbor attention: condense each neighbor's spatial tokens,
    then let neighbors attend to each other (nn_encoders.py:393-415)."""

    out_dim: int = 512
    depth: int = 2
    heads: int = 8
    head_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, k: int) -> jnp.ndarray:
        pooled = VQGANAggregator(
            out_dim=self.out_dim, depth=1, heads=self.heads,
            head_dim=self.head_dim, dtype=self.dtype,
            name="condense")(tokens, k)  # [B, k, D]
        x = pooled
        for i in range(self.depth):
            x = TransformerBlock(
                heads=self.heads, head_dim=self.head_dim, has_cross=False,
                dtype=self.dtype, name=f"cross_{i}")(x)
        return x
