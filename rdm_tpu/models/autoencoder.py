"""First-stage autoencoders: VQGAN (VQ-f4 / VQ-f16) and KL-regularized VAE.

TPU-first re-design of the first-stage models the reference inherits from
`taming` / `ldm` (imported at /root/reference/rdm/models/diffusion/ddpm.py:21-22
as AutoencoderKL/VQModelInterface and taming.models.vqgan.VQModel in
/root/reference/models/rarm/imagenet/dogs/config.yaml:29):

- NHWC layout; every conv is HWIO and lands on the MXU.
- The encoder/decoder are pure flax modules; quantization is a
  nearest-codebook matmul (one [N, n_embed] dot on the MXU, no per-vector
  loops) with a straight-through estimator.
- Norms/softmax in float32; convs in the configured compute dtype.

Released operating points (the ldm/taming model zoo downloaded by
/root/reference/scripts/download_first_stages.sh):
  VQ-f4 : embed_dim 3,   n_embed 8192,  ch 128, ch_mult (1,2,4),   no attn
  VQ-f16: embed_dim 256, n_embed 16384, ch 128, ch_mult (1,1,2,2,4), attn @16
  KL-f*: same trunk with double_z and a diagonal-Gaussian head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdm_tpu.models.layers import GroupNorm32
from rdm_tpu.ops.attention import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    """Architecture spec shared by VQ and KL variants."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 3
    resolution: int = 256
    double_z: bool = False
    dropout: float = 0.0
    # quantizer / posterior head
    embed_dim: int = 3
    n_embed: int = 8192  # 0 => KL model

    @classmethod
    def vq_f4(cls) -> "AutoencoderConfig":
        return cls()

    @classmethod
    def vq_f16(cls) -> "AutoencoderConfig":
        return cls(ch_mult=(1, 1, 2, 2, 4), attn_resolutions=(16,),
                   z_channels=256, embed_dim=256, n_embed=16384)

    @classmethod
    def kl_f8(cls) -> "AutoencoderConfig":
        return cls(ch_mult=(1, 2, 4, 4), z_channels=4, embed_dim=4,
                   double_z=True, n_embed=0)

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)


def _conv(features, kernel, dtype, *, stride=1, padding="SAME", name=None):
    # QuantizableConv reproduces nn.Conv exactly in f32/bf16 (same param
    # names/shapes — checkpoints load unchanged) and gives the decoder an
    # int8 serving fast path (ops/quant.quantize_conv_tree; round-5 int8
    # phase 3 — the VQ decode is the non-U-Net compute in the int8
    # serving program).
    from rdm_tpu.models.layers import QuantizableConv
    return QuantizableConv(features=features, kernel=kernel, stride=stride,
                           padding=padding, dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = _conv(self.out_channels, 3, self.dtype, name="conv1")(
            nn.swish(GroupNorm32(epsilon=1e-6, name="norm1")(x)))
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(self.out_channels, 3, self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = _conv(c, 1, self.dtype, name="q")(hn).reshape(b, h * w, 1, c)
        k = _conv(c, 1, self.dtype, name="k")(hn).reshape(b, h * w, 1, c)
        v = _conv(c, 1, self.dtype, name="v")(hn).reshape(b, h * w, 1, c)
        out = dot_product_attention(q, k, v).reshape(b, h, w, c)
        return x + _conv(c, 1, self.dtype, name="proj_out")(out)


class _Downsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1) padding — matches the torch
    first-stage weights' spatial alignment so converted checkpoints
    reconstruct identically."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(x.shape[-1], 3, self.dtype, stride=2, padding="VALID",
                     name="conv")(x)


class _Upsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from rdm_tpu.models.layers import _resize_nearest

        c = x.shape[-1]
        x = _resize_nearest(x, 2)
        return _conv(c, 3, self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.config
        h = _conv(cfg.ch, 3, self.dtype, name="conv_in")(x.astype(self.dtype))
        cur_res = cfg.resolution
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout, self.dtype,
                                name=f"down_{level}_block_{i}")(
                    h, deterministic=deterministic)
                if cur_res in cfg.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_{level}_attn_{i}")(h)
            if level != cfg.num_resolutions - 1:
                h = _Downsample(self.dtype, name=f"down_{level}_downsample")(h)
                cur_res //= 2
        h = ResnetBlock(h.shape[-1], cfg.dropout, self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm_out")(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv(out_ch, 3, self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        cfg = self.config
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = _conv(block_in, 3, self.dtype, name="conv_in")(
            z.astype(self.dtype))
        h = ResnetBlock(block_in, cfg.dropout, self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        cur_res = cfg.resolution // cfg.downsample_factor
        for level in reversed(range(cfg.num_resolutions)):
            for i in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.ch * cfg.ch_mult[level], cfg.dropout,
                                self.dtype, name=f"up_{level}_block_{i}")(
                    h, deterministic=deterministic)
                if cur_res in cfg.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = _Upsample(self.dtype, name=f"up_{level}_upsample")(h)
                cur_res *= 2
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm_out")(h))
        return _conv(cfg.out_ch, 3, self.dtype, name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantization as one MXU matmul.

    ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 — argmin needs only the last two
    terms, computed as a [N, n_embed] dot product. Straight-through gradient.
    """

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    def _codebook(self):
        return self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim), jnp.float32)

    @nn.compact
    def __call__(self, z):
        codebook = self._codebook()
        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        logits = flat @ codebook.T  # [N, n_embed], MXU
        d = jnp.sum(codebook**2, axis=1)[None, :] - 2.0 * logits
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(codebook, idx, axis=0).reshape(z.shape)
        commit_loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z.astype(jnp.float32)) ** 2
        ) + jnp.mean((z_q - jax.lax.stop_gradient(z.astype(jnp.float32))) ** 2)
        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q.astype(z.dtype) - z)
        return z_q, commit_loss, idx.reshape(z.shape[:-1])

    @nn.compact
    def lookup(self, idx):
        return jnp.take(self._codebook(), idx, axis=0)


class DiagonalGaussian:
    """Posterior for the KL model: channel-split mean/logvar."""

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=jnp.float32)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3))


class VQModel(nn.Module):
    """VQGAN: encoder → pre-quant 1x1 → codebook → post-quant 1x1 → decoder.

    `encode` returns (z_q, commit_loss, indices); `decode` maps quantized (or
    raw, force_not_quantize) latents back to images; `decode_code` decodes
    token ids (the RARM path, cf. reference transformer.py:286-294).
    """

    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, self.dtype)
        self.decoder = Decoder(cfg, self.dtype)
        self.quant_conv = _conv(cfg.embed_dim, 1, self.dtype,
                                name="quant_conv")
        self.post_quant_conv = _conv(cfg.z_channels, 1, self.dtype,
                                     name="post_quant_conv")
        self.quantize = VectorQuantizer(cfg.n_embed, cfg.embed_dim)

    def encode(self, x, *, deterministic: bool = True):
        h = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return self.quantize(h)

    def encode_prequant(self, x, *, deterministic: bool = True):
        """Continuous latent before quantization (LDM trains on this)."""
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode(self, z, *, force_not_quantize: bool = False,
               deterministic: bool = True):
        if not force_not_quantize:
            z, _, _ = self.quantize(z)
        return self.decoder(self.post_quant_conv(z),
                            deterministic=deterministic)

    def quantize_latent(self, z, *, deterministic: bool = True):
        """Codebook projection of a pre-quant latent [B,H,W,embed_dim]
        (the reference DDIM's quantize_denoised hook,
        ddim.py:260-261 via first_stage_model.quantize)."""
        z_q, _, _ = self.quantize(z)
        return z_q

    def decode_code(self, idx, *, deterministic: bool = True):
        """idx: [B, H, W] int token grid → image."""
        z_q = self.quantize.lookup(idx)
        return self.decoder(self.post_quant_conv(z_q),
                            deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True):
        z_q, loss, idx = self.encode(x, deterministic=deterministic)
        rec = self.decode(z_q, force_not_quantize=True,
                          deterministic=deterministic)
        return rec, loss, idx


class AutoencoderKL(nn.Module):
    """KL-regularized VAE (the kl-f* first stages)."""

    config: AutoencoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, self.dtype)
        self.decoder = Decoder(cfg, self.dtype)
        self.quant_conv = _conv(2 * cfg.embed_dim, 1, self.dtype,
                                name="quant_conv")
        self.post_quant_conv = _conv(cfg.z_channels, 1, self.dtype,
                                     name="post_quant_conv")

    def encode(self, x, *, deterministic: bool = True) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return DiagonalGaussian(moments)

    def decode(self, z, *, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)),
                            deterministic=deterministic)

    def __call__(self, x, rng, *, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior
