"""GIT — generative masked-image transformer (research variant).

TPU-native equivalent of /root/reference/rdm/modules/attention.py:368-434:
a bidirectional (non-causal) transformer over VQ token grids that predicts
masked tokens, optionally conditioned on a continuous masking-rate scalar
`r` (prepended as an embedded token) and on retrieved neighbors via
cross-attention. Decoding follows MaskGIT-style iterative unmasking.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdm_tpu.models.layers import LayerNormF32, TransformerBlock

Dtype = Any


@dataclasses.dataclass(frozen=True)
class GITConfig:
    input_vocab: int = 16385  # codes + mask token
    output_vocab: int = 16384
    embed_dim: int = 768
    n_layer: int = 12
    max_seq_len: int = 256
    n_heads: int = 12
    context_dim: Optional[int] = 512
    r_conditional: bool = True
    mask_token: int = 16384

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads


class GIT(nn.Module):
    config: GITConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, r=None, context=None, *,
                 deterministic: bool = True):
        """tokens int [B, S]; r optional [B, 1, 1] masking-rate scalar;
        context optional [B, S_ctx, D]. → logits [B, S, output_vocab]."""
        cfg = self.config
        x = nn.Embed(cfg.input_vocab, cfg.embed_dim,
                     param_dtype=jnp.float32,
                     name="tok_emb")(tokens).astype(self.dtype)
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (cfg.max_seq_len, cfg.embed_dim), jnp.float32)
        x = x + pos[: x.shape[1]].astype(x.dtype)
        r_len = 0
        if r is not None:
            assert cfg.r_conditional
            r_emb = nn.Dense(cfg.embed_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="to_r")(r)
            x = jnp.concatenate([r_emb, x], axis=1)
            r_len = r_emb.shape[1]
        for i in range(cfg.n_layer):
            x = TransformerBlock(
                heads=cfg.n_heads, head_dim=cfg.head_dim,
                has_cross=context is not None, dtype=self.dtype,
                name=f"block_{i}")(x, context,
                                   deterministic=deterministic)
        x = LayerNormF32(name="ln_f")(x)
        logits = nn.Dense(cfg.output_vocab, use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="to_logits")(x).astype(jnp.float32)
        return logits[:, r_len:]

    def masked_loss(self, tokens, rng, context=None,
                    *, deterministic: bool = True):
        """MaskGIT training objective: mask a random fraction
        r ~ U(0,1) of tokens, predict originals at masked positions."""
        cfg = self.config
        b, s = tokens.shape
        r_rng, m_rng = jax.random.split(rng)
        rate = jax.random.uniform(r_rng, (b, 1))
        mask = jax.random.uniform(m_rng, (b, s)) < rate
        masked = jnp.where(mask, cfg.mask_token, tokens)
        r = rate[:, :, None] if cfg.r_conditional else None
        logits = self(masked, r=r, context=context,
                      deterministic=deterministic)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[..., None],
                                   axis=-1)[..., 0]
        denom = jnp.maximum(mask.sum(), 1)
        loss = jnp.where(mask, nll, 0.0).sum() / denom
        return loss, {"loss": loss, "mask_rate": jnp.mean(rate)}


def maskgit_decode(model: GIT, params, context, rng, *,
                   steps: int = 8, batch: Optional[int] = None,
                   temperature: float = 1.0) -> jnp.ndarray:
    """Iterative unmasking: start fully masked, each step commit the
    most-confident predictions following a cosine unmasking schedule."""
    cfg = model.config
    b = batch or (context.shape[0] if context is not None else 1)
    s = cfg.max_seq_len
    tokens = jnp.full((b, s), cfg.mask_token, dtype=jnp.int32)
    known = jnp.zeros((b, s), dtype=bool)

    def body(carry, step):
        tokens, known, rng = carry
        frac_known_next = jnp.cos(
            (1.0 - (step + 1) / steps) * jnp.pi / 2)
        n_keep = jnp.ceil(frac_known_next * s).astype(jnp.int32)
        rate = 1.0 - known.mean(axis=1, keepdims=True)
        r = rate[:, :, None] if cfg.r_conditional else None
        logits = model.apply(params, tokens, r, context) / temperature
        rng, srng = jax.random.split(rng)
        sampled = jax.random.categorical(srng, logits, axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None],
                                   axis=-1)[..., 0]
        conf = jnp.where(known, jnp.inf, conf)  # keep committed tokens
        thresh = -jnp.sort(-conf, axis=1)[
            jnp.arange(b), jnp.minimum(n_keep, s - 1)]
        new_known = conf >= thresh[:, None]
        new_tokens = jnp.where(known, tokens,
                               sampled.astype(jnp.int32))
        new_tokens = jnp.where(new_known, new_tokens, cfg.mask_token)
        return (new_tokens, new_known | known, rng), None

    (tokens, known, _), _ = jax.lax.scan(
        body, (tokens, known, rng), jnp.arange(steps))
    # any still-masked positions: final greedy fill
    rate = jnp.zeros((b, 1, 1)) if cfg.r_conditional else None
    logits = model.apply(params, tokens, rate, context)
    final = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(known, tokens, final)


class GITUNet(nn.Module):
    """Token-grid masked-image model over the ADM U-Net trunk — the
    reference GITWrapper (/root/reference/rdm/modules/diffusionmodules/
    openaimodel.py:599-656): tokens are embedded to `unet.in_channels`
    channels, reshaped to the [side, side] grid, run through the U-Net
    with the masking-rate scalar `r` standing in for the timestep
    embedding, and projected to per-position codebook logits by the
    id-predictor head (GroupNorm -> 1x1 conv)."""

    unet_config: Any  # rdm_tpu.models.unet.UNetConfig
    input_vocab: int = 16385
    output_vocab: int = 16384
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, r=None, context=None, *,
                 deterministic: bool = True):
        """tokens [B, S] int; r [B] float mask rate (or None -> zeros);
        context [B, S_ctx, D] cross-attention conditioning.
        Returns logits [B, S, output_vocab]."""
        from rdm_tpu.models.layers import GroupNorm32, conv
        from rdm_tpu.models.unet import UNet

        b, s = tokens.shape
        side = int(s ** 0.5)
        assert side * side == s, "token count must be a square grid"
        if r is None:
            r = jnp.zeros((b,), dtype=jnp.float32)
        r = r.reshape(b)  # the reference squeezes trailing dims
        x = nn.Embed(self.input_vocab, self.unet_config.in_channels,
                     param_dtype=jnp.float32, name="tok_emb")(tokens)
        x = x.reshape(b, side, side, -1).astype(self.dtype)
        # timestep-embedding path consumes the (continuous) mask rate; the
        # sinusoidal embedding accepts floats as-is
        h = UNet(self.unet_config, dtype=self.dtype, name="unet")(
            x, r, context, deterministic=deterministic,
            return_features=True)
        # id predictor (ldm UNetModel.id_predictor semantics)
        h = GroupNorm32(name="id_norm")(h)
        logits = conv(self.output_vocab, 1, self.dtype,
                      name="id_predictor")(h)
        return logits.reshape(b, s, self.output_vocab).astype(jnp.float32)


class GITConcatUNet(nn.Module):
    """GITConcatWrapper (reference openaimodel.py:659-716): conditioning
    is a spatial feature map channel-concatenated to the embedded token
    grid (produced by `context_encoder`: context, side -> [B, side, side,
    Cc]) instead of cross-attention."""

    unet_config: Any
    context_channels: int
    input_vocab: int = 16385
    output_vocab: int = 16384
    embedding_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, context_map, r=None, *,
                 deterministic: bool = True):
        """tokens [B, S] int; context_map [B, side, side, Cc] spatial
        conditioning (e.g. a SpatioTemporalConcatZNNEncoder output).
        unet_config.in_channels must equal embedding_dim +
        context_channels."""
        from rdm_tpu.models.layers import GroupNorm32, conv
        from rdm_tpu.models.unet import UNet

        b, s = tokens.shape
        side = int(s ** 0.5)
        assert side * side == s
        assert context_map.shape[-1] == self.context_channels
        assert (self.unet_config.in_channels
                == self.embedding_dim + self.context_channels)
        if r is None:
            r = jnp.zeros((b,), dtype=jnp.float32)
        x = nn.Embed(self.input_vocab, self.embedding_dim,
                     param_dtype=jnp.float32, name="tok_emb")(tokens)
        x = x.reshape(b, side, side, -1).astype(self.dtype)
        x = jnp.concatenate([x, context_map.astype(x.dtype)], axis=-1)
        h = UNet(self.unet_config, dtype=self.dtype, name="unet")(
            x, r.reshape(b), None, deterministic=deterministic,
            return_features=True)
        h = GroupNorm32(name="id_norm")(h)
        logits = conv(self.output_vocab, 1, self.dtype,
                      name="id_predictor")(h)
        return logits.reshape(b, s, self.output_vocab).astype(jnp.float32)
