"""ADM-style U-Net with retrieval cross-attention — the RDM denoiser.

TPU-first re-design of the reference U-Net
(/root/reference/rdm/modules/diffusionmodules/openaimodel.py:36-371):

- NHWC layout; every conv/matmul lands on the MXU in bfloat16.
- Single functional signature `apply(params, x, t, context)` — the reference's
  wrapper/conditioning-key maze (ddpm.py:60-131) collapses to "context is the
  cross-attention sequence" because all released RDM configs use
  `conditioning_key: retro_only` (models/rdm/*/config.yaml).
- The timestep embedding is computed in float32 and shared across blocks.
- Gradient rematerialization is applied at the train-step level (checkpoint
  policy), not per-block, letting XLA schedule the recompute.

Released operating points:
  ImageNet: model_channels=192, channel_mult=(1,2,3,5), attn at ds {2,4,8},
            num_head_channels=32, transformer_depth=1, context_dim=512.
  FFHQ:     model_channels=224, channel_mult=(1,2,3,4), same attention spec.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from rdm_tpu.models.layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    Upsample,
    conv,
)
from rdm_tpu.ops.schedules import timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    model_channels: int = 192
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)  # ds values
    channel_mult: Tuple[int, ...] = (1, 2, 3, 5)
    num_heads: int = -1
    num_head_channels: int = 32
    transformer_depth: int = 1
    context_dim: Optional[int] = 512
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    num_classes: Optional[int] = None
    conv_resample: bool = True

    @classmethod
    def imagenet_rdm(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def ffhq_rdm(cls) -> "UNetConfig":
        return cls(model_channels=224, channel_mult=(1, 2, 3, 4))

    def heads_for(self, ch: int) -> Tuple[int, int]:
        """(num_heads, head_dim) for a channel count, num_head_channels rule."""
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels


class UNet(nn.Module):
    """eps-prediction U-Net. Input/output NHWC.

    __call__(x[B,H,W,C], t[B], context[B,S,Dc] or None, y[B] or None) -> eps
    """

    config: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context=None, y=None, *,
                 deterministic: bool = True, return_features: bool = False,
                 shared_cfg: Optional[bool] = None,
                 encoder_cache=None, return_cache: bool = False):
        """return_features=True skips the zero-init out head and returns
        the trunk features [B, H, W, model_channels] — the reference
        GITWrapper.unet_forward path (openaimodel.py:645-656), which feeds
        an id-predictor head instead of self.out.

        encoder_cache/return_cache implement the encoder-reuse serving
        mode ("Faster Diffusion", arXiv 2312.09608): return_cache=True
        also returns `(skip_tuple, mid)` from the down path + middle;
        passing that back as encoder_cache on a later step skips them
        entirely and re-runs ONLY the up path with the current timestep
        embedding. Approximate (the cached features belong to a nearby
        x_t); opt-in, never used by training or the exact samplers.

        Shared-prefix CFG: when `context` has batch 2B while `x` has batch
        B, the two context halves are taken as the (cond, uncond) pair of
        classifier-free guidance over the SAME x/t (reference
        ddim.py:229-238 doubles the whole batch instead). Every block
        before the first cross-attention is context-independent, so the
        prefix (conv_in, the pre-attention ResBlocks, the first
        downsamples) runs once at batch B and the stream is tiled to 2B
        exactly where the context first enters; pre-divergence skip
        connections are tiled at consumption. Bit-exact math, ~8% fewer
        FLOPs per CFG step at the flagship config. Output batch follows
        the context (2B).

        `shared_cfg` controls the contract explicitly (round-2 advisor):
        None (default) auto-detects from the 2B context batch as above;
        True asserts the caller really passed a (cond, uncond)-stacked
        context; False opts out, so an accidental 2x-batch context raises
        instead of silently tiling the activations."""
        cfg = self.config
        ch0 = cfg.model_channels
        time_dim = ch0 * 4

        ctx_doubled = (context is not None
                       and context.shape[0] == 2 * x.shape[0]
                       and context.shape[0] > 0)
        if shared_cfg and not ctx_doubled:
            raise ValueError(
                "shared_cfg=True requires context batch == 2 * x batch "
                f"(got context {None if context is None else context.shape}"
                f" vs x {x.shape})")
        if shared_cfg is False and context is not None \
                and context.shape[0] != x.shape[0]:
            raise ValueError(
                "shared_cfg=False: context batch must equal x batch "
                f"(got {context.shape[0]} vs {x.shape[0]})")
        shared_cfg = ctx_doubled if shared_cfg is None else bool(shared_cfg)
        tiled = not shared_cfg  # flips True once the stream is doubled

        def tile2(a):
            return jnp.concatenate([a, a], axis=0)

        t_emb = timestep_embedding(t, ch0)
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense1")(t_emb.astype(self.dtype))
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense2")(nn.silu(emb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional UNet requires labels"
            emb = emb + nn.Embed(
                cfg.num_classes, time_dim, dtype=self.dtype,
                param_dtype=jnp.float32, name="label_emb",
            )(y)

        if context is not None:
            context = context.astype(self.dtype)
        x = x.astype(self.dtype)

        def res(ch, name, **kw):
            return ResBlock(
                out_channels=ch, dropout=cfg.dropout,
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                dtype=self.dtype, name=name, **kw,
            )

        def attn(ch, name):
            heads, head_dim = cfg.heads_for(ch)
            return SpatialTransformer(
                heads=heads, head_dim=head_dim, depth=cfg.transformer_depth,
                dropout=cfg.dropout, dtype=self.dtype, name=name,
            )

        # Block outputs are tagged with jax.ad_checkpoint.checkpoint_name
        # by downsampling factor ("blk_ds{1,2,4,...}") so the train step's
        # "save_lowres" remat policy can keep the cheap low-resolution
        # activations and recompute only the large high-res ones
        # (train_state.make_train_step; no-op outside jax.checkpoint).
        def ckpt(a, d):
            return checkpoint_name(a, f"blk_ds{d}")

        if encoder_cache is not None:
            # encoder-reuse serving mode (Faster Diffusion, 2312.09608):
            # skip the whole down path + middle and reuse the features
            # cached on an earlier DDIM step; the up path still runs with
            # the CURRENT timestep embedding and context. Approximate by
            # construction — the skips/mid belong to a nearby x_t.
            hs, h = list(encoder_cache[0]), encoder_cache[1]
            ds = 2 ** (len(cfg.channel_mult) - 1)
            ch = cfg.channel_mult[-1] * ch0
            if h.shape[0] == 2 * x.shape[0] and not tiled:
                emb, tiled = tile2(emb), True
        else:
            # ---- down path ----
            h = conv(ch0, 3, self.dtype, name="conv_in")(x)
            hs = [h]
            ds = 1
            ch = ch0
            for level, mult in enumerate(cfg.channel_mult):
                for i in range(cfg.num_res_blocks):
                    ch = mult * ch0
                    h = res(ch, f"down_{level}_{i}_res")(
                        h, emb, deterministic=deterministic)
                    if ds in cfg.attention_resolutions:
                        if not tiled:
                            h, emb, tiled = tile2(h), tile2(emb), True
                        h = attn(ch, f"down_{level}_{i}_attn")(
                            h, context, deterministic=deterministic)
                    h = ckpt(h, ds)
                    hs.append(h)
                if level != len(cfg.channel_mult) - 1:
                    if cfg.resblock_updown:
                        h = res(ch, f"down_{level}_down", down=True)(
                            h, emb, deterministic=deterministic)
                    else:
                        h = Downsample(out_channels=ch,
                                       use_conv=cfg.conv_resample,
                                       dtype=self.dtype,
                                       name=f"down_{level}_down")(h)
                    ds *= 2
                    h = ckpt(h, ds)
                    hs.append(h)

            # ---- middle ----
            h = res(ch, "mid_res1")(h, emb, deterministic=deterministic)
            if not tiled:  # no attention in the down path at all
                h, emb, tiled = tile2(h), tile2(emb), True
            h = attn(ch, "mid_attn")(h, context,
                                     deterministic=deterministic)
            h = res(ch, "mid_res2")(h, emb, deterministic=deterministic)
            h = ckpt(h, ds)

        feats = (tuple(hs), h)

        # ---- up path ----
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if skip.shape[0] != h.shape[0]:  # pre-divergence skip
                    skip = tile2(skip)
                ch = mult * ch0
                # skip passed separately: the ResBlock evaluates the virtual
                # channel-concat without materializing it (SPLIT_SKIP_CONCAT)
                h = res(ch, f"up_{level}_{i}_res")(h, emb, skip=skip,
                                                   deterministic=deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"up_{level}_{i}_attn")(
                        h, context, deterministic=deterministic)
                h = ckpt(h, ds)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = res(ch, f"up_{level}_up", up=True)(
                            h, emb, deterministic=deterministic)
                    else:
                        h = Upsample(out_channels=ch, use_conv=cfg.conv_resample,
                                     dtype=self.dtype, name=f"up_{level}_up")(h)
                    ds //= 2
        assert not hs, "skip-connection bookkeeping mismatch"

        if return_features:
            return h
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = conv(cfg.out_channels, 3, self.dtype, zero_init=True,
                 name="out_conv")(h)
        out = h.astype(jnp.float32)
        if return_cache:
            return out, feats
        return out


class EncoderUNet(nn.Module):
    """Half U-Net classifier/feature-extractor — the reference's
    EncoderUNetModel (/root/reference/rdm/modules/diffusionmodules/
    openaimodel.py:374-590): the down path + middle block followed by a
    pooled head. pool: "adaptive" (global average) or "spatial" (flatten).
    Used for noisy-classifier guidance experiments.
    """

    config: UNetConfig
    out_features: int = 512
    pool: str = "adaptive"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        cfg = self.config
        ch0 = cfg.model_channels
        time_dim = ch0 * 4
        t_emb = timestep_embedding(t, ch0)
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense1")(t_emb.astype(self.dtype))
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_dense2")(nn.silu(emb))

        def res(ch, name, **kw):
            return ResBlock(out_channels=ch, dropout=cfg.dropout,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            dtype=self.dtype, name=name, **kw)

        h = conv(ch0, 3, self.dtype, name="conv_in")(x.astype(self.dtype))
        ds, ch = 1, ch0
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * ch0
                h = res(ch, f"down_{level}_{i}_res")(
                    h, emb, deterministic=deterministic)
                if ds in cfg.attention_resolutions:
                    heads, head_dim = cfg.heads_for(ch)
                    h = SpatialTransformer(
                        heads=heads, head_dim=head_dim,
                        depth=cfg.transformer_depth, dtype=self.dtype,
                        name=f"down_{level}_{i}_attn")(
                        h, None, deterministic=deterministic)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(out_channels=ch,
                               use_conv=cfg.conv_resample,
                               dtype=self.dtype,
                               name=f"down_{level}_down")(h)
                ds *= 2
        h = res(ch, "mid_res1")(h, emb, deterministic=deterministic)
        h = res(ch, "mid_res2")(h, emb, deterministic=deterministic)
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        if self.pool == "adaptive":
            h = jnp.mean(h, axis=(1, 2))
        else:
            h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name="head")(h).astype(jnp.float32)
