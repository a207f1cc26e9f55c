"""RDM — retrieval-augmented latent diffusion (the flagship model).

TPU-first re-design of MinimalRETRODiffusion
(/root/reference/rdm/models/diffusion/ddpm.py:134-1042). The reference's
wrapper/conditioning-key maze (DiffusionWrapper / RETRODiffusionWrapper,
ddpm.py:60-131) collapses to one rule — all released RDM configs use
`conditioning_key: retro_only` with an Identity retrieval encoder, so the
retrieved CLIP neighbors [B, n*k, 512] ARE the cross-attention context.

Semantics carried over (file:line into the reference):
- neighbor flattening `b n k d -> b (n k) d` (ddpm.py:365)
- classifier-free-guidance dropout: per-sample Bernoulli(p_uncond) replaces
  the whole neighbor sequence with a learned guidance vector
  (ddpm.py:393-396, 647-660)
- CFG label scales the *norm* of the guidance vector (ddpm.py:673-680)
- training loss: eps-prediction L2 with per-t logvar and optional ELBO term
  (ldm LatentDiffusion.p_losses semantics)
- query-as-neighbor: at inference a CLIP text/image query embedding is
  inserted as neighbor #0 (ddpm.py:775); `sample_with_neighbors` takes the
  already-assembled sequence.

The first stage (VQ-f4) and the CLIP retriever are frozen, separate modules;
their params are passed explicitly — nothing is hidden in module state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdm_tpu.models.unet import UNet, UNetConfig
from rdm_tpu.ops.schedules import (
    DiffusionSchedule,
    q_sample,
)
from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RDMConfig:
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig.imagenet_rdm)
    image_size: int = 64  # latent spatial size
    channels: int = 3  # latent channels
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    k_nn: int = 4
    n_patches_per_side: int = 1
    context_dim: int = 512
    # conditioning routing (reference ddpm.py:30-32, 60-131): how assembled
    # conditioning enters the U-Net. "retro_only"/"crossattn" = context via
    # cross-attention (all released configs); "concat" = channel concat;
    # "hybrid" = both; "adm" = class label through the U-Net label embedding.
    conditioning_key: str = "retro_only"
    # learnable neighbor encoder (reference init_nn_encoder ddpm.py:221-241;
    # its params live inside the RDM param tree, so the optimizer covers
    # them exactly like the reference's extended optimizer scope
    # ddpm.py:1013-1042). None => identity flatten of CLIP embeddings.
    nn_encoder: Optional[str] = None  # None | "aggregator" | "attender"
    nn_encoder_depth: int = 2
    nn_encoder_heads: int = 8
    nn_encoder_head_dim: int = 64
    p_uncond: float = 0.0
    scale_factor: float = 1.0
    parameterization: str = "eps"  # "eps" | "x0"
    learn_logvar: bool = False
    logvar_init: float = 0.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    retro_noise: bool = False

    @classmethod
    def imagenet(cls) -> "RDMConfig":
        return cls()

    @classmethod
    def ffhq(cls) -> "RDMConfig":
        return cls(unet=UNetConfig.ffhq_rdm())


class RDM(nn.Module):
    """Denoiser + CFG guidance vector + (optional) learned logvar.

    The module is deliberately thin: schedules live outside as pure tables,
    the first stage is a separate frozen model, and sampling is a pure
    function over `apply`.
    """

    config: RDMConfig
    dtype: Dtype = jnp.float32

    _COND_KEYS = ("retro_only", "crossattn", "concat", "hybrid", "adm")

    def setup(self):
        cfg = self.config
        if cfg.conditioning_key not in self._COND_KEYS:
            raise ValueError(f"unknown conditioning_key "
                             f"'{cfg.conditioning_key}' (one of "
                             f"{self._COND_KEYS})")
        self.unet = UNet(cfg.unet, dtype=self.dtype)
        if cfg.nn_encoder is not None:
            from rdm_tpu.models.nn_encoders import (VQGANAggregator,
                                                    VQGANNNAttender)
            enc_cls = {"aggregator": VQGANAggregator,
                       "attender": VQGANNNAttender}.get(cfg.nn_encoder)
            if enc_cls is None:
                raise ValueError(f"unknown nn_encoder '{cfg.nn_encoder}'")
            self.nn_encoder_mod = enc_cls(
                out_dim=cfg.context_dim, depth=cfg.nn_encoder_depth,
                heads=cfg.nn_encoder_heads,
                head_dim=cfg.nn_encoder_head_dim, dtype=self.dtype)
        self.unconditional_guidance_vex = self.param(
            "unconditional_guidance_vex",
            nn.initializers.normal(1.0),
            (cfg.context_dim,), jnp.float32)
        if cfg.learn_logvar:
            self.logvar = self.param(
                "logvar",
                lambda k: jnp.full((cfg.timesteps,), cfg.logvar_init,
                                   dtype=jnp.float32))
        else:
            self.logvar = jnp.full((cfg.timesteps,), cfg.logvar_init,
                                   dtype=jnp.float32)

    def __call__(self, x, t, context, y=None, concat=None, *,
                 deterministic: bool = True,
                 encoder_cache=None, return_cache: bool = False):
        """eps-prediction forward, routed by conditioning_key.

        context: [B, S, context_dim] or None (cross-attention paths);
        y: [B] int class labels (adm); concat: [B, H, W, Cc] channel-concat
        conditioning (concat/hybrid). Mirrors DiffusionWrapper.forward
        (reference ddpm.py:60-80) as explicit arguments instead of a
        key-dispatched cond dict.
        """
        key = self.config.conditioning_key
        if context is not None and context.ndim != 3:
            context = self.encode_neighbors(context)
        if key in ("concat", "hybrid"):
            if concat is None:
                raise ValueError(f"conditioning_key={key} requires concat")
            x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
        if key == "concat":
            context = None
        if key == "adm":
            if y is None:
                raise ValueError("conditioning_key=adm requires labels y")
            context = None
        return self.unet(x, t, context, y=y, deterministic=deterministic,
                         encoder_cache=encoder_cache,
                         return_cache=return_cache)

    def encode_neighbors(self, neighbors: jnp.ndarray) -> jnp.ndarray:
        """Neighbors → cross-attention context [B, S, context_dim].

        [B, n, k, D]: CLIP embeddings — identity flatten (ddpm.py:365), or
        per-neighbor learned pooling when nn_encoder is set.
        [B, n, k, T, c]: token sequences per neighbor (e.g. VQ latents of
        nn_patches) — requires a learned nn_encoder (aggregator/attender,
        reference nn_encoders.py:255-415).
        """
        cfg = self.config
        if neighbors.ndim == 3:
            return neighbors  # already [B, S, D]
        if neighbors.ndim == 4:
            b, n, k, d = neighbors.shape
            if cfg.nn_encoder is None:
                return neighbors.reshape(b, n * k, d)
            tokens = neighbors.reshape(b * n * k, 1, d)
            return self.nn_encoder_mod(tokens, k=n * k)
        if neighbors.ndim == 5:
            if cfg.nn_encoder is None:
                raise ValueError("token-sequence neighbors [B,n,k,T,c] "
                                 "need a learned nn_encoder")
            b, n, k, t, c = neighbors.shape
            tokens = neighbors.reshape(b * n * k, t, c)
            return self.nn_encoder_mod(tokens, k=n * k)
        raise ValueError(f"bad neighbor rank {neighbors.ndim}")

    def uncond_context(self, batch: int, seq_len: int,
                      guidance_label: Optional[float] = None) -> jnp.ndarray:
        """Null conditioning [B, S, D]: the guidance vector broadcast over
        the neighbor sequence; a label rescales its norm (ddpm.py:673-680)."""
        vex = self.unconditional_guidance_vex
        if guidance_label is not None:
            vex = vex / jnp.linalg.norm(vex) * guidance_label
        return jnp.broadcast_to(vex, (batch, seq_len, vex.shape[-1]))

    def training_loss(self, z, neighbors, rng, schedule: DiffusionSchedule,
                      *, y=None, concat=None, deterministic: bool = False):
        """One diffusion training objective evaluation.

        Args:
          z: latents [B, H, W, C] (already first-stage-encoded and scaled).
          neighbors: retrieved embeddings [B, n_patches^2, k, D],
            pre-flattened [B, S, D], or per-neighbor token sequences
            [B, n, k, T, c] (learned nn_encoder paths). None for
            concat/adm-only conditioning.
          y / concat: extra conditioning per conditioning_key.
          rng: PRNG key.
        Returns (loss, dict of metrics).
        """
        cfg = self.config
        b = z.shape[0]
        context = (self.encode_neighbors(neighbors)
                   if neighbors is not None else None)
        t_rng, noise_rng, drop_rng, retro_rng = jax.random.split(rng, 4)

        if context is not None and cfg.p_uncond > 0.0:
            drop = jax.random.bernoulli(drop_rng, cfg.p_uncond, (b,))
            uncond = self.uncond_context(b, context.shape[1])
            context = jnp.where(drop[:, None, None], uncond, context)

        t = jax.random.randint(t_rng, (b,), 0, cfg.timesteps)
        noise = jax.random.normal(noise_rng, z.shape, dtype=jnp.float32)
        x_noisy = q_sample(schedule, z, t, noise)
        if cfg.retro_noise and context is not None:
            ctx_noise = jax.random.normal(retro_rng, context.shape,
                                          dtype=jnp.float32)
            context = q_sample(schedule, context, t, ctx_noise)

        pred = self(x_noisy, t, context, y=y, concat=concat,
                    deterministic=deterministic)
        target = noise if cfg.parameterization == "eps" else z

        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        loss_simple = jnp.mean(err, axis=(1, 2, 3))  # [B]
        logvar_t = jnp.take(self.logvar, t)
        loss = loss_simple / jnp.exp(logvar_t) + logvar_t
        loss = cfg.l_simple_weight * jnp.mean(loss)
        metrics = {"loss_simple": jnp.mean(loss_simple)}
        if cfg.original_elbo_weight > 0.0:
            lvlb = jnp.mean(jnp.take(schedule.lvlb_weights, t) * loss_simple)
            loss = loss + cfg.original_elbo_weight * lvlb
            metrics["loss_vlb"] = lvlb
        metrics["loss"] = loss
        return loss, metrics


def flatten_neighbors(neighbors: jnp.ndarray) -> jnp.ndarray:
    """[B, n, k, D] -> [B, n*k, D] (reference ddpm.py:365)."""
    b, n, k, d = neighbors.shape
    return neighbors.reshape(b, n * k, d)


def make_denoise_fn(model: RDM, params, *, y=None, concat=None):
    """Bind params (+ static extra conditioning): (x, t, context) -> eps.

    For concat/hybrid/adm sampling the per-sample extra conditioning is
    closed over and, under CFG batch-doubling, tiled to the doubled batch.
    """

    def fn(x, t, context):
        yy, cc = y, concat
        if yy is not None and x.shape[0] == 2 * yy.shape[0]:
            yy = jnp.concatenate([yy, yy], axis=0)
        if cc is not None and x.shape[0] == 2 * cc.shape[0]:
            cc = jnp.concatenate([cc, cc], axis=0)
        return model.apply(params, x, t, context, y=yy, concat=cc)

    return fn


def make_denoise_feats_fn(model: RDM, params, *, y=None, concat=None):
    """Encoder-reuse variant of make_denoise_fn:
    (x, t, context, cache|None) -> (eps, cache). With cache=None the full
    U-Net runs and returns fresh down-path features; otherwise only the
    up path runs against the cached features (approximate — see
    UNet.__call__ encoder_cache)."""

    def fn(x, t, context, cache):
        yy, cc = y, concat
        if yy is not None and x.shape[0] == 2 * yy.shape[0]:
            yy = jnp.concatenate([yy, yy], axis=0)
        if cc is not None and x.shape[0] == 2 * cc.shape[0]:
            cc = jnp.concatenate([cc, cc], axis=0)
        return model.apply(params, x, t, context, y=yy, concat=cc,
                           encoder_cache=cache, return_cache=True)

    return fn


def sample_with_neighbors(
    model: RDM,
    params,
    neighbors: jnp.ndarray,
    schedule: DiffusionSchedule,
    sampler: DDIMSamplerConfig,
    rng: jax.Array,
    *,
    guidance_label: Optional[float] = None,
    y=None,
    concat=None,
    return_intermediates: bool = False,
) -> jnp.ndarray:
    """DDIM-sample latents conditioned on a neighbor sequence.

    neighbors: [B, n, k, D], [B, S, D], or token sequences [B, n, k, T, c]
    when the model has a learned nn_encoder. y/concat route per
    conditioning_key. Returns latents [B, H, W, C]; decode with the first
    stage. The whole call is jit-able.

    return_intermediates=True returns (latents, pred_x0 trajectory)
    instead (requires sampler.log_every_t != 0) — the fidelity harness
    (eval/fidelity.py) compares approximate serving modes step by step.
    """
    cfg = model.config
    uncond = None
    if neighbors is not None:
        neighbors = model.apply(params, neighbors,
                                method=RDM.encode_neighbors)
        b, s, _ = neighbors.shape
        if sampler.guidance_scale != 1.0:
            uncond = model.apply(params, b, s, guidance_label,
                                 method=RDM.uncond_context)
    else:  # concat/adm-only conditioning
        b = y.shape[0] if y is not None else concat.shape[0]
        if sampler.guidance_scale != 1.0:
            raise ValueError("CFG needs a neighbor context")
    shape = (b, cfg.image_size, cfg.image_size, cfg.channels)
    feats_fn = (make_denoise_feats_fn(model, params, y=y, concat=concat)
                if sampler.encoder_reuse > 1 else None)
    x, interm = ddim_sample(
        make_denoise_fn(model, params, y=y, concat=concat), schedule,
        sampler, shape, neighbors, rng, uncond_context=uncond,
        denoise_feats_fn=feats_fn)
    if return_intermediates:
        return x / cfg.scale_factor, interm
    return x / cfg.scale_factor
