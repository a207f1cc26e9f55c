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

    def setup(self):
        cfg = self.config
        self.unet = UNet(cfg.unet, dtype=self.dtype)
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

    def __call__(self, x, t, context, *, deterministic: bool = True):
        """eps-prediction forward. context: [B, S, context_dim] or None."""
        return self.unet(x, t, context, deterministic=deterministic)

    def uncond_context(self, batch: int, seq_len: int,
                      guidance_label: Optional[float] = None) -> jnp.ndarray:
        """Null conditioning [B, S, D]: the guidance vector broadcast over
        the neighbor sequence; a label rescales its norm (ddpm.py:673-680)."""
        vex = self.unconditional_guidance_vex
        if guidance_label is not None:
            vex = vex / jnp.linalg.norm(vex) * guidance_label
        return jnp.broadcast_to(vex, (batch, seq_len, vex.shape[-1]))

    def training_loss(self, z, neighbors, rng, schedule: DiffusionSchedule,
                      *, deterministic: bool = False):
        """One diffusion training objective evaluation.

        Args:
          z: latents [B, H, W, C] (already first-stage-encoded and scaled).
          neighbors: retrieved embeddings [B, n_patches^2, k, D] or
            pre-flattened [B, S, D].
          rng: PRNG key.
        Returns (loss, dict of metrics).
        """
        cfg = self.config
        b = z.shape[0]
        if neighbors.ndim == 4:
            n, k, d = neighbors.shape[1:]
            context = neighbors.reshape(b, n * k, d)  # b n k d -> b (n k) d
        else:
            context = neighbors
        t_rng, noise_rng, drop_rng, retro_rng = jax.random.split(rng, 4)

        if cfg.p_uncond > 0.0:
            drop = jax.random.bernoulli(drop_rng, cfg.p_uncond, (b,))
            uncond = self.uncond_context(b, context.shape[1])
            context = jnp.where(drop[:, None, None], uncond, context)

        t = jax.random.randint(t_rng, (b,), 0, cfg.timesteps)
        noise = jax.random.normal(noise_rng, z.shape, dtype=jnp.float32)
        x_noisy = q_sample(schedule, z, t, noise)
        if cfg.retro_noise:
            ctx_noise = jax.random.normal(retro_rng, context.shape,
                                          dtype=jnp.float32)
            context = q_sample(schedule, context, t, ctx_noise)

        pred = self(x_noisy, t, context, deterministic=deterministic)
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


def make_denoise_fn(model: RDM, params):
    """Bind params: (x, t, context) -> eps."""

    def fn(x, t, context):
        return model.apply(params, x, t, context)

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
) -> jnp.ndarray:
    """DDIM-sample latents conditioned on a neighbor sequence.

    neighbors: [B, n, k, D] or [B, S, D]. Returns latents [B, H, W, C];
    decode with the first stage. The whole call is jit-able.
    """
    cfg = model.config
    if neighbors.ndim == 4:
        neighbors = flatten_neighbors(neighbors)
    b, s, _ = neighbors.shape
    shape = (b, cfg.image_size, cfg.image_size, cfg.channels)
    uncond = None
    if sampler.guidance_scale != 1.0:
        uncond = model.apply(params, b, s, guidance_label,
                             method=RDM.uncond_context)
    x, _ = ddim_sample(
        make_denoise_fn(model, params), schedule, sampler, shape,
        neighbors, rng, uncond_context=uncond)
    return x / cfg.scale_factor
