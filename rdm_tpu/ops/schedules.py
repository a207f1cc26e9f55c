"""Diffusion noise schedules and DDIM sampling tables.

TPU-first design notes
----------------------
All schedule tables are computed once on the host in float64 and stored as
float32 ``jnp`` arrays; they are closed over by jitted functions so XLA bakes
them into the compiled program as constants.  The per-step DDIM update indexes
into these tables with a traced scalar (``lax.scan`` carries the step index),
keeping the whole reverse process inside a single compiled loop with static
shapes.  Model compute runs in bfloat16; the schedule math stays in float32 to
preserve the update's numerical fidelity (SURVEY.md §7 "hard parts" (b)).

Behavioral parity targets (semantics, not code, from the reference):
- beta schedule "linear": sqrt-space linspace, squared
  (ldm.modules.diffusionmodules.util.make_beta_schedule, used via
  /root/reference/rdm/models/diffusion/ddpm.py with linear_start=0.0015,
  linear_end=0.0195, timesteps=1000 in models/rdm/*/config.yaml).
- DDIM timestep selection + (alpha, alpha_prev, sigma) tables
  (/root/reference/rdm/models/diffusion/ddim.py:27-56).
- DDIM update rule (/root/reference/rdm/models/diffusion/ddim.py:253-267).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule, computed in float64 on host.

    "linear" is the LDM convention: linear in sqrt(beta) space.
    """
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0.0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Forward-process (DDPM) tables. All arrays are float32, length T."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    # posterior q(x_{t-1} | x_t, x_0)
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    num_timesteps: int = 1000
    # ELBO weights for the "eps" parameterization (ldm DDPM.register_schedule)
    lvlb_weights: jnp.ndarray = None

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        schedule: str = "linear",
        linear_start: float = 0.0015,
        linear_end: float = 0.0195,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            schedule, timesteps, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(
            np.maximum(posterior_variance, 1e-20)
        )
        posterior_mean_coef1 = (
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )
        # posterior_variance[0] == 0; row 0 is overwritten below, so guard
        # the division instead of warning
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2
                * posterior_variance
                * alphas
                * (1 - alphas_cumprod)
            )
        lvlb_weights[0] = lvlb_weights[1]

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(posterior_mean_coef1),
            posterior_mean_coef2=f32(posterior_mean_coef2),
            num_timesteps=timesteps,
            lvlb_weights=f32(lvlb_weights),
        )


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule coefficients and broadcast to `ndim` dims."""
    out = jnp.take(table, t)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(
    schedule: DiffusionSchedule,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0): forward diffusion in one shot.

    Math kept in float32 regardless of activation dtype; result is cast back.
    """
    x32 = x_start.astype(jnp.float32)
    out = (
        _extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim) * x32
        + _extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        * noise.astype(jnp.float32)
    )
    return out.astype(x_start.dtype)


def predict_start_from_noise(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    return (
        _extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    method: str = "uniform",
) -> np.ndarray:
    """Subset of DDPM steps used by DDIM (ascending).

    "uniform": stride subsample then shift by +1, matching the reference
    sampler's tables so released checkpoints sample identically.
    """
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif method == "quad":
        ddim_timesteps = (
            (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps))
            ** 2
        ).astype(int)
    else:
        raise ValueError(f"unknown ddim discretization '{method}'")
    # the reference's +1 shift; clamp covers the degenerate S == T case
    # (the reference itself would index out of bounds there)
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-DDIM-step tables, ascending in t. Length S."""

    timesteps: jnp.ndarray  # int32 [S] — DDPM t for each DDIM step
    alphas: jnp.ndarray  # float32 [S] — alphas_cumprod[timesteps]
    alphas_prev: jnp.ndarray  # float32 [S]
    sqrt_one_minus_alphas: jnp.ndarray  # float32 [S]
    sigmas: jnp.ndarray  # float32 [S]
    num_steps: int = 0

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: str = "uniform",
    ) -> "DDIMSchedule":
        ddim_timesteps = make_ddim_timesteps(
            num_steps, schedule.num_timesteps, method
        )
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        alphas = acp[ddim_timesteps]
        alphas_prev = np.concatenate(
            [acp[:1], acp[ddim_timesteps[:-1]]]
        )
        sigmas = eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ddim_timesteps, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
            num_steps=len(ddim_timesteps),
        )


def ddim_step(
    ddim: DDIMSchedule,
    x: jnp.ndarray,
    eps: jnp.ndarray,
    index: jnp.ndarray,
    noise: jnp.ndarray,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One reverse DDIM update x_t -> x_{t_prev} given predicted eps.

    Returns (x_prev, pred_x0). All math in float32.
    """
    x = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    shape1 = (1,) * (x.ndim - 1)
    a_t = ddim.alphas[index].reshape((1,) + shape1)
    a_prev = ddim.alphas_prev[index].reshape((1,) + shape1)
    sigma_t = ddim.sigmas[index].reshape((1,) + shape1)
    sqrt_one_minus_at = ddim.sqrt_one_minus_alphas[index].reshape((1,) + shape1)

    pred_x0 = (x - sqrt_one_minus_at * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * eps
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * temperature * noise
    return x_prev, pred_x0


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding: [cos | sin] halves (ADM convention).

    Computed in float32; callers cast to the model compute dtype.
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
