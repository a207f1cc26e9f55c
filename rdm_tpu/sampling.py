"""Jit-compiled samplers: DDIM (RDM) with classifier-free guidance.

TPU-first re-design of the reference DDIMSampler
(/root/reference/rdm/models/diffusion/ddim.py:58-268):

- The whole reverse process is ONE compiled program: `lax.scan` over the
  (static) DDIM step tables — no per-step Python dispatch, no host sync.
- CFG doubles the batch through a single denoiser call per step (parity with
  ddim.py:229-238) so the U-Net always sees one static batch shape.
- Schedule math stays float32 (tables baked as compile-time constants);
  the model runs in its own compute dtype.
- Optional per-step intermediates (pred_x0 trajectory) via scan outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from rdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule, ddim_step

# denoiser: (x, t, context) -> eps prediction
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DDIMSamplerConfig:
    num_steps: int = 100
    eta: float = 0.0
    method: str = "uniform"
    temperature: float = 1.0
    guidance_scale: float = 1.0  # 1.0 => no CFG branch compiled in
    log_every_t: int = 0  # 0 => no intermediates
    # "double": tile x/t/context to 2B through one denoiser call (reference
    # ddim.py:229-238). "shared": pass x/t at B with the stacked
    # [cond; uncond] context at 2B — requires a denoiser that implements
    # shared-prefix CFG (UNet auto-detects the 2B context and runs the
    # context-independent prefix once; exact same math, fewer FLOPs).
    cfg_mode: str = "double"
    # Encoder-reuse serving mode ("Faster Diffusion", arXiv 2312.09608):
    # recompute the U-Net down path + middle only every `encoder_reuse`
    # steps, re-running just the up path (with the current timestep
    # embedding) in between. 1 = exact sampling (default). >1 is
    # APPROXIMATE — cached features belong to a nearby x_t — and needs a
    # `denoise_feats_fn` (rdm.make_denoise_feats_fn).
    encoder_reuse: int = 1


def ddim_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    config: DDIMSamplerConfig,
    shape: Tuple[int, ...],
    context: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    uncond_context: Optional[jnp.ndarray] = None,
    x_init: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    quantize_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    style_context: Optional[jnp.ndarray] = None,
    content_context: Optional[jnp.ndarray] = None,
    random_guiding: str = "none",
    denoise_feats_fn=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the full DDIM reverse process.

    Args:
      denoise_fn: eps-model `(x[B,...], t[B], context[B,S,D]) -> eps[B,...]`.
      shape: static output shape (B, H, W, C).
      context: conditioning sequence, or None for an unconditional model.
      uncond_context: CFG null conditioning (same shape as context). Required
        when config.guidance_scale != 1.
      x_init: optional starting noise (defaults to N(0,1)).
      mask/x0: optional inpainting blend — keep x0 where mask==1
        (reference ddim.py:187-190).
      quantize_fn: optional pred_x0 projection applied each step — the
        `quantize_denoised` codebook snap (reference ddim.py:260-261);
        pass the first stage's quantizer.
      style_context / content_context: SNR-gated conditioning swap
        (reference ddim.py:178-184, after arXiv 2204.00227): style_context
        replaces the conditioning when snr < 5e-2 (late, low-noise steps
        set color/style), content_context when 5e-2 <= snr < 1.
      random_guiding: "none" | "fixed" | "sampled" — replace the CFG
        unconditional eps with a clamped N(0,1) guider drawn once
        ("fixed") or per step ("sampled") (reference ddim.py:169-171,
        193-194, 240-241).

    Returns:
      (x_0 sample, pred_x0 intermediates [n_logged, B, ...] or None)
    """
    ddim = DDIMSchedule.create(
        schedule, config.num_steps, eta=config.eta, method=config.method)
    use_cfg = config.guidance_scale != 1.0
    if use_cfg and uncond_context is None:
        raise ValueError("guidance_scale != 1 requires uncond_context")
    if config.cfg_mode not in ("double", "shared"):
        raise ValueError(f"bad cfg_mode '{config.cfg_mode}'")

    rng, init_rng = jax.random.split(rng)
    x = (x_init if x_init is not None
         else jax.random.normal(init_rng, shape, dtype=jnp.float32))
    if mask is not None:
        # reference ddim.py:187-190 blends q_sample(x0, ts) at the CURRENT
        # timestep before every step; pre-blend the initial noise at the
        # first (largest) DDIM timestep to match.
        from rdm_tpu.ops.schedules import q_sample

        ddim_pre = DDIMSchedule.create(
            schedule, config.num_steps, eta=config.eta, method=config.method)
        rng, brng = jax.random.split(rng)
        t0 = jnp.full((shape[0],), ddim_pre.timesteps[-1], dtype=jnp.int32)
        noised0 = q_sample(schedule, x0, t0,
                           jax.random.normal(brng, shape, jnp.float32))
        x = mask * noised0 + (1.0 - mask) * x

    if random_guiding not in ("none", "fixed", "sampled"):
        raise ValueError(f"bad random_guiding '{random_guiding}'")
    fixed_guider = None
    if random_guiding == "fixed":
        rng, grng = jax.random.split(rng)
        fixed_guider = jnp.clip(
            jax.random.normal(grng, shape, jnp.float32), -1.0, 1.0)

    def step_context(index):
        """SNR-gated style/content swap (reference ddim.py:178-184)."""
        ctx = context
        if ctx is None:
            return None
        snr = ddim.alphas[index] / (1.0 - ddim.alphas[index])
        if style_context is not None:
            ctx = jnp.where(snr < 5e-2, style_context, ctx)
        if content_context is not None:
            ctx = jnp.where(jnp.logical_and(snr >= 5e-2, snr < 1.0),
                            content_context, ctx)
        return ctx

    reuse = max(int(config.encoder_reuse), 1)
    if reuse > 1 and denoise_feats_fn is None:
        raise ValueError("encoder_reuse > 1 needs a denoise_feats_fn "
                         "(see rdm.make_denoise_feats_fn)")

    def dn(x_, t_, c_, cache):
        # every CFG mode makes exactly ONE denoiser call per step, so the
        # encoder cache threads through uniformly
        if denoise_feats_fn is None:
            return denoise_fn(x_, t_, c_), cache
        return denoise_feats_fn(x_, t_, c_, cache)

    def eps_model(x, t, ctx, guider, cache=None):
        if ctx is None:
            return dn(x, t, None, cache)
        if not use_cfg:
            return dn(x, t, ctx, cache)
        if guider is not None:
            # random guiding: the guider replaces the unconditional eps
            eps_c, cache = dn(x, t, ctx, cache)
            return guider + config.guidance_scale * (
                eps_c.astype(jnp.float32) - guider), cache
        ctx2 = jnp.concatenate([ctx, uncond_context], axis=0)
        if config.cfg_mode == "shared":
            eps2, cache = dn(x, t, ctx2, cache)
            if eps2.shape[0] != 2 * x.shape[0]:
                # e.g. a conditioning_key='concat' model drops the
                # cross-attention context before the U-Net, so the
                # shared-prefix contract (out batch follows the 2B
                # context) cannot hold — fail loudly instead of
                # silently splitting a B batch in half
                raise ValueError(
                    "cfg_mode='shared' needs a denoiser that returns "
                    f"batch {2 * x.shape[0]} for a doubled context "
                    f"(got {eps2.shape[0]}); use cfg_mode='double'")
        else:
            eps2, cache = dn(jnp.concatenate([x, x], axis=0),
                             jnp.concatenate([t, t], axis=0), ctx2, cache)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return eps_u + config.guidance_scale * (eps_c - eps_u), cache

    steps = ddim.num_steps

    cache0 = None
    if reuse > 1:
        # zero-filled cache pytree of the right shapes; step 0 refreshes.
        # The shape probe must use the SAME guider shape the scan body
        # will: "sampled" random guiding draws a per-step guider (single
        # denoiser call at batch B), while guider=None takes the
        # CFG-doubled path (cache at 2B) — probing with the wrong one
        # makes the carried cache batch mismatch the body.
        t_ex = jnp.full((shape[0],), ddim.timesteps[steps - 1],
                        dtype=jnp.int32)
        guider_ex = fixed_guider
        if random_guiding == "sampled":
            guider_ex = jnp.zeros(shape, jnp.float32)
        cache_shapes = jax.eval_shape(
            lambda xx: eps_model(xx, t_ex, step_context(steps - 1),
                                 guider_ex, None)[1], x)
        cache0 = jax.tree.map(lambda l: jnp.zeros(l.shape, l.dtype),
                              cache_shapes)

    def body(carry, step):
        if reuse > 1:
            x, cache, rng = carry
        else:
            x, rng = carry
        index = steps - 1 - step  # descending through the tables
        t = jnp.full((shape[0],), ddim.timesteps[index], dtype=jnp.int32)
        guider = fixed_guider
        if random_guiding == "sampled":
            rng, grng = jax.random.split(rng)
            guider = jnp.clip(jax.random.normal(grng, shape, jnp.float32),
                              -1.0, 1.0)
        sc = step_context(index)
        if reuse > 1:
            eps, cache = jax.lax.cond(
                step % reuse == 0,
                lambda c: eps_model(x, t, sc, guider, None),
                lambda c: eps_model(x, t, sc, guider, c),
                cache)
        else:
            eps, _ = eps_model(x, t, sc, guider)
        rng, nrng, mrng = jax.random.split(rng, 3)
        noise = jax.random.normal(nrng, shape, dtype=jnp.float32)
        if quantize_fn is None:
            x_prev, pred_x0 = ddim_step(
                ddim, x, eps, index, noise,
                temperature=config.temperature)
        else:
            # quantize_denoised: snap pred_x0 to the first-stage codebook
            # before the update (reference ddim.py:260-261)
            shape1 = (1,) * (x.ndim - 1)
            a_t = ddim.alphas[index].reshape((1,) + shape1)
            a_prev = ddim.alphas_prev[index].reshape((1,) + shape1)
            sigma_t = ddim.sigmas[index].reshape((1,) + shape1)
            sq1ma = ddim.sqrt_one_minus_alphas[index].reshape(
                (1,) + shape1)
            xf = x.astype(jnp.float32)
            ef = eps.astype(jnp.float32)
            pred_x0 = quantize_fn((xf - sq1ma * ef) / jnp.sqrt(a_t))
            dir_xt = jnp.sqrt(
                jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * ef
            x_prev = (jnp.sqrt(a_prev) * pred_x0 + dir_xt
                      + sigma_t * config.temperature * noise)
        if mask is not None:
            # Post-step equivalent of the reference's pre-step blend
            # (ddim.py:187-190): the next iteration runs at DDIM index-1, so
            # re-noise x0 to ddim.timesteps[index-1] — NOT t-1, which at
            # DDIM-50 is ~19 noise levels too high. No blend after the
            # final step (index 0); the initial blend happened pre-scan.
            from rdm_tpu.ops.schedules import q_sample
            t_prev = jnp.full(
                (shape[0],),
                ddim.timesteps[jnp.maximum(index - 1, 0)], dtype=jnp.int32)
            noised = q_sample(schedule, x0, t_prev,
                              jax.random.normal(mrng, shape, jnp.float32))
            x_prev = jnp.where(index > 0,
                               mask * noised + (1.0 - mask) * x_prev,
                               x_prev)
        out = pred_x0 if config.log_every_t else None
        if reuse > 1:
            return (x_prev, cache, rng), out
        return (x_prev, rng), out

    carry0 = (x, cache0, rng) if reuse > 1 else (x, rng)
    final, interm = jax.lax.scan(
        body, carry0, jnp.arange(steps, dtype=jnp.int32))
    x = final[0]
    if config.log_every_t:
        interm = interm[:: config.log_every_t]
    return x, interm


def ddim_retro_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    config: DDIMSamplerConfig,
    shape: Tuple[int, ...],
    init_context: jnp.ndarray,
    rng: jax.Array,
    *,
    reembed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    retro_every: int = 10,
    uncond_context: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM with iterative re-retrieval — the reference's experimental
    DDIMRetroSampler (/root/reference/rdm/models/diffusion/ddim.py:270-415)
    re-designed to run entirely on device: every `retro_every` steps the
    current pred_x0 is re-embedded and new neighbors retrieved
    (`reembed_fn`: latents [B,H,W,C] → context [B,S,D], typically
    first-stage decode → CLIP image tower → kNN gather from the HBM table),
    inside the same compiled lax.scan — no host round-trips.
    """
    ddim = DDIMSchedule.create(
        schedule, config.num_steps, eta=config.eta, method=config.method)
    use_cfg = config.guidance_scale != 1.0
    if use_cfg and uncond_context is None:
        raise ValueError("guidance_scale != 1 requires uncond_context")
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, dtype=jnp.float32)
    steps = ddim.num_steps

    def eps_model(x, t, ctx):
        if not use_cfg:
            return denoise_fn(x, t, ctx)
        ctx2 = jnp.concatenate([ctx, uncond_context], 0)
        if config.cfg_mode == "shared":
            eps2 = denoise_fn(x, t, ctx2)
            if eps2.shape[0] != 2 * x.shape[0]:
                raise ValueError(
                    "cfg_mode='shared' needs a denoiser that returns "
                    f"batch {2 * x.shape[0]} for a doubled context "
                    f"(got {eps2.shape[0]}); use cfg_mode='double'")
        else:
            eps2 = denoise_fn(jnp.concatenate([x, x], 0),
                              jnp.concatenate([t, t], 0), ctx2)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return eps_u + config.guidance_scale * (eps_c - eps_u)

    def body(carry, step):
        x, ctx, rng = carry
        index = steps - 1 - step
        t = jnp.full((shape[0],), ddim.timesteps[index], dtype=jnp.int32)
        eps = eps_model(x, t, ctx)
        rng, nrng = jax.random.split(rng)
        noise = jax.random.normal(nrng, shape, dtype=jnp.float32)
        x_prev, pred_x0 = ddim_step(ddim, x, eps, index, noise,
                                    temperature=config.temperature)
        ctx = jax.lax.cond(
            jnp.logical_and(step % retro_every == 0, step > 0),
            lambda: reembed_fn(pred_x0).astype(ctx.dtype),
            lambda: ctx)
        return (x_prev, ctx, rng), None

    (x, _, _), _ = jax.lax.scan(
        body, (x, init_context, rng), jnp.arange(steps, dtype=jnp.int32))
    return x


def ddpm_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    shape: Tuple[int, ...],
    context: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
    x_init: Optional[jnp.ndarray] = None,
    log_every_t: int = 0,
):
    """Full-length ancestral DDPM sampling (the ldm `p_sample_loop` the
    reference inherits; used by log_images when ddim=False). One lax.scan
    over all T steps; posterior mean/variance from the schedule tables.

    log_every_t > 0 captures the pred-x0 every that many steps (the
    reference's `progressive_denoising`, ddpm.py:599-605) into a
    preallocated buffer written with dynamic_update_slice — returns
    (x, captures [ceil(T/log_every_t), *shape]). 0 returns just x."""
    from rdm_tpu.ops.schedules import predict_start_from_noise

    rng, init_rng = jax.random.split(rng)
    x = (x_init if x_init is not None
         else jax.random.normal(init_rng, shape, dtype=jnp.float32))
    T = schedule.num_timesteps
    n_cap = -(-T // log_every_t) if log_every_t > 0 else 0
    caps = jnp.zeros((max(n_cap, 1),) + tuple(shape), jnp.float32)

    def body(carry, step):
        x, caps, rng = carry
        t_scalar = T - 1 - step
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        eps = denoise_fn(x, t, context).astype(jnp.float32)
        x0 = predict_start_from_noise(schedule, x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        if n_cap:
            caps = jax.lax.cond(
                step % log_every_t == 0,
                lambda c: jax.lax.dynamic_update_slice(
                    c, x0[None], (step // log_every_t,)
                    + (0,) * len(shape)),
                lambda c: c, caps)
        shape1 = (-1,) + (1,) * (x.ndim - 1)
        mean = (jnp.take(schedule.posterior_mean_coef1, t).reshape(shape1)
                * x0
                + jnp.take(schedule.posterior_mean_coef2, t).reshape(shape1)
                * x)
        logvar = jnp.take(schedule.posterior_log_variance_clipped,
                          t).reshape(shape1)
        rng, nrng = jax.random.split(rng)
        noise = jax.random.normal(nrng, shape, dtype=jnp.float32)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return (x, caps, rng), None

    (x, caps, _), _ = jax.lax.scan(body, (x, caps, rng),
                                   jnp.arange(T, dtype=jnp.int32))
    if n_cap:
        return x, caps
    return x
