"""RDM model + DDIM sampler tests: loss contract, CFG dropout, guidance
vector semantics, end-to-end jitted sampling, inpainting blend.

Parity targets: /root/reference/rdm/models/diffusion/ddpm.py:390-458,640-680
and ddim.py:142-268.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.rdm import (
    RDM,
    RDMConfig,
    flatten_neighbors,
    sample_with_neighbors,
)
from rdm_tpu.models.unet import UNetConfig
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample


def tiny_rdm(**kw):
    unet = UNetConfig(
        in_channels=2, out_channels=2, model_channels=16, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2),
        num_head_channels=8, context_dim=8)
    base = dict(unet=unet, image_size=8, channels=2, timesteps=50,
                context_dim=8, k_nn=2)
    base.update(kw)
    return RDMConfig(**base)


def _init(cfg):
    model = RDM(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.channels))
    t = jnp.asarray([0, 1])
    ctx = jnp.zeros((2, cfg.k_nn, cfg.context_dim))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    return model, params


def test_training_loss_finite_and_grads_flow():
    cfg = tiny_rdm(p_uncond=0.2)
    model, params = _init(cfg)
    schedule = DiffusionSchedule.create(
        cfg.timesteps, cfg.beta_schedule, cfg.linear_start, cfg.linear_end)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 2))
    nns = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 2, 8))

    def loss_fn(p):
        loss, metrics = model.apply(
            p, z, nns, jax.random.PRNGKey(3), schedule,
            method=RDM.training_loss)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_simple" in metrics
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0.0


def test_uncond_context_norm_scaling():
    cfg = tiny_rdm()
    model, params = _init(cfg)
    u = model.apply(params, 3, 4, 2.5, method=RDM.uncond_context)
    assert u.shape == (3, 4, 8)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(u[0, 0])), 2.5, rtol=1e-5)
    # all rows identical (broadcast of one vector)
    np.testing.assert_allclose(np.asarray(u[0, 0]), np.asarray(u[2, 3]),
                               atol=1e-7)


def test_flatten_neighbors():
    x = jnp.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    y = flatten_neighbors(x)
    assert y.shape == (2, 12, 5)
    np.testing.assert_array_equal(np.asarray(y[0, 7]), np.asarray(x[0, 1, 3]))


def test_ddim_sampling_end_to_end_jitted():
    cfg = tiny_rdm()
    model, params = _init(cfg)
    schedule = DiffusionSchedule.create(
        cfg.timesteps, cfg.beta_schedule, cfg.linear_start, cfg.linear_end)
    nns = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 2, 8))
    sampler = DDIMSamplerConfig(num_steps=5, guidance_scale=2.0)

    @jax.jit
    def run(rng):
        return sample_with_neighbors(model, params, nns, schedule, sampler,
                                     rng)

    x = run(jax.random.PRNGKey(6))
    assert x.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(x)).all()
    # deterministic in rng
    x2 = run(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    x3 = run(jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(x), np.asarray(x3))


def test_cfg_guidance_changes_sample():
    cfg = tiny_rdm()
    model, params = _init(cfg)
    # zero-init output conv => eps == 0 at init and CFG is a no-op; nudge
    # every conv kernel so the denoiser actually responds to context
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    schedule = DiffusionSchedule.create(
        cfg.timesteps, cfg.beta_schedule, cfg.linear_start, cfg.linear_end)
    nns = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2, 8))
    a = sample_with_neighbors(
        model, params, nns, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=1.0),
        jax.random.PRNGKey(0))
    b = sample_with_neighbors(
        model, params, nns, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=3.0),
        jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_inpainting_mask_keeps_known_region():
    """With mask==1 everywhere, the final step-wise blend pins x to renoised
    x0; at the last step t=~0 so output ≈ x0 in masked region."""
    cfg = tiny_rdm()
    model, params = _init(cfg)
    schedule = DiffusionSchedule.create(
        cfg.timesteps, cfg.beta_schedule, cfg.linear_start, cfg.linear_end)
    x0 = jnp.ones((1, 8, 8, 2)) * 0.5
    mask = jnp.ones_like(x0)
    ctx = jnp.zeros((1, 2, 8))
    out, _ = ddim_sample(
        lambda x, t, c: model.apply(params, x, t, c),
        schedule, DDIMSamplerConfig(num_steps=5), (1, 8, 8, 2), ctx,
        jax.random.PRNGKey(0), mask=mask, x0=x0)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=0.35)
