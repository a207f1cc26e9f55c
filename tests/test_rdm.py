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


def _dezero(params, seed=9):
    """Replace exactly-zero kernels (ADM zero-init out layers) with small
    random values: a fresh ADM U-Net is a constant function, so conditioning
    sensitivity and gradient flow are only observable after perturbation."""
    i = [0]

    def leaf(v):
        if v.ndim >= 2 and not np.any(np.asarray(v)):
            i[0] += 1
            return jax.random.normal(jax.random.PRNGKey(seed + i[0]),
                                     v.shape) * 0.02
        return v

    return jax.tree.map(leaf, params)


def test_conditioning_key_routing_roundtrip():
    """concat / hybrid / adm conditioning keys round-trip through
    training_loss and ddim sampling (reference ddpm.py:30-32,60-131)."""
    schedule = DiffusionSchedule.create(50, "linear", 0.0015, 0.0195)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 2))
    nns = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 2, 8))
    cc = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    y = jnp.asarray([1, 4])

    # concat: U-Net sees channel-concat input, no cross-attention
    unet = UNetConfig(
        in_channels=5, out_channels=2, model_channels=16, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2),
        num_head_channels=8, context_dim=8)
    cfg = tiny_rdm(unet=unet, conditioning_key="concat")
    model = RDM(cfg)
    params = model.init(jax.random.PRNGKey(0), z, jnp.asarray([0, 1]),
                        None, concat=cc)
    loss, _ = model.apply(params, z, None, jax.random.PRNGKey(4), schedule,
                          concat=cc, method=RDM.training_loss)
    assert np.isfinite(float(loss))
    out = sample_with_neighbors(
        model, params, None, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=1.0),
        jax.random.PRNGKey(5), concat=cc)
    assert out.shape == (2, 8, 8, 2)

    # hybrid: concat + cross-attention context
    cfg = tiny_rdm(unet=unet, conditioning_key="hybrid")
    model = RDM(cfg)
    params = model.init(jax.random.PRNGKey(0), z, jnp.asarray([0, 1]),
                        jnp.zeros((2, 2, 8)), concat=cc)
    loss, _ = model.apply(params, z, nns, jax.random.PRNGKey(4), schedule,
                          concat=cc, method=RDM.training_loss)
    assert np.isfinite(float(loss))
    out = sample_with_neighbors(
        model, params, nns, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=2.0),
        jax.random.PRNGKey(5), concat=cc)
    assert out.shape == (2, 8, 8, 2)

    # adm: class label through the U-Net label embedding
    unet_adm = UNetConfig(
        in_channels=2, out_channels=2, model_channels=16, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2),
        num_head_channels=8, context_dim=8, num_classes=10)
    cfg = tiny_rdm(unet=unet_adm, conditioning_key="adm")
    model = RDM(cfg)
    params = model.init(jax.random.PRNGKey(0), z, jnp.asarray([0, 1]),
                        None, y=y)
    params = _dezero(params)
    loss, _ = model.apply(params, z, None, jax.random.PRNGKey(4), schedule,
                          y=y, method=RDM.training_loss)
    assert np.isfinite(float(loss))
    out = sample_with_neighbors(
        model, params, None, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=1.0),
        jax.random.PRNGKey(5), y=y)
    assert out.shape == (2, 8, 8, 2)
    # labels must reach the forward pass (perturbation keeps the network
    # near-identity, so compare raw eps predictions bit-exactly)
    o1 = model.apply(params, z, jnp.asarray([3, 7]), None, y=y)
    o2 = model.apply(params, z, jnp.asarray([3, 7]), None,
                     y=jnp.asarray([2, 7]))
    assert float(jnp.abs(o1 - o2).max()) > 0.0


def test_learnable_nn_encoder_trains():
    """A learnable aggregator nn_encoder consumes per-neighbor token
    sequences in training_loss and gets NONZERO grads (reference
    ddpm.py:221-241 + optimizer scope :1013-1042 — here the encoder params
    nest inside the RDM tree, so the optimizer covers them by
    construction)."""
    cfg = tiny_rdm(nn_encoder="aggregator", nn_encoder_depth=1,
                   nn_encoder_heads=2, nn_encoder_head_dim=4)
    model = RDM(cfg)
    schedule = DiffusionSchedule.create(50, "linear", 0.0015, 0.0195)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 2))
    # [B, n, k, T, c] token sequences (e.g. VQ latents of nn_patches)
    nns = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 2, 6, 8))
    params = _dezero(model.init(jax.random.PRNGKey(0), z,
                                jnp.asarray([0, 1]), nns))
    assert "nn_encoder_mod" in params["params"]

    def loss_fn(p):
        loss, _ = model.apply(p, z, nns, jax.random.PRNGKey(3), schedule,
                              method=RDM.training_loss)
        return loss

    grads = jax.grad(loss_fn)(params)
    enc_grads = grads["params"]["nn_encoder_mod"]
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(enc_grads))
    assert gnorm > 0.0
    # sampling consumes the same token-sequence neighbors
    out = sample_with_neighbors(
        model, params, nns, schedule,
        DDIMSamplerConfig(num_steps=3, guidance_scale=2.0),
        jax.random.PRNGKey(5))
    assert out.shape == (2, 8, 8, 2)
