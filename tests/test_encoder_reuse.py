"""Encoder-reuse serving mode ("Faster Diffusion", arXiv 2312.09608):
UNet down-path features cached across DDIM steps, decoder re-run with
the current timestep embedding. Exact when refreshed every step;
approximate (and opt-in) beyond that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.rdm import (RDM, RDMConfig, make_denoise_feats_fn,
                                sample_with_neighbors)
from rdm_tpu.models.unet import UNet, UNetConfig
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample


def _tiny():
    unet = UNetConfig(
        in_channels=2, out_channels=2, model_channels=8, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=4, context_dim=8)
    return RDMConfig(unet=unet, image_size=8, channels=2, timesteps=20,
                     context_dim=8, k_nn=2)


def test_unet_cache_roundtrip_exact():
    # decoder-only from a cache taken at the SAME (x, t) must reproduce
    # the full forward bit-for-bit
    cfg = _tiny()
    unet = UNet(cfg.unet)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2))
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx)
    full, cache = unet.apply(params, x, t, ctx, return_cache=True)
    again, cache2 = unet.apply(params, x, t, ctx, encoder_cache=cache,
                               return_cache=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))
    for a, b in zip(jax.tree.leaves(cache), jax.tree.leaves(cache2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_cache_shared_cfg_roundtrip():
    # shared-prefix CFG (context 2B): the cached stream is tiled; the
    # decoder-only pass must tile the fresh emb and match the full call
    cfg = _tiny()
    unet = UNet(cfg.unet)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2))
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8))  # 2B
    params = unet.init(jax.random.PRNGKey(2), x, t,
                       ctx[:2])  # init with plain shapes
    full, cache = unet.apply(params, x, t, ctx, return_cache=True)
    assert full.shape[0] == 4  # output batch follows the 2B context
    again = unet.apply(params, x, t, ctx, encoder_cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))


@pytest.mark.parametrize("guidance,cfg_mode", [
    (1.0, "double"),          # no CFG
    (2.0, "shared"),          # shared-prefix CFG
    (2.0, "double"),          # reference-shaped CFG
])
def test_sample_with_encoder_reuse_runs(guidance, cfg_mode):
    cfg = _tiny()
    model = RDM(cfg)
    nns = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 2, 8))
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((2, 8, 8, 2)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 2, 8)))
    # randomize ALL weight leaves: the zero-init out head would otherwise
    # make eps identically 0 and mask the approximation
    rng_np = np.random.default_rng(0)
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng_np.standard_normal(p.shape).astype(np.float32) * 0.05)
        if p.ndim >= 2 else p, params)
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    exact = DDIMSamplerConfig(num_steps=6, guidance_scale=guidance,
                              cfg_mode=cfg_mode)
    fast = DDIMSamplerConfig(num_steps=6, guidance_scale=guidance,
                             cfg_mode=cfg_mode, encoder_reuse=3)
    z_exact = sample_with_neighbors(model, params, nns, schedule, exact,
                                    jax.random.PRNGKey(5),
                                    guidance_label=0.0)
    z_fast = sample_with_neighbors(model, params, nns, schedule, fast,
                                   jax.random.PRNGKey(5),
                                   guidance_label=0.0)
    assert z_fast.shape == z_exact.shape
    assert np.isfinite(np.asarray(z_fast)).all()
    # the approximation is active (refresh steps only every 3rd step)
    assert not np.allclose(np.asarray(z_fast), np.asarray(z_exact))


def test_encoder_reuse_one_is_exact_path():
    # encoder_reuse=1 with a feats fn must still equal the plain sampler
    cfg = _tiny()
    model = RDM(cfg)
    nns = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 2, 8))
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((2, 8, 8, 2)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    ctx = model.apply(params, nns, method=RDM.encode_neighbors)
    sampler = DDIMSamplerConfig(num_steps=4)
    from rdm_tpu.models.rdm import make_denoise_fn

    plain, _ = ddim_sample(make_denoise_fn(model, params), schedule,
                           sampler, (2, 8, 8, 2), ctx,
                           jax.random.PRNGKey(6))
    feats_fn = make_denoise_feats_fn(model, params)
    withfn, _ = ddim_sample(
        make_denoise_fn(model, params), schedule, sampler, (2, 8, 8, 2),
        ctx, jax.random.PRNGKey(6), denoise_feats_fn=feats_fn)
    # reuse=1: feats fn used every step with a fresh cache -> exact
    np.testing.assert_allclose(np.asarray(plain), np.asarray(withfn),
                               rtol=1e-6, atol=1e-6)


def test_encoder_reuse_needs_feats_fn():
    cfg = _tiny()
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    with pytest.raises(ValueError, match="denoise_feats_fn"):
        ddim_sample(lambda x, t, c: x, schedule,
                    DDIMSamplerConfig(num_steps=4, encoder_reuse=2),
                    (1, 8, 8, 2), None, jax.random.PRNGKey(0))


def test_encoder_reuse_under_dp_mesh():
    # the cache pytree rides the DDIM scan carry under a DP-sharded jit
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, db=2)
    cfg = _tiny()
    model = RDM(cfg)
    b = 8
    nns = jax.random.normal(jax.random.PRNGKey(3), (b, 1, 2, 8))
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((b, 8, 8, 2)),
                        jnp.zeros((b,), jnp.int32), jnp.zeros((b, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    sampler = DDIMSamplerConfig(num_steps=4, guidance_scale=2.0,
                                cfg_mode="shared", encoder_reuse=2)
    repl = NamedSharding(mesh, P())
    bs = NamedSharding(mesh, P("data"))
    run = jax.jit(lambda p, n, r: sample_with_neighbors(
        model, p, n, schedule, sampler, r, guidance_label=0.0),
        in_shardings=(repl, bs, repl), out_shardings=bs)
    z = run(params, jax.device_put(nns, bs), jax.random.PRNGKey(5))
    assert z.shape == (b, 8, 8, 2)
    assert np.isfinite(np.asarray(z)).all()


def test_encoder_reuse_with_sampled_random_guiding():
    # regression: the cache-shape probe must use the same guider shape
    # as the scan body — "sampled" guiding takes the single-call path
    # (cache at B), not the CFG-doubled one (2B)
    cfg = _tiny()
    model = RDM(cfg)
    nns = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 2, 8))
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((2, 8, 8, 2)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    ctx = model.apply(params, nns, method=RDM.encode_neighbors)
    uncond = model.apply(params, 2, ctx.shape[1], 0.0,
                         method=RDM.uncond_context)
    sampler = DDIMSamplerConfig(num_steps=4, guidance_scale=2.0,
                                encoder_reuse=2)
    z, _ = ddim_sample(
        None, schedule, sampler, (2, 8, 8, 2), ctx,
        jax.random.PRNGKey(6), uncond_context=uncond,
        random_guiding="sampled",
        denoise_feats_fn=make_denoise_feats_fn(model, params))
    assert z.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(z)).all()
