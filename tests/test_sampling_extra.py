"""DDPM ancestral sampler + profiling harness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.sampling import ddpm_sample
from rdm_tpu.utils.profiling import Timer, benchmark


def test_ddpm_sample_shapes_and_determinism():
    schedule = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)

    def denoise(x, t, ctx):
        return 0.1 * x  # contraction: keeps values finite

    out = ddpm_sample(denoise, schedule, (2, 4, 4, 1), None,
                      jax.random.PRNGKey(0))
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()
    out2 = ddpm_sample(denoise, schedule, (2, 4, 4, 1), None,
                       jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = ddpm_sample(denoise, schedule, (2, 4, 4, 1), None,
                       jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_ddim_retro_sample_reembeds_context():
    """The re-embed hook must fire every retro_every steps and its output
    must flow into subsequent denoiser calls."""
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_retro_sample

    schedule = DiffusionSchedule.create(40, "linear", 0.0015, 0.0195)
    calls = []

    def denoise(x, t, ctx):
        # record the context magnitude seen at each call via a tap
        return 0.05 * x + 0.001 * jnp.mean(ctx)

    def reembed(pred_x0):
        return jnp.ones((1, 2, 4)) * jnp.mean(jnp.abs(pred_x0))

    out = ddim_retro_sample(
        denoise, schedule, DDIMSamplerConfig(num_steps=8),
        (1, 4, 4, 1), jnp.zeros((1, 2, 4)), jax.random.PRNGKey(0),
        reembed_fn=reembed, retro_every=2)
    assert out.shape == (1, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()
    # with no re-retrieval the trajectory differs (context stays zeros)
    out_static = ddim_retro_sample(
        denoise, schedule, DDIMSamplerConfig(num_steps=8),
        (1, 4, 4, 1), jnp.zeros((1, 2, 4)), jax.random.PRNGKey(0),
        reembed_fn=reembed, retro_every=100)
    assert not np.allclose(np.asarray(out), np.asarray(out_static))


def test_benchmark_and_timer():
    f = jax.jit(lambda x: x * 2.0)
    stats = benchmark(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert stats["min_s"] <= stats["mean_s"] <= stats["max_s"]
    t = Timer()
    y = f(jnp.ones((4,)))
    with t.time(y):
        pass
    assert t.count == 1 and t.total >= 0.0


def test_ddim_quantize_denoised_hook():
    """quantize_fn must be applied to pred_x0 each step (reference
    ddim.py:260-261 semantics)."""
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    schedule = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    denoise = lambda x, t, c: 0.1 * x
    snap = lambda x0: jnp.round(x0 * 2.0) / 2.0  # toy codebook
    out_q, _ = ddim_sample(denoise, schedule, DDIMSamplerConfig(num_steps=5),
                           (1, 4, 4, 1), None, jax.random.PRNGKey(0),
                           quantize_fn=snap)
    out, _ = ddim_sample(denoise, schedule, DDIMSamplerConfig(num_steps=5),
                         (1, 4, 4, 1), None, jax.random.PRNGKey(0))
    assert out_q.shape == out.shape
    assert not np.allclose(np.asarray(out_q), np.asarray(out))


def test_ddim_inpaint_blend_matches_reference_structure():
    """Inpainting blend parity with the reference's PRE-step structure
    (ddim.py:187-190): before each step at DDIM index i the kept region is
    q_sample(x0, timesteps[i]); no blend after the final step. The oracle
    below implements exactly that pre-step loop, consuming the same RNG
    stream as ddim_sample's post-step formulation."""
    from rdm_tpu.ops.schedules import DDIMSchedule, ddim_step, q_sample
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    schedule = DiffusionSchedule.create(50, "linear", 0.0015, 0.0195)
    cfg = DDIMSamplerConfig(num_steps=5)
    shape = (2, 4, 4, 1)
    denoise = lambda x, t, c: 0.1 * x
    x0 = jnp.full(shape, 0.5)
    mask = jnp.zeros(shape).at[:, :, :2].set(1.0)  # keep left half

    key = jax.random.PRNGKey(7)
    got, _ = ddim_sample(denoise, schedule, cfg, shape, None, key,
                         mask=mask, x0=x0)

    # ---- oracle: reference-style pre-step blend, same RNG consumption ----
    ddim = DDIMSchedule.create(schedule, cfg.num_steps)
    rng, init_rng = jax.random.split(key)
    x = jax.random.normal(init_rng, shape, dtype=jnp.float32)
    rng, brng = jax.random.split(rng)
    blend_noise = jax.random.normal(brng, shape, jnp.float32)
    steps = ddim.num_steps
    for step in range(steps):
        index = steps - 1 - step
        # pre-step blend at the CURRENT ddim timestep
        t_cur = jnp.full((shape[0],), ddim.timesteps[index], jnp.int32)
        noised = q_sample(schedule, x0, t_cur, blend_noise)
        x = mask * noised + (1.0 - mask) * x
        t = jnp.full((shape[0],), ddim.timesteps[index], jnp.int32)
        eps = denoise(x, t, None)
        rng, nrng, mrng = jax.random.split(rng, 3)
        noise = jax.random.normal(nrng, shape, jnp.float32)
        x, _ = ddim_step(ddim, x, eps, index, noise)
        blend_noise = jax.random.normal(mrng, shape, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_snr_gated_context_swap_and_random_guiding():
    """style/content contexts swap in by SNR band (reference
    ddim.py:178-184) and random guiding replaces the uncond eps."""
    from rdm_tpu.ops.schedules import DDIMSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    schedule = DiffusionSchedule.create(1000, "linear", 0.0015, 0.0195)
    cfg = DDIMSamplerConfig(num_steps=10)
    shape = (1, 4, 4, 1)
    def denoise(x, t, ctx):
        return 0.05 * x + 0.01 * jnp.mean(ctx)

    base = jnp.full((1, 2, 4), 1.0)
    style = jnp.full((1, 2, 4), 2.0)
    content = jnp.full((1, 2, 4), 3.0)
    out_plain, _ = ddim_sample(denoise, schedule, cfg, shape, base,
                               jax.random.PRNGKey(0))
    out_swap, _ = ddim_sample(denoise, schedule, cfg, shape, base,
                              jax.random.PRNGKey(0), style_context=style,
                              content_context=content)
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_swap))
    # SNR bands actually cover both branches across the 1000-step schedule
    ddim = DDIMSchedule.create(schedule, cfg.num_steps)
    snr = np.asarray(ddim.alphas / (1.0 - ddim.alphas))
    assert (snr < 5e-2).any() and ((snr >= 5e-2) & (snr < 1.0)).any()

    # random guiding: runs the cond-only forward; deterministic per key
    g1, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, guidance_scale=2.0),
                        shape, base, jax.random.PRNGKey(1),
                        uncond_context=jnp.zeros_like(base),
                        random_guiding="sampled")
    g2, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, guidance_scale=2.0),
                        shape, base, jax.random.PRNGKey(1),
                        uncond_context=jnp.zeros_like(base),
                        random_guiding="fixed")
    g3, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, guidance_scale=2.0),
                        shape, base, jax.random.PRNGKey(1),
                        uncond_context=jnp.zeros_like(base))
    assert np.isfinite(np.asarray(g1)).all()
    assert not np.allclose(np.asarray(g1), np.asarray(g3))
    assert not np.allclose(np.asarray(g2), np.asarray(g3))
    import pytest
    with pytest.raises(ValueError):
        ddim_sample(denoise, schedule, cfg, shape, base,
                    jax.random.PRNGKey(0), random_guiding="bogus")


def test_ddpm_progressive_captures():
    # log_every_t captures pred-x0 along the ancestral trajectory
    # (reference progressive_denoising); captures are finite, ordered
    # high-noise -> clean, and the final state matches the plain call
    schedule = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    denoise = lambda x, t, c: 0.1 * x
    out, caps = ddpm_sample(denoise, schedule, (2, 4, 4, 1), None,
                            jax.random.PRNGKey(0), log_every_t=7)
    assert caps.shape == (3, 2, 4, 4, 1)  # ceil(20/7)
    assert np.isfinite(np.asarray(caps)).all()
    plain = ddpm_sample(denoise, schedule, (2, 4, 4, 1), None,
                        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-6)
