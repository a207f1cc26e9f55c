"""Golden-value tests for the diffusion schedule math.

Each test independently re-derives the expected values from the published
formulas (DDIM paper eq. 12 / LDM conventions) with plain numpy, then checks
the framework tables against them — the strategy recommended by SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.ops import (
    DDIMSchedule,
    DiffusionSchedule,
    ddim_step,
    make_ddim_timesteps,
    q_sample,
    predict_start_from_noise,
    timestep_embedding,
)

# The released RDM operating point (models/rdm/imagenet/config.yaml).
LINEAR_START, LINEAR_END, T = 0.0015, 0.0195, 1000


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(
        timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END
    )


def test_linear_betas_sqrt_space(sched):
    betas = np.linspace(LINEAR_START**0.5, LINEAR_END**0.5, T) ** 2
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    assert sched.betas.dtype == jnp.float32


def test_alphas_cumprod(sched):
    betas = np.linspace(LINEAR_START**0.5, LINEAR_END**0.5, T) ** 2
    acp = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev),
        np.append(1.0, acp[:-1]),
        rtol=1e-5,
    )


def test_q_sample_interpolates(sched):
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 3), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(4, 8, 8, 3), dtype=jnp.float32)
    t = jnp.asarray([0, 100, 500, 999])
    xt = q_sample(sched, x0, t, noise)
    acp = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([0, 100, 500, 999]):
        expected = np.sqrt(acp[ti]) * np.asarray(x0[i]) + np.sqrt(
            1 - acp[ti]
        ) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(xt[i]), expected, rtol=1e-4, atol=1e-5)


def test_predict_start_inverts_q_sample(sched):
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 3), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(2, 4, 4, 3), dtype=jnp.float32)
    t = jnp.asarray([250, 750])
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[1] == 21 and ts[-1] == 981
    ts100 = make_ddim_timesteps(100, 1000)
    assert ts100[0] == 1 and ts100[-1] == 991


def test_ddim_tables_eta0(sched):
    ddim = DDIMSchedule.create(sched, num_steps=50, eta=0.0)
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps(50, 1000)
    np.testing.assert_allclose(np.asarray(ddim.alphas), acp[ts], rtol=1e-5)
    expected_prev = np.concatenate([acp[:1], acp[ts[:-1]]])
    np.testing.assert_allclose(np.asarray(ddim.alphas_prev), expected_prev, rtol=1e-5)
    assert np.all(np.asarray(ddim.sigmas) == 0.0)


def test_ddim_tables_eta1(sched):
    eta = 1.0
    ddim = DDIMSchedule.create(sched, num_steps=50, eta=eta)
    a = np.asarray(ddim.alphas, dtype=np.float64)
    ap = np.asarray(ddim.alphas_prev, dtype=np.float64)
    expected_sigma = eta * np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(ddim.sigmas), expected_sigma, rtol=1e-4)


def test_ddim_step_matches_formula(sched):
    """Check the update against ddim.py:253-267 formulas, re-derived."""
    ddim = DDIMSchedule.create(sched, num_steps=50, eta=0.0)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    eps = rng.randn(2, 8, 8, 3).astype(np.float32)
    index = 37
    x_prev, pred_x0 = ddim_step(
        ddim, jnp.asarray(x), jnp.asarray(eps), index, jnp.zeros_like(jnp.asarray(x))
    )
    a_t = float(ddim.alphas[index])
    a_prev = float(ddim.alphas_prev[index])
    sqrt_1m_at = float(ddim.sqrt_one_minus_alphas[index])
    expected_x0 = (x - sqrt_1m_at * eps) / np.sqrt(a_t)
    expected_dir = np.sqrt(1.0 - a_prev) * eps
    expected_prev = np.sqrt(a_prev) * expected_x0 + expected_dir
    np.testing.assert_allclose(np.asarray(pred_x0), expected_x0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_prev), expected_prev, rtol=1e-4, atol=1e-5)


def test_ddim_full_chain_denoises(sched):
    """With a perfect eps oracle, DDIM must recover x0 almost exactly."""
    ddim = DDIMSchedule.create(sched, num_steps=50, eta=0.0)
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32)) * 0.5
    noise = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    # start from x_T for the largest ddim step
    acp = sched.alphas_cumprod
    tT = ddim.timesteps[-1]
    x = jnp.sqrt(acp[tT]) * x0 + jnp.sqrt(1 - acp[tT]) * noise

    def oracle_eps(x, index):
        # eps consistent with x_t = sqrt(a) x0 + sqrt(1-a) eps
        a = ddim.alphas[index]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    pred_x0 = None
    for index in range(ddim.num_steps - 1, -1, -1):
        eps = oracle_eps(x, index)
        x, pred_x0 = ddim_step(ddim, x, eps, index, jnp.zeros_like(x))
    # With a perfect oracle, eta=0 DDIM transports x along the deterministic
    # ODE trajectory: x_final = sqrt(acp[0]) x0 + sqrt(1-acp[0]) noise (the
    # chain ends at t=1, not t=0, per make_ddim_timesteps) and every
    # intermediate pred_x0 — including the last — equals x0 exactly.
    expected = jnp.sqrt(acp[0]) * x0 + jnp.sqrt(1 - acp[0]) * noise
    np.testing.assert_allclose(np.asarray(x), np.asarray(expected), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), rtol=1e-2, atol=1e-3)


def test_timestep_embedding_shape_and_values():
    emb = timestep_embedding(jnp.asarray([0, 10]), 192)
    assert emb.shape == (2, 192)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :96]), np.ones(96), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 96:]), np.zeros(96), atol=1e-6)
    # independent re-derivation for t=10
    half = 96
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    np.testing.assert_allclose(
        np.asarray(emb[1]),
        np.concatenate([np.cos(10 * freqs), np.sin(10 * freqs)]),
        atol=1e-4,  # float32 embedding vs float64 re-derivation
    )


def test_posterior_tables(sched):
    betas = np.linspace(LINEAR_START**0.5, LINEAR_END**0.5, T) ** 2
    acp = np.cumprod(1 - betas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), post_var, rtol=1e-4
    )


def test_ddim_eta_and_temperature_variants():
    """η>0 adds stochasticity; temperature scales it (reference
    ddim.py:264-266)."""
    import jax

    from rdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    schedule = DiffusionSchedule.create(100, "linear", 0.0015, 0.0195)
    ddim_det = DDIMSchedule.create(schedule, 10, eta=0.0)
    assert float(jnp.abs(ddim_det.sigmas).max()) == 0.0
    ddim_sto = DDIMSchedule.create(schedule, 10, eta=1.0)
    assert float(ddim_sto.sigmas[:-1].min()) > 0.0

    denoise = lambda x, t, c: 0.1 * x
    a1, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, eta=1.0),
                        (1, 4, 4, 1), None, jax.random.PRNGKey(0))
    a2, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, eta=0.0),
                        (1, 4, 4, 1), None, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    a3, _ = ddim_sample(denoise, schedule,
                        DDIMSamplerConfig(num_steps=5, eta=1.0,
                                          temperature=0.0),
                        (1, 4, 4, 1), None, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_beta_schedule_variants():
    from rdm_tpu.ops.schedules import make_beta_schedule

    for name in ("linear", "cosine", "sqrt_linear", "sqrt"):
        betas = make_beta_schedule(name, 100, 1e-4, 2e-2)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas < 1).all()
    cos = make_beta_schedule("cosine", 1000)
    assert cos.max() <= 0.999 + 1e-9


def test_quad_ddim_discretization():
    from rdm_tpu.ops.schedules import make_ddim_timesteps

    ts = make_ddim_timesteps(10, 1000, method="quad")
    assert ts.shape == (10,)
    assert (np.diff(ts) > 0).all()
    assert ts.max() < 1000
