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


def test_benchmark_and_timer():
    f = jax.jit(lambda x: x * 2.0)
    stats = benchmark(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert stats["min_s"] <= stats["mean_s"] <= stats["max_s"]
    t = Timer()
    y = f(jnp.ones((4,)))
    with t.time(y):
        pass
    assert t.count == 1 and t.total >= 0.0
