"""Training subsystem tests: EMA schedule, LR schedule, single-device and
data-parallel (8-device CPU mesh) train steps, loss descent.

Parity targets: LitEma decay warmup, ldm LambdaLinearScheduler, and the
DDP-equivalent data-parallel semantics of /root/reference/main.py:784-785.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.rdm import RDM, RDMConfig
from rdm_tpu.models.unet import UNetConfig
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.parallel.mesh import make_mesh
from rdm_tpu.training.ema import ema_init, ema_update
from rdm_tpu.training.optim import lambda_linear_schedule, make_optimizer
from rdm_tpu.training.train_state import init_train_state, make_train_step


def tiny_rdm():
    unet = UNetConfig(
        in_channels=2, out_channels=2, model_channels=8, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1,),
        num_head_channels=4, context_dim=8)
    return RDMConfig(unet=unet, image_size=4, channels=2, timesteps=20,
                     context_dim=8, k_nn=2)


def _setup(mesh=None):
    cfg = tiny_rdm()
    model = RDM(cfg)
    x = jnp.zeros((2, 4, 4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]),
                        jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    tx = make_optimizer(1e-3, warm_up_steps=2)
    state = init_train_state(params, tx)
    step = make_train_step(model, tx, schedule, mesh=mesh, remat=True)
    return model, state, step


def test_ema_warmup_and_convergence():
    params = {"w": jnp.zeros((3,))}
    st = ema_init(params)
    st = ema_update(st, {"w": jnp.ones((3,))}, decay=0.9999)
    # first update: d = min(0.9999, 2/11) => shadow moves most of the way
    np.testing.assert_allclose(np.asarray(st.params["w"]),
                               1.0 - 2.0 / 11.0, rtol=1e-5)
    for _ in range(200):
        st = ema_update(st, {"w": jnp.ones((3,))}, decay=0.99)
    np.testing.assert_allclose(np.asarray(st.params["w"]), 1.0, atol=0.05)


def test_lambda_linear_schedule():
    sched = lambda_linear_schedule(2.0, warm_up_steps=10, f_start=0.0)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100000)), 2.0, rtol=1e-3)


def test_train_step_descends():
    model, state, step = _setup()
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 2))
    nns = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 2, 8))
    losses = []
    for i in range(5):
        state, metrics = step(state, z, nns, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert all(np.isfinite(losses))
    assert float(metrics["grad_norm"]) > 0.0


def test_train_step_data_parallel_matches_single():
    """DP over the 8-device CPU mesh must produce the same update as a
    single-device step on the same global batch (all-reduce correctness)."""
    mesh = make_mesh(data=8, db=1)
    model, state_a, step_dp = _setup(mesh=mesh)
    _, state_b, step_1d = _setup(mesh=None)
    rng = jax.random.PRNGKey(3)
    z = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 4, 2))
    nns = jax.random.normal(jax.random.PRNGKey(5), (8, 1, 2, 8))
    sa, ma = step_dp(state_a, z, nns, rng)
    sb, mb = step_1d(state_b, z, nns, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    pa = jax.tree.leaves(sa.params)
    pb = jax.tree.leaves(sb.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_save_lowres_remat_and_bf16_moments():
    """save_lowres policy (blk_ds* checkpoint_name tags in models/unet.py)
    must reproduce the unrematted loss exactly, and mu_dtype=bfloat16 must
    store the Adam first moment in bf16 while still descending."""
    unet = UNetConfig(
        in_channels=2, out_channels=2, model_channels=8, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=4, context_dim=8)
    cfg = RDMConfig(unet=unet, image_size=8, channels=2, timesteps=20,
                    context_dim=8, k_nn=2)
    model = RDM(cfg)
    x = jnp.zeros((2, 8, 8, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]),
                        jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    tx = make_optimizer(1e-3, warm_up_steps=2, mu_dtype="bfloat16")
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 2))
    nns = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 2, 8))
    rng = jax.random.PRNGKey(3)

    results = {}
    for name, kw in [("none", dict(remat=False)),
                     ("save_lowres", dict(remat=True,
                                          remat_policy="save_lowres"))]:
        # fresh buffers per variant: the step donates its state
        state = init_train_state(jax.tree.map(jnp.copy, params), tx)
        step = make_train_step(model, tx, schedule, **kw)
        state, metrics = step(state, z, nns, rng)
        results[name] = (float(metrics["loss"]), state)
    # identical math, remat only changes what is stored vs recomputed
    np.testing.assert_allclose(results["none"][0],
                               results["save_lowres"][0], rtol=1e-6)

    # first moment stored in bf16
    st = results["save_lowres"][1]
    mu = st.opt_state[0].mu if hasattr(st.opt_state[0], "mu") \
        else st.opt_state[1][0].mu
    leaves = jax.tree.leaves(mu)
    assert all(l.dtype == jnp.bfloat16 for l in leaves), \
        {l.dtype for l in leaves}
    losses = [results["save_lowres"][0]]
    step = make_train_step(model, tx, schedule, remat=True,
                           remat_policy="save_lowres")
    for i in range(4):
        st, metrics = step(st, z, nns, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))


def test_train_step_fsdp_matches_replicated():
    """param_sharding="fsdp" (state leaves sharded over the data axis)
    must produce the same update as the replicated DP step, with the big
    leaves actually sharded (ZeRO semantics via GSPMD)."""
    from rdm_tpu.parallel.mesh import shard_train_state

    mesh = make_mesh(data=8, db=1)
    cfg = tiny_rdm()
    model = RDM(cfg)
    x = jnp.zeros((2, 4, 4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]),
                        jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    tx = make_optimizer(1e-3, warm_up_steps=2)
    state_r = init_train_state(jax.tree.map(jnp.copy, params), tx)
    state_f = shard_train_state(init_train_state(params, tx), mesh,
                                min_size=64)
    step_r = make_train_step(model, tx, schedule, mesh=mesh, remat=True)
    step_f = make_train_step(model, tx, schedule, mesh=mesh, remat=True,
                             param_sharding="fsdp", fsdp_min_size=64)
    rng = jax.random.PRNGKey(3)
    z = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 4, 2))
    nns = jax.random.normal(jax.random.PRNGKey(5), (8, 1, 2, 8))
    sr, mr = step_r(state_r, z, nns, rng)
    sf, mf = step_f(state_f, z, nns, rng)
    np.testing.assert_allclose(float(mr["loss"]), float(mf["loss"]),
                               rtol=1e-5)
    specs = [str(l.sharding.spec) for l in jax.tree.leaves(sf.params)]
    assert any("data" in s for s in specs), specs  # really sharded
    for a, b in zip(jax.tree.leaves(sr.params),
                    jax.tree.leaves(sf.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_fused_optimizer_update_matches_per_leaf():
    """optax.flatten fused update (make_optimizer(fused_update=True))
    must produce bit-comparable parameters to the per-leaf update — the
    round-4 trace lever for the 652-op optimizer pointwise tail."""
    cfg = tiny_rdm()
    model = RDM(cfg)
    x = jnp.zeros((2, 4, 4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]),
                        jnp.zeros((2, 2, 8)))
    schedule = DiffusionSchedule.create(cfg.timesteps, "linear", 0.0015,
                                        0.0195)
    rng = jax.random.PRNGKey(7)
    z = jax.random.normal(jax.random.PRNGKey(8), (4, 4, 4, 2))
    nns = jax.random.normal(jax.random.PRNGKey(9), (4, 1, 2, 8))

    states = {}
    for fused in (False, True):
        tx = make_optimizer(1e-3, warm_up_steps=2, fused_update=fused)
        # fresh buffers per branch: the jitted step donates the state, so
        # the first branch consumes anything shared
        state = init_train_state(
            jax.tree.map(lambda p: jnp.array(np.asarray(p)), params), tx)
        step = make_train_step(model, tx, schedule, remat=False)
        for _ in range(3):
            state, m = step(state, z, nns, rng)
        states[fused] = (state, float(m["loss"]))
    np.testing.assert_allclose(states[False][1], states[True][1],
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(states[False][0].params),
                    jax.tree.leaves(states[True][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
