"""Batch partitioning of Pallas kernels under jit-with-shardings
(ops/partitioning.py): without the custom_partitioning wrapper, GSPMD
all-gathers DP-sharded batches around opaque pallas_calls and every
device runs the full batch; with it, each device runs its local shard.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdm_tpu.ops.partitioning import call_batch_partitioned


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("data",))


def _toy_kernel(x):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    return pl.pallas_call(
        kern,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x)


def test_unwrapped_pallas_call_is_gathered():
    # the premise: a bare pallas_call under a batch-sharded jit gets
    # all-gathered (this is what the wrapper exists to prevent)
    mesh = _mesh()
    sh = NamedSharding(mesh, P("data"))
    hlo = jax.jit(_toy_kernel, in_shardings=sh, out_shardings=sh).lower(
        jax.ShapeDtypeStruct((8, 128), jnp.float32)).compile().as_text()
    assert hlo.count("all-gather") > 0


def test_wrapped_pallas_call_stays_local():
    mesh = _mesh()
    sh = NamedSharding(mesh, P("data"))
    f = lambda x: call_batch_partitioned(_toy_kernel, (x,), (0,))
    jf = jax.jit(f, in_shardings=sh, out_shardings=sh)
    hlo = jf.lower(
        jax.ShapeDtypeStruct((8, 128), jnp.float32)).compile().as_text()
    assert hlo.count("all-gather") == 0
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = jf(jax.device_put(x, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_fused_block_partitioned_parity():
    # the real fused SpatialTransformer block, DP-sharded over the mesh,
    # must match the unsharded result bit-for-bit (same local kernels)
    from rdm_tpu.models.layers import FusedTransformerBlock, TransformerBlock

    heads, head_dim, b, s, s_ctx = 4, 32, 8, 16, 4
    c = heads * head_dim
    rng = jax.random.PRNGKey(0)
    kx, kc, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (b, s, c), jnp.float32)
    ctx = jax.random.normal(kc, (b, s_ctx, 64), jnp.float32)
    ref = TransformerBlock(heads=heads, head_dim=head_dim)
    params = ref.init(kp, x, ctx)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  interpret=True)

    single = fused.apply(params, x, ctx)

    mesh = _mesh()
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    jf = jax.jit(functools.partial(fused.apply),
                 in_shardings=(repl, batch_sh, batch_sh),
                 out_shardings=batch_sh)
    sharded = jf(params, jax.device_put(x, batch_sh),
                 jax.device_put(ctx, batch_sh))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-5, atol=2e-5)
    hlo = jf.lower(params, jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(ctx.shape, ctx.dtype)
                   ).compile().as_text()
    assert hlo.count("all-gather") == 0


def test_flash_attention_partitioned_parity_and_grads():
    # forward partitioned inside the custom_vjp: DP-sharded forward runs
    # shard-local (no all-gather), and gradients still flow through the
    # XLA-recompute defvjp backward
    from rdm_tpu.ops.flash_attention import _xla_reference, flash_attention

    b, s, h, d = 8, 16, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    mesh = _mesh()
    bs = NamedSharding(mesh, P("data"))

    want = _xla_reference(q, k, v, d ** -0.5, False)
    jf = jax.jit(lambda a, b_, c: flash_attention(a, b_, c,
                                                  interpret=True),
                 in_shardings=(bs, bs, bs), out_shardings=bs)
    got = jf(jax.device_put(q, bs), jax.device_put(k, bs),
             jax.device_put(v, bs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    hlo = jf.lower(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)
                   ).compile().as_text()
    assert hlo.count("all-gather") == 0

    def loss(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, interpret=True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_xla_reference(q_, k_, v_, d ** -0.5,
                                      False) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a_, b2 in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b2),
                                   rtol=2e-4, atol=2e-4)
