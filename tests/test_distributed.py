"""Multi-host helper tests (single-process semantics) + diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdm_tpu.parallel.distributed import (
    global_array_from_local,
    host_info,
    initialize,
    shard_for_host,
)
from rdm_tpu.parallel.mesh import make_mesh
from jax.sharding import PartitionSpec as P


def test_host_info_and_shard():
    initialize()  # no-op single process
    rank, world = host_info()
    assert rank == 0 and world == 1
    start, size = shard_for_host(32)
    assert (start, size) == (0, 32)


def test_global_array_from_local():
    mesh = make_mesh(data=8, db=1)
    local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = global_array_from_local(local, mesh, P("data"))
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_rdm_log_images_grids():
    from rdm_tpu.diagnostics import log_images, make_grid
    from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
    from rdm_tpu.models.rdm import RDM, RDMConfig
    from rdm_tpu.models.unet import UNetConfig
    from rdm_tpu.ops.schedules import DiffusionSchedule

    unet = UNetConfig(in_channels=4, out_channels=4, model_channels=8,
                      num_res_blocks=1, attention_resolutions=(1,),
                      channel_mult=(1,), num_head_channels=4,
                      context_dim=8)
    cfg = RDMConfig(unet=unet, image_size=8, channels=4, timesteps=20,
                    context_dim=8, k_nn=2)
    model = RDM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 2, 8)))
    fs_cfg = AutoencoderConfig(ch=8, ch_mult=(1, 2, 4), num_res_blocks=1,
                               resolution=32, z_channels=4, embed_dim=4,
                               n_embed=16)
    fs = VQModel(fs_cfg)
    fs_params = fs.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    batch = {
        "image": np.random.default_rng(0).uniform(
            -1, 1, (2, 32, 32, 3)).astype(np.float32),
        "nn_embeddings": np.random.default_rng(1).standard_normal(
            (2, 1, 2, 8)).astype(np.float32),
    }
    grids = log_images(model, params, fs, fs_params,
                       DiffusionSchedule.create(20, "linear", 0.0015,
                                                0.0195),
                       batch, jax.random.PRNGKey(2), ddim_steps=3,
                       diffusion_row_steps=3, with_progressive_row=True)
    assert {"inputs", "reconstruction", "diffusion_row",
            "samples", "denoise_row", "progressive_row",
            "samples_inpainting", "samples_outpainting",
            "mask", "samples_x0_quantized"} <= set(grids)
    for g in grids.values():
        assert g.dtype == np.uint8 and g.ndim == 3
    # grid geometry
    imgs = np.zeros((5, 8, 8, 3), dtype=np.uint8)
    grid = make_grid(imgs, n_per_row=2)
    assert grid.shape == (3 * 8, 2 * 8, 3)


def test_data_parallel_ddim_sampling_matches_single_device():
    """Serving scale-out: the whole CFG DDIM scan (shared-prefix mode,
    the RDMPipeline default) runs under a batch sharding over the `data`
    mesh axis and must produce the single-device result exactly — XLA
    inserts no cross-device math for a pure DP sampler, so this guards
    both correctness and the absence of accidental collectives."""
    from jax.sharding import NamedSharding

    from rdm_tpu.models.unet import UNet, UNetConfig
    from rdm_tpu.ops.schedules import DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    cfg = UNetConfig(
        in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,),
        channel_mult=(1, 2), num_head_channels=16, context_dim=64)
    model = UNet(cfg)
    b = 8
    x = jnp.zeros((b, 16, 16, 3))
    t = jnp.zeros((b,), dtype=jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 64))
    unc = jnp.zeros((b, 4, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)

    schedule = DiffusionSchedule.create(timesteps=20)
    scfg = DDIMSamplerConfig(num_steps=4, guidance_scale=2.0,
                             cfg_mode="shared")

    def run(p, c, u, r):
        fn = lambda xx, tt, cc: model.apply(p, xx, tt, cc)
        out, _ = ddim_sample(fn, schedule, scfg, (b, 16, 16, 3), c, r,
                             uncond_context=u)
        return out

    rng = jax.random.PRNGKey(7)
    single = jax.jit(run)(params, ctx, unc, rng)

    mesh = make_mesh(data=8, db=1)
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(
        run,
        in_shardings=(repl, batch_sharding, batch_sharding, repl),
        out_shardings=batch_sharding)(params, ctx, unc, rng)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5, rtol=1e-5)
