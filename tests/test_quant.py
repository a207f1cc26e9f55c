"""int8 U-Net serving mode (rdm_tpu/ops/quant.py).

Covers: QuantizableConv int8-vs-f32 numeric agreement, calibration
sowing, quantize_conv_tree structure (exclusions, pass-through leaves),
and the pipeline --int8_weights path end to end (lazy calibration,
reproducibility, bf16-agreement envelope on the trunk features).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_quantizable_conv_int8_matches_f32():
    from rdm_tpu.models.layers import QuantizableConv
    from rdm_tpu.ops.quant import _quantize_node

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 16), jnp.float32)
    conv = QuantizableConv(features=32, kernel=3)
    params = conv.init(jax.random.PRNGKey(1), x)
    y_f32 = conv.apply(params, x)

    node = _quantize_node(params["params"],
                          jnp.max(jnp.abs(x)))
    qparams = {"params": node}
    assert node["kernel"].dtype == jnp.int8
    y_int8 = conv.apply(qparams, x)
    assert y_int8.dtype == y_f32.dtype
    # int8 weight+act quantization error: well-correlated, small relative
    err = np.linalg.norm(np.asarray(y_int8 - y_f32))
    ref = np.linalg.norm(np.asarray(y_f32))
    assert err / ref < 0.05
    cos = float(np.sum(np.asarray(y_int8) * np.asarray(y_f32))
                / (np.linalg.norm(np.asarray(y_int8)) * ref))
    assert cos > 0.999


def test_quantizable_conv_param_path_matches_nn_conv():
    """Checkpoint compat: same param names/shapes as nn.Conv (the
    torch→JAX converter and released checkpoints depend on them)."""
    from flax import linen as nn
    from rdm_tpu.models.layers import QuantizableConv

    x = jnp.zeros((1, 4, 4, 3))
    q = QuantizableConv(features=8, kernel=3).init(
        jax.random.PRNGKey(0), x)
    c = nn.Conv(features=8, kernel_size=(3, 3), padding="SAME").init(
        jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, q) == jax.tree.map(jnp.shape, c)
    # and the f32 forward is identical math
    y_q = QuantizableConv(features=8, kernel=3).apply(c, x + 1.0)
    y_c = nn.Conv(features=8, kernel_size=(3, 3), padding="SAME").apply(
        c, x + 1.0)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_c),
                               atol=1e-6)


@pytest.fixture
def tiny_unet():
    from rdm_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=16,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_head_channels=8,
                     context_dim=24)
    model = UNet(cfg)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 3, 24))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    # the eps head is zero-init: randomize it so forward comparisons
    # are non-degenerate
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (jax.random.normal(jax.random.PRNGKey(9),
                                           p.shape) * 0.02
                         if any(getattr(k, "key", None) == "out_conv"
                                for k in path)
                         and getattr(p, "ndim", 0) == 4 else p),
        params)
    return model, params


def test_calibrate_and_quantize_tree(tiny_unet):
    from rdm_tpu.ops import quant

    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    t = jnp.full((2,), 10, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 24))

    # no sowing outside calibrate()
    _, inter = model.apply(params, x, t, ctx, mutable=["intermediates"])
    assert not jax.tree_util.tree_leaves(inter)

    with quant.calibrate():
        _, inter = model.apply(params, x, t, ctx,
                               mutable=["intermediates"])
    leaves = jax.tree_util.tree_leaves(inter)
    assert leaves and all(l.shape == () for l in leaves)
    # conv_in's sown absmax is the input's absmax
    got = float(inter["intermediates"]["conv_in"]["act_absmax"])
    assert got == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)

    qtree = quant.quantize_conv_tree(params, inter)
    n = quant.num_quantized(qtree)
    assert n > 0
    # default exclusions stay f32
    assert qtree["params"]["conv_in"]["kernel"].dtype == jnp.float32
    assert qtree["params"]["out_conv"]["kernel"].dtype == jnp.float32
    assert "act_scale" not in qtree["params"]["conv_in"]
    # quantized nodes carry scales; bias untouched
    q1 = qtree["params"]["down_0_0_res"]["conv1"]
    assert q1["kernel"].dtype == jnp.int8
    assert q1["kernel_scale"].shape == (q1["kernel"].shape[-1],)
    assert q1["act_scale"].shape == ()
    assert q1["bias"].dtype == jnp.float32

    # int8 forward agrees with f32 on the trunk (loose: per-tensor act
    # scales + int8 weights)
    f = model.apply(params, x, t, ctx, return_features=True)
    g = model.apply(qtree, x, t, ctx, return_features=True)
    fn = np.asarray(f, np.float32).ravel()
    gn = np.asarray(g, np.float32).ravel()
    cos = float(fn @ gn / (np.linalg.norm(fn) * np.linalg.norm(gn)))
    assert cos > 0.99


def test_quantize_tree_requires_calibration(tiny_unet):
    from rdm_tpu.ops import quant

    _, params = tiny_unet
    with pytest.raises(ValueError, match="calibration"):
        quant.quantize_conv_tree(params, {"intermediates": {}})


def test_ddim_trajectory_absmax_covers_every_conv(tiny_unet):
    from rdm_tpu.ops import quant
    from rdm_tpu.ops.schedules import DiffusionSchedule

    model, params = tiny_unet
    schedule = DiffusionSchedule.create(50, "linear", 0.0015, 0.0195)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    # shared-prefix CFG serving form: context at 2B, x at B
    ctx = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 24))
    absmax = quant.ddim_trajectory_absmax(
        lambda p, x, t, c: model.apply(p, x, t, c,
                                       mutable=["intermediates"]),
        params, z, schedule, num_steps=8, context=ctx, n_points=3)
    leaves = jax.tree_util.tree_leaves(absmax)
    assert leaves and all(float(l) > 0 for l in leaves)
    qtree = quant.quantize_conv_tree(params, absmax)
    assert quant.num_quantized(qtree) > 0


def test_pipeline_int8_end_to_end(tmp_path):
    """--int8_weights through RDMPipeline: lazy calibration on the first
    call, reproducible samples, images in range."""
    import pickle
    import textwrap

    from rdm_tpu.pipeline import RDMPipeline

    yaml = textwrap.dedent("""
    model:
      target: rdm.models.diffusion.ddpm.MinimalRETRODiffusion
      params:
        k_nn: 3
        timesteps: 50
        image_size: 8
        channels: 3
        unet_config:
          params:
            in_channels: 3
            out_channels: 3
            model_channels: 16
            attention_resolutions: [2]
            num_res_blocks: 1
            channel_mult: [1, 2]
            num_head_channels: 8
            context_dim: 24
        first_stage_config:
          params:
            embed_dim: 3
            n_embed: 32
            ddconfig:
              z_channels: 3
              resolution: 16
              in_channels: 3
              out_ch: 3
              ch: 8
              ch_mult: [1, 2]
              num_res_blocks: 1
              attn_resolutions: []
    """)
    mdir = tmp_path / "rdm"
    db = tmp_path / "db"
    mdir.mkdir()
    db.mkdir()
    (mdir / "config.yaml").write_text(yaml)
    emb = np.random.default_rng(0).standard_normal(
        (64, 24)).astype(np.float32)
    np.savez(db / "part0.npz", embedding=emb, img_id=np.arange(64),
             patch_coords=np.zeros((64, 4), int))

    pipe = RDMPipeline.from_model_dir(str(mdir), database=str(db),
                                      random_init=True, int8_weights=True)
    assert pipe._params_int8 is None
    logs = pipe.sample_unconditional(2, steps=4, guidance_scale=2.0,
                                     seed=0)
    imgs = logs["samples_with_sampled_nns"]
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
    assert pipe._params_int8 is not None
    from rdm_tpu.ops.quant import num_quantized
    assert num_quantized(pipe._params_int8) > 0
    # reproducible; calibration happens once
    logs2 = pipe.sample_unconditional(2, steps=4, guidance_scale=2.0,
                                      seed=0)
    np.testing.assert_array_equal(imgs,
                                  logs2["samples_with_sampled_nns"])
    # int8 phase 3: the VQ decoder quantizes alongside the U-Net, its
    # conv_in/conv_out stay bf16, and the int8 decode stays close to the
    # bf16 decode on the same latents
    assert pipe._fs_params_int8 is not None
    assert num_quantized(pipe._fs_params_int8) > 0
    import jax
    import jax.numpy as jnp
    fs = pipe._fs_params_int8["params"]["decoder"]
    assert fs["conv_in"]["kernel"].dtype != jnp.int8
    assert fs["conv_out"]["kernel"].dtype != jnp.int8
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    img_bf16 = np.asarray(pipe._decode(pipe.first_stage_params, z),
                          np.float32)
    img_int8 = np.asarray(pipe._decode(pipe._fs_params_int8, z),
                          np.float32)
    a, b = img_bf16.ravel(), img_int8.ravel()
    cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9))
    assert cos > 0.99, cos
