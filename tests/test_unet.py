"""Shape/contract tests for the U-Net and its building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.layers import (
    CrossAttention,
    GEGLUFeedForward,
    ResBlock,
    SpatialTransformer,
    TransformerBlock,
)
from rdm_tpu.models.unet import UNet, UNetConfig
from rdm_tpu.ops.attention import dot_product_attention


def tiny_cfg(**kw):
    base = dict(
        in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,),
        channel_mult=(1, 2), num_head_channels=16, context_dim=64,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_forward_shape_and_zero_init():
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.asarray([0, 500])
    ctx = jnp.ones((2, 4, 64))
    params = model.init(rng, x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 3)
    # zero-initialized output conv → exact zeros at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_context_changes_output():
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    t = jnp.asarray([100])
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 64))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 64))
    params = model.init(rng, x, t, c1)
    # perturb the zero out conv so outputs are nonzero
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    o1 = model.apply(params, x, t, c1)
    o2 = model.apply(params, x, t, c2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unet_unconditional_mode():
    cfg = tiny_cfg(context_dim=None)
    model = UNet(cfg)
    x = jnp.ones((1, 16, 16, 3))
    t = jnp.asarray([10])
    params = model.init(jax.random.PRNGKey(0), x, t, None)
    out = model.apply(params, x, t, None)
    assert out.shape == (1, 16, 16, 3)


def test_unet_class_conditional():
    cfg = tiny_cfg(num_classes=10)
    model = UNet(cfg)
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.asarray([10, 20])
    y = jnp.asarray([3, 7])
    ctx = jnp.ones((2, 4, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, y)
    out = model.apply(params, x, t, ctx, y)
    assert out.shape == (2, 16, 16, 3)


def test_unet_imagenet_param_count():
    """The flagship config should be ~400M params (6.2GB fp32 ckpt ballpark

    includes optimizer state; raw params are ~1.6GB). Guard the architecture
    against accidental drift with a loose band.
    """
    cfg = UNetConfig.imagenet_rdm()
    model = UNet(cfg)
    x = jnp.ones((1, 64, 64, 3))
    t = jnp.asarray([0])
    ctx = jnp.ones((1, 4, 512))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, t, ctx)
    )
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 3.0e8 < n < 6.0e8, f"param count {n:,} outside expected band"


def test_resblock_channel_change():
    block = ResBlock(out_channels=64)
    x = jnp.ones((2, 8, 8, 32))
    emb = jnp.ones((2, 128))
    params = block.init(jax.random.PRNGKey(0), x, emb)
    out = block.apply(params, x, emb)
    assert out.shape == (2, 8, 8, 64)


def test_resblock_updown():
    for kw, expect_hw in [(dict(up=True), 16), (dict(down=True), 4)]:
        block = ResBlock(out_channels=32, **kw)
        x = jnp.ones((1, 8, 8, 32))
        emb = jnp.ones((1, 64))
        params = block.init(jax.random.PRNGKey(0), x, emb)
        out = block.apply(params, x, emb)
        assert out.shape == (1, expect_hw, expect_hw, 32)


def test_cross_attention_self_vs_cross():
    attn = CrossAttention(heads=2, head_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32))
    params = attn.init(jax.random.PRNGKey(2), x, ctx)
    out = attn.apply(params, x, ctx)
    assert out.shape == (1, 6, 16)


def test_attention_matches_naive():
    """XLA attention path vs an explicit per-head numpy softmax."""
    rng = np.random.RandomState(0)
    b, s, h, d = 2, 5, 3, 4
    q = rng.randn(b, s, h, d).astype(np.float32)
    k = rng.randn(b, s, h, d).astype(np.float32)
    v = rng.randn(b, s, h, d).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    scale = d ** -0.5
    for bi in range(b):
        for hi in range(h):
            scores = q[bi, :, hi] @ k[bi, :, hi].T * scale
            e = np.exp(scores - scores.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            expected = p @ v[bi, :, hi]
            np.testing.assert_allclose(
                np.asarray(out[bi, :, hi]), expected, rtol=1e-4, atol=1e-5
            )


def test_attention_causal_prefix_alignment():
    """Causal mask must align to the END of the key sequence (prefix decode)."""
    rng = np.random.RandomState(1)
    b, h, d = 1, 1, 4
    sk, sq = 6, 2  # query is the last 2 positions of a 6-token sequence
    q = rng.randn(b, sq, h, d).astype(np.float32)
    k = rng.randn(b, sk, h, d).astype(np.float32)
    v = rng.randn(b, sk, h, d).astype(np.float32)
    out = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True
    )
    # query 0 ≙ global position 4: may attend keys 0..4; query 1: keys 0..5
    scale = d ** -0.5
    for qi, limit in [(0, 5), (1, 6)]:
        scores = (q[0, qi, 0] @ k[0, :, 0].T * scale)[:limit]
        e = np.exp(scores - scores.max())
        p = e / e.sum()
        expected = p @ v[0, :limit, 0]
        np.testing.assert_allclose(
            np.asarray(out[0, qi, 0]), expected, rtol=1e-4, atol=1e-5
        )


def test_spatial_transformer_residual_at_init():
    st = SpatialTransformer(heads=2, head_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 16))
    ctx = jnp.ones((1, 3, 32))
    params = st.init(jax.random.PRNGKey(1), x, ctx)
    out = st.apply(params, x, ctx)
    # zero-init proj_out → exact identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_encoder_unet_pooling():
    from rdm_tpu.models.unet import EncoderUNet

    cfg = tiny_cfg(context_dim=None)
    model = EncoderUNet(cfg, out_features=10)
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.asarray([0, 5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 10)
    sp = EncoderUNet(cfg, out_features=10, pool="spatial")
    params2 = sp.init(jax.random.PRNGKey(0), x, t)
    assert sp.apply(params2, x, t).shape == (2, 10)


def test_resblock_split_skip_concat_parity():
    """SPLIT_SKIP_CONCAT evaluates the virtual channel-concat exactly:
    identical param tree and outputs vs the materialized concat (the up
    path's skip handling). Measured perf no-go on v5e but kept exact."""
    import rdm_tpu.models.layers as L

    rb = L.ResBlock(out_channels=8, dtype=jnp.float32)
    xa = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    params = rb.init(jax.random.PRNGKey(3), xa, emb, skip=xs)
    # same params drive the concat path (skip folded into x)
    y_cat = rb.apply(params, jnp.concatenate([xa, xs], -1), emb)
    old = L.SPLIT_SKIP_CONCAT
    try:
        L.SPLIT_SKIP_CONCAT = True
        y_split = rb.apply(params, xa, emb, skip=xs)
        # GN-group straddle (parts not aligned) must fall back to concat
        xb = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 5))
        xt = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 3))
        p2 = rb.init(jax.random.PRNGKey(6), xb, emb, skip=xt)
        y2a = rb.apply(p2, xb, emb, skip=xt)
        y2b = rb.apply(p2, jnp.concatenate([xb, xt], -1), emb)
    finally:
        L.SPLIT_SKIP_CONCAT = old
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y2a), np.asarray(y2b), atol=2e-5)


def test_pointwise_conv_matches_conv1x1():
    """PointwiseConv (PROJ_AS_DOT path) matches nn.Conv(1x1) with the same
    param tree."""
    import flax.linen as nn

    import rdm_tpu.models.layers as L

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 6))
    pw = L.PointwiseConv(5, dtype=jnp.float32)
    params = pw.init(jax.random.PRNGKey(1), x)
    ref = nn.Conv(features=5, kernel_size=(1, 1), padding="SAME",
                  dtype=jnp.float32, param_dtype=jnp.float32)
    y_ref = ref.apply(params, x)
    y = pw.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_groupnorm_tuple_parts_match_concat():
    import rdm_tpu.models.layers as L

    a = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    gn = L.GroupNorm32(num_groups=4)
    params = gn.init(jax.random.PRNGKey(2), jnp.concatenate([a, b], -1))
    y_cat = gn.apply(params, jnp.concatenate([a, b], -1))
    ya, yb = gn.apply(params, (a, b))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([ya, yb], -1)), np.asarray(y_cat),
        atol=1e-5)


def test_dense_2d_flag_matches_3d():
    import rdm_tpu.models.layers as L

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    st = L.SpatialTransformer(heads=2, head_dim=8, dtype=jnp.float32)
    params = st.init(jax.random.PRNGKey(2), x, ctx)
    old_d, old_p = L.DENSE_2D, L.PROJ_AS_DOT
    try:
        L.DENSE_2D, L.PROJ_AS_DOT = False, False
        y0 = st.apply(params, x, ctx)
        L.DENSE_2D, L.PROJ_AS_DOT = True, True
        y1 = st.apply(params, x, ctx)
    finally:
        L.DENSE_2D, L.PROJ_AS_DOT = old_d, old_p
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


def test_shared_prefix_cfg_matches_batch_doubling():
    """UNet with context [2B] over x [B] (shared-prefix CFG) must equal
    the reference batch-doubling (x tiled to 2B) exactly — the prefix is
    context-independent, so running it once is pure FLOP removal."""
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.asarray([100, 700])
    ctx_c = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64))
    ctx_u = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 64))
    params = model.init(rng, x, t, ctx_c)
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)

    ctx2 = jnp.concatenate([ctx_c, ctx_u], axis=0)
    doubled = model.apply(params, jnp.concatenate([x, x], 0),
                          jnp.concatenate([t, t], 0), ctx2)
    shared = model.apply(params, x, t, ctx2)
    assert shared.shape == doubled.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(doubled),
                               atol=2e-5, rtol=1e-4)


def test_shared_prefix_cfg_no_down_attention():
    """Shared mode must also work when the first cross-attention is the
    middle block (attention_resolutions miss every down ds)."""
    cfg = tiny_cfg(attention_resolutions=(64,))
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    t = jnp.asarray([5])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx[:1])
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    doubled = model.apply(params, jnp.concatenate([x, x], 0),
                          jnp.concatenate([t, t], 0), ctx)
    shared = model.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(doubled),
                               atol=2e-5, rtol=1e-4)


def test_shared_cfg_flag_contract():
    """Explicit shared_cfg flag (round-2 advisor): True demands a
    (cond, uncond)-stacked 2B context; False rejects a 2x-batch context
    instead of silently tiling the activations."""
    import pytest

    cfg = tiny_cfg()
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.asarray([100, 700])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64))
    ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)

    # shared_cfg=True with a doubled context == auto-detect
    auto = model.apply(params, x, t, ctx2)
    explicit = model.apply(params, x, t, ctx2, shared_cfg=True)
    np.testing.assert_allclose(np.asarray(explicit), np.asarray(auto))
    # True without the 2B context: loud failure
    with pytest.raises(ValueError, match="shared_cfg=True"):
        model.apply(params, x, t, ctx, shared_cfg=True)
    # False with an accidental 2x-batch context: loud failure, no tiling
    with pytest.raises(ValueError, match="shared_cfg=False"):
        model.apply(params, x, t, ctx2, shared_cfg=False)
    # False with a matched context: plain batched forward
    plain = model.apply(params, x, t, ctx, shared_cfg=False)
    assert plain.shape == (2, 16, 16, 3)


def test_ddim_cfg_mode_shared_matches_double():
    """End-to-end: ddim_sample(cfg_mode='shared') equals 'double' through
    the real UNet denoiser."""
    import dataclasses as dc

    from rdm_tpu.ops.schedules import DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    cfg = tiny_cfg()
    model = UNet(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([0, 0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64))
    unc = jnp.zeros((2, 4, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    schedule = DiffusionSchedule.create(timesteps=20)
    scfg = DDIMSamplerConfig(num_steps=5, guidance_scale=2.0)
    fn = lambda xx, tt, cc: model.apply(params, xx, tt, cc)
    out_d, _ = ddim_sample(fn, schedule, scfg, (2, 16, 16, 3), ctx,
                           jax.random.PRNGKey(7), uncond_context=unc)
    out_s, _ = ddim_sample(fn, schedule,
                           dc.replace(scfg, cfg_mode="shared"),
                           (2, 16, 16, 3), ctx,
                           jax.random.PRNGKey(7), uncond_context=unc)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=1e-4, rtol=1e-4)
