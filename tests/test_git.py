"""GIT masked-image transformer tests (parity target:
/root/reference/rdm/modules/attention.py:368-434 + MaskGIT-style decode)."""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.git import GIT, GITConfig, maskgit_decode

TINY = GITConfig(input_vocab=20, output_vocab=19, embed_dim=32, n_layer=2,
                 max_seq_len=16, n_heads=2, context_dim=8, mask_token=19)


def _init():
    model = GIT(TINY)
    toks = jnp.zeros((2, 16), dtype=jnp.int32)
    r = jnp.zeros((2, 1, 1))
    ctx = jnp.zeros((2, 3, 8))
    params = model.init(jax.random.PRNGKey(0), toks, r, ctx)
    return model, params


def test_forward_shapes_and_r_token_stripped():
    model, params = _init()
    toks = jnp.zeros((2, 16), dtype=jnp.int32)
    ctx = jnp.zeros((2, 3, 8))
    logits = model.apply(params, toks, jnp.ones((2, 1, 1)) * 0.5, ctx)
    assert logits.shape == (2, 16, 19)  # r token cut off
    logits2 = model.apply(params, toks, None, ctx)
    assert logits2.shape == (2, 16, 19)


def test_masked_loss_finite_and_grads():
    model, params = _init()
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 19, (2, 16)),
                       dtype=jnp.int32)
    ctx = jnp.zeros((2, 3, 8))

    def loss_fn(p):
        return model.apply(p, toks, jax.random.PRNGKey(1), ctx,
                           method=GIT.masked_loss)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["mask_rate"]) <= 1.0
    assert sum(float(jnp.sum(jnp.abs(g)))
               for g in jax.tree.leaves(grads)) > 0


def test_maskgit_decode_valid_tokens():
    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((1, 3, 8)),
                      dtype=jnp.float32)
    toks = maskgit_decode(model, params, ctx, jax.random.PRNGKey(0),
                          steps=4)
    assert toks.shape == (1, 16)
    arr = np.asarray(toks)
    assert (arr >= 0).all() and (arr < 19).all()  # no mask tokens remain


def test_git_unet_wrapper():
    """GITWrapper equivalent: token grid -> U-Net trunk -> codebook
    logits, with the mask rate driving the timestep path."""
    from rdm_tpu.models.git import GITUNet
    from rdm_tpu.models.unet import UNetConfig

    unet = UNetConfig(in_channels=16, out_channels=16, model_channels=16,
                      num_res_blocks=1, attention_resolutions=(1,),
                      channel_mult=(1, 2), num_head_channels=8,
                      context_dim=12)
    model = GITUNet(unet_config=unet, input_vocab=33, output_vocab=32)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 33, (2, 16)))
    ctx = jnp.zeros((2, 3, 12))
    r = jnp.asarray([0.3, 0.8])
    params = model.init(jax.random.PRNGKey(0), tokens, r, ctx)
    # ADM ResBlock out layers are zero-init => the trunk ignores the
    # timestep/mask-rate path at init; perturb zero kernels to observe it
    i = [0]

    def dezero(v):
        if v.ndim >= 2 and not np.any(np.asarray(v)):
            i[0] += 1
            return jax.random.normal(jax.random.PRNGKey(50 + i[0]),
                                     v.shape) * 0.05
        return v

    params = jax.tree.map(dezero, params)
    out = model.apply(params, tokens, r, ctx)
    assert out.shape == (2, 16, 32) and out.dtype == jnp.float32
    # mask rate must reach the trunk (timestep path)
    out2 = model.apply(params, tokens, jnp.asarray([0.9, 0.1]), ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # r=None defaults to zeros
    out3 = model.apply(params, tokens, None, ctx)
    assert np.isfinite(np.asarray(out3)).all()


def test_git_concat_unet_wrapper():
    """GITConcatWrapper equivalent: spatial conditioning map concatenated
    in channels instead of cross-attention."""
    from rdm_tpu.models.git import GITConcatUNet
    from rdm_tpu.models.unet import UNetConfig

    unet = UNetConfig(in_channels=8 + 6, out_channels=8, model_channels=16,
                      num_res_blocks=1, attention_resolutions=(),
                      channel_mult=(1, 2), num_head_channels=8,
                      context_dim=None)
    model = GITConcatUNet(unet_config=unet, context_channels=6,
                          input_vocab=33, output_vocab=32, embedding_dim=8)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 33, (2, 16)))
    cmap = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 4, 4, 6)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, cmap)
    out = model.apply(params, tokens, cmap)
    assert out.shape == (2, 16, 32)
    out2 = model.apply(params, tokens, cmap * 0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
