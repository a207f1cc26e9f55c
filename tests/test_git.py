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
