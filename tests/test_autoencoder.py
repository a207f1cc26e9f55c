"""First-stage autoencoder tests: shape contracts, quantizer math,
straight-through gradients, code-path consistency, KL posterior.

Behavioral parity targets: taming VQModel / ldm AutoencoderKL as used by the
reference (ddpm.py:21-22, rarm config models/rarm/imagenet/dogs/config.yaml:29).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdm_tpu.models.autoencoder import (
    AutoencoderConfig,
    AutoencoderKL,
    DiagonalGaussian,
    VectorQuantizer,
    VQModel,
)

TINY = AutoencoderConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=16,
                         z_channels=4, embed_dim=4, n_embed=32)


def test_vq_roundtrip_shapes():
    model = VQModel(TINY)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, loss, idx = model.apply(params, x)
    assert rec.shape == (2, 16, 16, 3)
    assert idx.shape == (2, 8, 8)  # f2 downsampling for ch_mult len 2
    assert np.isfinite(float(loss))


def test_quantizer_argmin_and_straight_through():
    vq = VectorQuantizer(n_embed=8, embed_dim=4)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 3, 4)),
                    dtype=jnp.float32)
    params = vq.init(jax.random.PRNGKey(1), z)
    z_q, loss, idx = vq.apply(params, z)
    codebook = np.asarray(params["params"]["embedding"])
    flat = np.asarray(z).reshape(-1, 4)
    d = ((flat[:, None, :] - codebook[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), d.argmin(1))
    np.testing.assert_allclose(np.asarray(z_q).reshape(-1, 4),
                               codebook[d.argmin(1)], atol=1e-6)
    # straight-through: dL/dz == dL/dz_q for L = sum(z_q * w)
    w = jnp.ones_like(z)
    g = jax.grad(lambda z_: jnp.sum(vq.apply(params, z_)[0] * w))(z)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_decode_code_matches_decode_quantized():
    model = VQModel(TINY)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 16, 3)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z_q, _, idx = model.apply(params, x, method=VQModel.encode)
    rec_a = model.apply(params, z_q, force_not_quantize=True,
                        method=VQModel.decode)
    rec_b = model.apply(params, idx, method=VQModel.decode_code)
    np.testing.assert_allclose(np.asarray(rec_a), np.asarray(rec_b), atol=1e-5)


def test_kl_model_and_posterior():
    cfg = AutoencoderConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            resolution=16, z_channels=4, embed_dim=4,
                            double_z=True, n_embed=0)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    rec, post = model.apply(params, x, jax.random.PRNGKey(2))
    assert rec.shape == x.shape
    assert post.mean.shape == (2, 8, 8, 4)
    # standard-normal moments → KL ≈ 0
    moments = jnp.zeros((2, 4, 4, 8))
    p = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(p.kl()), 0.0, atol=1e-6)
    # mode is deterministic, samples are not
    s1 = p.sample(jax.random.PRNGKey(3))
    s2 = p.sample(jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
