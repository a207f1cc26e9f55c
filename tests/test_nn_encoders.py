"""NN-encoder zoo tests: reshaping contracts and VQ-path shapes
(parity targets: /root/reference/rdm/modules/encoders/nn_encoders.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
from rdm_tpu.models.nn_encoders import (
    CLIPEmbeddingReshaper,
    ClassicVQEncoder,
    CodebookNNEncoder,
    DummyEncoder,
    IdentityEncoder,
    SpatioTemporalZNNEncoder,
    VQGANAggregator,
    VQGANNNAttender,
)

VQ_CFG = AutoencoderConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                           resolution=8, z_channels=4, embed_dim=4,
                           n_embed=16)


def _vq():
    vq = VQModel(VQ_CFG)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    return vq, params


def test_reshaper_and_identity():
    x = jnp.asarray(np.arange(2 * 2 * 3 * 5).reshape(2, 2, 3, 5),
                    dtype=jnp.float32)
    out = CLIPEmbeddingReshaper()(x)
    assert out.shape == (2, 6, 5)
    np.testing.assert_array_equal(np.asarray(out[0, 4]),
                                  np.asarray(x[0, 1, 1]))
    out2 = IdentityEncoder()(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    d = DummyEncoder(out_dim=7)(x)
    assert d.shape == (2, 6, 7) and float(jnp.abs(d).sum()) == 0.0


def test_vq_patch_encoders_shapes():
    vq, params = _vq()
    patches = jnp.zeros((2, 1, 3, 8, 8, 3))  # [B, n, k, h, w, 3]
    z_enc = ClassicVQEncoder(vq, params).encode(patches)
    # f2 VQ: 8x8 -> 4x4 latent, embed_dim 4
    assert z_enc.shape == (2, 1 * 3 * 16, 4)
    codes = CodebookNNEncoder(vq, params).encode(patches)
    assert codes.shape == (2, 3 * 16)
    assert codes.dtype in (jnp.int32, jnp.int64)
    st = SpatioTemporalZNNEncoder(vq, params).encode(patches)
    assert st.shape == (2, 16, 3 * 4)


def test_learned_aggregators():
    tokens = jnp.asarray(
        np.random.default_rng(0).standard_normal((6, 16, 4)),
        dtype=jnp.float32)  # B=2, k=3 → 6 neighbor token maps
    agg = VQGANAggregator(out_dim=32, depth=1, heads=2, head_dim=8)
    params = agg.init(jax.random.PRNGKey(0), tokens, 3)
    out = agg.apply(params, tokens, 3)
    assert out.shape == (2, 3, 32)
    att = VQGANNNAttender(out_dim=32, depth=1, heads=2, head_dim=8)
    p2 = att.init(jax.random.PRNGKey(1), tokens, 3)
    out2 = att.apply(p2, tokens, 3)
    assert out2.shape == (2, 3, 32)
    assert np.isfinite(np.asarray(out2)).all()


def test_remaining_vq_encoder_zoo_shapes():
    """The rest of the reference zoo (nn_encoders.py:77-241): temporal,
    spatio-temporal-concat, VQ-concat, dimension-stacker, pixel-unet."""
    from rdm_tpu.models.nn_encoders import (
        DimensionStackerVQEncoder,
        PixelNNEncoderUnetConcatenator,
        SpatioTemporalCodeNNEncoder,
        SpatioTemporalConcatCodeNNEncoder,
        SpatioTemporalConcatZNNEncoder,
        TemporalNNCodeEncoder,
        TemporalNNZEncoder,
        VQConcatNNEncoder,
    )

    vq, params = _vq()
    patches = jnp.zeros((2, 1, 3, 8, 8, 3))  # f2 VQ: 4x4 latent, c=4
    codes = SpatioTemporalCodeNNEncoder(vq, params).encode(patches)
    assert codes.shape == (2, 3 * 16)
    tcodes = TemporalNNCodeEncoder(vq, params).encode(patches)
    assert tcodes.shape == (2, 3, 16)
    tz = TemporalNNZEncoder(vq, params).encode(patches)
    assert tz.shape == (2, 3, 16 * 4)
    cz = SpatioTemporalConcatZNNEncoder(vq, params).encode(patches)
    assert cz.shape == (2, 4, 4, 3 * 4)  # NHWC channel concat
    cc = SpatioTemporalConcatCodeNNEncoder(vq, params).encode(patches)
    assert cc.shape == (2, 3, 4, 4)
    lst = VQConcatNNEncoder(vq, params).encode(patches)
    assert isinstance(lst, list) and len(lst) == 3
    assert lst[0].shape == (2, 4, 4, 4)
    ds = DimensionStackerVQEncoder(vq, params).encode(patches)
    assert ds.shape == (2, 16, 3 * 4)
    pix = PixelNNEncoderUnetConcatenator(
        encoder=lambda x: vq.apply(params, x,
                                   method=VQModel.encode_prequant),
        backbone=lambda f: f * 2.0)
    out = pix.encode(patches)
    assert out.shape == (2, 4, 4, 3 * 4)


def test_code_aggregator():
    from rdm_tpu.models.nn_encoders import (CodeVQGANAggregator,
                                            ContinuousVQGANAggregator)

    assert ContinuousVQGANAggregator is VQGANAggregator
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, (6, 16)), dtype=jnp.int32)
    agg = CodeVQGANAggregator(num_tokens=16, embed_dim=16, out_dim=24,
                              depth=1, heads=2, head_dim=8)
    params = agg.init(jax.random.PRNGKey(0), ids, 3)
    out = agg.apply(params, ids, 3)
    assert out.shape == (2, 3, 24)
    assert np.isfinite(np.asarray(out)).all()
