"""CLIP tokenizer + model tests.

Tokenizer golden values are canonical OpenAI CLIP ids (the public tokenizer
tokenizes "a photo of a cat" to exactly these ids); the towers are checked
for shape contracts, EOT selection, and causality.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.clip import CLIP, ClipConfig, TextTransformer, preprocess
from rdm_tpu.utils.tokenizer import default_tokenizer, tokenize

TINY = ClipConfig(
    embed_dim=16, image_resolution=32, vision_width=64, vision_layers=2,
    vision_patch_size=16, context_length=12, vocab_size=49408,
    transformer_width=64, transformer_layers=2)


def test_tokenizer_golden_ids():
    t = tokenize("a photo of a cat")
    np.testing.assert_array_equal(
        t[0][:7], [49406, 320, 1125, 539, 320, 2368, 49407])
    assert (t[0][7:] == 0).all()
    assert t.shape == (1, 77)


def test_tokenizer_roundtrip_and_truncation():
    tok = default_tokenizer()
    ids = tok.encode("retrieval augmented diffusion!")
    # decode space-separates word and punctuation tokens
    assert tok.decode(ids).strip() == "retrieval augmented diffusion !"
    long = " ".join(["word"] * 200)
    t = tokenize(long, context_length=10)
    assert t.shape == (1, 10)
    assert t[0, 0] == tok.sot_token and t[0, -1] == tok.eot_token


def test_clip_towers_shapes():
    model = CLIP(TINY)
    imgs = jnp.zeros((2, 32, 32, 3))
    toks = jnp.asarray(tokenize(["a cat", "a dog"], context_length=12))
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    img_emb = model.apply(params, imgs, method=CLIP.encode_image)
    txt_emb = model.apply(params, toks, method=CLIP.encode_text)
    assert img_emb.shape == (2, 16)
    assert txt_emb.shape == (2, 16)
    logits = model.apply(params, imgs, toks)
    assert logits.shape == (2, 2)


def test_text_tower_reads_eot_position():
    """Changing tokens after EOT must not change the embedding (causal mask +
    EOT gather)."""
    model = TextTransformer(TINY)
    toks = np.zeros((1, 12), dtype=np.int32)
    toks[0, 0] = 49406
    toks[0, 1] = 320
    toks[0, 2] = 49407
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    e1 = model.apply(params, jnp.asarray(toks))
    toks2 = toks.copy()
    toks2[0, 5] = 777  # after EOT; masked out by causality at EOT position
    e2 = model.apply(params, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_preprocess_range_and_shape():
    x = jnp.zeros((1, 16, 16, 3))  # mid-gray in [-1,1]
    out = preprocess(x, resolution=8)
    assert out.shape == (1, 8, 8, 3)
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, atol=1e-5)


def test_modified_resnet_tower():
    from rdm_tpu.models.clip import CLIP, ClipConfig, ModifiedResNet

    rn = ModifiedResNet(layers=(1, 1), width=16, heads=8, out_dim=12)
    x = jnp.zeros((2, 32, 32, 3))
    params = rn.init(jax.random.PRNGKey(0), x)
    out = rn.apply(params, x)
    assert out.shape == (2, 12)
    assert np.isfinite(np.asarray(out)).all()
    # full CLIP with the resnet tower selected
    cfg = ClipConfig(embed_dim=12, image_resolution=32, vision_width=16,
                     context_length=8, vocab_size=64, transformer_width=32,
                     transformer_layers=1, head_dim=16,
                     resnet_layers=(1, 1))
    model = CLIP(cfg)
    toks = jnp.zeros((2, 8), dtype=jnp.int32)
    p = model.init(jax.random.PRNGKey(1), x, toks)
    emb = model.apply(p, x, method=CLIP.encode_image)
    assert emb.shape == (2, 12)


def test_tokenizer_unicode_and_bytes():
    """Non-ASCII input round-trips through the byte-level BPE."""
    tok = default_tokenizer()
    for text in ("café au lait", "naïve résumé", "日本語のテスト",
                 "emoji 🎨 art"):
        ids = tok.encode(text)
        assert all(0 <= i < 49408 for i in ids)
        decoded = tok.decode(ids).strip()
        # whitespace normalization aside, characters survive
        assert decoded.replace(" ", "") == text.lower().replace(" ", "")


def test_tokenizer_clean_fixes_mojibake():
    """UTF-8-as-latin-1 mojibake must tokenize like the intended text
    (reference basic_clean runs ftfy.fix_text)."""
    from rdm_tpu.utils.tokenizer import _clean

    assert _clean("cafÃ©") == "café"
    assert _clean("naÃ¯ve dog") == "naïve dog"
    # plain ASCII and real non-ASCII text pass through
    assert _clean("  A  Dog ") == "a dog"
    assert _clean("café") == "café"
