"""RARM tests: causality, teacher-forced loss, KV-cache parity with full
re-forward, sampling determinism, CFG, top-k filtering.

Parity targets: /root/reference/rdm/models/autoregression/transformer.py
:213-222 (forward), :241-268 (sampling loop, reimplemented with a cache).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rdm_tpu.models.rarm import (
    RARM,
    RARMConfig,
    sample_tokens,
    top_k_filter,
)

TINY = RARMConfig(vocab_size=40, out_vocab=38, heads=2, head_dim=8,
                  depth=2, context_dim=12, seq_len=8, sos_token=39,
                  mask_token=38, code_side=2)


def _init():
    model = RARM(TINY)
    toks = jnp.zeros((2, 4), dtype=jnp.int32)
    ctx = jnp.zeros((2, 3, 12))
    params = model.init(jax.random.PRNGKey(0), toks, ctx)
    return model, params


def test_forward_shape_and_causality():
    model, params = _init()
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 38, (1, 6)), dtype=jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 3, 12)), dtype=jnp.float32)
    logits = model.apply(params, toks, ctx)
    assert logits.shape == (1, 6, 38)
    # mutate a future token: logits at earlier positions must not change
    toks2 = toks.at[0, 4].set((toks[0, 4] + 1) % 38)
    logits2 = model.apply(params, toks2, ctx)
    np.testing.assert_allclose(np.asarray(logits[:, :4]),
                               np.asarray(logits2[:, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 4:]),
                           np.asarray(logits2[:, 4:]))


def test_context_changes_logits():
    model, params = _init()
    toks = jnp.zeros((1, 4), dtype=jnp.int32)
    c1 = jnp.ones((1, 3, 12))
    c2 = -jnp.ones((1, 3, 12))
    l1 = model.apply(params, toks, c1)
    l2 = model.apply(params, toks, c2)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_training_loss_and_grads():
    model, params = _init()
    z = jnp.asarray(np.random.default_rng(1).integers(0, 38, (2, 8)),
                    dtype=jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)

    def loss_fn(p):
        return model.apply(p, z, ctx, method=RARM.training_loss)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    # random init → loss within a few nats of log(out_vocab)
    assert abs(float(loss) - np.log(38)) < 3.0
    assert sum(float(jnp.sum(jnp.abs(g)))
               for g in jax.tree.leaves(grads)) > 0
    # mask-token augmentation path stays finite (reference get_r semantics:
    # masked context entries take the scalar mask_token value)
    loss_m, _ = model.apply(params, z, ctx, jax.random.PRNGKey(0), 0.3,
                            method=RARM.training_loss)
    assert np.isfinite(float(loss_m))


def test_kv_cache_matches_full_forward():
    """decode_step logits at each position must equal the full (re-forward)
    logits at that position — the cache is exact, not approximate."""
    model, params = _init()
    rng = np.random.default_rng(3)
    ctx = jnp.asarray(rng.standard_normal((2, 3, 12)), dtype=jnp.float32)
    prefix = np.concatenate(
        [[[TINY.sos_token], [TINY.sos_token]],
         rng.integers(0, 38, (2, 5))], axis=1).astype(np.int32)
    full_logits = model.apply(params, jnp.asarray(prefix), ctx)

    cache = model.apply(params, 2, ctx, method=RARM.init_cache)
    step_logits = []
    for pos in range(prefix.shape[1]):
        logits, cache = model.apply(
            params, jnp.asarray(prefix[:, pos]), jnp.int32(pos), cache,
            method=RARM.decode_step)
        step_logits.append(np.asarray(logits))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               atol=2e-5, rtol=1e-4)


def test_sample_tokens_deterministic_and_in_range():
    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(4).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    toks = sample_tokens(model, params, ctx, jax.random.PRNGKey(0),
                         top_k=10)
    assert toks.shape == (2, TINY.seq_len)
    assert (np.asarray(toks) >= 0).all()
    assert (np.asarray(toks) < TINY.out_vocab).all()
    toks2 = sample_tokens(model, params, ctx, jax.random.PRNGKey(0),
                          top_k=10)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_sample_cfg_changes_output():
    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(5).standard_normal((1, 3, 12)),
                      dtype=jnp.float32)
    a = sample_tokens(model, params, ctx, jax.random.PRNGKey(1), top_k=10)
    b = sample_tokens(model, params, ctx, jax.random.PRNGKey(1), top_k=10,
                      guidance_scale=3.0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_staged_window_sampling_matches_full():
    """Growing-window decode (window_chunk < seq_len) must produce
    bit-identical tokens to full-cache decode: positions past `pos` are
    masked either way, so bounding the cache read to a window that covers
    pos is a pure traffic optimization."""
    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(6).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    full = sample_tokens(model, params, ctx, jax.random.PRNGKey(2),
                         top_k=10, window_chunk=TINY.seq_len)
    staged = sample_tokens(model, params, ctx, jax.random.PRNGKey(2),
                           top_k=10, window_chunk=3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(staged))
    # and with CFG
    full_c = sample_tokens(model, params, ctx, jax.random.PRNGKey(3),
                           top_k=10, guidance_scale=2.0,
                           window_chunk=TINY.seq_len)
    staged_c = sample_tokens(model, params, ctx, jax.random.PRNGKey(3),
                             top_k=10, guidance_scale=2.0, window_chunk=3)
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(staged_c))


def test_windowed_decode_step_matches_full_cache():
    """decode_step with a static window covering pos equals the
    unwindowed read."""
    model, params = _init()
    rng = np.random.default_rng(7)
    ctx = jnp.asarray(rng.standard_normal((2, 3, 12)), dtype=jnp.float32)
    prefix = np.concatenate(
        [[[TINY.sos_token], [TINY.sos_token]],
         rng.integers(0, 38, (2, 4))], axis=1).astype(np.int32)
    cache_a = model.apply(params, 2, ctx, method=RARM.init_cache)
    cache_b = model.apply(params, 2, ctx, method=RARM.init_cache)
    for pos in range(prefix.shape[1]):
        la, cache_a = model.apply(
            params, jnp.asarray(prefix[:, pos]), jnp.int32(pos), cache_a,
            method=RARM.decode_step)
        lb, cache_b = model.apply(
            params, jnp.asarray(prefix[:, pos]), jnp.int32(pos), cache_b,
            window=min(pos + 1, TINY.seq_len),
            method=RARM.decode_step)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-5, rtol=1e-4)


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0


def test_simple_and_token_sequence_transformers():
    from rdm_tpu.models.rarm import SimpleTransformer, \
        TokenSequenceTransformer

    st = SimpleTransformer(inner_dim=16, heads=2, head_dim=8, depth=1,
                           residual=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 16)),
                    dtype=jnp.float32)
    params = st.init(jax.random.PRNGKey(0), x)
    out = st.apply(params, x)
    assert out.shape == (2, 5, 16)

    tst = TokenSequenceTransformer(vocab_size=10, embed_dim=4,
                                   inner_dim=16, heads=2, head_dim=8)
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 10, (2, 3, 4)),
                       dtype=jnp.int32)
    p2 = tst.init(jax.random.PRNGKey(1), toks)
    out2 = tst.apply(p2, toks)
    assert out2.shape == (2, 3, 16)


def test_fused_pallas_decode_matches_sample_tokens():
    """sample_tokens_fused (Pallas decode kernels, interpret mode on
    CPU) must reproduce sample_tokens token-for-token in f32 — the
    kernels restate LN/qkv/cached-attention/GEGLU with batched SEG-matmul
    attention, so parity here guards the whole restatement."""
    from rdm_tpu.models.rarm import sample_tokens_fused

    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(8).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    ref = sample_tokens(model, params, ctx, jax.random.PRNGKey(5),
                        top_k=10)
    fused = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(5),
                                top_k=10, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))
    # CFG + staged windows
    ref_c = sample_tokens(model, params, ctx, jax.random.PRNGKey(6),
                          top_k=10, guidance_scale=2.0, window_chunk=3)
    fus_c = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(6),
                                top_k=10, guidance_scale=2.0,
                                window_chunk=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(fus_c))


def test_int8_decode_greedy_agreement():
    """int8 weight-only decode (serving mode): per-output-channel
    symmetric quantization keeps ~0.4% weight error, so greedy decode
    should track the bf16 path closely (measured 0.961 token agreement
    at flagship scale on TPU)."""
    from rdm_tpu.models.rarm import sample_tokens_fused

    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(9).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    a = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                            top_k=1, interpret=True)
    b = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                            top_k=1, int8_weights=True, interpret=True)
    agree = float((np.asarray(a) == np.asarray(b)).mean())
    assert agree >= 0.75, agree


def test_int8_kv_decode_agreement(monkeypatch):
    """int8 KV-cache serving mode: caches store int8 rows with
    per-(row, batch) scales; the current position attends exact bf16.
    Greedy decode must track the bf16-cache fused path closely, compose
    with int8 weights, and the commit mechanism (in-kernel alias vs
    caller-side DUS) must be invisible to the sampled tokens."""
    from rdm_tpu.models.rarm import sample_tokens_fused
    from rdm_tpu.ops import decode_kernel

    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(13).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    ref = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                              top_k=1, interpret=True)
    kv = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                             top_k=1, int8_kv=True, interpret=True)
    agree = float((np.asarray(ref) == np.asarray(kv)).mean())
    assert agree >= 0.9, agree

    # composes with int8 weights (both quantizations active)
    both = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                               top_k=1, int8_kv=True, int8_weights=True,
                               interpret=True)
    agree2 = float((np.asarray(ref) == np.asarray(both)).mean())
    assert agree2 >= 0.5, agree2

    # CFG + growing-window staging run through the int8 cache path
    cfgd = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(2),
                               top_k=5, guidance_scale=2.0,
                               window_chunk=3, int8_kv=True,
                               interpret=True)
    assert np.asarray(cfgd).shape == np.asarray(ref).shape

    # forcing the caller-DUS commit path reproduces the aliased
    # in-kernel-commit tokens exactly
    monkeypatch.setattr(decode_kernel, "uses_inkernel_commit",
                        lambda *a: False)
    kv_dus = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(1),
                                 top_k=1, int8_kv=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(kv_dus))


def test_deferred_batched_commit_matches_inkernel(monkeypatch):
    """Above the in-kernel alias threshold the fused path defers KV rows
    and commits all layers in one aliased commit_rows kernel. Forcing
    that mode at test scale must reproduce the in-kernel-commit tokens
    exactly (the commit mechanism must be invisible to sampling)."""
    from rdm_tpu.models.rarm import sample_tokens_fused
    from rdm_tpu.ops import decode_kernel

    model, params = _init()
    ctx = jnp.asarray(np.random.default_rng(11).standard_normal((2, 3, 12)),
                      dtype=jnp.float32)
    ref = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(7),
                              top_k=10, guidance_scale=2.0,
                              window_chunk=3, interpret=True)
    monkeypatch.setenv("RARM_BATCHED_COMMIT", "1")
    monkeypatch.setattr(decode_kernel, "uses_inkernel_commit",
                        lambda *a: False)
    deferred = sample_tokens_fused(model, params, ctx,
                                   jax.random.PRNGKey(7), top_k=10,
                                   guidance_scale=2.0, window_chunk=3,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(deferred))
