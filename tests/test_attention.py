"""Attention op tests: XLA path vs a numpy oracle, flash kernel parity
(interpret mode on CPU), causal/mask semantics, and gradients.

Semantics under test mirror /root/reference/rdm/modules/attention.py:52-72.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdm_tpu.ops.attention import dot_product_attention


def _oracle(q, k, v, scale=None, causal=False, mask=None):
    """Pure numpy attention."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    scores = np.einsum("bqhd,bkhd->bhqk", q, k).astype(np.float64) * scale
    if mask is not None:
        scores = np.where(mask[:, None, None, :], scores, -1e9)
    if causal:
        qi = np.arange(sq)[:, None] + (sk - sq)
        kj = np.arange(sk)[None, :]
        scores = np.where((kj <= qi)[None, None], scores, -1e9)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_xla_attention_matches_oracle(causal):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 16, 4, 8), dtype=np.float32)
    k = rng.standard_normal((2, 24, 4, 8), dtype=np.float32)
    v = rng.standard_normal((2, 24, 4, 8), dtype=np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                causal=causal, impl="xla")
    np.testing.assert_allclose(np.asarray(out), _oracle(q, k, v, causal=causal),
                               atol=1e-5, rtol=1e-5)


def test_key_padding_mask():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 4, 2, 8), dtype=np.float32)
    k = rng.standard_normal((2, 6, 2, 8), dtype=np.float32)
    v = rng.standard_normal((2, 6, 2, 8), dtype=np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=bool)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                mask=jnp.asarray(mask), impl="xla")
    np.testing.assert_allclose(np.asarray(out), _oracle(q, k, v, mask=mask),
                               atol=1e-5, rtol=1e-5)
    # masked-out keys must not influence the result
    k2 = k.copy()
    k2[0, 3:] = 123.0
    out2 = dot_product_attention(jnp.asarray(q), jnp.asarray(k2),
                                 jnp.asarray(v), mask=jnp.asarray(mask),
                                 impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_kernel_matches_xla(causal):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 128, 1, 32)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 128, 1, 32)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 128, 1, 32)), dtype=jnp.float32)
    ref = dot_product_attention(q, k, v, causal=causal, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = dot_product_attention(q, k, v, causal=causal, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_kernel_gradients_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 64, 1, 32)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 64, 1, 32)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 64, 1, 32)), dtype=jnp.float32)

    def loss(impl, q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl=impl) ** 2)

    g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_backward_kernel_matches_xla_grads():
    """The (non-default) Pallas backward kernel vs XLA gradients, causal
    and non-causal, including the cross-q-block dk/dv accumulation."""
    from jax.experimental.pallas import tpu as pltpu

    from rdm_tpu.ops.flash_attention import _flash_backward, _xla_reference

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    for causal in (False, True):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, 32 ** -0.5,
                                              causal), q, k, v)
        ref = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            # block_q < sq exercises the dk/dv revisit accumulation
            import rdm_tpu.ops.flash_attention as fa
            out = fa._flash_backward(q, k, v, g, 32 ** -0.5, causal)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)


def test_flash_pallas_bwd_env_grads_match_xla_bwd():
    """RDM_TPU_FLASH_BWD=pallas routes the custom_vjp backward through the
    flash backward kernel (batch-partitioned wrap included); gradients
    must match the default XLA-recompute backward."""
    import rdm_tpu.ops.flash_attention as fa

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), dtype=jnp.float32)

    def loss(q_, k_, v_):
        return jnp.sum(
            fa.flash_attention(q_, k_, v_, interpret=True) ** 2)

    old = os.environ.get("RDM_TPU_FLASH_BWD")
    try:
        os.environ["RDM_TPU_FLASH_BWD"] = "xla"
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        os.environ["RDM_TPU_FLASH_BWD"] = "pallas"
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        if old is None:
            os.environ.pop("RDM_TPU_FLASH_BWD", None)
        else:
            os.environ["RDM_TPU_FLASH_BWD"] = old
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_flash_bwd_default_gated_on_head_dim(monkeypatch):
    """The TPU default routes the Pallas flash backward only at
    head_dim <= 32 (measured crossover: RDM d=32 wins 149.1 vs 112.5
    samples/s, RARM d=64 loses 259.1 vs 271.1 — COVERAGE.md round 5);
    RDM_TPU_FLASH_BWD overrides both ways."""
    import rdm_tpu.ops.flash_attention as fa

    monkeypatch.delenv("RDM_TPU_FLASH_BWD", raising=False)
    monkeypatch.setattr(fa.jax, "default_backend", lambda: "tpu")
    assert fa._use_pallas_bwd(32) is True
    assert fa._use_pallas_bwd(64) is False
    monkeypatch.setattr(fa.jax, "default_backend", lambda: "cpu")
    assert fa._use_pallas_bwd(32) is False
    monkeypatch.setenv("RDM_TPU_FLASH_BWD", "pallas")
    assert fa._use_pallas_bwd(64) is True
    monkeypatch.setenv("RDM_TPU_FLASH_BWD", "xla")
    assert fa._use_pallas_bwd(32) is False
