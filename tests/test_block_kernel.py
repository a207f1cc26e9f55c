"""Parity tests for the fused SpatialTransformer block kernels
(ops/block_kernel.py) against the standard TransformerBlock path.

Runs the Pallas kernels in interpret mode on CPU; the param trees of the
two module variants must be identical (checkpoint compatibility) and the
outputs must match within dtype tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.layers import FusedTransformerBlock, TransformerBlock


def _mk(heads, head_dim, ctx_dim, b, s, s_ctx, dtype, seed=0):
    c = heads * head_dim
    rng = jax.random.PRNGKey(seed)
    kx, kc, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (b, s, c), jnp.float32).astype(dtype)
    ctx = jax.random.normal(kc, (b, s_ctx, ctx_dim),
                            jnp.float32).astype(dtype)
    ref = TransformerBlock(heads=heads, head_dim=head_dim, dtype=dtype)
    params = ref.init(kp, x, ctx)
    return ref, params, x, ctx


@pytest.mark.parametrize("split_k3", ["0", "1"])
@pytest.mark.parametrize("heads,head_dim,dtype,tol", [
    (4, 32, jnp.float32, 2e-5),    # exact 128-lane pack
    (6, 32, jnp.float32, 2e-5),    # ragged: Cp=256, last group 2 heads
    (4, 32, jnp.bfloat16, 3e-2),
    (2, 64, jnp.float32, 2e-5),    # 2 heads per lane group
])
def test_fused_block_parity(heads, head_dim, dtype, tol, split_k3,
                            monkeypatch):
    monkeypatch.setenv("RDM_TPU_SPLIT_K3", split_k3)
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=2, s=16,
                              s_ctx=4, dtype=dtype)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=dtype, interpret=True)
    want = ref.apply(params, x, ctx)
    got = fused.apply(params, x, ctx)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("b,s,dtype,tol", [
    (8, 16, jnp.float32, 2e-5),   # multi-image attention grid, nb=8
    (8, 16, jnp.bfloat16, 3e-2),  # nb=8 packing at the serving dtype
    (2, 16, jnp.float32, 2e-5),   # multi-image grid, nb=2 (b limits)
    (3, 16, jnp.float32, 2e-5),   # odd batch: no pow2 divisor -> nb=1
    (2, 512, jnp.float32, 2e-5),  # row-tiled grid (s > 256)
])
def test_attention_grid_variants(b, s, dtype, tol):
    heads, head_dim = 4, 32
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=b, s=s,
                              s_ctx=4, dtype=dtype, seed=3)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=dtype, interpret=True)
    want = ref.apply(params, x, ctx)
    got = fused.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("knobs,s,dtype,tol", [
    # small tiles on every kernel (row counts below the defaults)
    ({"RDM_TPU_K1_ROWS": "128", "RDM_TPU_K3A_ROWS": "128",
      "RDM_TPU_FF_ROWS": "128", "RDM_TPU_ATTN_BQ": "128"}, 512,
     jnp.float32, 3e-5),
    # multi-image packing on the row-tiled attention grid (nb>1);
    # the VMEM guard must keep nb*bq within budget, parity unchanged
    ({"RDM_TPU_ATTN_NB": "2"}, 512, jnp.float32, 3e-5),
    # the serving dtype through the nbq>1 packing (advisor r4)
    ({"RDM_TPU_ATTN_NB": "2"}, 512, jnp.bfloat16, 3e-2),
    ({"RDM_TPU_ATTN_NB": "4", "RDM_TPU_ATTN_BQ": "256"}, 512,
     jnp.float32, 3e-5),
    # knobs are sanitized: non-pow2 rounds down, bad value -> default
    ({"RDM_TPU_FF_ROWS": "300", "RDM_TPU_K1_ROWS": "bogus"}, 16,
     jnp.float32, 3e-5),
])
def test_tile_knob_parity(knobs, s, dtype, tol, monkeypatch):
    # env tile-size overrides (TPU sweep hooks) keep exact parity
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    heads, head_dim = 4, 32
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=4, s=s,
                              s_ctx=4, dtype=dtype, seed=7)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=dtype, interpret=True)
    want = ref.apply(params, x, ctx)
    got = fused.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_split_k3_matches_single_kernel():
    # the two kernel-3 formulations agree on identical inputs (f32 exact
    # within accumulation-order noise), including a non-4 context length
    from rdm_tpu.ops import block_kernel as bk

    heads, head_dim, s_ctx = 6, 32, 3
    c = heads * head_dim
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=48, b=2, s=32,
                              s_ctx=s_ctx, dtype=jnp.float32, seed=2)
    single = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                   dtype=jnp.float32, interpret=True)
    import unittest.mock as mock
    orig = bk.fused_transformer_block
    outs = {}
    for mode in (False, True):
        with mock.patch.object(
                bk, "fused_transformer_block",
                lambda *a, **kw: orig(*a, **{**kw, "split_k3": mode})):
            outs[mode] = single.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=3e-5, atol=3e-5)


def test_split_k3_all_negative_scores_no_nan():
    # Regression: the packed [M, P] score matrix zero-pads P up to 128
    # lanes. The padded columns used to participate in the row-global
    # softmax max, flooring it at 0 — a row whose REAL cross-attn scores
    # all sit below ~-88 then underflowed to den=0 -> NaN in bf16.
    # Construct that regime exactly: identical rows, every score ~ -95.
    from rdm_tpu.ops.block_kernel import _split_post_ff

    heads, head_dim, s_ctx, b, s, ff = 4, 32, 3, 1, 16, 256
    c = heads * head_dim
    dt = jnp.bfloat16
    v = np.linspace(-1.0, 1.0, c, dtype=np.float32)
    u = (v - v.mean()) / v.std()                    # = LN2 output per row
    beta = 95.0 / (float(head_dim) ** -0.5
                   * min((u[h * head_dim:(h + 1) * head_dim] ** 2).sum()
                         for h in range(heads)))
    x = jnp.asarray(np.tile(v, (b, s, 1)), dt)
    attn = jnp.zeros((b, s, c), dt)
    ck = jnp.asarray(-beta * np.tile(u, (b, s_ctx, 1)), dt)  # scores ~ -95
    rng = np.random.default_rng(7)
    cv = jnp.asarray(rng.standard_normal((b, s_ctx, c)), dt)
    eye = jnp.eye(c, dtype=dt)
    zeros_c = jnp.zeros((1, c), dt)
    w = dict(wo=jnp.zeros((c, c), dt), bo=zeros_c,
             n2s=jnp.ones((1, c), dt), n2b=zeros_c,
             wq2=eye, wo2=eye, bo2=zeros_c,
             n3s=jnp.ones((1, c), dt), n3b=zeros_c,
             wa=jnp.zeros((c, ff), dt), wg=jnp.zeros((c, ff), dt),
             ba=jnp.zeros((1, ff), dt), bg=jnp.zeros((1, ff), dt),
             w2=jnp.zeros((ff, c), dt), b2=zeros_c)
    y = _split_post_ff(x, attn, ck, cv, w, heads=heads, head_dim=head_dim,
                       interpret=True)
    got = np.asarray(y - x, np.float32)             # = cross-attn output
    assert np.isfinite(got).all()
    # equal scores per head -> exactly uniform attention over s_ctx
    want = np.asarray(jnp.mean(cv, axis=1, keepdims=True), np.float32)
    want = np.broadcast_to(want, got.shape)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("heads,head_dim,dtype,tol", [
    (4, 32, jnp.float32, 2e-4),
    (6, 32, jnp.float32, 2e-4),    # ragged pack: Cp=256
    (4, 32, jnp.bfloat16, 5e-2),
])
def test_fused_block_training_grad_parity(heads, head_dim, dtype, tol):
    """Training path (custom_vjp: Pallas fwd, 2D-XLA bwd): value AND
    gradients wrt params/input/context match jax.grad of the standard
    TransformerBlock within dtype tolerance."""
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=2, s=16,
                              s_ctx=4, dtype=dtype, seed=11)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=dtype, interpret=True)
    # a non-uniform cotangent via a weighted-sum loss
    wgt = jax.random.normal(jax.random.PRNGKey(9), x.shape,
                            jnp.float32).astype(dtype)

    def loss(mod):
        def f(p, x_, c_):
            y = mod.apply(p, x_, c_, deterministic=False)
            return jnp.sum((y * wgt).astype(jnp.float32))
        return f

    v_ref, g_ref = jax.value_and_grad(loss(ref), argnums=(0, 1, 2))(
        params, x, ctx)
    v_f, g_f = jax.value_and_grad(loss(fused), argnums=(0, 1, 2))(
        params, x, ctx)
    sc = max(1.0, abs(float(v_ref)))
    assert abs(float(v_f) - float(v_ref)) / sc < tol
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_f = jax.tree.leaves(g_f)
    assert len(flat_ref) == len(flat_f)
    for (path, a), b in zip(flat_ref, flat_f):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b / denom, a / denom, rtol=tol, atol=tol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_block_training_value_matches_inference():
    # the custom_vjp primal is the SAME fused forward the inference path
    # runs — bit-identical outputs
    ref, params, x, ctx = _mk(4, 32, ctx_dim=64, b=2, s=16, s_ctx=4,
                              dtype=jnp.float32, seed=13)
    fused = FusedTransformerBlock(heads=4, head_dim=32,
                                  dtype=jnp.float32, interpret=True)
    y_inf = fused.apply(params, x, ctx, deterministic=True)
    y_tr = fused.apply(params, x, ctx, deterministic=False)
    np.testing.assert_array_equal(np.asarray(y_inf), np.asarray(y_tr))


def test_param_trees_identical():
    heads, head_dim = 4, 32
    c = heads * head_dim
    x = jnp.zeros((2, 16, c))
    ctx = jnp.zeros((2, 4, 64))
    ref = TransformerBlock(heads=heads, head_dim=head_dim)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  interpret=True)
    p_ref = ref.init(jax.random.PRNGKey(0), x, ctx)
    p_fused = fused.init(jax.random.PRNGKey(0), x, ctx)
    ref_tree = jax.tree.map(lambda a: (a.shape, a.dtype), p_ref)
    fused_tree = jax.tree.map(lambda a: (a.shape, a.dtype), p_fused)
    assert ref_tree == fused_tree


def test_fused_block_larger_seq():
    # S=64 (ds=8-like whole-image tile) through the real block sizes
    ref, params, x, ctx = _mk(4, 32, ctx_dim=32, b=3, s=64, s_ctx=4,
                              dtype=jnp.float32, seed=1)
    fused = FusedTransformerBlock(heads=4, head_dim=32,
                                  dtype=jnp.float32, interpret=True)
    want = ref.apply(params, x, ctx)
    got = fused.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("heads,head_dim,s_ctx,ctx_dim", [
    (8, 16, 1, 16),    # 8 heads per lane group, single retrieval token
    (4, 128, 4, 32),   # head_dim == full lane width (1 head per group)
    (12, 32, 5, 24),   # Cp = 384 exact multiple, odd context length
])
def test_fused_block_shape_edges(heads, head_dim, s_ctx, ctx_dim):
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=ctx_dim, b=2, s=16,
                              s_ctx=s_ctx, dtype=jnp.float32, seed=5)
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=jnp.float32, interpret=True)
    want = ref.apply(params, x, ctx)
    got = fused.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_int8_parity():
    """int8 serving variant: calibrate act absmax on the unfused path,
    ride them in as a "quant" collection, and the fused kernels run
    the block matmuls in weight+activation int8 within quantization
    tolerance of the exact block."""
    from rdm_tpu.ops import quant

    heads, head_dim = 4, 32
    ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=2, s=16,
                              s_ctx=4, dtype=jnp.float32, seed=5)
    with quant.calibrate():
        want, inter = ref.apply(params, x, ctx,
                                mutable=["intermediates"])
    calib = inter["intermediates"]
    for mod in ("attn1", "attn2", "ff"):
        assert "act_absmax" in calib[mod], calib.keys()
    variables = {**params, "quant": calib}
    fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                  dtype=jnp.float32, interpret=True)
    got = fused.apply(variables, x, ctx)
    w = np.asarray(want, np.float32).ravel()
    g = np.asarray(got, np.float32).ravel()
    cos = float(w @ g / (np.linalg.norm(w) * np.linalg.norm(g)))
    assert cos > 0.995, cos
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.1, rel
    # without the quant collection the same module runs the exact bf16
    # kernels (bit-comparable to the parity tests above)
    exact = fused.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_int8_attention_core(monkeypatch):
    """The int8 attention core (dynamic in-kernel q/k/v scales, p at the
    static 127 scale) stays within quantization tolerance of the exact
    block on both grids, and RDM_TPU_INT8_ATTN=0 reverts to the bf16
    core (which is tighter)."""
    from rdm_tpu.ops import quant

    heads, head_dim = 4, 32
    for b, s in ((2, 16), (8, 16), (2, 512)):  # nb>1 and row-tiled grids
        ref, params, x, ctx = _mk(heads, head_dim, ctx_dim=64, b=b, s=s,
                                  s_ctx=4, dtype=jnp.float32, seed=11)
        with quant.calibrate():
            want, inter = ref.apply(params, x, ctx,
                                    mutable=["intermediates"])
        variables = {**params, "quant": inter["intermediates"]}
        fused = FusedTransformerBlock(heads=heads, head_dim=head_dim,
                                      dtype=jnp.float32, interpret=True)
        monkeypatch.setenv("RDM_TPU_INT8_ATTN", "1")
        got_q8 = fused.apply(variables, x, ctx)
        monkeypatch.setenv("RDM_TPU_INT8_ATTN", "0")
        got_bf = fused.apply(variables, x, ctx)
        w = np.asarray(want, np.float32).ravel()
        for got, floor in ((got_q8, 0.993), (got_bf, 0.995)):
            g = np.asarray(got, np.float32).ravel()
            cos = float(w @ g / (np.linalg.norm(w) * np.linalg.norm(g)))
            assert cos > floor, (b, s, floor, cos)
        # the two cores genuinely differ (the env gate selects a kernel)
        assert not np.allclose(np.asarray(got_q8), np.asarray(got_bf))
