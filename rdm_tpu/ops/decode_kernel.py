"""Fused RARM decode-step TPU kernels (Pallas).

Two kernels per transformer layer replace the ~40 XLA ops the decode
step otherwise issues per layer (profiled: ~790 device ops/step at
0.3-7 us each — the XLA decode runs ~2x above its HBM floor):

  1. `_attn_kernel`    — LN1 + fused [C, 3C] qkv projection + cached
     causal self-attention on a W-chunked grid with an online-softmax
     accumulator (flash-style over the KV cache).
  2. `_post_ff_kernel` — attn out-proj + LN2 + cross-attention +
     out-proj (first column block) + GEGLU FF column-blocked over the
     hidden dim.

Design notes (shaped by Mosaic's restrictions and the 16 MB scoped-VMEM
budget — the scoped-vmem XLA flag is unreachable in this environment):

- Everything stays BATCHED: single-token attention is a GEMV per
  (batch, head), which the MXU hates; instead scores are computed as
  one [W*B, C] x [C, H] matmul against a 0/1 head-segment matrix SEG
  (SEG[c, h] = 1 iff lane c belongs to head h), and probabilities are
  expanded back per-lane with SEG^T. No per-head loops, no lane-segment
  reductions, no unsupported lane-splitting reshapes.
- KV caches are TIME-MAJOR [T, B, C]: broadcasting the query over cache
  rows is then a leading-dim broadcast (supported), and the staged
  window read is a leading-dim block.
- An earlier per-batch-grid variant measured 3x SLOWER than XLA
  (65 us/kernel call: M=1 dots serialized 12 heads x B cells on the
  MXU); a j-inner FF column grid re-streamed 14 MB of weights per batch
  cell. Both are structural lessons, kept here so they aren't retried.

Cache protocol: kernels read the PRE-update cache window (rows
[0, window)) with rows >= pos masked; the current position enters via
the freshly projected k_new/v_new (numerically identical to
update-then-attend). Chunks entirely past `pos` are skipped outright
(pl.when + index_map clamped to the last live chunk, so a skipped cell
re-visits an already-resident block instead of streaming dead cache
tail — CFG b64 79.1 -> 86.8 img/s). Row-commit is a measured matrix
(v5e, 2026-08, CFG b64 = the regime the threshold falls back in):

  - in-kernel aliased row output (block-pipelined): wins only while the
    redundant per-cell write-back stays <= 512 KB/layer-step — the
    scalar-dependent output index defeats Mosaic's revisit detection,
    so every grid cell re-writes the row block (b64 CFG: 6.3 MB/
    layer-step, measured -8%).
  - caller-side dynamic_update_slice per layer (2L tiny DUS/step,
    ~3.5 us dispatch each): 86.8-87.3 img/s. DEFAULT above threshold.
  - batched cross-layer commit, block-pipelined outputs: 79.2 (the
    single-cell grid serializes 3n block DMAs and fetches the unread
    cache blocks too).
  - batched cross-layer commit, ANY-space aliased outputs + overlapped
    explicit async row DMAs (`commit_rows`, RARM_BATCHED_COMMIT=1):
    80.7 — the extra kernel launch plus the row HBM round-trip (rows
    written by decode_layer, read back into VMEM, DMA'd into the
    cache) costs more than the 2L DUS dispatches it saves.

So: in-kernel alias below threshold, caller DUS above; `commit_rows`
stays as the env-gated experimental record of the no-go.

Reference semantics: transformer.py:241-268 / attention.py:199-272
(re-designed: the reference re-forwards the full prefix per token).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below
    f32 round-off for the gelu use). Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _layer_norm(x, scale, bias, eps=1e-5):
    """f32-stat LayerNorm matching models.layers._RawLayerNorm; x [B, C]."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    y = y * scale.astype(x.dtype)
    return y + bias.astype(x.dtype)


def _dot(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _wdot(a, w_ref, s_ref):
    """a @ W with optional int8 weight dequantization.

    int8 weights convert to the activation dtype in-register and the
    per-output-channel scale multiplies the f32 DOT OUTPUT (the scale
    commutes out of the contraction) — HBM streams half the bytes."""
    w = w_ref[...]
    if w.dtype == jnp.int8:
        w = w.astype(a.dtype)
    out = _dot(a, w)
    if s_ref is not None:
        out = out * s_ref[...].astype(jnp.float32)
    return out


def head_segment_matrices(heads: int, head_dim: int, dtype=jnp.bfloat16
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SEG [C, H] (0/1: lane -> its head) and SEG^T [H, C]."""
    c = heads * head_dim
    seg = np.zeros((c, heads), np.float32)
    for h in range(heads):
        seg[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return jnp.asarray(seg, dtype), jnp.asarray(seg.T, dtype)


# ---------------------------------------------------------------- kernels

def _attn_kernel(
    pos_ref, x_ref, kwin_ref, vwin_ref, *rest,
    wc: int, n_chunks: int, scale: float, quantized: bool,
    int8_kv: bool = False,
):
    """LN1 + fused qkv + online-softmax cached attention over W-chunks
    (grid = (n_chunks,)).

    x [B, C]; kwin/vwin chunk [Wc, B, C] (time-major); SEG tricks keep
    every op batched. The first chunk projects q/k_new/v_new into
    scratches (and emits k_new/v_new for the cache commit); scratches
    carry the running max / denom / weighted-V across chunks; the last
    chunk folds in the current position and writes the normalized
    output.

    int8_kv: the K/V caches are stored int8 with per-(row, batch) f32
    scales ([T, B, 1] side caches, chunked alongside). Scores multiply
    by the k-scale AFTER the SEG matmul (the per-row scale commutes out
    of the lane contraction) and the v-scale folds into the f32
    probabilities BEFORE the SEG^T expansion ([Wc,B,H] — cheaper than
    scaling the [Wc,B,C] dequantized values). The current position
    attends through the exact bf16 kn/vn scratches, so quantization only
    touches PAST rows — serving-mode approximation, gated by token
    agreement (tests/test_rarm.py)."""
    if int8_kv:
        kssc_ref, vssc_ref = rest[:2]       # [Wc, B, 1] f32 scale chunks
        rest = rest[2:]
    else:
        kssc_ref = vssc_ref = None
    seg_ref, segt_ref, n1s_ref, n1b_ref, wqkv_ref = rest[:5]
    rest = rest[5:]
    if quantized:
        sqkv_ref, rest = rest[0], rest[1:]
    else:
        sqkv_ref = None
    if int8_kv:
        o_ref, kc_row, vc_row, ks_row, vs_row = rest[:5]
        rest = rest[5:]
    else:
        o_ref, kc_row, vc_row = rest[:3]
        ks_row = vs_row = None
        rest = rest[3:]
    q_acc, kn_acc, vn_acc, m_acc, den_acc, pv_acc = rest
    wi = pl.program_id(0)
    pos = pos_ref[0]
    b, c = x_ref.shape

    @pl.when(wi == 0)
    def _():
        x = x_ref[...]
        hh = _layer_norm(x, n1s_ref[...], n1b_ref[...])
        qkv = _wdot(hh, wqkv_ref, sqkv_ref)   # [B, 3C] f32
        q_acc[...] = qkv[:, :c].astype(x.dtype)
        knf = qkv[:, c:2 * c]
        vnf = qkv[:, 2 * c:]
        kn_acc[...] = knf.astype(x.dtype)
        vn_acc[...] = vnf.astype(x.dtype)
        # commit the current position straight into the cache row
        # outputs (aliased when inkernel_commit — see decode_layer) or
        # emit [1, B, C] rows for a caller-side update. Benign race with
        # window prefetch under aliasing: row `pos` is masked this step
        # and only read from the NEXT pallas_call onward.
        if int8_kv:
            ksc = jnp.maximum(jnp.max(jnp.abs(knf), axis=-1,
                                      keepdims=True), 1e-12) / 127.0
            vsc = jnp.maximum(jnp.max(jnp.abs(vnf), axis=-1,
                                      keepdims=True), 1e-12) / 127.0
            kc_row[0] = jnp.clip(jnp.round(knf / ksc),
                                 -127.0, 127.0).astype(jnp.int8)
            vc_row[0] = jnp.clip(jnp.round(vnf / vsc),
                                 -127.0, 127.0).astype(jnp.int8)
            ks_row[0] = ksc
            vs_row[0] = vsc
        else:
            kc_row[0] = knf.astype(x.dtype)
            vc_row[0] = vnf.astype(x.dtype)
        m_acc[...] = jnp.full_like(m_acc[...], _NEG_INF)
        den_acc[...] = jnp.zeros_like(den_acc[...])
        pv_acc[...] = jnp.zeros_like(pv_acc[...])

    # Chunks entirely past `pos` contribute nothing (every row masked):
    # skip their compute outright. Their input index_maps are also
    # clamped to the last live chunk (decode_layer), so a revisited
    # block needs no fresh DMA — early stage steps stop streaming the
    # cache tail they cannot attend to.
    @pl.when(wi * wc < pos)
    def _():
        q = q_acc[...]                  # [B, C] bf16
        h = seg_ref.shape[1]
        kchunk = kwin_ref[...]          # [Wc, B, C]
        vchunk = vwin_ref[...]
        if int8_kv:
            kchunk = kchunk.astype(q.dtype)   # int8 -> bf16 in-register
            vchunk = vchunk.astype(q.dtype)
        q_b = jax.lax.broadcast_in_dim(q, (wc, b, c), (1, 2))
        prod = (q_b * kchunk).reshape(wc * b, c)
        s = (_dot(prod, seg_ref[...]).reshape(wc, b, h)
             * jnp.float32(scale))      # [Wc, B, H] f32
        if int8_kv:
            s = s * kssc_ref[...]       # per-(row, batch) k scale
        absw = (jax.lax.broadcasted_iota(jnp.int32, (wc, b, h), 0)
                + wi * wc)
        s = jnp.where(absw < pos, s, _NEG_INF)

        m_old = m_acc[...]              # [B, H]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
        corr = jnp.exp(m_old - m_new)   # [B, H]
        p = jnp.exp(s - jax.lax.broadcast_in_dim(m_new, (wc, b, h),
                                                 (1, 2)))
        den_acc[...] = den_acc[...] * corr + jnp.sum(p, axis=0)
        corr_full = _dot(corr.astype(seg_ref.dtype),
                         segt_ref[...])                          # [B, C]
        p_v = p * vssc_ref[...] if int8_kv else p   # fold v scale into p
        p_full = _dot(p_v.reshape(wc * b, h).astype(segt_ref.dtype),
                      segt_ref[...]).reshape(wc, b, c)
        pv = jnp.sum((p_full.astype(vchunk.dtype) * vchunk)
                     .astype(jnp.float32), axis=0)               # [B, C]
        pv_acc[...] = pv_acc[...] * corr_full + pv
        m_acc[...] = m_new

    @pl.when(wi == n_chunks - 1)
    def _():
        # fold in the current position from k_new/v_new, then normalize
        q = q_acc[...]
        kn = kn_acc[...]
        vn = vn_acc[...]
        s_n = (_dot((q * kn).astype(q.dtype), seg_ref[...])
               * jnp.float32(scale))    # [B, H]
        m_f = jnp.maximum(m_acc[...], s_n)
        corr2 = jnp.exp(m_acc[...] - m_f)
        p_n = jnp.exp(s_n - m_f)
        den_f = den_acc[...] * corr2 + p_n
        corr2_full = _dot(corr2.astype(seg_ref.dtype), segt_ref[...])
        pn_full = _dot(p_n.astype(seg_ref.dtype), segt_ref[...])
        pv_f = (pv_acc[...] * corr2_full
                + pn_full * vn.astype(jnp.float32))
        den_full = _dot(den_f.astype(seg_ref.dtype), segt_ref[...])
        o_ref[...] = (pv_f / den_full).astype(o_ref.dtype)


def _post_ff_kernel(
    x_ref, attn_ref, ck_ref, cv_ref, seg_ref, segt_ref,
    wo_ref, bo_ref, n2s_ref, n2b_ref, wq2_ref, wo2_ref, bo2_ref,
    n3s_ref, n3b_ref, wa_ref, wg_ref, ba_ref, bg_ref, w2_ref, b2_ref,
    *rest, n_col_blocks: int, scale: float, quantized: bool,
):
    """Post-attention half + GEGLU FF in one kernel
    (grid = (n_col_blocks,), rows batched).

    Block j == 0 additionally runs: attn out-proj + residual, LN2 +
    batched cross-attention (tiny time-major [S, B, C] context, SEG
    matmuls) + out-proj + residual — into the x_mid scratch. Every
    block then computes its GEGLU column slice f_j = a_j * gelu(gate_j)
    and accumulates f_j @ W2[rows_j] into an f32 scratch; the final
    block adds bias + residual."""
    if quantized:
        (swo_ref, swq2_ref, swo2_ref, swa_ref, swg_ref,
         sw2_ref) = rest[:6]
        rest = rest[6:]
    else:
        swo_ref = swq2_ref = swo2_ref = swa_ref = swg_ref = sw2_ref = None
    xo_ref, xmid_acc, acc_ref = rest
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        x = x_ref[...]                  # [B, C]
        b, c = x.shape
        h = seg_ref.shape[1]
        x = x + (_wdot(attn_ref[...], wo_ref, swo_ref)
                 + bo_ref[...]).astype(x.dtype)
        h2 = _layer_norm(x, n2s_ref[...], n2b_ref[...])
        q2 = _wdot(h2, wq2_ref, swq2_ref).astype(x.dtype)
        ck = ck_ref[...]                # [S, B, C]
        cv = cv_ref[...]
        s_ctx = ck.shape[0]
        q_b = jax.lax.broadcast_in_dim(q2, (s_ctx, b, c), (1, 2))
        s = (_dot((q_b * ck).reshape(s_ctx * b, c), seg_ref[...])
             .reshape(s_ctx, b, h) * jnp.float32(scale))
        m = jnp.max(s, axis=0)
        p = jnp.exp(s - jax.lax.broadcast_in_dim(m, (s_ctx, b, h),
                                                 (1, 2)))
        den = jnp.sum(p, axis=0)
        p_full = _dot(p.reshape(s_ctx * b, h).astype(segt_ref.dtype),
                      segt_ref[...]).reshape(s_ctx, b, c)
        pv = jnp.sum((p_full.astype(cv.dtype) * cv).astype(jnp.float32),
                     axis=0)
        den_full = _dot(den.astype(seg_ref.dtype), segt_ref[...])
        attn2 = (pv / den_full).astype(x.dtype)
        xmid_acc[...] = x + (_wdot(attn2, wo2_ref, swo2_ref)
                             + bo2_ref[...]).astype(x.dtype)

    x = xmid_acc[...]                   # [B, C]
    h3 = _layer_norm(x, n3s_ref[...], n3b_ref[...])
    a = _wdot(h3, wa_ref, swa_ref) + ba_ref[...]  # [B, F/J] f32
    gate = _wdot(h3, wg_ref, swg_ref) + bg_ref[...]
    # exact-erf gelu(gate) = 0.5 * gate * (1 + erf(gate / sqrt(2)))
    f = (a * (0.5 * gate
              * (1.0 + _erf(gate * jnp.float32(0.7071067811865476))))
         ).astype(x.dtype)
    part = _wdot(f, w2_ref, sw2_ref)              # [B, C] f32

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == n_col_blocks - 1)
    def _():
        xo_ref[...] = x + (acc_ref[...] + b2_ref[...]).astype(x.dtype)


# ---------------------------------------------------------------- commit

def _commit_kernel(pos_ref, *refs, n: int):
    """Issue n overlapped VMEM->HBM row DMAs into the aliased caches.

    refs layout: n row refs (VMEM blocks), n (unread) cache refs (ANY),
    n output refs (ANY, aliased to the caches), n DMA semaphores. Every
    copy targets row `pos` of its HBM-resident output; unwritten rows
    keep the aliased input's content."""
    pos = pos_ref[0]
    rows, outs = refs[:n], refs[2 * n:3 * n]
    sems = refs[3 * n:]
    copies = [
        pltpu.make_async_copy(r, o.at[pl.ds(pos, 1)], s)
        for r, o, s in zip(rows, outs, sems)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def commit_rows(pos, caches, rows, *, interpret: bool = False):
    """Commit one decode step's KV rows for ALL layers in a single
    aliased pallas_call (grid (1,)): each cache [T, B, C] comes back
    with rows[i] written at row `pos`, every other row untouched
    (in-place via input_output_aliases).

    Replaces the per-layer dynamic_update_slice fallback: 2L tiny DUS
    ops/step each pay ~3.5 us dispatch (round-2 profile: 33 ms of a
    691 ms b16 decode). The caches stay HBM-resident (memory_space ANY)
    — a first block-pipelined version that let Pallas stream the row
    blocks through VMEM measured 79.2 vs 86.8 img/s at CFG b64: the
    single-cell grid serializes 3n block DMAs and fetches the unread
    cache/output blocks too. Explicit overlapped async row copies move
    only the 2L*B*C row bytes."""
    n = len(caches)
    assert n == len(rows)
    t_cache, b, c = caches[0].shape
    row_spec = pl.BlockSpec((1, b, c), lambda i, pos: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    new_caches = pl.pallas_call(
        functools.partial(_commit_kernel, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[row_spec] * n + [any_spec] * n,
            out_specs=tuple([any_spec] * n),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * n,
        ),
        out_shape=tuple(jax.ShapeDtypeStruct(kc.shape, kc.dtype)
                        for kc in caches),
        input_output_aliases={1 + n + i: i for i in range(n)},
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * n * b * c * 2, transcendentals=0),
        interpret=interpret,
    )(pos.reshape((1,)).astype(jnp.int32), *rows, *caches)
    return list(new_caches)


# ---------------------------------------------------------------- wrapper

def _vmem_full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *a: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _window_chunking(window: int, b: int) -> Tuple[int, int]:
    """Cache-window chunk size and count for the attention kernel grid."""
    wc = max(8, min(64, 1024 // b))
    while window % wc:
        wc //= 2
    return wc, window // wc


def uses_inkernel_commit(window: int, b: int, c: int) -> bool:
    """Whether decode_layer alias-commits KV rows in-kernel at this op
    point (see the threshold note inside decode_layer)."""
    wc, n_chunks = _window_chunking(window, b)
    return n_chunks * b * c * 2 <= 512 * 1024


def decode_layer(
    x: jnp.ndarray,
    pos: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    seg: jnp.ndarray,
    segt: jnp.ndarray,
    w: Dict[str, jnp.ndarray],
    *,
    heads: int,
    head_dim: int,
    window: int,
    ks_cache: jnp.ndarray = None,
    vs_cache: jnp.ndarray = None,
    defer_commit: bool = False,
    partition: bool = False,
    interpret: bool = False,
):
    """Run one fused decode layer.

    x: [B, C]; pos: scalar int32; k/v_cache: TIME-MAJOR [T, B, C] (only
    rows [0, window) are read); cross_k/v: [S_ctx, B, C]; seg/segt from
    head_segment_matrices; w: per-layer dict from
    rarm.extract_decode_weights. Returns (x_out, k_cache, v_cache) —
    the caches come back with row `pos` committed IN-KERNEL (aliased
    outputs, in-place under the decode scan). Above the in-kernel
    threshold (uses_inkernel_commit False): with defer_commit the raw
    [1, B, C] k/v rows are returned instead, for a batched cross-layer
    commit_rows call; otherwise a per-layer dynamic_update_slice commits
    here.

    ks_cache/vs_cache ([T, B, 1] f32, required iff the caches are int8)
    enable the int8 KV serving mode: cache rows store int8 with
    per-(row, batch) scales, halving the cache HBM stream. Measured on
    top of int8_weights (official forced-sync series, v5e): b16
    75.8→81.0, b64+approx 162.7→172.1 (new best point), but plain b64
    129.9→127.7 and CFG b64 94.2→91.6 — the in-register dequant +
    scale-chunk DMAs can outweigh the saved bytes, so opt-in per op
    point. Returns (x_out, k_cache, v_cache, ks_cache, vs_cache). The
    current position stays exact bf16 (kernel scratches); defer_commit
    is not supported with int8_kv.

    partition=True makes the layer DP-partitionable (multi-chip serving):
    both pallas_calls go through `ops.partitioning.call_batch_partitioned`
    so each device runs its LOCAL batch shard, and the KV commit is
    forced to the caller-side dynamic_update_slice (in-kernel aliased
    row outputs don't survive the custom_partitioning wrap; DUS is
    natively batch-sharded by GSPMD). Single-device processes bypass the
    wrap entirely, so this is a no-op on one chip.
    """
    scale = float(head_dim) ** -0.5
    quantized = "wqkv_s" in w
    int8_kv = ks_cache is not None
    assert not (int8_kv and defer_commit), \
        "int8_kv commits per layer (commit_rows assumes uniform shapes)"
    attn_scale_in = [w["wqkv_s"]] if quantized else []

    def attn_call(pos1, x, k_cache, v_cache, *rest_args):
        """The LN1+qkv+cached-attention pallas_call, all shapes derived
        from the args so the partitioner can re-trace it at per-device
        LOCAL batch. Returns (attn [B,C], k_row, v_row[, ks_row,
        vs_row]) — rows are the full aliased caches under in-kernel
        commit, else [1,B,C] (scale rows [1,B,1])."""
        if int8_kv:
            ks_cache, vs_cache = rest_args[:2]
            rest_args = rest_args[2:]
        seg, segt, n1s, n1b, wqkv, *scales = rest_args
        b, c = x.shape
        t_cache = k_cache.shape[0]
        out_bc = jax.ShapeDtypeStruct((b, c), x.dtype)
        # chunk the cache window so (Wc, B, C) blocks stay within VMEM
        wc, n_chunks = _window_chunking(window, b)

        # The scalar-dependent row index defeats Pallas's revisited-block
        # detection, so the (1, B, C) out block is written back EVERY
        # grid step. Cheap at small batch/chunk counts (b16: 4 x 24
        # KB/layer); catastrophic at CFG b64 (32 x 196 KB/layer = 113
        # MB/step, measured -8%). Alias-commit in-kernel only when the
        # redundant write-back stays under ~512 KB per layer-step (CFG
        # b16 = 384 KB measured a win); otherwise emit the rows and
        # update caller-side. Partitioned mode always emits rows.
        inkernel = (not partition) and uses_inkernel_commit(window, b, c)
        kv_dtype = k_cache.dtype
        if inkernel:
            row_out = pl.BlockSpec((1, b, c),
                                   lambda i, pos: (pos[0], 0, 0),
                                   memory_space=pltpu.VMEM)
            sc_out = pl.BlockSpec((1, b, 1),
                                  lambda i, pos: (pos[0], 0, 0),
                                  memory_space=pltpu.VMEM)
            row_shapes = (
                jax.ShapeDtypeStruct((t_cache, b, c), kv_dtype),
                jax.ShapeDtypeStruct((t_cache, b, c), kv_dtype),
            )
            sc_shapes = (
                jax.ShapeDtypeStruct((t_cache, b, 1), jnp.float32),
                jax.ShapeDtypeStruct((t_cache, b, 1), jnp.float32),
            )
            # operand order: (pos, x, k, v[, ks, vs], ...) — caches
            # alias their row-updated outputs
            aliases = ({2: 1, 3: 2, 4: 3, 5: 4} if int8_kv
                       else {2: 1, 3: 2})
        else:
            row_out = pl.BlockSpec((1, b, c), lambda i, pos: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
            sc_out = pl.BlockSpec((1, b, 1), lambda i, pos: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
            row_shapes = (
                jax.ShapeDtypeStruct((1, b, c), kv_dtype),
                jax.ShapeDtypeStruct((1, b, c), kv_dtype),
            )
            sc_shapes = (
                jax.ShapeDtypeStruct((1, b, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, b, 1), jnp.float32),
            )
            aliases = {}

        def full_sp(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda i, pos: (0,) * nd,
                                memory_space=pltpu.VMEM)

        def chunk_sp(lanes):
            # chunk index clamped to the last chunk holding live rows
            # (< pos): cells skipped by the in-kernel pl.when revisit
            # the previous block instead of streaming unread tail
            return pl.BlockSpec(
                (wc, b, lanes),
                lambda i, pos: (jnp.minimum(i,
                                            jnp.maximum(pos[0] - 1, 0)
                                            // wc), 0, 0),
                memory_space=pltpu.VMEM)

        sc_in = [chunk_sp(1), chunk_sp(1)] if int8_kv else []
        sc_args = (ks_cache, vs_cache) if int8_kv else ()
        kv_bytes = 1 if int8_kv else 2
        return pl.pallas_call(
            functools.partial(_attn_kernel, wc=wc, n_chunks=n_chunks,
                              scale=scale, quantized=quantized,
                              int8_kv=int8_kv),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    full_sp((b, c)),                    # x
                    chunk_sp(c),                        # k chunk
                    chunk_sp(c),                        # v chunk
                ] + sc_in + [
                    full_sp(seg.shape), full_sp(segt.shape),
                    full_sp(n1s.shape), full_sp(n1b.shape),
                    full_sp(wqkv.shape),
                ] + [full_sp(a.shape) for a in scales],
                out_specs=((full_sp((b, c)), row_out, row_out)
                           + ((sc_out, sc_out) if int8_kv else ())),
                scratch_shapes=[
                    pltpu.VMEM((b, c), x.dtype),     # q
                    pltpu.VMEM((b, c), x.dtype),     # k_new
                    pltpu.VMEM((b, c), x.dtype),     # v_new
                    pltpu.VMEM((b, heads), jnp.float32),
                    pltpu.VMEM((b, heads), jnp.float32),
                    pltpu.VMEM((b, c), jnp.float32),
                ],
            ),
            out_shape=(out_bc,) + row_shapes
                      + (sc_shapes if int8_kv else ()),
            input_output_aliases=aliases,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * window * c + 6 * b * c * c,
                bytes_accessed=2 * b * window * c * kv_bytes
                               + 2 * wqkv.size,
                transcendentals=b * window * heads),
            interpret=interpret,
        )(pos1, x, k_cache, v_cache, *sc_args,
          seg, segt, n1s, n1b, wqkv, *scales)

    pos1 = pos.reshape((1,)).astype(jnp.int32)
    sc_caches = (ks_cache, vs_cache) if int8_kv else ()
    attn_args = (pos1, x, k_cache, v_cache, *sc_caches, seg, segt,
                 w["n1s"], w["n1b"], w["wqkv"], *attn_scale_in)
    n_lead = 4 + len(sc_caches)   # pos, x, k, v[, ks, vs]: batch dims
    if partition:
        from rdm_tpu.ops.partitioning import call_batch_partitioned
        outs = call_batch_partitioned(
            attn_call, attn_args,
            (None, 0) + (1,) * (n_lead - 2)
            + (None,) * (len(attn_args) - n_lead),
            out_batch_dims=(0,) + (1,) * (n_lead - 2))
        inkernel_commit = False
    else:
        outs = attn_call(*attn_args)
        inkernel_commit = uses_inkernel_commit(window, x.shape[0],
                                               x.shape[1])
    attn, k_out, v_out = outs[:3]
    if inkernel_commit:
        k_cache, v_cache = k_out, v_out
        if int8_kv:
            ks_cache, vs_cache = outs[3], outs[4]
    elif defer_commit and not partition:
        k_cache, v_cache = k_out, v_out  # raw [1, B, C] rows
    else:
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_out, pos, axis=0)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_out, pos, axis=0)
        if int8_kv:
            ks_cache = jax.lax.dynamic_update_slice_in_dim(
                ks_cache, outs[3], pos, axis=0)
            vs_cache = jax.lax.dynamic_update_slice_in_dim(
                vs_cache, outs[4], pos, axis=0)

    def post_call(x, attn, cross_k, cross_v, seg, segt,
                  wo, bo, n2s, n2b, wq2, wo2, bo2, n3s, n3b,
                  wff_a, wff_g, bff_a, bff_g, wff2, bff2, *scales):
        """Post-attn + cross-attn + GEGLU FF pallas_call; shapes derived
        from the args (re-traceable at local batch)."""
        b, c = x.shape
        s_ctx = cross_k.shape[0]
        ff = wff_a.shape[1]
        n_col = 4
        while ff % n_col:
            n_col //= 2
        fcol = ff // n_col
        col_in = pl.BlockSpec((c, fcol), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
        col_bias = pl.BlockSpec((1, fcol), lambda j: (0, j),
                                memory_space=pltpu.VMEM)
        col_out = pl.BlockSpec((fcol, c), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)
        if quantized:
            col_scale = pl.BlockSpec((1, fcol), lambda j: (0, j),
                                     memory_space=pltpu.VMEM)
            swo, swq2, swo2, swa, swg, sw2 = scales
            ff_scale_specs = [_vmem_full(swo.shape),
                              _vmem_full(swq2.shape),
                              _vmem_full(swo2.shape),
                              col_scale, col_scale,
                              _vmem_full(sw2.shape)]
        else:
            ff_scale_specs = []
        return pl.pallas_call(
            functools.partial(_post_ff_kernel, n_col_blocks=n_col,
                              scale=scale, quantized=quantized),
            grid=(n_col,),
            in_specs=[
                _vmem_full((b, c)), _vmem_full((b, c)),     # x, attn
                _vmem_full((s_ctx, b, c)), _vmem_full((s_ctx, b, c)),
                _vmem_full(seg.shape), _vmem_full(segt.shape),
                _vmem_full(wo.shape), _vmem_full(bo.shape),
                _vmem_full(n2s.shape), _vmem_full(n2b.shape),
                _vmem_full(wq2.shape), _vmem_full(wo2.shape),
                _vmem_full(bo2.shape),
                _vmem_full(n3s.shape), _vmem_full(n3b.shape),
                col_in, col_in, col_bias, col_bias,
                col_out, _vmem_full(bff2.shape),
            ] + ff_scale_specs,
            out_specs=_vmem_full((b, c)),
            out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
            scratch_shapes=[pltpu.VMEM((b, c), x.dtype),
                            pltpu.VMEM((b, c), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * c * (3 * ff + 3 * c),
                bytes_accessed=int(2 * (wff_a.size + wff_g.size
                                        + wff2.size + wo.size
                                        + wq2.size + wo2.size)),
                transcendentals=b * ff),
            interpret=interpret,
        )(x, attn, cross_k, cross_v, seg, segt,
          wo, bo, n2s, n2b, wq2, wo2, bo2, n3s, n3b,
          wff_a, wff_g, bff_a, bff_g, wff2, bff2, *scales)

    ff_scale_in = ([w["wo_s"], w["wq2_s"], w["wo2_s"],
                    w["wff_a_s"], w["wff_g_s"], w["wff2_s"]]
                   if quantized else [])
    post_args = (x, attn, cross_k, cross_v, seg, segt,
                 w["wo"], w["bo"], w["n2s"], w["n2b"], w["wq2"],
                 w["wo2"], w["bo2"], w["n3s"], w["n3b"],
                 w["wff_a"], w["wff_g"], w["bff_a"], w["bff_g"],
                 w["wff2"], w["bff2"], *ff_scale_in)
    if partition:
        xo = call_batch_partitioned(
            post_call, post_args,
            (0, 0, 1, 1) + (None,) * (len(post_args) - 4))
    else:
        xo = post_call(*post_args)

    if int8_kv:
        return xo, k_cache, v_cache, ks_cache, vs_cache
    return xo, k_cache, v_cache
