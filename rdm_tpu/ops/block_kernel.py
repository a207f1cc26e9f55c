"""Fused U-Net SpatialTransformer block kernels (Pallas).

Round-2 profile (HLO-mapped v5e trace, CFG batch 32): ~20 ms of the
60.6 ms flagship forward is transformer-block Dense projections lowered
through XLA's conv emitter at 10-45% per-op MXU efficiency, and every
graph-level rewrite tried (DENSE_2D, PROJ_AS_DOT, both) measured SLOWER
— the relayout at each conv<->dot boundary costs more than the bad
layouts. The structural fix: the Pallas flash-attention call already
forces one layout boundary on each side of the block, so extending the
Pallas region outward — swallowing LN1+QKV before the attention core
and out-proj+LN2+cross-attn+LN3+GEGLU after it — moves ALL the
badly-lowered Denses into Pallas without adding any boundary.

Three kernels per TransformerBlock (reference attention.py:122-196):

  1. `_ln_qkv_kernel`   — LN1 + fused [C, 3Cp] qkv projection; q/k/v are
     emitted HEAD-PACKED: head h occupies lanes [h*d, (h+1)*d) of a
     128-lane group, C padded up to Cp (multiple of 128) with zero
     lanes. No BSHD transpose exists anywhere in the fused path.
  2. `_packed_attn_kernel` — flash attention over packed lanes, grid
     (batch, lane-group, q-block). Each 128-lane group holds 128//d
     heads; per head the QK^T/PV dots run masked at full 128-lane width
     — identical MXU work to the d-padded dots of the plain flash
     kernel (rank-d contractions on a 128-wide array cost 128/d x in
     any formulation; measured-equivalent analysis in ADR below), but
     the packed layout removes the 6 relayout round trips.
  3. `_post_ff_kernel`  — attn out-proj + residual + LN2 + cross-attn
     (SEG segment matmuls, time-major context — the decode-kernel
     pattern) + out-proj + residual + LN3 + GEGLU FF column-blocked +
     residual.

Head-packing ADR (round-2 VERDICT item 4): for per-head rank-32
contractions there is NO packing that beats plain lane padding on the
MXU — QK^T with 4 heads packed into the 128-lane contraction computes
the SUM of head scores (wrong); block-diagonal K-expansion, Hadamard
recombination, and per-head lane masking all cost exactly 4x the
useful FLOPs at full utilization, i.e. the same wall time as the
padded d=32 dot. The 128-contraction granularity of the systolic array
makes the 4x fundamental. What packing DOES buy is layout: q/k/v stay
in row-major [B, S, Cp] end to end.

Numerics: LN stats f32 (models.layers._RawLayerNorm parity), matmuls
accumulate f32 via preferred_element_type, softmax f32 with the
exp2/log2(e) folding, gelu exact-erf via the A&S 7.1.26 polynomial.
Inference only (sampling); training keeps the standard path — the
differentiable custom_vjp wrapper (fused_transformer_block_ad) measured
a NO-GO as a training default (83.9 vs 120.5 samples/s b32), while the
standalone Pallas flash BACKWARD kernel became the d<=32 training
default in round 5 (ops/flash_attention.py, 149.1 vs 112.5 samples/s).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rdm_tpu.ops.decode_kernel import (_erf, _layer_norm,
                                       head_segment_matrices)

_NEG_INF = -1e9
_LOG2E = 1.4426950408889634


def _dot(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


# --------------------------------------------------------- int8 helpers
#
# Serving-mode weight+activation int8 for the block matmuls (round 4).
# Slope-timed Pallas probe on v5e ([4096,512]x[512,1024] chained through
# a fori_loop): bf16 dot 175 TFLOP/s (89% peak) vs int8 355 TOP/s (90%
# of the 394 int8 peak) — a true 2.03x MXU rate. The int8 pipeline trace
# shows these bf16 kernels at 48% of device time once the convs are
# int8, so they are the remaining serving lever. Activations quantize
# in-kernel with STATIC calibrated scales (ops/quant.py — the same
# dynamic-requant-is-a-no-go measurement as the convs); weights
# per-output-column; the attention core (kernel 2) and the per-image
# cross-attention block matrices stay bf16 (quality-sensitive, small).


def _quantize_act(h, a_ref):
    """f32 activations -> int8 with the static scale a_ref [1,1] f32."""
    inv = 1.0 / a_ref[0, 0]
    return jnp.clip(jnp.round(h.astype(jnp.float32) * inv),
                    -127.0, 127.0).astype(jnp.int8)


def _qdot(h, w_ref, ws_ref, a_ref):
    """Quantize-h int8 x int8 dot, dequant on the output.

    h [M, K] f32/bf16, w_ref [K, N] int8, ws_ref [1, N] f32 per-column
    weight scale, a_ref [1, 1] f32 activation scale. Returns [M, N] f32.
    """
    hq = _quantize_act(h, a_ref)
    y = jax.lax.dot_general(
        hq, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a_ref[0, 0] * ws_ref[...])


def quantize_cols(w: jnp.ndarray):
    """[K, N] weights -> (int8 codes, [1, N] f32 per-column scale).
    All-zero (lane-padding) columns get scale eps and zero codes."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True),
                    jnp.float32(1e-12)) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------- kernel 1

def _ln_qkv_kernel(x_ref, n1s_ref, n1b_ref, wqkv_ref, q_ref, k_ref, v_ref,
                   *, cp: int):
    """LN1 + packed qkv projection for one row tile.

    x [M, C] -> q/k/v [M, Cp] (Cp = heads padded to 128-lane groups)."""
    h = _layer_norm(x_ref[...], n1s_ref[...], n1b_ref[...])
    qkv = _dot(h, wqkv_ref[...])            # [M, 3Cp] f32
    dt = q_ref.dtype
    q_ref[...] = qkv[:, :cp].astype(dt)
    k_ref[...] = qkv[:, cp:2 * cp].astype(dt)
    v_ref[...] = qkv[:, 2 * cp:].astype(dt)


def _ln_qkv_kernel_q(x_ref, n1s_ref, n1b_ref, wqkv_ref, ws_ref, a_ref,
                     q_ref, k_ref, v_ref, *, cp: int):
    """int8 variant of _ln_qkv_kernel: the LN output quantizes with the
    calibrated static scale, the qkv projection runs int8 on the MXU."""
    h = _layer_norm(x_ref[...], n1s_ref[...], n1b_ref[...])
    qkv = _qdot(h, wqkv_ref, ws_ref, a_ref)  # [M, 3Cp] f32
    dt = q_ref.dtype
    q_ref[...] = qkv[:, :cp].astype(dt)
    k_ref[...] = qkv[:, cp:2 * cp].astype(dt)
    v_ref[...] = qkv[:, 2 * cp:].astype(dt)


# ---------------------------------------------------------------- kernel 2

def _packed_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                        scale: float):
    """Flash attention on one (batch, lane-group, q-block) cell.

    q [1, BQ, 128], k/v [1, S, 128]; 128//head_dim heads per group,
    each handled by a lane-masked full-width dot (same MXU cost as the
    padded per-head dot — see module ADR).

    The leading block dim is the images-per-cell count: 1 on the
    row-tiled grid (large S), NB>1 on the multi-image grid (small S,
    whole sequence per cell) — packing several images per cell
    amortizes per-cell grid overhead that dominates at small S
    (measured sweep, B=32 bf16: res16 S=256 nb=1 234 us -> nb=8
    169.5; res8 S=64 nb=1 154.6 -> nb=8 53.3, nb=16/32 regress)."""
    for n in range(q_ref.shape[0]):
        q = q_ref[n]                        # [BQ, 128]
        k = k_ref[n]                        # [S, 128]
        v = v_ref[n]
        bq = q.shape[0]
        lanes = q.shape[1]
        acc = jnp.zeros((bq, lanes), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, lanes), 1)
        for h in range(lanes // head_dim):
            mh = jnp.logical_and(lane >= h * head_dim,
                                 lane < (h + 1) * head_dim)
            qh = jnp.where(mh, q, jnp.zeros_like(q))
            s = jax.lax.dot_general(
                qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [BQ, S]
            s = s * (scale * _LOG2E)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            den = jnp.sum(p, axis=-1, keepdims=True)
            pv = _dot(p.astype(v.dtype), v)          # [BQ, 128] f32
            pv = pv * pl.reciprocal(den, approx=False)
            acc = acc + jnp.where(mh, pv, 0.0)
        o_ref[n] = acc.astype(o_ref.dtype)


def _packed_attn_kernel_q8(q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                           scale: float):
    """int8 attention core (round 5): QK^T and PV run int8 x int8 -> int32
    on the MXU at 2x the bf16 rate. The d=32 lane-padding tax (128/d = 4x
    effective FLOPs, module ADR) is unavoidable in ANY formulation, so
    halving the per-FLOP cost is the only remaining lever on the padded
    dots — the bf16 kernel already measured ~84% of its padded ceiling
    at the res32 site (block_0.565, 1.25 ms: 206 GFLOP effective / 165
    TFLOP/s in the round-5 int8 pipeline trace).

    Scales are DYNAMIC but in-kernel: per-cell absmax of q/k/v computed
    in VMEM (no extra HBM pass — the conv-path dynamic-requant no-go was
    about HBM round trips, which do not exist here) and the softmax
    probabilities quantize with the exact static scale 127 (p in [0,1]).
    Softmax itself stays f32, and the denominator comes from the f32
    probabilities, so the only approximation is the three 8-bit
    roundings.

    MEASURED NO-GO as a default (round 5, healthy-device A/B, isolated
    per-site loops with device-time cross-check against the pipeline
    trace): res32 b32 S1024 0.989x, res16 b64 S256 0.980x, res8 b64
    S64 1.028x — a wash. The core is softmax/VPU-bound (f32 exp2 + two
    max/sum reductions per head survive unchanged), so halving the MXU
    dot cost moves nothing; per-block parity cosine stays > 0.993.
    Kept opt-in (RDM_TPU_INT8_ATTN=1, int8 serving mode only) as the
    starting point if a future int8 softmax lands."""
    for n in range(q_ref.shape[0]):
        qf = q_ref[n].astype(jnp.float32)    # [BQ, 128]
        kf = k_ref[n].astype(jnp.float32)    # [S, 128]
        vf = v_ref[n].astype(jnp.float32)
        bq, lanes = qf.shape
        qs = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-12) / 127.0
        ks = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-12) / 127.0
        vs = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-12) / 127.0
        qq = jnp.clip(jnp.round(qf / qs), -127.0, 127.0).astype(jnp.int8)
        kq = jnp.clip(jnp.round(kf / ks), -127.0, 127.0).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vf / vs), -127.0, 127.0).astype(jnp.int8)
        acc = jnp.zeros((bq, lanes), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, lanes), 1)
        for h in range(lanes // head_dim):
            mh = jnp.logical_and(lane >= h * head_dim,
                                 lane < (h + 1) * head_dim)
            qh = jnp.where(mh, qq, jnp.zeros_like(qq))
            s = jax.lax.dot_general(
                qh, kq, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)       # [BQ, S] exact
            s = s.astype(jnp.float32) * jnp.float32(qs * ks * scale
                                                    * _LOG2E)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            den = jnp.sum(p, axis=-1, keepdims=True)    # f32 denominator
            pq = jnp.round(p * 127.0).astype(jnp.int8)  # p in [0,1]
            pv = jax.lax.dot_general(
                pq, vq, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)       # [BQ, 128]
            pv = pv.astype(jnp.float32) * jnp.float32(vs / 127.0)
            pv = pv * pl.reciprocal(den, approx=False)
            acc = acc + jnp.where(mh, pv, 0.0)
        o_ref[n] = acc.astype(o_ref.dtype)


def use_int8_attn_core() -> bool:
    """int8 attention core inside the int8 serving mode. Default OFF:
    measured a wash (0.98-1.03x per site, _packed_attn_kernel_q8
    docstring) because the core is softmax-bound, and off keeps the
    int8 mode's approximation surface smaller."""
    return os.environ.get("RDM_TPU_INT8_ATTN", "0") == "1"


# ---------------------------------------------------------------- kernel 3

def _post_ff_kernel(
    x_ref, attn_ref, ck_ref, cv_ref, seg_ref, segt_ref,
    wo_ref, bo_ref, n2s_ref, n2b_ref, wq2_ref, wo2_ref, bo2_ref,
    n3s_ref, n3b_ref, wa_ref, wg_ref, ba_ref, bg_ref, w2_ref, b2_ref,
    y_ref, xmid_acc, acc_ref, *, n_col_blocks: int, scale: float,
):
    """Post-attention half + GEGLU FF for one (batch, row-tile) pair,
    grid (B, S_tiles, J) with the FF hidden dim column-blocked over J.

    j == 0: attn out-proj + residual, LN2 + SEG-matmul cross-attention
    over the tiny per-image context + out-proj + residual -> xmid.
    Every j: GEGLU column slice accumulated into f32 acc; the last j
    adds bias + residual and writes y."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        x = x_ref[0]                         # [M, C]
        m, c = x.shape
        x1 = x + (_dot(attn_ref[0], wo_ref[...])
                  + bo_ref[...]).astype(x.dtype)
        h2 = _layer_norm(x1, n2s_ref[...], n2b_ref[...])
        q2 = _dot(h2, wq2_ref[...]).astype(x.dtype)   # [M, C]
        s_ctx = ck_ref.shape[1]
        # unrolled over the tiny static context length with 2D ops only:
        # Mosaic cannot lower a middle-dim broadcast ([S_ctx, C] ->
        # [S_ctx, M, C]), and S_ctx is <= a few dozen retrieval tokens
        ss = []
        for t in range(s_ctx):
            ckt = ck_ref[0, t:t + 1, :]               # [1, C]
            ss.append(_dot((q2 * ckt).astype(q2.dtype), seg_ref[...])
                      * jnp.float32(scale))           # [M, H] f32
        mx = ss[0]
        for t in range(1, s_ctx):
            mx = jnp.maximum(mx, ss[t])
        ps = [jnp.exp(s - mx) for s in ss]
        den = ps[0]
        for t in range(1, s_ctx):
            den = den + ps[t]
        pv = jnp.zeros((m, c), jnp.float32)
        for t in range(s_ctx):
            p_full = _dot(ps[t].astype(segt_ref.dtype), segt_ref[...])
            cvt = cv_ref[0, t:t + 1, :]               # [1, C]
            pv = pv + p_full * cvt.astype(jnp.float32)
        den_full = _dot(den.astype(seg_ref.dtype), segt_ref[...])
        attn2 = (pv / den_full).astype(x.dtype)
        xmid_acc[...] = x1 + (_dot(attn2, wo2_ref[...])
                              + bo2_ref[...]).astype(x.dtype)

    xm = xmid_acc[...]                       # [M, C]
    h3 = _layer_norm(xm, n3s_ref[...], n3b_ref[...])
    a = _dot(h3, wa_ref[...]) + ba_ref[...]  # [M, F/J] f32
    g = _dot(h3, wg_ref[...]) + bg_ref[...]
    f = (a * (0.5 * g * (1.0 + _erf(g * jnp.float32(0.7071067811865476))))
         ).astype(xm.dtype)
    part = _dot(f, w2_ref[...])              # [M, C] f32

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == n_col_blocks - 1)
    def _():
        y_ref[0] = xm + (acc_ref[...] + b2_ref[...]).astype(xm.dtype)


# ------------------------------------------------- kernel 3 split variant
#
# Round-3 micro-bench (slope-timed isolated kernels, chained through a
# fori_loop so the ~28 ms tunnel dispatch cancels): the single (b, t, j)
# _post_ff_kernel grid re-streams the FF column weights once per
# (batch, row-tile) sweep and runs the cross-attention as s_ctx tiny
# [M, H] SEG dots at ~10-25% lane utilization. Splitting it wins at
# every resolution site of the flagship U-Net:
#
#   site             baseline      split      (us/iter, B=32)
#   res32 C=384        2450.2     1863.6
#   res16 C=576         782.7      741.3
#   res8  C=960         975.0      579.4
#
# Split design (RDM_TPU_SPLIT_K3=0 reverts to the single kernel):
#   3a `_post_cross_kernel` — grid (B, S_tiles): attn out-proj + LN2 +
#      cross-attention via PER-IMAGE BLOCK MATRICES. The context is tiny
#      (s_ctx retrieval tokens), so K/V fold into wk [C, P], wv [P, C]
#      with P = heads*s_ctx padded to 128 lanes: ONE [M,C]x[C,P] score
#      dot replaces the s_ctx-unrolled SEG loop, softmax normalizes with
#      a row-global max (any per-row constant cancels per head), and the
#      per-head denominator comes from a 0/1 group-sum matrix.
#   3b `_geglu_ff_kernel` — grid (R_tiles, J) over BATCH-FLATTENED rows
#      [B*S, C]: the FF weight columns stream once per full row sweep
#      instead of once per (batch, row-tile).


def _post_cross_kernel(x_ref, attn_ref, wk_ref, wv_ref, g_ref, segt_ref,
                       wo_ref, bo_ref, n2s_ref, n2b_ref, wq2_ref, wo2_ref,
                       bo2_ref, xmid_ref, *, n_real: int):
    """Attn out-proj + residual + LN2 + cross-attn for one (batch, tile).

    wk [1, C, P] (scale folded in), wv [1, P, C], g [P, H] per-head
    group-sum, segt [H, C] head->channel broadcast; columns >= n_real are
    zero padding.

    Softmax numerics: any per-row constant cancels per head through the
    num/den renormalization, so a row-global max suffices mathematically —
    but the exp must survive the bf16 cast. Padded columns score exactly 0
    and are EXCLUDED from the max (else they floor it at 0, and a row
    whose real scores all sit below ~-88 underflows to den=0 -> NaN).
    The shifted scores are additionally clamped at -75 (exp(-75) ~ 2.6e-33,
    comfortably normal in bf16): a head sitting > 75 below the row-global
    max keeps a finite, ~uniform attention pattern instead of NaN. Heads
    within 75 of the max — every case observed with trained weights — are
    bit-identical to the unclamped computation."""
    x = x_ref[0]
    x1 = x + (_dot(attn_ref[0], wo_ref[...]) + bo_ref[...]).astype(x.dtype)
    h2 = _layer_norm(x1, n2s_ref[...], n2b_ref[...])
    q2 = _dot(h2, wq2_ref[...]).astype(x.dtype)           # [M, C]
    s = _dot(q2, wk_ref[0])                               # [M, P] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(lane < n_real, s, _NEG_INF)
    mrow = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(jnp.maximum(s - mrow, -75.0)).astype(x.dtype)  # [M, P]
    den = _dot(p, g_ref[...])                             # [M, H] f32
    num = _dot(p, wv_ref[0])                              # [M, C] f32
    den_full = _dot(den.astype(x.dtype), segt_ref[...])   # [M, C] f32
    attn2 = (num / den_full).astype(x.dtype)
    xmid_ref[0] = x1 + (_dot(attn2, wo2_ref[...])
                        + bo2_ref[...]).astype(x.dtype)


def _post_cross_kernel_q(x_ref, attn_ref, wk_ref, wv_ref, g_ref, segt_ref,
                         wo_ref, wso_ref, ao_ref, bo_ref, n2s_ref, n2b_ref,
                         wq2_ref, wsq2_ref, aq2_ref, wo2_ref, wso2_ref,
                         ao2_ref, bo2_ref, xmid_ref, *, n_real: int):
    """int8 variant of _post_cross_kernel: wo/wq2/wo2 run int8 (packed
    attention output, LN2 output, and cross-attn output quantize with
    their calibrated scales); the per-image cross score/value matmuls
    stay bf16."""
    x = x_ref[0]
    x1 = x + (_qdot(attn_ref[0], wo_ref, wso_ref, ao_ref)
              + bo_ref[...]).astype(x.dtype)
    h2 = _layer_norm(x1, n2s_ref[...], n2b_ref[...])
    q2 = _qdot(h2, wq2_ref, wsq2_ref, aq2_ref).astype(x.dtype)   # [M, C]
    s = _dot(q2, wk_ref[0])                               # [M, P] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(lane < n_real, s, _NEG_INF)
    mrow = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(jnp.maximum(s - mrow, -75.0)).astype(x.dtype)  # [M, P]
    den = _dot(p, g_ref[...])                             # [M, H] f32
    num = _dot(p, wv_ref[0])                              # [M, C] f32
    den_full = _dot(den.astype(x.dtype), segt_ref[...])   # [M, C] f32
    attn2 = num / den_full                                # f32
    xmid_ref[0] = x1 + (_qdot(attn2, wo2_ref, wso2_ref, ao2_ref)
                        + bo2_ref[...]).astype(x.dtype)


def _geglu_ff_kernel(xm_ref, n3s_ref, n3b_ref, wa_ref, wg_ref, ba_ref,
                     bg_ref, w2_ref, b2_ref, y_ref, h3_ref, acc_ref,
                     *, n_col_blocks: int):
    """LN3 + GEGLU FF over one row tile of the flattened [B*S, C] stream,
    FF hidden dim column-blocked over the fast grid axis J."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h3_ref[...] = _layer_norm(
            xm_ref[...], n3s_ref[...], n3b_ref[...]).astype(xm_ref.dtype)

    h3 = h3_ref[...]
    a = _dot(h3, wa_ref[...]) + ba_ref[...]
    g = _dot(h3, wg_ref[...]) + bg_ref[...]
    f = (a * (0.5 * g * (1.0 + _erf(g * jnp.float32(0.7071067811865476))))
         ).astype(h3.dtype)
    part = _dot(f, w2_ref[...])

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == n_col_blocks - 1)
    def _():
        y_ref[...] = xm_ref[...] + (acc_ref[...]
                                    + b2_ref[...]).astype(xm_ref.dtype)


def _geglu_ff_kernel_q(xm_ref, n3s_ref, n3b_ref, wa_ref, wsa_ref, wg_ref,
                       wsg_ref, ba_ref, bg_ref, w2_ref, ws2_ref, a3_ref,
                       ah_ref, b2_ref, y_ref, h3_ref, acc_ref,
                       *, n_col_blocks: int):
    """int8 variant of _geglu_ff_kernel: wa/wg/w2 run int8. The LN3
    output quantizes once into the int8 scratch (reused across column
    blocks); the gated hidden activation quantizes per block with the
    calibrated hidden scale. wsa/wsg slices follow the column blocks;
    ws2 is the full per-output-channel scale row."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h3 = _layer_norm(xm_ref[...], n3s_ref[...], n3b_ref[...])
        h3_ref[...] = _quantize_act(h3, a3_ref)

    h3q = h3_ref[...]
    a3 = a3_ref[0, 0]

    def qdot_pre(w_ref, ws_ref):
        y = jax.lax.dot_general(
            h3q, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (a3 * ws_ref[...])

    a = qdot_pre(wa_ref, wsa_ref) + ba_ref[...]
    g = qdot_pre(wg_ref, wsg_ref) + bg_ref[...]
    f = a * (0.5 * g * (1.0 + _erf(g * jnp.float32(0.7071067811865476))))
    part = _qdot(f, w2_ref, ws2_ref, ah_ref)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == n_col_blocks - 1)
    def _():
        y_ref[...] = xm_ref[...] + (acc_ref[...]
                                    + b2_ref[...]).astype(xm_ref.dtype)


def make_cross_mats(ck, cv, heads: int, head_dim: int, scale: float):
    """Fold pre-projected context K/V [B, T, C] into per-image block
    matrices for `_post_cross_kernel`: wk [B, C, P] (scale folded in),
    wv [B, P, C], g [P, H] 0/1 per-head column-group sum. Column order is
    t-fastest within head (j = h*T + t); P = heads*T padded to 128 lanes.

    All ops are tile/mask/pad elementwise — XLA hoists them out of the
    DDIM scan since the context is loop-invariant."""
    b, t, c = ck.shape
    dt = ck.dtype
    p_real = heads * t
    p = _round_up(p_real, 128)
    cidx = np.arange(c) // head_dim                       # head of channel
    jh = np.arange(p_real) // t                           # head of column
    mask = jnp.asarray((cidx[:, None] == jh[None, :]), dt)
    ckt = jnp.transpose(ck, (0, 2, 1))                    # [B, C, T]
    wk = jnp.tile(ckt, (1, 1, heads)) * mask[None]        # [B, C, HT]
    wk = wk * jnp.asarray(scale, dt)
    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, p - p_real)))
    cvt = jnp.tile(cv, (1, heads, 1))                     # [B, HT, C]
    wv = jnp.pad(cvt * mask.T[None], ((0, 0), (0, p - p_real), (0, 0)))
    g = (np.arange(p_real)[:, None] // t ==
         np.arange(heads)[None, :]).astype(np.float32)
    g = jnp.pad(jnp.asarray(g, dt), ((0, p - p_real), (0, 0)))
    return wk, wv, g


def _env_pow2(name: str, default: int) -> int:
    """Read a positive power-of-two tile knob from the environment
    (on-TPU sweep hooks: RDM_TPU_FF_ROWS / _K1_ROWS / _K3A_ROWS /
    _ATTN_BQ). Sanitized so a bad value can't zero a tile."""
    try:
        v = int(os.environ.get(name, str(default)))
    except ValueError:
        return default
    if v < 1:
        return default
    return 1 << (v.bit_length() - 1)


def _ff_col_blocks(c: int, ff: int, budget: int = 8 * 1024 * 1024,
                   fixed_bytes: int = 0) -> int:
    """Smallest column-block count keeping resident FF weights within
    the VMEM budget. n_col=1 means a single fetch (no double buffering,
    so no 2x factor); multi-block streams double-buffered. `fixed_bytes`
    accounts for non-blocked weights resident in the same kernel (the
    single-kernel path keeps wo/wq2/wo2 in VMEM alongside the FF
    columns). Both kernel-3 variants size through this one function so
    the RDM_TPU_SPLIT_K3 A/B compares kernels, not blocking policies."""
    ff_tiles = max(1, ff // 128)
    wbytes = (2 * c * ff + ff * c) * 2
    n_col = 1
    for cand in range(1, ff_tiles + 1):
        if ff % (cand * 128) and cand != 1:
            continue
        if ff_tiles % cand:
            continue
        n_col = cand
        cost = wbytes if cand == 1 else 2 * wbytes // cand
        if fixed_bytes + cost <= budget:
            break
    return n_col


# ---------------------------------------------------------------- wrapper

def _full(shape, ngrid):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *a: (0,) * nd,
                        memory_space=pltpu.VMEM)


def pack_head_lanes(w: jnp.ndarray, heads: int, head_dim: int,
                    cp: int) -> jnp.ndarray:
    """[in, heads*head_dim] -> [in, cp]: zero-pad the head lanes up to
    full 128-lane groups (cp = heads*head_dim rounded up to 128)."""
    c = heads * head_dim
    if cp == c:
        return w
    return jnp.pad(w, ((0, 0), (0, cp - c)))


def fused_transformer_block(
    x: jnp.ndarray,            # [B, S, C]
    ck: jnp.ndarray,           # [B, S_ctx, C]  pre-projected context keys
    cv: jnp.ndarray,           # [B, S_ctx, C]  pre-projected context values
    w: Dict[str, jnp.ndarray],
    *,
    heads: int,
    head_dim: int,
    interpret: bool = False,
    split_k3: bool | None = None,
    qscales: Dict[str, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """One fused pre-LN transformer block (self-attn -> cross-attn ->
    GEGLU FF, each residual) — semantics of models.layers.TransformerBlock
    / reference attention.py:77-96, inference only.

    Weight dict (compute dtype, f32 norms/biases; packed shapes):
      n1s/n1b/n2s/n2b/n3s/n3b [1, C]; wqkv [C, 3*Cp]; wo [Cp, C];
      bo/bo2/b2 [1, C]; wq2 [C, C]; wo2 [C, C]; wa/wg [C, F]; ba/bg
      [1, F]; w2 [F, C].

    qscales (int8 serving, see the int8-helpers block comment): dict of
    calibrated act ABSMAX scalars {a_qkv, o_attn1, a_attn2, o_attn2,
    a_ff, h_ff} — when given, the block matmuls run weight+activation
    int8 (weights quantized here per output column; loop-invariant, XLA
    hoists the quantization out of the sampling scan). Forces the split
    kernel-3 path.
    """
    b, s, c = x.shape
    assert heads * head_dim == c, (heads, head_dim, c)
    cp = _round_up(c, 128)
    scale = float(head_dim) ** -0.5
    dt = x.dtype
    x2 = x.reshape(b * s, c)
    r = b * s

    def act_scale(name):
        return (qscales[name].astype(jnp.float32) / 127.0).reshape(1, 1)

    # -- kernel 1: LN1 + packed qkv --------------------------------------
    m_a = _env_pow2("RDM_TPU_K1_ROWS", 512 if cp <= 512 else 256)
    # pure halving to a divisor of r (no min(m_a, r) shortcut: for
    # non-pow2 r < m_a that would silently switch to a grid=1 full-rows
    # tile, an unmeasured VMEM-residency change — advisor r4)
    while r % m_a:
        m_a //= 2
    out_rcp = jax.ShapeDtypeStruct((r, cp), dt)
    row_in = pl.BlockSpec((m_a, c), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    row_out = pl.BlockSpec((m_a, cp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    if qscales is not None:
        wqkv_q, ws_qkv = quantize_cols(w["wqkv"])
        kern1 = functools.partial(_ln_qkv_kernel_q, cp=cp)
        extra_in = [_full(ws_qkv.shape, 1), _full((1, 1), 1)]
        args1 = (x2, w["n1s"], w["n1b"], wqkv_q, ws_qkv,
                 act_scale("a_qkv"))
        wspec1 = _full(wqkv_q.shape, 1)
    else:
        kern1 = functools.partial(_ln_qkv_kernel, cp=cp)
        extra_in = []
        args1 = (x2, w["n1s"], w["n1b"], w["wqkv"])
        wspec1 = _full(w["wqkv"].shape, 1)
    q, k, v = pl.pallas_call(
        kern1,
        grid=(r // m_a,),
        in_specs=[
            row_in,
            _full(w["n1s"].shape, 1), _full(w["n1b"].shape, 1),
            wspec1,
        ] + extra_in,
        out_specs=(row_out, row_out, row_out),
        out_shape=(out_rcp, out_rcp, out_rcp),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * c * 3 * cp,
            bytes_accessed=r * c * 2 * 4 + w["wqkv"].size * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args1)

    # -- kernel 2: packed-lane flash attention ---------------------------
    q = q.reshape(b, s, cp)
    k = k.reshape(b, s, cp)
    v = v.reshape(b, s, cp)
    g = cp // 128
    nb = 1
    if s <= 256:
        # multi-image grid: whole sequence per cell, pack images to
        # amortize per-cell overhead (see _packed_attn_kernel docstring)
        while nb < 8 and b % (2 * nb) == 0:
            nb *= 2
    if nb > 1:
        mspec = pl.BlockSpec((nb, s, 128), lambda bi, gi: (bi, 0, gi),
                             memory_space=pltpu.VMEM)
        grid = (b // nb, g)
        in_specs = [mspec, mspec, mspec]
        out_spec = mspec
    else:
        bq = min(_env_pow2("RDM_TPU_ATTN_BQ", 512), s)
        while s % bq:
            bq //= 2
        # row-tiled grid can ALSO pack images per cell (leading block
        # dim > 1, kernel loops it) — RDM_TPU_ATTN_NB sweep knob
        nbq = _env_pow2("RDM_TPU_ATTN_NB", 1)
        while nbq > 1 and b % nbq:
            nbq //= 2
        # scoped-VMEM guard: the kernel's f32 score scratch scales like
        # nbq*bq*S (one [BQ,S] matrix per head per image, images
        # unrolled) — nbq=2 at bq=512, S=1024 was measured to OOM the
        # 16 MB scoped-vmem cap (17.53M), and bq=1024 alone at nbq=1
        # likewise (17.44M). Keep nbq*bq at the proven default (512)
        # budget by shrinking bq first, then nbq. nbq also multiplies
        # the per-cell K/V residency ((nbq, s, 128) blocks), which the
        # score budget does not model — cap nbq*s at the proven
        # nbq=1, S=1024 point so a sweep knob cannot OOM via KV bytes
        # at large S (advisor r4).
        while nbq > 1 and nbq * s > 1024:
            nbq //= 2
        while nbq * bq > 512:
            if bq > 128:
                bq //= 2
            elif nbq > 1:
                nbq //= 2
            else:
                break
        qspec = pl.BlockSpec((nbq, bq, 128),
                             lambda bi, gi, qi: (bi, qi, gi),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((nbq, s, 128),
                              lambda bi, gi, qi: (bi, 0, gi),
                              memory_space=pltpu.VMEM)
        grid = (b // nbq, g, s // bq)
        in_specs = [qspec, kvspec, kvspec]
        out_spec = qspec
    attn_kernel = (_packed_attn_kernel_q8
                   if qscales is not None and use_int8_attn_core()
                   else _packed_attn_kernel)
    attn = pl.pallas_call(
        functools.partial(attn_kernel, head_dim=head_dim,
                          scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, cp), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * cp,
            bytes_accessed=3 * b * s * cp * 2,
            transcendentals=b * s * s * (cp // head_dim)),
        interpret=interpret,
    )(q, k, v)

    # -- kernel 3: out-proj + cross-attn + GEGLU FF ----------------------
    if split_k3 is None:
        split_k3 = os.environ.get("RDM_TPU_SPLIT_K3", "1") != "0"
    if qscales is not None or split_k3:
        return _split_post_ff(x, attn, ck, cv, w, heads=heads,
                              head_dim=head_dim, interpret=interpret,
                              qscales=qscales)
    ff = w["wa"].shape[1]
    s_ctx = ck.shape[1]
    seg, segt = head_segment_matrices(heads, head_dim, dtype=dt)

    m_c = min(512, s)
    while s % m_c:
        m_c //= 2
    # FF column blocks so resident weights (incl. the non-blocked
    # wo/wq2/wo2 this kernel also holds) stay within the VMEM budget
    fixed = (w["wo"].size + w["wq2"].size + w["wo2"].size) * 2
    n_col = _ff_col_blocks(c, ff, budget=9 * 1024 * 1024,
                           fixed_bytes=fixed)
    fcol = ff // n_col

    xspec = pl.BlockSpec((1, m_c, c), lambda bi, ti, ji: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, m_c, cp), lambda bi, ti, ji: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    ctxspec = pl.BlockSpec((1, s_ctx, c), lambda bi, ti, ji: (bi, 0, 0),
                           memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti, ji: (0,) * nd,
                            memory_space=pltpu.VMEM)

    col_in = pl.BlockSpec((c, fcol), lambda bi, ti, ji: (0, ji),
                          memory_space=pltpu.VMEM)
    col_bias = pl.BlockSpec((1, fcol), lambda bi, ti, ji: (0, ji),
                            memory_space=pltpu.VMEM)
    col_out = pl.BlockSpec((fcol, c), lambda bi, ti, ji: (ji, 0),
                           memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_post_ff_kernel, n_col_blocks=n_col,
                          scale=scale),
        grid=(b, s // m_c, n_col),
        in_specs=[
            xspec, aspec, ctxspec, ctxspec,
            const(seg.shape), const(segt.shape),
            const(w["wo"].shape), const(w["bo"].shape),
            const(w["n2s"].shape), const(w["n2b"].shape),
            const(w["wq2"].shape), const(w["wo2"].shape),
            const(w["bo2"].shape),
            const(w["n3s"].shape), const(w["n3b"].shape),
            col_in, col_in, col_bias, col_bias, col_out,
            const(w["b2"].shape),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), dt),
        scratch_shapes=[pltpu.VMEM((m_c, c), dt),
                        pltpu.VMEM((m_c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * c * (cp + 2 * c + 3 * ff)
            + 4 * r * s_ctx * c,
            bytes_accessed=(w["wo"].size + w["wq2"].size + w["wo2"].size
                            + (2 * c * ff + ff * c)) * 2
            + r * (c + cp) * 2 * 2,
            transcendentals=r * (ff + s_ctx * heads)),
        interpret=interpret,
    )(x, attn, ck, cv, seg, segt,
      w["wo"], w["bo"], w["n2s"], w["n2b"], w["wq2"], w["wo2"], w["bo2"],
      w["n3s"], w["n3b"], w["wa"], w["wg"], w["ba"], w["bg"], w["w2"],
      w["b2"])
    return y


# ------------------------------------------------ differentiable wrapper
#
# Training path (round 5): the same fused Pallas kernels run the
# TRAINING forward via jax.custom_vjp — Pallas forward, XLA-reference
# backward (the flash_attention.py:256-279 recipe). The backward is the
# jax.vjp of `_xla_block_reference`, a mathematically identical unfused
# block whose Dense contractions run on FLATTENED [B*S, C] operands:
# inside this self-contained bwd subgraph the 2D forms lower as plain
# MXU dots instead of the 10-45%-efficiency conv-emitter 3D dots of the
# standard training path (the fwd-path DENSE_2D no-go does not apply —
# the Pallas block boundary already pays its relayout either way).
# Recompute-style: residuals are just (x, ck, cv, w).
#
# MEASURED NO-GO as the training default (v5e, flagship b32 no-remat):
# 83.9 samples/s / 31.7% MFU vs 120.5 / 37.5% standard — the bwd block
# recompute adds +21% executed FLOPs AND per-FLOP efficiency drops (the
# custom_vjp boundary blocks cross-block fusion; the 2D bwd dots don't
# recoup it). Saving more residuals (q/k/v, attn, xmid are already
# kernel outputs) would cut the recompute from ~11 to ~5 matmul-units,
# bounding the best case at ~-8% vs standard — still a loss, not
# pursued. Env-gated RDM_TPU_FUSED_BLOCK_TRAIN=1; the full measured
# matrix lives in models/layers.use_fused_spatial_block_train.


def _xla_block_reference(x, ck, cv, w, *, heads: int, head_dim: int):
    """Unfused XLA block over the SAME packed weight dict as
    `fused_transformer_block` (semantics: models.layers.TransformerBlock,
    reference attention.py:77-96). Used as the custom_vjp backward."""
    b, s, c = x.shape
    cp = w["wo"].shape[0]
    dt = x.dtype
    scale = float(head_dim) ** -0.5

    def ln(t2, sc, bi):
        # models.layers._RawLayerNorm numerics: f32 stats, eps 1e-5,
        # dtype-native arithmetic
        xf = t2.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                          - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (t2 - mean.astype(dt)) * inv.astype(dt)
        return y * sc[0].astype(dt) + bi[0].astype(dt)

    def mm(a2, w2):
        return jax.lax.dot_general(
            a2, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def attend(q4, k4, v4):
        sc_ = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                         preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(sc_, axis=-1).astype(dt)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v4)

    x2 = x.reshape(b * s, c)
    # self-attention: packed wqkv's pad lanes are zero fill — the real
    # head channels are the first c of each cp-wide third
    h1 = ln(x2, w["n1s"], w["n1b"])
    qkv = mm(h1, w["wqkv"]).astype(dt)               # [r, 3cp]
    q = qkv[:, :c].reshape(b, s, heads, head_dim)
    k = qkv[:, cp:cp + c].reshape(b, s, heads, head_dim)
    v = qkv[:, 2 * cp:2 * cp + c].reshape(b, s, heads, head_dim)
    a1 = attend(q, k, v).reshape(b * s, c)
    x1 = x2 + (mm(a1, w["wo"][:c]) + w["bo"][0]).astype(dt)

    # cross-attention over the pre-projected context k/v
    t = ck.shape[1]
    h2 = ln(x1, w["n2s"], w["n2b"])
    q2 = mm(h2, w["wq2"]).astype(dt).reshape(b, s, heads, head_dim)
    k2 = ck.reshape(b, t, heads, head_dim)
    v2 = cv.reshape(b, t, heads, head_dim)
    a2 = attend(q2, k2, v2).reshape(b * s, c)
    x1 = x1 + (mm(a2, w["wo2"]) + w["bo2"][0]).astype(dt)

    # GEGLU FF (exact-erf gelu, f32 pre-activation like the kernel)
    h3 = ln(x1, w["n3s"], w["n3b"])
    a = mm(h3, w["wa"]) + w["ba"][0]
    g = mm(h3, w["wg"]) + w["bg"][0]
    f = (a * (0.5 * g * (1.0 + jax.lax.erf(
        g * jnp.float32(0.7071067811865476))))).astype(dt)
    y = x1 + (mm(f, w["w2"]) + w["b2"][0]).astype(dt)
    return y.reshape(b, s, c)


def _fused_block_fwd_partitioned(x, ck, cv, w, heads, head_dim,
                                 interpret):
    """Fused forward, batch-partitioned over a multi-device mesh —
    wrapped INSIDE the custom_vjp so differentiation stays on the defvjp
    path (custom_partitioning ops have no VJP rule; same structure as
    flash_attention._flash_forward_partitioned)."""
    from rdm_tpu.ops.partitioning import call_batch_partitioned

    def fn(xb, ckb, cvb, wb):
        return fused_transformer_block(xb, ckb, cvb, wb, heads=heads,
                                       head_dim=head_dim,
                                       interpret=interpret)

    return call_batch_partitioned(fn, (x, ck, cv, w), (0, 0, 0, None))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_block_ad(x, ck, cv, w, heads, head_dim, interpret):
    return _fused_block_fwd_partitioned(x, ck, cv, w, heads, head_dim,
                                        interpret)


def _fused_block_ad_fwd(x, ck, cv, w, heads, head_dim, interpret):
    return (_fused_block_fwd_partitioned(x, ck, cv, w, heads, head_dim,
                                         interpret), (x, ck, cv, w))


def _fused_block_ad_bwd(heads, head_dim, interpret, res, g):
    x, ck, cv, w = res
    _, vjp = jax.vjp(
        functools.partial(_xla_block_reference, heads=heads,
                          head_dim=head_dim), x, ck, cv, w)
    return vjp(g)


_fused_block_ad.defvjp(_fused_block_ad_fwd, _fused_block_ad_bwd)


def fused_transformer_block_ad(
    x: jnp.ndarray,
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    w: Dict[str, jnp.ndarray],
    *,
    heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused block: Pallas kernels forward, flattened-2D
    XLA reference backward (training path; no int8, no dropout)."""
    return _fused_block_ad(x, ck, cv, w, heads, head_dim, interpret)


def _split_post_ff(x, attn, ck, cv, w, *, heads: int, head_dim: int,
                   interpret: bool, qscales=None) -> jnp.ndarray:
    """Split kernel-3 path (default; see the kernel-3-split comment block
    for the measured matrix and the RDM_TPU_SPLIT_K3=0 revert).
    qscales engages the int8 kernel variants (module int8-helpers ADR)."""
    b, s, c = x.shape
    cp = _round_up(c, 128)
    ff = w["wa"].shape[1]
    scale = float(head_dim) ** -0.5
    dt = x.dtype
    _, segt = head_segment_matrices(heads, head_dim, dtype=dt)
    wk, wv, g = make_cross_mats(ck, cv, heads, head_dim, scale)
    p = wk.shape[2]

    def act_scale(name):
        return (qscales[name].astype(jnp.float32) / 127.0).reshape(1, 1)

    # -- 3a: out-proj + cross-attn, grid (B, S_tiles) --------------------
    m_c = min(_env_pow2("RDM_TPU_K3A_ROWS", 512), s)
    while s % m_c:
        m_c //= 2
    xspec = pl.BlockSpec((1, m_c, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, m_c, cp), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    wkspec = pl.BlockSpec((1, c, p), lambda bi, ti: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    wvspec = pl.BlockSpec((1, p, c), lambda bi, ti: (bi, 0, 0),
                          memory_space=pltpu.VMEM)

    def const2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    r = b * s
    if qscales is not None:
        wo_q, wso = quantize_cols(w["wo"])
        wq2_q, wsq2 = quantize_cols(w["wq2"])
        wo2_q, wso2 = quantize_cols(w["wo2"])
        kern3a = functools.partial(_post_cross_kernel_q,
                                   n_real=heads * ck.shape[1])
        in3a = [xspec, aspec, wkspec, wvspec, const2(g.shape),
                const2(segt.shape),
                const2(wo_q.shape), const2(wso.shape), const2((1, 1)),
                const2(w["bo"].shape), const2(w["n2s"].shape),
                const2(w["n2b"].shape),
                const2(wq2_q.shape), const2(wsq2.shape), const2((1, 1)),
                const2(wo2_q.shape), const2(wso2.shape), const2((1, 1)),
                const2(w["bo2"].shape)]
        args3a = (x, attn, wk, wv, g, segt,
                  wo_q, wso, act_scale("o_attn1"),
                  w["bo"], w["n2s"], w["n2b"],
                  wq2_q, wsq2, act_scale("a_attn2"),
                  wo2_q, wso2, act_scale("o_attn2"), w["bo2"])
    else:
        kern3a = functools.partial(_post_cross_kernel,
                                   n_real=heads * ck.shape[1])
        in3a = [xspec, aspec, wkspec, wvspec, const2(g.shape),
                const2(segt.shape), const2(w["wo"].shape),
                const2(w["bo"].shape), const2(w["n2s"].shape),
                const2(w["n2b"].shape), const2(w["wq2"].shape),
                const2(w["wo2"].shape), const2(w["bo2"].shape)]
        args3a = (x, attn, wk, wv, g, segt, w["wo"], w["bo"], w["n2s"],
                  w["n2b"], w["wq2"], w["wo2"], w["bo2"])
    xmid = pl.pallas_call(
        kern3a,
        grid=(b, s // m_c),
        in_specs=in3a,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * c * (cp + 2 * c + 2 * p),
            bytes_accessed=(w["wo"].size + w["wq2"].size + w["wo2"].size
                            + b * 2 * c * p) * 2 + r * (c + cp) * 2 * 2,
            transcendentals=r * p),
        interpret=interpret,
    )(*args3a)

    # -- 3b: LN3 + GEGLU FF over flattened rows, grid (R_tiles, J) -------
    # RDM_TPU_FF_ROWS: row-tile size knob (default 512) for on-TPU sweeps
    # — larger tiles amortize per-cell overhead at the cost of VMEM.
    # Sanitized to a positive power of two so a bad env value can't zero
    # the tile (ZeroDivisionError) or collapse it to 1-row cells.
    xm2 = xmid.reshape(r, c)
    m = min(_env_pow2("RDM_TPU_FF_ROWS", 512), r)
    while r % m:
        m //= 2
    n_col = _ff_col_blocks(c, ff)
    fcol = ff // n_col
    rowspec = pl.BlockSpec((m, c), lambda ti, ji: (ti, 0),
                           memory_space=pltpu.VMEM)

    def constf(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda ti, ji: (0,) * nd,
                            memory_space=pltpu.VMEM)

    col_in = pl.BlockSpec((c, fcol), lambda ti, ji: (0, ji),
                          memory_space=pltpu.VMEM)
    col_bias = pl.BlockSpec((1, fcol), lambda ti, ji: (0, ji),
                            memory_space=pltpu.VMEM)
    col_out = pl.BlockSpec((fcol, c), lambda ti, ji: (ji, 0),
                           memory_space=pltpu.VMEM)
    if qscales is not None:
        wa_q, wsa = quantize_cols(w["wa"])
        wg_q, wsg = quantize_cols(w["wg"])
        w2_q, ws2 = quantize_cols(w["w2"])
        y2 = pl.pallas_call(
            functools.partial(_geglu_ff_kernel_q, n_col_blocks=n_col),
            grid=(r // m, n_col),
            in_specs=[rowspec, constf(w["n3s"].shape),
                      constf(w["n3b"].shape),
                      col_in, col_bias, col_in, col_bias,
                      col_bias, col_bias, col_out, constf(ws2.shape),
                      constf((1, 1)), constf((1, 1)),
                      constf(w["b2"].shape)],
            out_specs=rowspec,
            out_shape=jax.ShapeDtypeStruct((r, c), dt),
            scratch_shapes=[pltpu.VMEM((m, c), jnp.int8),
                            pltpu.VMEM((m, c), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * r * c * 3 * ff,
                bytes_accessed=(2 * c * ff + ff * c) + r * c * 2 * 2,
                transcendentals=r * ff),
            interpret=interpret,
        )(xm2, w["n3s"], w["n3b"], wa_q, wsa, wg_q, wsg, w["ba"],
          w["bg"], w2_q, ws2, act_scale("a_ff"), act_scale("h_ff"),
          w["b2"])
        return y2.reshape(b, s, c)
    y2 = pl.pallas_call(
        functools.partial(_geglu_ff_kernel, n_col_blocks=n_col),
        grid=(r // m, n_col),
        in_specs=[rowspec, constf(w["n3s"].shape), constf(w["n3b"].shape),
                  col_in, col_in, col_bias, col_bias, col_out,
                  constf(w["b2"].shape)],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((r, c), dt),
        scratch_shapes=[pltpu.VMEM((m, c), dt),
                        pltpu.VMEM((m, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * c * 3 * ff,
            bytes_accessed=(2 * c * ff + ff * c) * 2 + r * c * 2 * 2,
            transcendentals=r * ff),
        interpret=interpret,
    )(xm2, w["n3s"], w["n3b"], w["wa"], w["wg"], w["ba"], w["bg"],
      w["w2"], w["b2"])
    return y2.reshape(b, s, c)
