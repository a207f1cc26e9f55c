"""Fused flash-attention TPU kernel (Pallas).

Covers the RDM U-Net's hot self-attention (<=4096 latent tokens) — the
"hottest" inner loop identified in SURVEY.md §3-A against
/root/reference/rdm/modules/attention.py:52-72 (einsum QK^T → softmax → V).

Design (TPU-first, per the Pallas guide):
- Grid over (batch, heads, q-blocks); the full K/V for one (batch, head) pair
  rides in VMEM (<=4096 x 128 bf16 = 1 MB each), so the score matrix never
  touches HBM — the win over the unfused path, whose [B,H,S,S] fp32 scores
  (64 MB at S=4096) spill.
- QK^T and PV land on the MXU with fp32 accumulation
  (preferred_element_type); softmax runs on the VPU in fp32.
- K blocks are revisited across q-blocks with identical index maps, so the
  Pallas pipeline keeps them resident instead of re-fetching.
- Differentiable via jax.custom_vjp: forward is the fused kernel; backward
  re-runs the mathematically identical XLA attention under jax.vjp
  (recompute-style — trades FLOPs for never materializing fwd residuals).

Shape convention matches rdm_tpu.ops.attention: BSHD = [batch, seq, heads,
head_dim].
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                 sq: int, sk: int, block_q: int):
    """One q-block vs the full key sequence of one (batch, head).

    Refs are BHSD blocks of shape (1, 1, S, D): the last two dims are the
    (sublane, lane) tile dims, as the Mosaic lowering requires."""
    q = q_ref[0, 0, :, :]  # [BQ, D]
    k = k_ref[0, 0, :, :]  # [Sk, D]
    v = v_ref[0, 0, :, :]  # [Sk, D]

    # fold the attention scale and the exp->exp2 change of base into the
    # QK product: softmax(s*scale) == exp2((s*scale*log2e) - m2)/sum(...)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, Sk]
    scores = scores * (scale * 1.4426950408889634)  # log2(e)

    if causal:
        i = pl.program_id(2)
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
                 + i * block_q + (sk - sq))
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
        scores = jnp.where(k_pos <= q_pos, scores, _NEG_INF)

    # numerically stable softmax on the VPU: exp2 (native) instead of exp,
    # and the 1/denom applied AFTER the PV matmul ([BQ, D] instead of
    # [BQ, Sk] divisions — Sk/D x less VPU work)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, D]
    out = out * pl.reciprocal(denom, approx=False)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _flash_forward(q, k, v, scale: float, causal: bool,
                   interpret: bool = False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(512, sq)
    while sq % block_q:
        block_q //= 2
    grid = (b, h, sq // block_q)

    # BSHD -> BHSD so (seq, head_dim) are the tiled trailing dims; XLA
    # fuses these transposes into the surrounding projection matmuls
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    kernel = functools.partial(
        _attn_kernel, scale=scale, causal=causal, sq=sq, sk=sk,
        block_q=block_q,
    )
    flops = 4 * b * h * sq * sk * d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, causal: bool, sq: int, sk: int,
                     block_q: int):
    """Flash backward for one q-block vs full K/V of one (batch, head).

    P is recomputed in-kernel (standard flash bwd):
      dV += P^T dO;  dP = dO V^T;  dS = P * (dP - rowsum(dP * P));
      dQ = dS K * scale;  dK += dS^T Q * scale.
    dK/dV output blocks are revisited across q-blocks (constant index map)
    and accumulated; zero-initialized on the first q-step.
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0, :, :] = jnp.zeros_like(dk_ref[0, 0, :, :])
        dv_ref[0, 0, :, :] = jnp.zeros_like(dv_ref[0, 0, :, :])

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if causal:
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
                 + qi * block_q + (sk - sq))
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
        s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p * pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)

    # dV += P^T dO
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv_ref[0, 0, :, :] += dv.astype(dv_ref.dtype)
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    # dQ = dS K * scale
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    # dK += dS^T Q * scale
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk_ref[0, 0, :, :] += dk.astype(dk_ref.dtype)


def _flash_backward(q, k, v, g, scale: float, causal: bool,
                    interpret: bool = False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(512, sq)
    while sq % block_q:
        block_q //= 2
    grid = (b, h, sq // block_q)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    gt = jnp.transpose(g, (0, 2, 1, 3))
    kernel = functools.partial(
        _attn_bwd_kernel, scale=scale, causal=causal, sq=sq, sk=sk,
        block_q=block_q)
    qspec = pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=(qspec, kvspec, kvspec),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct(kt.shape, jnp.float32),
            jax.ShapeDtypeStruct(vt.shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq * sk * d,
            bytes_accessed=2 * (q.size + k.size + v.size)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt, gt)
    back = lambda t, dt: jnp.transpose(t, (0, 2, 1, 3)).astype(dt)
    return back(dq, q.dtype), back(dk, k.dtype), back(dv, v.dtype)


def _xla_reference(q, k, v, scale: float, causal: bool):
    """Unfused reference with identical semantics; used for the backward."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        kj = jnp.arange(sk)[None, :]
        scores = jnp.where((kj <= qi)[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_forward_partitioned(q, k, v, scale, causal,
                               interpret=False):
    """Forward kernel, batch-partitioned over a multi-device mesh.

    Wrapping INSIDE the custom_vjp (not around it) keeps differentiation
    on the defvjp path — custom_partitioning ops have no VJP rule — while
    the primal/fwd kernel runs on local batch shards instead of being
    all-gathered around the opaque pallas_call (ops/partitioning.py)."""
    from rdm_tpu.ops.partitioning import call_batch_partitioned

    def fn(q_, k_, v_):
        return _flash_forward(q_, k_, v_, scale, causal,
                              interpret=interpret)

    return call_batch_partitioned(fn, (q, k, v), (0, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, causal, interpret):
    return _flash_forward_partitioned(q, k, v, scale, causal, interpret)


def _flash_fwd(q, k, v, scale, causal, interpret):
    return (_flash_forward_partitioned(q, k, v, scale, causal, interpret),
            (q, k, v))


def _flash_bwd(scale, causal, interpret, res, g):
    # Two backends, RDM_TPU_FLASH_BWD selects (read at trace time):
    # - "pallas": the flash backward kernel (_flash_backward) — recomputes
    #   P in-VMEM, never materializes any [B,H,S,S] tensor in HBM. The
    #   round-5 HLO-mapped train trace showed the XLA-recompute backward's
    #   S=1024 attention dots lowering to convolution-base-dilated at
    #   3.6-6.0% MXU efficiency (~15 ms per res32 block, ~75 ms of the
    #   267 ms b32 step); the kernel runs the same math without the HBM
    #   round trips.
    # - "xla": jax.vjp of the reference attention (recompute-style).
    # TPU default is gated on head_dim — both directions are measured
    # (bench_train b32 pipelined, round 5):
    #   RDM  d=32 no-remat: pallas 149.1 samples/s (46.3% MFU) vs
    #                       xla 112.5 (35.0%)  -> pallas wins
    #   RARM d=64 remat:    pallas 259.1 (43.4%) vs xla 271.1 (45.4%)
    #                       -> xla wins (less lane padding to amortize;
    #                       causal chunk-skip favors XLA's dot lowering)
    # Round-2 also measured xla ahead at RDM b16 remat (82.1 vs 71.6) —
    # the winner moves with the op point; RDM_TPU_FLASH_BWD overrides.
    q, k, v = res
    if _use_pallas_bwd(q.shape[-1]):
        from rdm_tpu.ops.partitioning import call_batch_partitioned

        def fn(q_, k_, v_, g_):
            return _flash_backward(q_, k_, v_, g_, scale, causal,
                                   interpret=interpret)

        return call_batch_partitioned(fn, (q, k, v, g), (0, 0, 0, 0),
                                      out_batch_dims=(0, 0, 0))
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale,
                                                       causal), q, k, v)
    return vjp(g)


def _use_pallas_bwd(head_dim: int) -> bool:
    mode = os.environ.get("RDM_TPU_FLASH_BWD", "")
    if mode in ("pallas", "xla"):
        return mode == "pallas"
    # Measured crossover (see _flash_bwd): the kernel wins at d=32 (RDM),
    # the XLA recompute backward wins at d=64 (RARM).
    return jax.default_backend() == "tpu" and head_dim <= 32


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over BSHD tensors. Key-padding masks are not fused;
    callers with masks route to the XLA path (rdm_tpu.ops.attention).
    `interpret=True` runs the kernel in Pallas interpret mode (CPU tests;
    composes with the batch partitioner, unlike
    pltpu.force_tpu_interpret_mode whose IO-callback lowering cannot run
    inside a custom_partitioning module)."""
    if mask is not None:
        raise NotImplementedError("flash kernel does not take padding masks")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale), bool(causal), bool(interpret))
