"""Multi-head attention ops.

Two interchangeable execution paths with identical semantics:

- ``xla``: plain einsum attention. XLA fuses scale+softmax+matmul well for the
  small sequence lengths in this framework (<=4096 latent tokens, <=77 text
  tokens, <=64 retrieval-context tokens — SURVEY.md §5.7).
- ``pallas``: a fused flash-attention TPU kernel (rdm_tpu.ops.flash_attention)
  for the U-Net's hot self-attention; used automatically on TPU when shapes
  are tile-aligned.

Shape convention: [batch, seq, heads, head_dim] throughout ("BSHD").
Softmax is always computed in float32.

Behavioral parity: CrossAttention in
/root/reference/rdm/modules/attention.py:20-74 (einsum QK^T * scale → softmax
→ V), including additive masking and causal masking semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # large negative instead of -inf: keeps softmax NaN-free


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over BSHD tensors.

    Args:
      q: [B, Sq, H, D]
      k, v: [B, Sk, H, D]
      scale: defaults to D**-0.5.
      causal: lower-triangular mask aligned to the *end* of the key sequence
        (query i attends to keys j <= i + (Sk - Sq)), matching the reference's
        F.pad-based causal mask for prefix decoding.
      mask: optional boolean [B, Sk] key-padding mask; True = attend.
      impl: "auto" | "xla" | "pallas".
    Returns:
      [B, Sq, H, D] in q.dtype.
    """
    if impl == "auto":
        impl = _pick_impl(q, k, causal, mask)
    if impl == "pallas":
        from rdm_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, causal=causal, mask=mask)
    return _xla_attention(q, k, v, scale=scale, causal=causal, mask=mask)


import os

_DISABLE_FLASH = os.environ.get("RDM_TPU_FLASH", "1") == "0"


def _pick_impl(q, k, causal, mask) -> str:
    """Measured end-to-end on v5e (bench.py, full DDIM-50 pipeline): the
    fused Pallas kernel in the U-Net's self-attention is the difference
    between 4.80 img/s @ 52% MFU and 0.80 img/s @ 8.6% MFU — XLA spills
    the fp32 score tensors at these shapes. (Isolated op microbenchmarks
    through the remote-dispatch tunnel under-time XLA and are NOT a valid
    basis for this choice — trust the pipeline number.) RDM_TPU_FLASH=0
    forces the XLA path everywhere."""
    if _DISABLE_FLASH or mask is not None:
        return "xla"
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        return "xla"
    sq, sk, d = q.shape[1], k.shape[1], q.shape[3]
    if (sq >= 256 and sk >= 256 and sq % 128 == 0 and sk % 128 == 0
            and d % 32 == 0 and d <= 128):
        return "pallas"
    return "xla"


def _xla_attention(q, k, v, *, scale, causal, mask):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    dtype_in = q.dtype
    # fp32 inputs get true fp32 matmuls; bf16 inputs ride the MXU fast path
    prec = jax.lax.Precision.HIGHEST if dtype_in == jnp.float32 else None
    # scores in float32 for softmax stability
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
        precision=prec,
    )
    scores = scores * jnp.float32(scale)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
    if causal:
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        kj = jnp.arange(sk)[None, :]
        scores = jnp.where((kj <= qi)[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype_in)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=prec)
    return out.astype(dtype_in)
