"""Neural building blocks shared by the RDM U-Net and the RARM transformer.

flax.linen modules, NHWC image layout (TPU-native; conv kernels HWIO feed the
MXU directly), parameters kept in float32, activations in a configurable
compute dtype (bfloat16 in production). Normalizations and softmax always run
in float32.

Behavioral parity targets (semantics only, re-designed for NHWC/JAX):
- ResBlock / Upsample / Downsample: ldm.modules.diffusionmodules.openaimodel
  (imported by /root/reference/rdm/modules/diffusionmodules/openaimodel.py:4-10).
- CrossAttention / BasicTransformerBlock / SpatialTransformer:
  /root/reference/rdm/modules/attention.py:20-196.
- GEGLU FeedForward: ldm.modules.attention.FeedForward (glu=True), used at
  /root/reference/rdm/modules/attention.py:81.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdm_tpu.ops.attention import dot_product_attention

Dtype = Any

zeros_init = nn.initializers.zeros

# Run transformer-block Dense projections on [b*s, c] instead of [b, s, c].
# Measured no-go on v5e (flagship U-Net fwd, CFG batch 32): the in-context
# 3D dot_generals lower through XLA's conv emitter at 10-45% MXU
# efficiency (~20 ms/iter of projection time), but flattening them to 2D
# makes the full forward WORSE (65.7 vs 60.7 ms/iter) — the reshapes force
# relayout copies at every Dense while the surrounding 1x1 convs keep the
# trunk in batch-in-sublanes conv layouts. Kept for A/B measurement.
DENSE_2D = False


def _dense_2d(dense: nn.Module, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a Dense over the last dim via a flattened 2D matmul."""
    if not DENSE_2D or x.ndim == 2:
        return dense(x)
    lead = x.shape[:-1]
    y = dense(x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, y.shape[-1])


# Evaluate up-path ResBlocks on (h, skip) part pairs instead of one
# concatenated tensor: GN stats, SiLU, conv1 and the 1x1 residual conv all
# distribute exactly over the channel concat (conv(cat(a,b),W) =
# conv(a,W_a)+conv(b,W_b); no GN group straddles the boundary for the
# released configs), so the concat buffer never materializes and each part
# conv has the same shape as the down-path convs. Motivation: the trace
# shows up-path conv1-over-concat at 44% MXU efficiency vs 68% for the
# identical-FLOPs down-path convs. Measured no-go on v5e (flagship fwd,
# CFG batch 32): 61.5 ms/iter vs 60.7 with the plain concat — XLA's
# concat-fused conv beats the explicit split (the split pays a second
# output buffer + add and loses the concat-gather fusion). Default off;
# kept because it is exact (parity-tested) and may win on other shapes.
SPLIT_SKIP_CONCAT = False


class _RawGroupNorm(nn.Module):
    """bf16-native GroupNorm: statistics accumulate in float32 (converts
    fused into the reduction — nothing f32 is materialized), normalization
    arithmetic runs in the input dtype.

    Motivation (v5e device trace of the flagship U-Net forward): the
    cast-to-f32 GroupNorm path was 33% of device time (convert_reduce
    fusions) while the convolutions were ~15% — norm memory traffic, not
    MXU work, dominated. Single-pass E[x²]−E[x]² stats halve the reads.

    Named "GroupNorm_0" by the wrapper so converted checkpoints keep the
    flax param path norm*/GroupNorm_0/{scale,bias}.
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x may be a tuple of tensors treated as a virtual channel concat
        # (see SPLIT_SKIP_CONCAT): stats/params span the concatenated
        # channel axis but the big tensors are never concatenated.
        parts = x if isinstance(x, tuple) else (x,)
        c = sum(p.shape[-1] for p in parts)
        g = self.num_groups
        cpg = c // g
        b = parts[0].shape[0]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # lane-preserving: reduce spatial axes per channel (C stays the
        # 128-lane dim), then aggregate the tiny [B, C] sums into groups —
        # never reshape the big tensor into (g, C/g)
        spatial_axes = tuple(range(1, parts[0].ndim - 1))
        n_elems = cpg * int(np.prod(
            [parts[0].shape[a] for a in spatial_axes]))
        # note: an optimization_barrier here helps isolated GN (575 vs 411
        # GB/s) but hurts the full U-Net (61.7 vs 60.3 ms) by blocking
        # GN-apply fusion into the convs — measured, do not add
        s = jnp.concatenate(
            [jnp.sum(p.astype(jnp.float32), axis=spatial_axes)
             for p in parts], axis=-1)  # [B, C] f32
        s2 = jnp.concatenate(
            [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=spatial_axes)
             for p in parts], axis=-1)
        sg = s.reshape(b, g, cpg).sum(-1) / n_elems  # [B, g] group mean
        s2g = s2.reshape(b, g, cpg).sum(-1) / n_elems
        var = jnp.maximum(s2g - jnp.square(sg), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # expand group stats back to per-channel vectors [B, C]
        mean_c = jnp.repeat(sg, cpg, axis=1)
        inv_c = jnp.repeat(inv, cpg, axis=1)
        eff_scale = inv_c * scale[None]  # [B, C]
        eff_bias = bias[None] - mean_c * inv_c * scale[None]
        outs = []
        off = 0
        for p in parts:
            cp = p.shape[-1]
            bshape = (b,) + (1,) * (p.ndim - 2) + (cp,)
            es = eff_scale[:, off:off + cp].reshape(bshape)
            eb = eff_bias[:, off:off + cp].reshape(bshape)
            outs.append(p * es.astype(p.dtype) + eb.astype(p.dtype))
            off += cp
        return outs[0] if not isinstance(x, tuple) else tuple(outs)


class GroupNorm32(nn.Module):
    """GroupNorm with f32 statistics and dtype-native arithmetic.

    Uses gcd(num_groups, channels) groups so tiny test configs are valid;
    production channel counts are multiples of 32, giving exactly 32 groups.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = (sum(p.shape[-1] for p in x) if isinstance(x, tuple)
             else x.shape[-1])
        groups = math.gcd(self.num_groups, c)
        return _RawGroupNorm(num_groups=groups, epsilon=self.epsilon,
                             name="GroupNorm_0")(x)


class _RawLayerNorm(nn.Module):
    """bf16-native LayerNorm: f32 statistics via reduction-fused converts,
    single fused x*eff_scale+eff_bias pass in the input dtype (same
    trace-driven rationale as _RawGroupNorm)."""

    epsilon: float = 1e-5
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (c,),
                           jnp.float32) if self.use_bias else None)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # per-row stats stay tiny [..., 1]; arithmetic in input dtype
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        y = y * scale.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class LayerNormF32(nn.Module):
    """LayerNorm with f32 statistics and dtype-native arithmetic."""

    epsilon: float = 1e-5
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return _RawLayerNorm(epsilon=self.epsilon, use_bias=self.use_bias,
                             name="LayerNorm_0")(x)


# Lower SpatialTransformer proj_in/proj_out 1x1 convs as token matmuls
# (parameter tree identical to nn.Conv) so no convolution sits inside the
# transformer trunk and XLA's layout assignment can keep the whole block
# region in dot-friendly token-major layouts. Measured no-go on v5e
# (flagship fwd, CFG batch 32): 62.5 ms/iter vs 60.7 baseline; combined
# with DENSE_2D: 65.1 ms. XLA's in-context conv-emitter lowering of the
# trunk dots — ~20 ms/iter at 10-45% per-op MXU efficiency in the trace —
# still beats every explicit relayout alternative tried; the apparent
# inefficiency is the price of the conv<->dot layout boundary, which the
# alternatives pay more for. Kept for A/B measurement.
PROJ_AS_DOT = False


class PointwiseConv(nn.Module):
    """1x1 conv expressed as a matmul over flattened tokens.

    Parameter names/shapes match nn.Conv(kernel_size=(1,1)) exactly
    (kernel [1,1,C,F], bias [F]) so converted checkpoints load unchanged.
    """

    features: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = (zeros_init if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, (1, 1, c, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        lead = x.shape[:-1]
        y = jnp.dot(x.reshape(-1, c),
                    kernel.reshape(c, self.features).astype(x.dtype))
        y = y + bias.astype(y.dtype)
        return y.reshape(*lead, self.features)


def quantize_to_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric round-to-nearest int8 with a given (broadcastable) f32
    scale. Saturates at ±127."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class QuantizableConv(nn.Module):
    """NHWC conv, parameter-compatible with nn.Conv (`kernel` [kh,kw,I,O]
    f32 + `bias` [O]), with an int8 serving fast path.

    Normal mode reproduces nn.Conv(dtype=...) exactly. When the param
    tree carries an int8 `kernel` (produced by
    rdm_tpu.ops.quant.quantize_conv_tree) the conv runs int8 x int8 →
    int32 on the MXU (2x the bf16 rate on v5e): the input is quantized
    with the STATIC calibrated per-tensor `act_scale` (dynamic max-abs
    requant was measured to eat most of the int8 win — probe r4: bare
    int8 conv 1.6-2.3x bf16, dynamic-requant 1.0-1.36x), the output is
    dequantized by `act_scale * kernel_scale[O]` (per-output-channel) and
    the f32 bias is added.

    Calibration: apply(..., mutable=["intermediates"]) with
    rdm_tpu.ops.quant.CALIBRATE set sows the input max-abs under
    intermediates/<path>/act_absmax.
    """

    features: int
    kernel: int
    stride: int = 1
    padding: Any = "SAME"
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = (zeros_init if self.zero_init
                else nn.initializers.lecun_normal())
        kern = self.param("kernel", init,
                          (self.kernel, self.kernel, x.shape[-1],
                           self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if kern.dtype == jnp.int8:
            # quantized serving tree: extra leaves exist alongside the
            # int8 kernel; the init fns below never run (apply-only path)
            w_s = self.param("kernel_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
            a_s = self.param("act_scale", nn.initializers.ones,
                             (), jnp.float32)
            xq = quantize_to_int8(x, a_s)
            y = jax.lax.conv_general_dilated(
                xq, kern, window_strides=(self.stride, self.stride),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (a_s * w_s) + bias
            return y.astype(self.dtype)
        from rdm_tpu.ops import quant as _quant
        if _quant.CALIBRATE:
            self.sow("intermediates", "act_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.float32(0))
        x, kern, bias = nn.dtypes.promote_dtype(x, kern, bias,
                                                dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(self.stride, self.stride),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


def conv(features: int, kernel: int, dtype: Dtype, *, stride: int = 1,
         zero_init: bool = False,
         name: Optional[str] = None) -> QuantizableConv:
    """3x3/1x1 NHWC conv with SAME padding (int8-serving capable)."""
    return QuantizableConv(
        features=features,
        kernel=kernel,
        stride=stride,
        zero_init=zero_init,
        dtype=dtype,
        name=name,
    )


class _SplitConv(nn.Module):
    """Conv over a virtual channel-concat of input parts.

    Parameter names/shapes match nn.Conv over the concatenated input
    (kernel [k,k,C_total,F], bias [F]) so checkpoints load unchanged;
    computes conv(cat(parts), W) as sum_p conv(part_p, W_p) with f32
    partial accumulation — the concat tensor never exists.
    """

    features: int
    kernel: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        c_total = sum(p.shape[-1] for p in parts)
        init = (zeros_init if self.zero_init
                else nn.initializers.lecun_normal())
        kern = self.param("kernel", init,
                          (self.kernel, self.kernel, c_total,
                           self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        acc = None
        off = 0
        for p in parts:
            cp = p.shape[-1]
            w = kern[:, :, off:off + cp, :].astype(p.dtype)
            y = jax.lax.conv_general_dilated(
                p, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
            off += cp
        return (acc + bias[None, None, None, :]).astype(self.dtype)


class ResBlock(nn.Module):
    """Timestep-conditioned residual block.

    norm → silu → conv3x3 → (+ time emb) → norm → silu → dropout → zero-conv3x3,
    with a 1x1-projected residual when channel count changes. Optional
    FiLM-style scale-shift conditioning and fused up/down resampling.
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, *, skip=None, deterministic: bool = True):
        # `skip` is an optional second input treated as channel-concatenated
        # after x (the U-Net up path). With SPLIT_SKIP_CONCAT every op of
        # the prologue distributes over the virtual concat (see _SplitConv)
        # so the concat tensor never materializes.
        if skip is not None:
            c_total = x.shape[-1] + skip.shape[-1]
            groups = math.gcd(32, c_total)
            cpg = c_total // groups
            split_ok = (SPLIT_SKIP_CONCAT and not self.up and not self.down
                        and x.shape[-1] % cpg == 0
                        and c_total != self.out_channels)
            if not split_ok:
                x = jnp.concatenate([x, skip], axis=-1)
                skip = None
        if skip is not None:
            hx, hs = GroupNorm32(name="norm1")((x, skip))
            h_parts = (nn.silu(hx), nn.silu(hs))
            h = _SplitConv(self.out_channels, 3, dtype=self.dtype,
                           name="conv1")(h_parts)
            x = _SplitConv(self.out_channels, 1, dtype=self.dtype,
                           name="skip")((x, skip))
            in_ch = self.out_channels  # residual already projected
        else:
            in_ch = x.shape[-1]
            h = nn.silu(GroupNorm32(name="norm1")(x))
            if self.up:
                h = _resize_nearest(h, 2)
                x = _resize_nearest(x, 2)
            elif self.down:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            h = conv(self.out_channels, 3, self.dtype, name="conv1")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="emb_proj",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm32(name="norm2")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :].astype(h.dtype)
            h = nn.silu(GroupNorm32(name="norm2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv(self.out_channels, 3, self.dtype, zero_init=True, name="conv2")(h)

        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, self.dtype, name="skip")(x)
        return x + h


def _resize_nearest(x, factor: int):
    """Integer-factor nearest upsample as broadcast+reshape — lowers to a
    cheap broadcast instead of jax.image.resize's gather/pad chain (which
    traced at ~56 GB/s on v5e)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class Upsample(nn.Module):
    """Nearest 2x upsample + conv3x3."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        x = _resize_nearest(x, 2)
        if self.use_conv:
            x = conv(out_ch, 3, self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Strided conv3x3 downsample (or avg-pool when use_conv=False).

    Explicit symmetric padding + VALID matches torch's pad=1 stride-2 window
    alignment (XLA SAME pads asymmetrically at stride 2), so converted ADM
    U-Net weights reproduce the reference activations exactly.
    """

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        if self.use_conv:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return nn.Conv(
                features=out_ch, kernel_size=(3, 3), strides=(2, 2),
                padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    Linear projections without bias for q/k/v, biased output projection —
    the layout expected by released RDM/RARM checkpoints.
    """

    heads: int
    head_dim: int
    context_dim: Optional[int] = None  # informational; inferred from input
    causal: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def _sow_absmax(self, name, t):
        # int8 calibration (ops/quant.py): record the max-abs of the
        # tensors the fused int8 block kernels quantize — the projection
        # input (post-LN) and the attention output. No-op outside
        # quant.calibrate()/mutable intermediates.
        from rdm_tpu.ops import quant as _quant
        if _quant.CALIBRATE:
            self.sow("intermediates", name,
                     jnp.max(jnp.abs(t.astype(jnp.float32))),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.float32(0))

    @nn.compact
    def __call__(self, x, context=None, *, mask=None, deterministic: bool = True):
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        self._sow_absmax("act_absmax", x)
        q = _dense_2d(dense("to_q"), x)
        k = _dense_2d(dense("to_k"), ctx)
        v = _dense_2d(dense("to_v"), ctx)
        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.head_dim)
        k = k.reshape(b, sk, self.heads, self.head_dim)
        v = v.reshape(b, sk, self.heads, self.head_dim)
        out = dot_product_attention(
            q, k, v, causal=self.causal and context is None, mask=mask
        )
        out = out.reshape(b, sq, inner)
        self._sow_absmax("out_absmax", out)
        out = _dense_2d(nn.Dense(
            x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
            name="to_out"), out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class GEGLUFeedForward(nn.Module):
    """x → Dense(2*inner) → a * gelu(b) → dropout → Dense(dim)."""

    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def _sow_absmax(self, name, t):
        # int8 calibration record (see CrossAttention._sow_absmax)
        from rdm_tpu.ops import quant as _quant
        if _quant.CALIBRATE:
            self.sow("intermediates", name,
                     jnp.max(jnp.abs(t.astype(jnp.float32))),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.float32(0))

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        inner = dim * self.mult
        self._sow_absmax("act_absmax", x)
        h = _dense_2d(nn.Dense(
            inner * 2, dtype=self.dtype, param_dtype=jnp.float32,
            name="proj_in"), x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gate, approximate=False)  # exact erf, torch parity
        self._sow_absmax("hidden_absmax", h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return _dense_2d(nn.Dense(
            dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
        ), h)


class TransformerBlock(nn.Module):
    """Pre-LN: self-attn → cross-attn → GEGLU FF, each residual.

    When has_cross=False the middle attention collapses to self-attention on
    x (reference behavior when context_dim is None).
    """

    heads: int
    head_dim: int
    has_cross: bool = True
    causal: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        x = x + CrossAttention(
            heads=self.heads, head_dim=self.head_dim, causal=self.causal,
            dropout=self.dropout, dtype=self.dtype, name="attn1",
        )(LayerNormF32(name="norm1")(x), deterministic=deterministic)
        x = x + CrossAttention(
            heads=self.heads, head_dim=self.head_dim,
            causal=self.causal and not self.has_cross,
            dropout=self.dropout, dtype=self.dtype, name="attn2",
        )(
            LayerNormF32(name="norm2")(x),
            context=context if self.has_cross else None,
            deterministic=deterministic,
        )
        x = x + GEGLUFeedForward(
            dropout=self.dropout, dtype=self.dtype, name="ff"
        )(LayerNormF32(name="norm3")(x), deterministic=deterministic)
        return x


# Fused Pallas SpatialTransformer blocks (ops/block_kernel.py): LN1+QKV,
# packed-lane flash attention, and out-proj+cross-attn+GEGLU run as three
# Pallas kernels instead of conv-emitter Denses (round-2 profile: ~20 ms
# of the 60.6 ms flagship forward at 10-45% per-op MXU efficiency).
# RDM_TPU_FUSED_BLOCK=0 reverts.
def use_fused_spatial_block() -> bool:
    if os.environ.get("RDM_TPU_FUSED_BLOCK", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


# Training forward through the same fused kernels via jax.custom_vjp
# (Pallas fwd, flattened-2D XLA reference bwd —
# block_kernel.fused_transformer_block_ad). Requires dropout == 0 (true
# for every released RDM config).
#
# MEASURED NO-GO as a default on v5e (round 5, flagship b32 no-remat
# bf16-mu pipelined): 83.9 samples/s at 31.7% MFU vs 120.5 at 37.5% for
# the standard path. Two compounding costs: (a) the recompute-style
# backward re-runs the whole block forward (executed FLOPs/sample
# 7.43e11 vs 6.13e11, +21%), which the serving-side fused-fwd saving
# (~33% of a CFG forward) cannot amortize across a fwd+bwd step; (b)
# per-FLOP efficiency DROPS (MFU 37.5 -> 31.7%) — the custom_vjp
# boundary blocks XLA from fusing the block into the surrounding convs,
# and the flattened-2D bwd dots do not beat the conv-emitter bwd enough
# to pay for it. Kept behind RDM_TPU_FUSED_BLOCK_TRAIN=1 for A/B and for
# shapes where the serving kernels dominate harder; grad-parity-tested
# either way (tests/test_block_kernel.py).
def use_fused_spatial_block_train() -> bool:
    if os.environ.get("RDM_TPU_FUSED_BLOCK_TRAIN", "0") != "1":
        return False
    return use_fused_spatial_block()


class _KernParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel [in, out], optional bias)
    without running the Dense — same names, same init, so the param tree
    is identical to the unfused module's and checkpoints load on both
    paths."""

    in_dim: int
    out_dim: int
    use_bias: bool = False
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (zeros_init if self.zero_init
                else nn.initializers.lecun_normal())
        kern = self.param("kernel", init, (self.in_dim, self.out_dim),
                          jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.out_dim,),
                           jnp.float32) if self.use_bias else None)
        return kern, bias


class _LNParams(nn.Module):
    """LayerNormF32-shaped params (scale/bias under LayerNorm_0)."""

    dim: int

    @nn.compact
    def __call__(self):
        return _LNLeaf(self.dim, name="LayerNorm_0")()


class _LNLeaf(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class FusedTransformerBlock(nn.Module):
    """TransformerBlock with the compute routed through the fused Pallas
    kernels (rdm_tpu.ops.block_kernel). Param tree identical to
    TransformerBlock. Inference runs the kernels directly; training
    (deterministic=False, dropout must be 0) runs them under
    jax.custom_vjp with a flattened-2D XLA-reference backward."""

    heads: int
    head_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x, context, *, deterministic: bool = True):
        from rdm_tpu.ops.block_kernel import (fused_transformer_block,
                                              pack_head_lanes)

        assert deterministic or self.dropout == 0.0, \
            "fused training path requires dropout == 0"
        b, s, c = x.shape
        inner = self.heads * self.head_dim
        assert inner == c, (inner, c)
        ctx_dim = context.shape[-1]
        cp = (c + 127) // 128 * 128
        dt = self.dtype

        class _Attn(nn.Module):
            ctx: int

            @nn.compact
            def __call__(self):
                wq, _ = _KernParams(c, inner, name="to_q")()
                wk, _ = _KernParams(self.ctx, inner, name="to_k")()
                wv, _ = _KernParams(self.ctx, inner, name="to_v")()
                wo, bo = _KernParams(inner, c, use_bias=True,
                                     name="to_out")()
                # int8 serving: the calibrated act absmax ride in the
                # "quant" collection at this module's path (sown by the
                # unfused CrossAttention during quant.calibrate())
                qa = self.get_variable("quant", "act_absmax", None)
                qo = self.get_variable("quant", "out_absmax", None)
                return wq, wk, wv, wo, bo, qa, qo

        class _FF(nn.Module):
            @nn.compact
            def __call__(self):
                ffd = c * 4
                w1, b1 = _KernParams(c, 2 * ffd, use_bias=True,
                                     name="proj_in")()
                w2, b2 = _KernParams(ffd, c, use_bias=True,
                                     name="proj_out")()
                qa = self.get_variable("quant", "act_absmax", None)
                qh = self.get_variable("quant", "hidden_absmax", None)
                return w1, b1, w2, b2, qa, qh

        n1s, n1b = _LNParams(c, name="norm1")()
        wq, wk, wv, wo, bo, q_a1, q_o1 = _Attn(c, name="attn1")()
        n2s, n2b = _LNParams(c, name="norm2")()
        wq2, wk2, wv2, wo2, bo2, q_a2, q_o2 = _Attn(ctx_dim,
                                                    name="attn2")()
        n3s, n3b = _LNParams(c, name="norm3")()
        w1, b1, w2, b2, q_a3, q_h3 = _FF(name="ff")()
        qvals = (q_a1, q_o1, q_a2, q_o2, q_a3, q_h3)
        qscales = None
        if all(v is not None for v in qvals):
            qscales = dict(zip(("a_qkv", "o_attn1", "a_attn2", "o_attn2",
                                "a_ff", "h_ff"), qvals))

        row = lambda p: p.reshape(1, -1).astype(jnp.float32)
        ffd = c * 4
        weights = dict(
            n1s=row(n1s), n1b=row(n1b),
            wqkv=jnp.concatenate(
                [pack_head_lanes(wq.astype(dt), self.heads, self.head_dim,
                                 cp),
                 pack_head_lanes(wk.astype(dt), self.heads, self.head_dim,
                                 cp),
                 pack_head_lanes(wv.astype(dt), self.heads, self.head_dim,
                                 cp)], axis=1),
            # pad-head lanes of the packed attention output hit zero rows
            wo=jnp.pad(wo.astype(dt), ((0, cp - c), (0, 0))),
            bo=row(bo),
            n2s=row(n2s), n2b=row(n2b),
            wq2=wq2.astype(dt), wo2=wo2.astype(dt), bo2=row(bo2),
            n3s=row(n3s), n3b=row(n3b),
            wa=w1[:, :ffd].astype(dt), wg=w1[:, ffd:].astype(dt),
            ba=row(b1[:ffd]), bg=row(b1[ffd:]),
            w2=w2.astype(dt), b2=row(b2),
        )
        # context k/v projections are [B, S_ctx, C]-tiny — XLA keeps them
        ctx = context.astype(dt)
        ck = jnp.einsum("bsd,dc->bsc", ctx, wk2.astype(dt))
        cv = jnp.einsum("bsd,dc->bsc", ctx, wv2.astype(dt))

        heads, head_dim, interpret = self.heads, self.head_dim, \
            self.interpret

        if not deterministic:
            # training: custom_vjp fused forward (partitioning rides
            # INSIDE the custom_vjp — block_kernel ADR); int8 serving
            # scales never apply to training
            assert qscales is None, "int8 fused path is inference-only"
            from rdm_tpu.ops.block_kernel import fused_transformer_block_ad

            return fused_transformer_block_ad(
                x.astype(dt), ck, cv, weights, heads=heads,
                head_dim=head_dim, interpret=interpret)

        # batch-partitioned under a multi-device mesh: without the
        # custom_partitioning wrapper GSPMD all-gathers the DP-sharded
        # batch around the opaque pallas_calls (ops/partitioning.py).
        # plain positional closure: custom_partitioning rejects functions
        # whose signature leaves keyword(-only) arguments unresolved
        from rdm_tpu.ops.partitioning import call_batch_partitioned

        def fn(xb, ckb, cvb, wb):
            qs = wb.pop("__qscales__", None) if isinstance(wb, dict) \
                else None
            return fused_transformer_block(
                xb, ckb, cvb, wb, heads=heads, head_dim=head_dim,
                interpret=interpret, qscales=qs)

        if qscales is not None:
            # scalars ride inside the weights operand (replicated under
            # the batch-partitioning wrapper like every other weight)
            weights = dict(weights)
            # (1,1)-shaped: the batch-partitioning wrapper has no scalar
            # operand support, and the kernels consume [1,1] refs anyway
            weights["__qscales__"] = {
                k: jnp.asarray(v, jnp.float32).reshape(1, 1)
                for k, v in qscales.items()}
        return call_batch_partitioned(
            fn, (x.astype(dt), ck, cv, weights), (0, 0, 0, None))


class SpatialTransformer(nn.Module):
    """The U-Net cross-attention insert (hot inner module of RDM).

    GroupNorm → 1x1 conv to inner_dim → flatten to tokens → `depth`
    transformer blocks cross-attending to `context` → zero-init 1x1 conv →
    residual. On TPU at inference the blocks run as fused Pallas kernels
    (see FusedTransformerBlock); both paths declare identical param trees.
    """

    heads: int
    head_dim: int
    depth: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        x_in = x
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        if PROJ_AS_DOT:
            proj_in = PointwiseConv(inner, dtype=self.dtype, name="proj_in")
            proj_out = PointwiseConv(c, zero_init=True, dtype=self.dtype,
                                     name="proj_out")
        else:
            proj_in = conv(inner, 1, self.dtype, name="proj_in")
            proj_out = conv(c, 1, self.dtype, zero_init=True,
                            name="proj_out")
        x = proj_in(x)
        x = x.reshape(b, h * w, inner)
        from rdm_tpu.ops import quant as _quant
        # calibration must run the UNFUSED blocks: the fused kernels
        # neither sow act absmax nor need to be calibrated against
        # themselves (ops/quant.py). Training (deterministic=False) takes
        # the fused path through the custom_vjp wrapper when dropout is 0
        # (every released RDM config) — RDM_TPU_FUSED_BLOCK_TRAIN=0
        # reverts.
        fused = (context is not None
                 and 128 % self.head_dim == 0
                 and not _quant.CALIBRATE
                 and (use_fused_spatial_block() if deterministic
                      else (self.dropout == 0.0
                            and use_fused_spatial_block_train())))
        for i in range(self.depth):
            if fused:
                x = FusedTransformerBlock(
                    heads=self.heads, head_dim=self.head_dim,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"block_{i}",
                )(x, context, deterministic=deterministic)
            else:
                x = TransformerBlock(
                    heads=self.heads, head_dim=self.head_dim,
                    has_cross=context is not None, dropout=self.dropout,
                    dtype=self.dtype, name=f"block_{i}",
                )(x, context, deterministic=deterministic)
        x = x.reshape(b, h, w, inner)
        x = proj_out(x)
        return x + x_in
