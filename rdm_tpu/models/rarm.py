"""RARM — retrieval-augmented autoregressive transformer over VQGAN tokens.

TPU-first re-design of LatentImageRETRO + RetrievalPatchTransformer
(/root/reference/rdm/models/autoregression/transformer.py:122-270,
/root/reference/rdm/modules/attention.py:199-272):

- decoder trunk: token embedding (vocab 16386 = 16384 codes + mask + SOS),
  learned positional encodings, `depth` pre-LN blocks of causal self-attn →
  cross-attn to the retrieved CLIP neighbors → GEGLU FF, then a linear head
  to 16384 code logits (reference config models/rarm/imagenet/dogs/
  config.yaml:14-27: depth 18, 12 heads, d_head 64, ctx 512).
- **KV-cached decoding**: the reference re-forwards the full prefix for
  every generated token with no cache (transformer.py:241-268 — its biggest
  inference inefficiency, SURVEY.md §5.7). Here decoding is one `lax.scan`
  with a static-shape KV cache; cross-attention K/V are computed once per
  sample call. CFG (zeroed neighbors) doubles the batch through the same
  cache (semantically the guided logits of transformer.py:246-253, without
  the reference's prefix-duplication bug).
- mask-token augmentation: elements of the (continuous) neighbor context are
  replaced by the scalar mask_token value with prob p ~ U(0, p_mask_max)
  (transformer.py:191-205 — faithful, odd as it is).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdm_tpu.models.layers import GEGLUFeedForward, LayerNormF32
from rdm_tpu.ops.attention import dot_product_attention

Dtype = Any

# decode-loop experiment flag (env RARM_FUSED_QKV=1): issue q/k/v as one
# fused [inner, 3*inner] dot per self-attention in decode_step.
# Measured no-go on v5e — see _Attention.project_qkv_fused.
import os as _os

FUSED_QKV = _os.environ.get("RARM_FUSED_QKV", "0") == "1"


@dataclasses.dataclass(frozen=True)
class RARMConfig:
    vocab_size: int = 16386  # input vocab incl. mask + sos
    out_vocab: int = 16384
    heads: int = 12
    head_dim: int = 64
    depth: int = 18
    context_dim: int = 512
    seq_len: int = 256  # image token count (16x16 VQ-f16 grid)
    sos_token: int = 16385
    mask_token: int = 16384
    code_side: int = 16
    p_mask_max: float = 0.0

    @property
    def inner_dim(self) -> int:
        return self.heads * self.head_dim

    @classmethod
    def imagenet_dogs(cls) -> "RARMConfig":
        return cls()


class _Attention(nn.Module):
    """to_q/to_k/to_v (no bias) + biased to_out; exposes split projections
    so the decode path can maintain a KV cache."""

    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        dense = lambda name: nn.Dense(inner, use_bias=False,
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        self.to_q = dense("to_q")
        self.to_k = dense("to_k")
        self.to_v = dense("to_v")
        self.to_out = nn.Dense(inner, dtype=self.dtype,
                               param_dtype=jnp.float32, name="to_out")

    def _split(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x, context=None, *, causal=False):
        ctx = x if context is None else context
        q = self._split(self.to_q(x))
        k = self._split(self.to_k(ctx))
        v = self._split(self.to_v(ctx))
        out = dot_product_attention(q, k, v, causal=causal)
        b, s = out.shape[:2]
        return self.to_out(out.reshape(b, s, -1))

    def project_kv(self, ctx):
        return self._split(self.to_k(ctx)), self._split(self.to_v(ctx))

    def project_qkv_fused(self, x):
        """q/k/v in ONE [inner, 3*inner] matmul over the shared input.

        MEASURED NO-GO on v5e (decode matrix, 2026-08): 35.9 vs 46.4
        img/s at B=16 (59.6 vs 75.2 at B=64) — XLA does NOT hoist the
        loop-invariant weight concat out of the decode scan, so every
        step re-streams 3x[768,768] per layer just to concatenate it.
        Kept behind RARM_FUSED_QKV=1 for hardware where LICM applies.
        Returns (q, k, v) split [B, S, H, D]."""
        w = jnp.concatenate(
            [self.to_q.variables["params"]["kernel"],
             self.to_k.variables["params"]["kernel"],
             self.to_v.variables["params"]["kernel"]],
            axis=1).astype(self.dtype)
        qkv = x @ w
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return self._split(q), self._split(k), self._split(v)

    def attend_cached(self, x, k_cache, v_cache, pos):
        """Single-position query against a static-shape cache.

        x: [B, 1, inner]; k/v_cache: [B, T, H, D]; pos: current index —
        positions > pos are masked out.
        """
        q = self._split(self.to_q(x))  # [B, 1, H, D]
        return self.attend_cached_q(q, k_cache, v_cache, pos)

    def attend_cached_q(self, q, k_cache, v_cache, pos):
        """attend_cached with the query already projected+split."""
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        t = k_cache.shape[1]
        valid = jnp.arange(t)[None, None, None, :] <= pos
        scores = jnp.where(valid, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache)
        b = out.shape[0]
        return self.to_out(out.reshape(b, 1, -1))


class _Block(nn.Module):
    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = LayerNormF32(name="norm1")
        self.attn1 = _Attention(self.heads, self.head_dim, self.dtype,
                                name="attn1")
        self.norm2 = LayerNormF32(name="norm2")
        self.attn2 = _Attention(self.heads, self.head_dim, self.dtype,
                                name="attn2")
        self.norm3 = LayerNormF32(name="norm3")
        self.ff = GEGLUFeedForward(dtype=self.dtype, name="ff")

    def __call__(self, x, context):
        x = x + self.attn1(self.norm1(x), causal=True)
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class DecodeCache(NamedTuple):
    """Static-shape KV caches, one array PER LAYER (tuples, not a stacked
    [depth, ...] array): each decode step then updates only its own layer's
    [B, T, H, D] buffer with one dynamic_update_slice, instead of routing
    every update through a full-stack gather/scatter that XLA may
    materialize as whole-cache copies 2x per layer per step."""

    self_k: Tuple[jnp.ndarray, ...]  # depth x [B, T, H, D]
    self_v: Tuple[jnp.ndarray, ...]
    cross_k: Tuple[jnp.ndarray, ...]  # depth x [B, S_ctx, H, D]
    cross_v: Tuple[jnp.ndarray, ...]


class RARM(nn.Module):
    """The decoder-only retrieval transformer; pure function over params."""

    config: RARMConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_emb = nn.Embed(cfg.vocab_size, cfg.inner_dim,
                                  param_dtype=jnp.float32, name="token_emb")
        # exactly seq_len positions: the decode sequence is [SOS, t0..t_{S-2}]
        # (the reference's [inner, seq_len] table transposed)
        self.positional_encoding = self.param(
            "positional_encoding",
            nn.initializers.normal(cfg.inner_dim ** -0.5),
            (cfg.seq_len, cfg.inner_dim), jnp.float32)
        self.blocks = [
            _Block(cfg.heads, cfg.head_dim, self.dtype, name=f"block_{d}")
            for d in range(cfg.depth)]
        self.proj_out = nn.Dense(cfg.out_vocab, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="proj_out")

    def _embed(self, tokens, pos_offset=0):
        x = self.token_emb(tokens).astype(self.dtype)
        pos = self.positional_encoding[
            pos_offset: pos_offset + tokens.shape[1]]
        return x + pos.astype(x.dtype)

    def __call__(self, tokens, context):
        """Teacher-forced forward: tokens [B, S] (SOS-prefixed, shifted),
        context [B, S_ctx, context_dim] → logits [B, S, out_vocab]."""
        x = self._embed(tokens)
        context = context.astype(self.dtype)
        for block in self.blocks:
            x = block(x, context)
        return self.proj_out(x).astype(jnp.float32)

    # ---------- KV-cached decoding ----------

    def init_cache(self, batch: int, context) -> DecodeCache:
        cfg = self.config
        t = cfg.seq_len  # decode sequence [SOS, t0..t_{S-2}]
        shape = (batch, t, cfg.heads, cfg.head_dim)
        cross_k, cross_v = [], []
        for block in self.blocks:
            k, v = block.attn2.project_kv(context.astype(self.dtype))
            cross_k.append(k)
            cross_v.append(v)
        return DecodeCache(
            self_k=tuple(jnp.zeros(shape, dtype=self.dtype)
                         for _ in range(cfg.depth)),
            self_v=tuple(jnp.zeros(shape, dtype=self.dtype)
                         for _ in range(cfg.depth)),
            cross_k=tuple(cross_k),
            cross_v=tuple(cross_v))

    def decode_step(self, token, pos, cache: DecodeCache,
                    window: Optional[int] = None
                    ) -> Tuple[jnp.ndarray, DecodeCache]:
        """token [B] int32, pos scalar int32 → (logits [B, out_vocab],
        updated cache).

        `window` (static) bounds the self-attention read to the cache's
        first `window` positions — valid whenever pos < window. The decode
        loop runs in growing-window stages so early steps never stream the
        full [B, T, H, D] buffers from HBM (self-attn cache reads measured
        at 36% of decode device time with full-cache reads)."""
        x = (self.token_emb(token[:, None]).astype(self.dtype)
             + jax.lax.dynamic_slice_in_dim(
                 self.positional_encoding, pos, 1, axis=0
             ).astype(self.dtype)[None])
        sk, sv = list(cache.self_k), list(cache.self_v)
        s_ctx = cache.cross_k[0].shape[1]
        for d, block in enumerate(self.blocks):
            h = block.norm1(x)
            if FUSED_QKV:
                q_new, k_new, v_new = block.attn1.project_qkv_fused(h)
            else:
                q_new = block.attn1._split(block.attn1.to_q(h))
                k_new = block.attn1._split(block.attn1.to_k(h))  # [B,1,H,D]
                v_new = block.attn1._split(block.attn1.to_v(h))
            sk[d] = jax.lax.dynamic_update_slice_in_dim(sk[d], k_new, pos,
                                                        axis=1)
            sv[d] = jax.lax.dynamic_update_slice_in_dim(sv[d], v_new, pos,
                                                        axis=1)
            k_view = sk[d] if window is None else sk[d][:, :window]
            v_view = sv[d] if window is None else sv[d][:, :window]
            x = x + block.attn1.attend_cached_q(q_new, k_view, v_view, pos)
            h = block.norm2(x)
            x = x + block.attn2.attend_cached(
                h, cache.cross_k[d], cache.cross_v[d],
                s_ctx - 1)  # full cross context
            x = x + block.ff(block.norm3(x))
        logits = self.proj_out(x).astype(jnp.float32)[:, 0]
        return logits, DecodeCache(tuple(sk), tuple(sv),
                                   cache.cross_k, cache.cross_v)

    # ---------- training ----------

    def training_loss(self, z_indices, neighbors, rng=None,
                      p_mask: Optional[float] = None):
        """z_indices [B, S] ground-truth VQ codes, neighbors [B, S_ctx, D].

        Returns (loss, metrics). Applies the mask-token augmentation when
        p_mask > 0 (reference get_r, transformer.py:191-205).
        """
        cfg = self.config
        b = z_indices.shape[0]
        r = neighbors
        if p_mask is not None and rng is not None:
            mask = jax.random.bernoulli(rng, p_mask, r.shape)
            r = jnp.where(mask, jnp.float32(cfg.mask_token), r)
        sos = jnp.full((b, 1), cfg.sos_token, dtype=z_indices.dtype)
        inp = jnp.concatenate([sos, z_indices], axis=1)[:, :-1]
        logits = self(inp, r)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, z_indices[..., None],
                                   axis=-1)[..., 0]
        loss = jnp.mean(nll)
        return loss, {"loss": loss,
                      "ppl": jnp.exp(loss)}


class SimpleTransformer(nn.Module):
    """Plain pre-LN encoder over continuous sequences — the reference's
    SimpleTransformer (attention.py:275-345): LayerNorm → 1x1 proj →
    blocks (optional cross-attention) → 1x1 proj out, optional residual."""

    inner_dim: int
    heads: int
    head_dim: int
    depth: int = 1
    out_channels: Optional[int] = None
    residual: bool = False
    cross_attend: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        from rdm_tpu.models.layers import TransformerBlock

        in_ch = x.shape[-1]
        h = LayerNormF32(name="norm")(x)
        h = nn.Dense(self.inner_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_in")(h)
        for d in range(self.depth):
            h = TransformerBlock(
                heads=self.heads, head_dim=self.head_dim,
                has_cross=self.cross_attend and context is not None,
                dtype=self.dtype, name=f"block_{d}")(h, context)
        h = nn.Dense(self.out_channels or in_ch, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_out")(h)
        return x + h if self.residual else h


class TokenSequenceTransformer(nn.Module):
    """RetrievalTemporalTokenTransformerWrapper equivalent
    (attention.py:347-359): token grids [B, n, s] are embedded, each
    group's s embeddings concatenated into one feature vector, then run
    through a SimpleTransformer trunk."""

    vocab_size: int
    embed_dim: int
    inner_dim: int
    heads: int
    head_dim: int
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, context=None):
        b, n, s = tokens.shape
        emb = nn.Embed(self.vocab_size, self.embed_dim,
                       param_dtype=jnp.float32,
                       name="tok_emb")(tokens.reshape(b, n * s))
        x = emb.reshape(b, n, s * self.embed_dim).astype(self.dtype)
        return SimpleTransformer(
            inner_dim=self.inner_dim, heads=self.heads,
            head_dim=self.head_dim, depth=self.depth, dtype=self.dtype,
            cross_attend=context is not None, name="trunk")(x, context)


def _sample_next(logits, rng, *, use_cfg, guidance_scale, temperature,
                 top_k, approx_top_k):
    """Shared sampling tail: CFG combine -> temperature -> top-k filter
    -> categorical draw. Used by both the XLA-scan and fused-kernel
    decode bodies so the semantics can't drift apart."""
    if use_cfg:
        lc, lu = jnp.split(logits, 2, axis=0)
        logits = lu + guidance_scale * (lc - lu)
    logits = logits / temperature
    if top_k:
        logits = top_k_filter(logits, top_k, approx=approx_top_k)
    rng, sub = jax.random.split(rng)
    nxt = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
    return nxt, rng


def _run_stages(make_body, carry, steps, window_chunk, window_for):
    """Growing-window stage driver shared by both decode paths: scan
    `window_chunk`-step stages, each compiled with a static cache window
    from `window_for(end)`. Returns [B, steps] tokens."""
    outs = []
    for start in range(0, steps, window_chunk):
        end = min(start + window_chunk, steps)
        carry, toks = jax.lax.scan(
            make_body(window_for(end)), carry,
            jnp.arange(start, end, dtype=jnp.int32))
        outs.append(toks)
    tokens = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return jnp.transpose(tokens, (1, 0))


def top_k_filter(logits: jnp.ndarray, k: int,
                 approx: bool = False) -> jnp.ndarray:
    """Keep top-k logits, set the rest to -inf (transformer.py top_k_logits
    semantics).

    approx=True uses the TPU-native approx_max_k to find the threshold
    (the exact [B, 16384] top_k lowers to a full sort — measured 0.167 ms
    per decode step, ~10% of RARM decode). Recall ~0.95: a few near-tie
    tail logits may swap in/out of the keep set; default stays exact."""
    if approx:
        kth = jax.lax.approx_max_k(logits, k)[0][..., -1:]
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_tokens(
    model: RARM,
    params,
    neighbors: jnp.ndarray,
    rng: jax.Array,
    *,
    steps: Optional[int] = None,
    temperature: float = 1.0,
    top_k: int = 256,
    guidance_scale: float = 1.0,
    approx_top_k: bool = False,
    window_chunk: int = 64,
) -> jnp.ndarray:
    """KV-cached autoregressive sampling. neighbors [B, S_ctx, D].

    Returns [B, seq_len] int32 VQ code indices. Jit-able end to end.

    The decode runs as a sequence of growing-window scan stages
    (`window_chunk` steps each): steps in [0, w) only stream the first w
    cache positions from HBM, cutting average self-attention cache
    traffic ~37% vs full-cache reads (numerically identical — positions
    past `pos` are masked either way).
    """
    cfg = model.config
    steps = steps or cfg.seq_len
    if top_k:
        top_k = min(top_k, cfg.out_vocab)
    b = neighbors.shape[0]
    use_cfg = guidance_scale != 1.0
    ctx = neighbors
    if use_cfg:
        ctx = jnp.concatenate([neighbors, jnp.zeros_like(neighbors)], axis=0)
    cache = model.apply(params, b * (2 if use_cfg else 1), ctx,
                        method=RARM.init_cache)
    sos = jnp.full((b,), cfg.sos_token, dtype=jnp.int32)

    def make_body(window):
        def body(carry, step):
            token, cache, rng = carry
            tok_in = (jnp.concatenate([token, token], axis=0)
                      if use_cfg else token)
            logits, cache = model.apply(params, tok_in, step, cache,
                                        window=window,
                                        method=RARM.decode_step)
            nxt, rng = _sample_next(
                logits, rng, use_cfg=use_cfg,
                guidance_scale=guidance_scale, temperature=temperature,
                top_k=top_k, approx_top_k=approx_top_k)
            return (nxt, cache, rng), nxt

        return body

    t_cache = cache.self_k[0].shape[1]
    return _run_stages(
        make_body, (sos, cache, rng), steps, window_chunk,
        window_for=lambda end: end if end < t_cache else None)


def use_fused_decode_default() -> bool:
    """True when the Pallas decode kernels are the right default: on a
    real TPU (Mosaic kernels; interpret mode would crawl on CPU).
    Measured v5e gains over the XLA scan: 46.4->52.3 img/s b16,
    28.4->42.0 CFG b16, 75.2->102.2 b64. RARM_PALLAS_DECODE=0 forces
    the XLA path."""
    if _os.environ.get("RARM_PALLAS_DECODE", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def extract_decode_weights(params, config: RARMConfig, dtype=jnp.bfloat16,
                           int8_weights: bool = False):
    """Per-layer weight dicts for the fused Pallas decode kernel
    (rdm_tpu.ops.decode_kernel) — q/k/v kernels pre-concatenated, norms
    and biases reshaped to [1, n] rows, everything in the compute dtype
    except norm params (f32 stats parity with LayerNormF32).

    int8_weights=True additionally stores every matmul weight as
    symmetric per-output-channel int8 (`<name>` int8 + `<name>_s`
    [1, out] bf16 scale). The kernels dequantize by scaling the DOT
    OUTPUT (scale commutes out of the contraction), so HBM weight
    traffic halves — decode at small batch is weight-streaming-bound."""
    p = params["params"] if "params" in params else params

    def ff_half(ff):
        return ff["proj_in"]["kernel"].shape[1] // 2

    layers = []
    for d in range(config.depth):
        blk = p[f"block_{d}"]

        def ln(name):
            n = blk[name]["LayerNorm_0"]
            return (n["scale"].reshape(1, -1).astype(jnp.float32),
                    n["bias"].reshape(1, -1).astype(jnp.float32))

        n1s, n1b = ln("norm1")
        n2s, n2b = ln("norm2")
        n3s, n3b = ln("norm3")
        a1, a2, ff = blk["attn1"], blk["attn2"], blk["ff"]
        # matmul kernels stay in their checkpoint dtype here; cast (or
        # quantization) happens once below so int8 codes come from the
        # ORIGINAL f32 values, not a bf16-rounded copy (round-2 advisor
        # fix: casting first baked bf16 rounding error into the codes)
        layers.append(dict(
            n1s=n1s, n1b=n1b,
            wqkv=jnp.concatenate(
                [a1["to_q"]["kernel"], a1["to_k"]["kernel"],
                 a1["to_v"]["kernel"]], axis=1),
            wo=a1["to_out"]["kernel"],
            bo=a1["to_out"]["bias"].reshape(1, -1).astype(jnp.float32),
            n2s=n2s, n2b=n2b,
            wq2=a2["to_q"]["kernel"],
            wo2=a2["to_out"]["kernel"],
            bo2=a2["to_out"]["bias"].reshape(1, -1).astype(jnp.float32),
            n3s=n3s, n3b=n3b,
            # GEGLU proj_in split into (value, gate) halves so the FF
            # kernel can block columns in matched pairs
            wff_a=ff["proj_in"]["kernel"][:, :ff_half(ff)],
            wff_g=ff["proj_in"]["kernel"][:, ff_half(ff):],
            bff_a=ff["proj_in"]["bias"][:ff_half(ff)]
            .reshape(1, -1).astype(jnp.float32),
            bff_g=ff["proj_in"]["bias"][ff_half(ff):]
            .reshape(1, -1).astype(jnp.float32),
            wff2=ff["proj_out"]["kernel"],
            bff2=ff["proj_out"]["bias"].reshape(1, -1).astype(jnp.float32),
        ))
    matmul_names = ("wqkv", "wo", "wq2", "wo2", "wff_a", "wff_g", "wff2")
    for w in layers:
        for name in matmul_names:
            if int8_weights:
                wf = w[name].astype(jnp.float32)
                s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
                s = jnp.maximum(s, 1e-12)
                w[name] = jnp.clip(jnp.round(wf / s), -127,
                                   127).astype(jnp.int8)
                w[name + "_s"] = s.astype(jnp.bfloat16)
            else:
                w[name] = w[name].astype(dtype)
    return layers


def sample_tokens_fused(
    model: RARM,
    params,
    neighbors: jnp.ndarray,
    rng: jax.Array,
    *,
    steps: Optional[int] = None,
    temperature: float = 1.0,
    top_k: int = 256,
    guidance_scale: float = 1.0,
    approx_top_k: bool = False,
    window_chunk: int = 64,
    int8_weights: bool = False,
    int8_kv: bool = False,
    partition: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """sample_tokens through the fused Pallas decode-step kernels
    (rdm_tpu.ops.decode_kernel.decode_layer): four batched kernels per
    layer per step instead of ~40 XLA ops. Same growing-window staging
    and sampling semantics; numerics differ from sample_tokens only by
    bf16 reduction order. interpret=True runs the kernels in interpreter
    mode (CPU-testable). KV caches are time-major [T, B, C] here.
    int8_weights quantizes every matmul weight to symmetric
    per-output-channel int8 (halved HBM weight traffic — decode at small
    batch is weight-bound); sampling is no longer bit-comparable to the
    bf16 path, so it stays opt-in for serving.
    int8_kv stores the K/V caches int8 with per-(row, batch) f32 scales
    (decode_kernel int8_kv mode), halving the cache HBM stream. Measured
    matrix on int8_weights (official forced-sync bench_rarm, v5e): b16
    75.8->81.0 (+6.8%), b64+approx 162.7->172.1 (+5.8%, the new best
    serving point), but plain b64 129.9->127.7 and CFG b64 94.2->91.6 --
    the in-kernel dequant + scale-chunk DMAs outweigh the saved traffic
    at exact-top-k b64, so it stays opt-in per op point rather than a
    default. The current position always attends through exact bf16
    kernel scratches; approximation is gated by token agreement
    (tests/test_rarm.py). Composes with int8_weights and approx_top_k.
    partition=True makes the decode DP-partitionable: the kernels run on
    each device's local batch shard (custom_partitioning batch rules,
    caller-side DUS cache commits — see decode_layer); bit-identical to
    partition=False on one device, where the wrap bypasses itself."""
    from rdm_tpu.ops.decode_kernel import (commit_rows, decode_layer,
                                           uses_inkernel_commit,
                                           head_segment_matrices)

    cfg = model.config
    dtype = model.dtype
    steps = steps or cfg.seq_len
    if top_k:
        top_k = min(top_k, cfg.out_vocab)
    b = neighbors.shape[0]
    use_cfg = guidance_scale != 1.0
    ctx = neighbors
    if use_cfg:
        ctx = jnp.concatenate([neighbors, jnp.zeros_like(neighbors)],
                              axis=0)
    ctx = ctx.astype(dtype)
    bb = ctx.shape[0]
    c = cfg.inner_dim
    t = cfg.seq_len
    seg, segt = head_segment_matrices(cfg.heads, cfg.head_dim, dtype)

    p = params["params"] if "params" in params else params
    emb = p["token_emb"]["embedding"].astype(dtype)      # [vocab, C]
    posenc = p["positional_encoding"].astype(dtype)      # [T, C]
    head_w = p["proj_out"]["kernel"].astype(dtype)
    head_b = p["proj_out"]["bias"].astype(dtype)
    layers = extract_decode_weights(params, cfg, dtype,
                                    int8_weights=int8_weights)

    # cross-attention K/V, once per sample call, TIME-MAJOR [S, B, C]
    cross = []
    for d in range(cfg.depth):
        a2 = p[f"block_{d}"]["attn2"]
        ck = (ctx @ a2["to_k"]["kernel"].astype(dtype))  # [B, S, C]
        cv = (ctx @ a2["to_v"]["kernel"].astype(dtype))
        cross.append((jnp.transpose(ck, (1, 0, 2)),
                      jnp.transpose(cv, (1, 0, 2))))

    cache_dtype = jnp.int8 if int8_kv else dtype
    k_caches = tuple(jnp.zeros((t, bb, c), cache_dtype)
                     for _ in range(cfg.depth))
    v_caches = tuple(jnp.zeros((t, bb, c), cache_dtype)
                     for _ in range(cfg.depth))
    ks_caches = tuple(jnp.ones((t, bb, 1), jnp.float32)
                      for _ in range(cfg.depth)) if int8_kv else ()
    vs_caches = tuple(jnp.ones((t, bb, 1), jnp.float32)
                      for _ in range(cfg.depth)) if int8_kv else ()
    sos = jnp.full((b,), cfg.sos_token, dtype=jnp.int32)

    def make_body(window):
        # above the in-kernel alias threshold (large batch x chunks) the
        # rows CAN be deferred and committed for ALL layers in one
        # aliased async-copy kernel (RARM_BATCHED_COMMIT=1) — but the
        # extra kernel launch plus the row HBM round-trip (row written
        # by decode_layer, read back, DMA'd into the cache) measured
        # SLOWER than 2L caller-side dynamic_update_slices on v5e
        # (CFG b64: 80.7 vs 86.8 img/s; block-pipelined variant 79.2),
        # so the default stays the DUS fallback.
        defer = (_os.environ.get("RARM_BATCHED_COMMIT", "0") == "1"
                 and not partition and not int8_kv
                 and not uses_inkernel_commit(window, bb, c))

        def body(carry, step):
            token, kc, vc, ksc, vsc, rng = carry
            tok_in = (jnp.concatenate([token, token], axis=0)
                      if use_cfg else token)
            x = (jnp.take(emb, tok_in, axis=0)
                 + jax.lax.dynamic_slice_in_dim(posenc, step, 1, axis=0))
            kc, vc = list(kc), list(vc)
            ksc, vsc = list(ksc), list(vsc)
            krows, vrows = [], []
            for d in range(cfg.depth):
                # caches return with row `step` committed in-kernel (or,
                # when deferred, the raw rows for the batched commit)
                outs = decode_layer(
                    x, step, kc[d], vc[d], cross[d][0], cross[d][1],
                    seg, segt, layers[d],
                    heads=cfg.heads, head_dim=cfg.head_dim,
                    window=window,
                    ks_cache=ksc[d] if int8_kv else None,
                    vs_cache=vsc[d] if int8_kv else None,
                    defer_commit=defer,
                    partition=partition, interpret=interpret)
                x, ko, vo = outs[:3]
                if int8_kv:
                    ksc[d], vsc[d] = outs[3], outs[4]
                if defer:
                    krows.append(ko)
                    vrows.append(vo)
                else:
                    kc[d], vc[d] = ko, vo
            if defer:
                updated = commit_rows(step, kc + vc, krows + vrows,
                                      interpret=interpret)
                kc = updated[:cfg.depth]
                vc = updated[cfg.depth:]
            logits = (x @ head_w + head_b).astype(jnp.float32)
            nxt, rng = _sample_next(
                logits, rng, use_cfg=use_cfg,
                guidance_scale=guidance_scale, temperature=temperature,
                top_k=top_k, approx_top_k=approx_top_k)
            return (nxt, tuple(kc), tuple(vc), tuple(ksc), tuple(vsc),
                    rng), nxt

        return body

    # kernel windows round up to a multiple of 8 (rows past `pos` are
    # masked): an odd window would force the attention kernel's chunk
    # size down to 1 — the serialized small-block shape its docstring
    # records as a measured disaster
    return _run_stages(
        make_body, (sos, k_caches, v_caches, ks_caches, vs_caches, rng),
        steps, window_chunk,
        window_for=lambda end: min(t, ((end + 7) // 8) * 8))
