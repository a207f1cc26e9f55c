"""Weight-converter parity tests against small PyTorch oracle modules.

The oracles are fresh torch implementations of the *semantics* the released
checkpoints assume (taming autoencoder blocks, ADM U-Net blocks, CLIP
residual blocks) — converting their random state dicts into the flax models
and comparing forward outputs end-to-end validates layout transposes,
padding alignment, norm-group counts, GEGLU ordering, and MHA qkv packing.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
from rdm_tpu.models.clip import CLIP, ClipConfig
from rdm_tpu.models.unet import UNet, UNetConfig
from rdm_tpu.utils.torch_convert import (
    convert_autoencoder,
    convert_clip,
    convert_unet,
)

ATOL = 2e-4


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nhwc(x):
    return jnp.asarray(np.transpose(x.detach().numpy(), (0, 2, 3, 1)))


def _assert_close(torch_out_nchw, jax_out_nhwc, atol=ATOL):
    ref = np.transpose(torch_out_nchw.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(jax_out_nhwc), ref, atol=atol,
                               rtol=1e-3)


def swish(x):
    return x * torch.sigmoid(x)


# ---------------- taming-style autoencoder oracle ----------------

class TResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(math.gcd(32, cin), cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(math.gcd(32, cout), cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(swish(self.norm1(x)))
        h = self.conv2(swish(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttnBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(math.gcd(32, c), c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(hn).reshape(b, c, h * w)
        v = self.v(hn).reshape(b, c, h * w)
        attn = torch.softmax(q @ k * (c ** -0.5), dim=-1)
        out = (v @ attn.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class TDownsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TLevel(tnn.Module):
    def __init__(self, blocks, attns=None, downsample=None, upsample=None):
        super().__init__()
        self.block = tnn.ModuleList(blocks)
        self.attn = tnn.ModuleList(attns or [])
        if downsample is not None:
            self.downsample = downsample
        if upsample is not None:
            self.upsample = upsample


class TMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.block_1 = TResBlock(c, c)
        self.attn_1 = TAttnBlock(c)
        self.block_2 = TResBlock(c, c)

    def forward(self, h):
        return self.block_2(self.attn_1(self.block_1(h)))


class TEncoder(tnn.Module):
    """ch=32, ch_mult=(1,2), 1 res block, attn at bottom resolution."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.ch
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch, 3, padding=1)
        self.down = tnn.ModuleList([
            TLevel([TResBlock(ch, ch)], downsample=TDownsample(ch)),
            TLevel([TResBlock(ch, 2 * ch)], [TAttnBlock(2 * ch)]),
        ])
        self.mid = TMid(2 * ch)
        self.norm_out = tnn.GroupNorm(math.gcd(32, 2 * ch), 2 * ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(2 * ch, cfg.z_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        h = self.down[0].block[0](h)
        h = self.down[0].downsample(h)
        h = self.down[1].block[0](h)
        h = self.down[1].attn[0](h)
        h = self.mid(h)
        return self.conv_out(swish(self.norm_out(h)))


class TDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.ch
        self.conv_in = tnn.Conv2d(cfg.z_channels, 2 * ch, 3, padding=1)
        self.mid = TMid(2 * ch)
        self.up = tnn.ModuleList([
            TLevel([TResBlock(2 * ch, ch), TResBlock(ch, ch)]),
            TLevel([TResBlock(2 * ch, 2 * ch), TResBlock(2 * ch, 2 * ch)],
                   [TAttnBlock(2 * ch), TAttnBlock(2 * ch)],
                   upsample=TUpsample(2 * ch)),
        ])
        self.norm_out = tnn.GroupNorm(math.gcd(32, ch), ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, cfg.out_ch, 3, padding=1)

    def forward(self, z):
        h = self.mid(self.conv_in(z))
        h = self.up[1].attn[0](self.up[1].block[0](h))
        h = self.up[1].attn[1](self.up[1].block[1](h))
        h = self.up[1].upsample(h)
        h = self.up[0].block[0](h)
        h = self.up[0].block[1](h)
        return self.conv_out(swish(self.norm_out(h)))


class TVQ(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = tnn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
        self.quantize = tnn.Module()
        self.quantize.embedding = tnn.Embedding(cfg.n_embed, cfg.embed_dim)

    def forward(self, x):
        h = self.quant_conv(self.encoder(x))
        flat = h.permute(0, 2, 3, 1).reshape(-1, h.shape[1])
        cb = self.quantize.embedding.weight
        d = (flat ** 2).sum(1, keepdim=True) - 2 * flat @ cb.T \
            + (cb ** 2).sum(1)[None]
        idx = d.argmin(1)
        z_q = cb[idx].reshape(h.shape[0], h.shape[2], h.shape[3], -1)
        z_q = z_q.permute(0, 3, 1, 2)
        return self.decoder(self.post_quant_conv(z_q)), idx


AE_CFG = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(8,), resolution=16,
                           z_channels=4, embed_dim=4, n_embed=16)


def test_autoencoder_conversion_end_to_end():
    torch.manual_seed(0)
    oracle = TVQ(AE_CFG).eval()
    with torch.no_grad():
        x = torch.randn(2, 3, 16, 16)
        ref, ref_idx = oracle(x)
    params = convert_autoencoder(_sd(oracle), AE_CFG)
    model = VQModel(AE_CFG)
    rec, _, idx = model.apply(params, _nhwc(x))
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1),
                                  ref_idx.numpy())
    _assert_close(ref, rec)


# ---------------- ADM U-Net oracle ----------------

class TADMRes(tnn.Module):
    def __init__(self, cin, cout, emb_dim):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(math.gcd(32, cin), cin), tnn.SiLU(),
            tnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = tnn.Sequential(tnn.SiLU(),
                                         tnn.Linear(emb_dim, cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(math.gcd(32, cout), cout), tnn.SiLU(),
            tnn.Identity(), tnn.Conv2d(cout, cout, 3, padding=1))
        if cin != cout:
            self.skip_connection = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        skip = getattr(self, "skip_connection", lambda v: v)
        return skip(x) + h


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TCrossAttn(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        sk = ctx.shape[1]
        h, d = self.heads, self.head_dim
        q = self.to_q(x).reshape(b, s, h, d).permute(0, 2, 1, 3)
        k = self.to_k(ctx).reshape(b, sk, h, d).permute(0, 2, 1, 3)
        v = self.to_v(ctx).reshape(b, sk, h, d).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-1, -2) * (d ** -0.5), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, s, h * d)
        return self.to_out[0](out)


class TTransformerBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TCrossAttn(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TCrossAttn(dim, ctx_dim, heads, head_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.Module()
        self.ff.net = tnn.Sequential(TGEGLU(dim, dim * 4), tnn.Identity(),
                                     tnn.Linear(dim * 4, dim))

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff.net(self.norm3(x))
        return x


class TSpatial(tnn.Module):
    def __init__(self, c, ctx_dim, heads, head_dim, depth=1):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(math.gcd(32, c), c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, inner, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlock(inner, ctx_dim, heads, head_dim)
             for _ in range(depth)])
        self.proj_out = tnn.Conv2d(inner, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        x_in = x
        x = self.proj_in(self.norm(x))
        x = x.reshape(b, -1, h * w).permute(0, 2, 1)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = x.permute(0, 2, 1).reshape(b, -1, h, w)
        return x_in + self.proj_out(x)


class TOp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.op = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TUNet(tnn.Module):
    """Tiny ADM U-Net: ch 32, mult (1,2), 1 res block, attn at ds (1,2)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        ch = cfg.model_channels
        emb = 4 * ch
        ctx = cfg.context_dim
        heads = lambda c: (c // cfg.num_head_channels, cfg.num_head_channels)

        self.time_embed = tnn.Sequential(
            tnn.Linear(ch, emb), tnn.SiLU(), tnn.Linear(emb, emb))
        sp = lambda c: TSpatial(c, ctx, *heads(c))
        self.input_blocks = tnn.ModuleList([
            tnn.ModuleList([tnn.Conv2d(cfg.in_channels, ch, 3, padding=1)]),
            tnn.ModuleList([TADMRes(ch, ch, emb), sp(ch)]),
            tnn.ModuleList([TOp(ch)]),
            tnn.ModuleList([TADMRes(ch, 2 * ch, emb), sp(2 * ch)]),
        ])
        self.middle_block = tnn.ModuleList(
            [TADMRes(2 * ch, 2 * ch, emb), sp(2 * ch),
             TADMRes(2 * ch, 2 * ch, emb)])
        self.output_blocks = tnn.ModuleList([
            tnn.ModuleList([TADMRes(4 * ch, 2 * ch, emb), sp(2 * ch)]),
            tnn.ModuleList([TADMRes(3 * ch, 2 * ch, emb), sp(2 * ch),
                            TUp(2 * ch)]),
            tnn.ModuleList([TADMRes(3 * ch, ch, emb), sp(ch)]),
            tnn.ModuleList([TADMRes(2 * ch, ch, emb), sp(ch)]),
        ])
        self.out = tnn.Sequential(
            tnn.GroupNorm(math.gcd(32, ch), ch), tnn.SiLU(),
            tnn.Conv2d(ch, cfg.out_channels, 3, padding=1))
        self.model_channels = ch

    def forward(self, x, t, ctx):
        emb = self.time_embed(t_timestep_embedding(t, self.model_channels))
        hs = []
        h = x
        for blocks in self.input_blocks:
            for b in blocks:
                if isinstance(b, TADMRes):
                    h = b(h, emb)
                elif isinstance(b, TSpatial):
                    h = b(h, ctx)
                else:
                    h = b(h)
            hs.append(h)
        for b in self.middle_block:
            h = b(h, emb) if isinstance(b, TADMRes) else b(h, ctx)
        for blocks in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for b in blocks:
                if isinstance(b, TADMRes):
                    h = b(h, emb)
                elif isinstance(b, TSpatial):
                    h = b(h, ctx)
                else:
                    h = b(h)
        return self.out(h)


UNET_CFG = UNetConfig(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(1, 2), channel_mult=(1, 2),
    num_head_channels=16, transformer_depth=1, context_dim=24)


def test_unet_conversion_end_to_end():
    torch.manual_seed(1)
    oracle = TUNet(UNET_CFG).eval()
    with torch.no_grad():
        x = torch.randn(2, 3, 8, 8)
        t = torch.tensor([3, 40])
        ctx = torch.randn(2, 5, 24)
        ref = oracle(x, t, ctx)
    params = convert_unet(_sd(oracle), UNET_CFG, prefix="")
    model = UNet(UNET_CFG)
    out = model.apply(params, _nhwc(x), jnp.asarray(t.numpy()),
                      jnp.asarray(ctx.numpy()))
    _assert_close(ref, out, atol=5e-4)


# ---------------- CLIP block oracle ----------------

class TClipBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Module()
        self.mlp.c_fc = tnn.Linear(d, d * 4)
        self.mlp.c_proj = tnn.Linear(d * 4, d)
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, causal=False):
        h = self.ln_1(x)
        mask = None
        if causal:
            s = x.shape[1]
            mask = torch.full((s, s), float("-inf")).triu(1)
        a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        h = self.mlp.c_proj(self.mlp.c_fc(h) * torch.sigmoid(
            1.702 * self.mlp.c_fc(h)))
        return x + h


def test_clip_block_mha_packing():
    from rdm_tpu.models.clip import ResidualAttentionBlock
    from rdm_tpu.utils.torch_convert import _Mapper, _convert_clip_block

    torch.manual_seed(2)
    d, heads = 32, 2
    oracle = TClipBlock(d, heads).eval()
    sd = {f"blk.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    m = _Mapper(sd)
    _convert_clip_block(m, "blk", "blk")
    params = {"params": m.tree["blk"]}
    x = torch.randn(2, 7, d)
    with torch.no_grad():
        ref = oracle(x, causal=True)
    model = ResidualAttentionBlock(heads=heads, causal=True)
    out = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4,
                               rtol=1e-3)


# ---------------- full CLIP oracle ----------------

class TClipVisual(tnn.Module):
    def __init__(self, width, layers, patch, res, out_dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, patch, stride=patch, bias=False)
        scale = width ** -0.5
        self.class_embedding = tnn.Parameter(scale * torch.randn(width))
        grid = res // patch
        self.positional_embedding = tnn.Parameter(
            scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = tnn.LayerNorm(width)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TClipBlock(width, width // 16) for _ in range(layers)])
        self.ln_post = tnn.LayerNorm(width)
        self.proj = tnn.Parameter(scale * torch.randn(width, out_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        return self.ln_post(x[:, 0]) @ self.proj


class TClip(tnn.Module):
    def __init__(self, width=32, layers=2, patch=8, res=16, out=16,
                 twidth=32, tlayers=2, ctx=12, vocab=64):
        super().__init__()
        self.visual = TClipVisual(width, layers, patch, res, out)
        self.token_embedding = tnn.Embedding(vocab, twidth)
        self.positional_embedding = tnn.Parameter(
            0.01 * torch.randn(ctx, twidth))
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TClipBlock(twidth, twidth // 16) for _ in range(tlayers)])
        self.ln_final = tnn.LayerNorm(twidth)
        self.text_projection = tnn.Parameter(
            0.02 * torch.randn(twidth, out))
        self.logit_scale = tnn.Parameter(torch.tensor(2.6593))

    def encode_text(self, toks):
        x = self.token_embedding(toks) + self.positional_embedding
        for blk in self.transformer.resblocks:
            x = blk(x, causal=True)
        x = self.ln_final(x)
        eot = toks.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


def test_full_clip_conversion():
    from rdm_tpu.models.clip import CLIP, ClipConfig

    torch.manual_seed(3)
    oracle = TClip().eval()
    sd = _sd(oracle)
    from rdm_tpu.utils.torch_convert import convert_clip
    cfg = ClipConfig(embed_dim=16, image_resolution=16, vision_width=32,
                     vision_layers=2, vision_patch_size=8,
                     context_length=12, vocab_size=64,
                     transformer_width=32, transformer_layers=2,
                     head_dim=16)
    params, _ = convert_clip(sd, cfg)
    model = CLIP(cfg)
    with torch.no_grad():
        img = torch.randn(2, 3, 16, 16)
        ref_img = oracle.visual(img)
        toks = torch.tensor([[63, 5, 9, 62, 0, 0, 0, 0, 0, 0, 0, 0],
                             [63, 7, 62, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        ref_txt = oracle.encode_text(toks)
    out_img = model.apply(params, _nhwc(img), method=CLIP.encode_image)
    np.testing.assert_allclose(np.asarray(out_img), ref_img.numpy(),
                               atol=3e-4, rtol=1e-3)
    out_txt = model.apply(params, jnp.asarray(toks.numpy()),
                          method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(out_txt), ref_txt.numpy(),
                               atol=3e-4, rtol=1e-3)


# ---------------- RARM transformer oracle ----------------

class TRarm(tnn.Module):
    """RetrievalPatchTransformer, continuous=False layout
    (reference attention.py:199-272)."""

    def __init__(self, vocab=24, inner=32, heads=2, d_head=16, depth=2,
                 ctx_dim=8, seq=6, out_vocab=20):
        super().__init__()
        self.proj_in = tnn.Embedding(vocab, inner)
        self.positional_encoding = tnn.Parameter(
            torch.randn(inner, seq) / inner ** 0.5)
        self.transformer_blocks = tnn.ModuleList([
            TTransformerBlock(inner, ctx_dim, heads, d_head)
            for _ in range(depth)])
        self.proj_out = tnn.Conv1d(inner, out_vocab, 1)
        self.heads, self.d_head = heads, d_head

    def forward(self, x, context):
        x = self.proj_in(x)  # [b, t, c]
        x = x + self.positional_encoding.T[None, :x.shape[1]]
        s = x.shape[1]
        mask = torch.full((s, s), float("-inf")).triu(1)
        for blk in self.transformer_blocks:
            # causal self-attention + cross-attention + ff, pre-LN
            h = blk.norm1(x)
            b, t, _ = h.shape
            hd, nh = self.d_head, self.heads
            q = blk.attn1.to_q(h).reshape(b, t, nh, hd).permute(0, 2, 1, 3)
            kk = blk.attn1.to_k(h).reshape(b, t, nh, hd).permute(0, 2, 1, 3)
            vv = blk.attn1.to_v(h).reshape(b, t, nh, hd).permute(0, 2, 1, 3)
            att = torch.softmax(
                q @ kk.transpose(-1, -2) * hd ** -0.5 + mask, dim=-1)
            sa = (att @ vv).permute(0, 2, 1, 3).reshape(b, t, -1)
            x = x + blk.attn1.to_out[0](sa)
            x = x + blk.attn2(blk.norm2(x), context)
            x = x + blk.ff.net(blk.norm3(x))
        return self.proj_out(x.permute(0, 2, 1)).permute(0, 2, 1)


def test_rarm_transformer_conversion():
    from rdm_tpu.models.rarm import RARM, RARMConfig
    from rdm_tpu.utils.torch_convert import convert_rarm_transformer

    torch.manual_seed(4)
    oracle = TRarm().eval()
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    cfg = RARMConfig(vocab_size=24, out_vocab=20, heads=2, head_dim=16,
                     depth=2, context_dim=8, seq_len=6, sos_token=23,
                     mask_token=22, code_side=2)
    params = convert_rarm_transformer(sd, cfg.depth)
    model = RARM(cfg)
    with torch.no_grad():
        toks = torch.randint(0, 20, (2, 6))
        ctx = torch.randn(2, 3, 8)
        ref = oracle(toks, ctx)
    out = model.apply(params, jnp.asarray(toks.numpy()),
                      jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-4,
                               rtol=1e-3)


def test_full_rdm_checkpoint_conversion_with_ema_swap():
    """convert_rdm: model.diffusion_model.* + first_stage_model.* prefixes,
    guidance vector passthrough, and the LitEma-style EMA weight swap
    (flattened-name matching)."""
    from rdm_tpu.models.rdm import RDM, RDMConfig
    from rdm_tpu.utils.torch_convert import convert_rdm

    torch.manual_seed(7)
    unet_oracle = TUNet(UNET_CFG).eval()
    vq_oracle = TVQ(AE_CFG).eval()
    sd = {}
    for k, v in unet_oracle.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v.detach().numpy()
    for k, v in vq_oracle.state_dict().items():
        sd[f"first_stage_model.{k}"] = v.detach().numpy()
    sd["unconditional_guidance_vex"] = np.arange(24, dtype=np.float32)
    # EMA entries: LitEma stores one per model.* param with dots stripped;
    # give the out-conv weight a distinguishable EMA value
    ema_key = "model.diffusion_model.out.2.weight"
    ema_flat = ema_key[len("model."):].replace(".", "")
    ema_val = np.full_like(sd[ema_key], 0.5, dtype=np.float32)
    sd["model_ema." + ema_flat] = ema_val
    sd["model_ema.num_updates"] = np.asarray(10)
    sd["model_ema.decay"] = np.asarray(0.999)

    cfg = RDMConfig(unet=UNET_CFG, image_size=8, channels=3, timesteps=50,
                    context_dim=24, k_nn=3)

    # without EMA: raw weights
    params_raw, fs = convert_rdm(sd, UNET_CFG, AE_CFG, use_ema=False)
    # with EMA: the out-conv weight takes the EMA value
    params_ema, _ = convert_rdm(sd, UNET_CFG, AE_CFG, use_ema=True)
    raw_k = params_raw["params"]["unet"]["out_conv"]["kernel"]
    ema_k = params_ema["params"]["unet"]["out_conv"]["kernel"]
    assert not np.allclose(raw_k, ema_k)
    np.testing.assert_allclose(ema_k, 0.5, atol=1e-6)
    np.testing.assert_array_equal(
        params_raw["params"]["unconditional_guidance_vex"],
        np.arange(24, dtype=np.float32))

    # converted tree must slot into the RDM module and run
    model = RDM(cfg)
    x = jnp.zeros((1, 8, 8, 3))
    out = model.apply(params_ema, x, jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 3, 24)))
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
    # first-stage tree runs too
    rec, _, _ = VQModel(AE_CFG).apply(fs, _nhwc(torch.zeros(1, 3, 16, 16)))
    assert rec.shape == (1, 16, 16, 3)


# ---------------- CLIP ModifiedResNet (RN50-style) oracle ----------------

class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 \
            else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            # OpenAI layout: avgpool named "-1", conv "0", bn "1"
            from collections import OrderedDict
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride) if stride > 1
                 else tnn.Identity()),
                ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4))]))
        else:
            self.downsample = None

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.avgpool(h)
        h = self.bn3(self.conv3(h))
        sc = self.downsample(x) if self.downsample is not None else x
        return torch.relu(h + sc)


class TModifiedResNet(tnn.Module):
    def __init__(self, layers=(1, 1), width=16, out_dim=12, heads=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, padding=1,
                                bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(2)
        planes, inplanes = width, width
        stages = []
        for s, n in enumerate(layers):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                blocks.append(TBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            stages.append(tnn.ModuleList(blocks))
            planes *= 2
        self.layer1, self.layer2 = stages
        embed = inplanes
        self.attnpool = tnn.Module()
        self.attnpool.positional_embedding = tnn.Parameter(
            0.02 * torch.randn(4 * 4 + 1, embed))  # 32px -> 4x4 grid
        for p in ("q_proj", "k_proj", "v_proj"):
            setattr(self.attnpool, p, tnn.Linear(embed, embed))
        self.attnpool.c_proj = tnn.Linear(embed, out_dim)
        self.heads = heads

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = torch.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for blk in self.layer1:
            x = blk(x)
        for blk in self.layer2:
            x = blk(x)
        b, c, h, w = x.shape
        t = x.reshape(b, c, h * w).permute(0, 2, 1)
        t = torch.cat([t.mean(1, keepdim=True), t], dim=1)
        t = t + self.attnpool.positional_embedding[None]
        ap = self.attnpool
        q = ap.q_proj(t[:, :1]).reshape(b, 1, self.heads, -1)
        k = ap.k_proj(t).reshape(b, -1, self.heads, q.shape[-1])
        v = ap.v_proj(t).reshape(b, -1, self.heads, q.shape[-1])
        att = torch.softmax(
            torch.einsum("bqhd,bkhd->bhqk", q, k)
            * q.shape[-1] ** -0.5, dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, c)
        return ap.c_proj(out)


def test_clip_resnet_visual_conversion():
    from rdm_tpu.models.clip import ModifiedResNet
    from rdm_tpu.utils.torch_convert import convert_clip_resnet_visual

    torch.manual_seed(9)
    oracle = TModifiedResNet().eval()
    sd = {f"visual.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    variables = convert_clip_resnet_visual(sd, layers=(1, 1))
    model = ModifiedResNet(layers=(1, 1), width=16, heads=8, out_dim=12)
    with torch.no_grad():
        x = torch.randn(2, 3, 32, 32)
        ref = oracle(x)
        ref_conv1 = oracle.conv1(x)
    out, inter = model.apply(variables, _nhwc(x),
                             capture_intermediates=True)
    # Intermediate parity: a stem-padding misalignment (XLA SAME vs torch
    # pad=1 at stride 2) passes the tiny pooled output at absolute 5e-4 but
    # shifts every conv1 window — assert the raw conv1 feature map too.
    conv1 = np.asarray(inter["intermediates"]["conv1"]["__call__"][0])
    np.testing.assert_allclose(conv1.transpose(0, 3, 1, 2),
                               ref_conv1.numpy(), atol=1e-5, rtol=1e-4)
    # relative tolerance against the output scale, not bare atol
    scale = float(np.abs(ref.numpy()).max())
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=1e-3 * scale, rtol=1e-3)


def test_golden_ddim_trajectory_vs_torch():
    """End-to-end numerical parity: converted U-Net weights + identical
    noise must reproduce the reference's FULL DDIM trajectory (pred_x0 at
    every step and the final latent) against a torch loop implementing
    ddim.py:253-267 with CFG (ddim.py:229-238), eta=0."""
    from rdm_tpu.ops.schedules import DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    torch.manual_seed(11)
    oracle = TUNet(UNET_CFG).eval()
    params = convert_unet(_sd(oracle), UNET_CFG, prefix="")
    model = UNet(UNET_CFG)

    T, S, scale = 50, 10, 2.0
    # independent float64 tables from the reference formulas
    betas = np.linspace(0.0015 ** 0.5, 0.0195 ** 0.5, T) ** 2
    acp = np.cumprod(1.0 - betas)
    ts = np.minimum(np.arange(0, T, T // S) + 1, T - 1)
    alphas = acp[ts]
    alphas_prev = np.concatenate([acp[:1], acp[ts[:-1]]])

    ctx = torch.randn(2, 3, 24)
    uctx = torch.zeros(2, 3, 24)
    x0_noise = torch.randn(2, 3, 8, 8)

    x = x0_noise.clone()
    traj = []
    with torch.no_grad():
        for i in reversed(range(S)):
            t = torch.full((2,), int(ts[i]), dtype=torch.long)
            e_c = oracle(x, t, ctx)
            e_u = oracle(x, t, uctx)
            eps = e_u + scale * (e_c - e_u)
            a_t, a_prev = float(alphas[i]), float(alphas_prev[i])
            pred_x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
            dir_xt = np.sqrt(1.0 - a_prev) * eps
            x = np.sqrt(a_prev) * pred_x0 + dir_xt
            traj.append(pred_x0.numpy())

    schedule = DiffusionSchedule.create(T, "linear", 0.0015, 0.0195)
    cfg = DDIMSamplerConfig(num_steps=S, guidance_scale=scale, log_every_t=1)
    denoise = lambda xt, tt, cc: model.apply(params, xt, tt, cc)
    out, interm = ddim_sample(
        denoise, schedule, cfg, (2, 8, 8, 3),
        jnp.asarray(ctx.numpy()), jax.random.PRNGKey(0),
        uncond_context=jnp.asarray(uctx.numpy()),
        x_init=_nhwc(x0_noise))

    assert interm.shape[0] == S
    for i in range(S):
        got = np.asarray(interm[i]).transpose(0, 3, 1, 2)
        ref = traj[i]
        tol = 1e-3 * max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(got, ref, atol=tol,
                                   err_msg=f"pred_x0 diverges at step {i}")
    final_tol = 1e-3 * max(1.0, float(np.abs(x.numpy()).max()))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               x.numpy(), atol=final_tol)


def test_golden_ddim_to_pixels_vs_torch():
    """Golden chain extended to PIXELS: DDIM-CFG sampling through converted
    U-Net weights, then the sampled latent quantized through the converted
    VQ codebook and decoded to images (the reference's sample →
    decode_first_stage chain, ddpm.py decode path with
    force_not_quantize=False), must match a torch loop + torch decode
    end-to-end."""
    from rdm_tpu.ops.schedules import DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample

    torch.manual_seed(17)
    oracle = TUNet(UNET_CFG).eval()
    params = convert_unet(_sd(oracle), UNET_CFG, prefix="")
    model = UNet(UNET_CFG)

    # VQ first stage whose embed space matches the U-Net's 3 latent channels
    ae_cfg = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                               attn_resolutions=(8,), resolution=16,
                               z_channels=3, embed_dim=3, n_embed=16)
    vq_oracle = TVQ(ae_cfg).eval()
    ae_params = convert_autoencoder(_sd(vq_oracle), ae_cfg)
    vq = VQModel(ae_cfg)

    T, S, scale = 50, 5, 2.0
    betas = np.linspace(0.0015 ** 0.5, 0.0195 ** 0.5, T) ** 2
    acp = np.cumprod(1.0 - betas)
    ts = np.minimum(np.arange(0, T, T // S) + 1, T - 1)
    alphas = acp[ts]
    alphas_prev = np.concatenate([acp[:1], acp[ts[:-1]]])

    ctx = torch.randn(2, 3, 24)
    uctx = torch.zeros(2, 3, 24)
    x = torch.randn(2, 3, 8, 8)
    x0_noise = x.clone()
    with torch.no_grad():
        for i in reversed(range(S)):
            t = torch.full((2,), int(ts[i]), dtype=torch.long)
            e_c = oracle(x, t, ctx)
            e_u = oracle(x, t, uctx)
            eps = e_u + scale * (e_c - e_u)
            a_t, a_prev = float(alphas[i]), float(alphas_prev[i])
            pred_x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * eps
        # torch decode: nearest-codebook quantize -> post_quant -> decoder
        flat = x.permute(0, 2, 3, 1).reshape(-1, 3)
        cb = vq_oracle.quantize.embedding.weight
        d = ((flat ** 2).sum(1, keepdim=True) - 2 * flat @ cb.T
             + (cb ** 2).sum(1)[None])
        idx = d.argmin(1)
        z_q = cb[idx].reshape(2, 8, 8, 3).permute(0, 3, 1, 2)
        ref_px = vq_oracle.decoder(vq_oracle.post_quant_conv(z_q))

    schedule = DiffusionSchedule.create(T, "linear", 0.0015, 0.0195)
    cfg = DDIMSamplerConfig(num_steps=S, guidance_scale=scale)
    denoise = lambda xt, tt, cc: model.apply(params, xt, tt, cc)
    out, _ = ddim_sample(
        denoise, schedule, cfg, (2, 8, 8, 3),
        jnp.asarray(ctx.numpy()), jax.random.PRNGKey(0),
        uncond_context=jnp.asarray(uctx.numpy()),
        x_init=_nhwc(x0_noise))
    px = vq.apply(ae_params, out, force_not_quantize=False,
                  method=VQModel.decode)
    tol = 2e-3 * max(1.0, float(ref_px.abs().max()))
    _assert_close(ref_px, px, atol=tol)


# ---------------- int8 quantization gates on converted oracle weights --
# (VERDICT r3 #8: the flagship int8 agreement numbers were measured on
# bench-synthesized params; these gates re-measure the recipes on REAL
# torch-initialized weight distributions via the converter.)

def test_unet_int8_agreement_on_converted_weights():
    """U-Net int8 serving recipe (ops/quant.py) on converted torch
    weights: calibrated weight+activation int8 must track the f32 eps
    output closely."""
    from rdm_tpu.ops import quant

    torch.manual_seed(11)
    oracle = TUNet(UNET_CFG).eval()
    params = convert_unet(_sd(oracle), UNET_CFG, prefix="")
    model = UNet(UNET_CFG)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([3, 40])
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 5, 24)).astype(np.float32))
    with quant.calibrate():
        ref, inter = model.apply(params, x, t, ctx,
                                 mutable=["intermediates"])
    qtree = quant.quantize_conv_tree(params, inter)
    assert quant.num_quantized(qtree) > 0
    out = model.apply(qtree, x, t, ctx)
    r = np.asarray(ref, np.float32).ravel()
    o = np.asarray(out, np.float32).ravel()
    cos = float(r @ o / (np.linalg.norm(r) * np.linalg.norm(o)))
    assert cos > 0.995
    rel = np.linalg.norm(o - r) / np.linalg.norm(r)
    assert rel < 0.1


def test_rarm_int8_agreement_on_converted_weights():
    """RARM weight-only int8 recipe (models/rarm.extract_decode_weights)
    on converted torch weights: per-output-channel codes must round-trip
    accurately and greedy token choices must agree with f32."""
    from rdm_tpu.models.rarm import RARM, RARMConfig, extract_decode_weights
    from rdm_tpu.utils.torch_convert import convert_rarm_transformer

    torch.manual_seed(12)
    oracle = TRarm().eval()
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    cfg = RARMConfig(vocab_size=24, out_vocab=20, heads=2, head_dim=16,
                     depth=2, context_dim=8, seq_len=6, sos_token=23,
                     mask_token=22, code_side=2)
    params = convert_rarm_transformer(sd, cfg.depth)
    f32 = extract_decode_weights(params, cfg, int8_weights=False,
                                 dtype=jnp.float32)
    q = extract_decode_weights(params, cfg, int8_weights=True)
    names = ("wqkv", "wo", "wq2", "wo2", "wff_a", "wff_g", "wff2")
    # (a) code round-trip: dequantized int8 ~ original weights
    for lf, lq in zip(f32, q):
        for n in names:
            deq = (lq[n].astype(jnp.float32)
                   * lq[n + "_s"].astype(jnp.float32))
            w = np.asarray(lf[n], np.float32)
            rel = np.linalg.norm(np.asarray(deq) - w) / np.linalg.norm(w)
            assert rel < 0.01, (n, rel)
    # (b) greedy token agreement: run the model with weights replaced by
    # their dequantized int8 codes (the fused kernels scale the dot
    # OUTPUT — mathematically identical to contracting with these
    # dequantized weights)
    def dequant_params(p):
        import copy
        out = copy.deepcopy(jax.tree.map(lambda x: x, p))
        root = out["params"] if "params" in out else out
        for d in range(cfg.depth):
            blk = root[f"block_{d}"]
            for mod, key in (("attn1", "to_q"), ("attn1", "to_k"),
                             ("attn1", "to_v"), ("attn1", "to_out"),
                             ("attn2", "to_q"), ("attn2", "to_out"),
                             ("ff", "proj_in"), ("ff", "proj_out")):
                k = blk[mod][key]["kernel"].astype(jnp.float32)
                s = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=0, keepdims=True) / 127.0,
                    1e-12)
                kq = jnp.clip(jnp.round(k / s), -127, 127)
                blk[mod][key]["kernel"] = (
                    kq * s.astype(jnp.bfloat16).astype(jnp.float32))
        return out

    model = RARM(cfg)
    toks = jnp.asarray(np.random.default_rng(2).integers(
        0, 20, (8, 6)))
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (8, 3, 8)).astype(np.float32))
    logits_f32 = model.apply(params, toks, ctx)
    logits_q = model.apply(dequant_params(params), toks, ctx)
    agree = float(np.mean(
        np.argmax(np.asarray(logits_f32), -1)
        == np.argmax(np.asarray(logits_q), -1)))
    assert agree >= 0.95, agree


def test_rarm_int8_kv_agreement_on_converted_weights():
    """int8 KV-cache serving mode on converted torch weights (real
    weight distributions, not synthetic): greedy decode through the
    fused kernels with int8 per-(row, batch)-scaled caches must track
    the bf16-cache decode."""
    from rdm_tpu.models.rarm import RARM, RARMConfig, sample_tokens_fused
    from rdm_tpu.utils.torch_convert import convert_rarm_transformer

    torch.manual_seed(12)
    oracle = TRarm().eval()
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    cfg = RARMConfig(vocab_size=24, out_vocab=20, heads=2, head_dim=16,
                     depth=2, context_dim=8, seq_len=6, sos_token=23,
                     mask_token=22, code_side=2)
    params = convert_rarm_transformer(sd, cfg.depth)
    model = RARM(cfg, dtype=jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(7).standard_normal(
        (8, 3, 8)).astype(np.float32))
    ref = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(4),
                              top_k=1, interpret=True)
    kv = sample_tokens_fused(model, params, ctx, jax.random.PRNGKey(4),
                             top_k=1, int8_kv=True, interpret=True)
    agree = float((np.asarray(ref) == np.asarray(kv)).mean())
    assert agree >= 0.95, agree
