"""Visual training diagnostics — the reference `log_images` surface.

Produces the image grids the reference emits every N steps
(/root/reference/rdm/models/diffusion/ddpm.py:460-638 via ImageLogger,
main.py:541-656): inputs, first-stage reconstructions, the forward
diffusion row (q_sample at increasing t), the denoise row (pred_x0 along
the DDIM trajectory), and conditioned samples (EMA weights).

All outputs are uint8 HWC grids ready for PNG/TB writers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.models.autoencoder import VQModel
from rdm_tpu.models.rdm import RDM, flatten_neighbors
from rdm_tpu.ops.schedules import DiffusionSchedule, q_sample
from rdm_tpu.sampling import DDIMSamplerConfig, ddim_sample


def to_uint8(images) -> np.ndarray:
    x = np.clip((np.asarray(images, dtype=np.float32) + 1.0) / 2.0, 0, 1)
    return (x * 255).astype(np.uint8)


def make_grid(images: np.ndarray, n_per_row: int = 4) -> np.ndarray:
    """[N, H, W, C] uint8 → one [rows*H, cols*W, C] grid."""
    n, h, w, c = images.shape
    cols = min(n_per_row, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), dtype=images.dtype)
    for i, img in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    return grid


def _font(size: int):
    """Scalable font without a bundled TTF (the reference vendors
    data/DejaVuSans.ttf; Pillow's built-in scalable default replaces
    it). Falls back to the tiny bitmap font on very old Pillow."""
    from PIL import ImageFont

    try:
        return ImageFont.load_default(size=size)
    except TypeError:
        return ImageFont.load_default()


def log_txt_as_img(wh, texts, *, fontsize: int = 10) -> np.ndarray:
    """Render caption strings onto white tiles — the reference's
    conditioning visualization for caption/human_label batches
    (ldm.util.log_txt_as_img, used at
    /root/reference/rdm/models/diffusion/ddpm.py:524-529).
    Returns uint8 [B, H, W, 3]."""
    from PIL import Image, ImageDraw

    w, h = wh
    font = _font(fontsize)
    out = []
    for text in texts:
        img = Image.new("RGB", (w, h), color="white")
        draw = ImageDraw.Draw(img)
        n_chars = max(int(w / (fontsize * 0.6)), 1)
        lines = "\n".join(
            str(text)[i:i + n_chars]
            for i in range(0, len(str(text)), n_chars))
        draw.text((2, 2), lines, fill="black", font=font)
        out.append(np.asarray(img, np.uint8))
    return np.stack(out)


def neighbor_grid(batch, nn_key: str = "nn_patches",
                  label_key: str = None, max_images: int = None,
                  fontsize: int = 10) -> np.ndarray:
    """Retrieved-neighbor grid, k patches per row — the reference
    ImageNeighborPlotter
    (/root/reference/rdm/models/autoregression/transformer.py:534-547).
    With label_key (e.g. "human_label") each sample's rows get a caption
    strip rendered above them (the class-name captions the reference
    draws with its bundled DejaVuSans font). Returns one uint8 grid."""
    x = np.asarray(batch[nn_key], np.float32)
    if max_images is not None:
        x = x[:max_images]
    b, n, k, h, w, c = x.shape
    labels = None
    if label_key is not None and label_key in batch:
        labels = [str(l) for l in batch[label_key][:b]]
    rows = []
    for bi in range(b):
        patches = to_uint8(x[bi].reshape(n * k, h, w, c))
        g = make_grid(patches, k)
        if labels is not None:
            strip = log_txt_as_img((g.shape[1], fontsize + 6),
                                   [labels[bi]], fontsize=fontsize)[0]
            g = np.concatenate([strip, g], axis=0)
        rows.append(g)
    return np.concatenate(rows, axis=0)


def log_images(
    model: RDM,
    params,
    first_stage: VQModel,
    first_stage_params,
    schedule: DiffusionSchedule,
    batch: Dict[str, Any],
    rng: jax.Array,
    *,
    n_row: int = 4,
    max_images: int = 4,
    ddim_steps: int = 50,
    guidance_scale: float = 1.0,
    diffusion_row_steps: int = 6,
    with_denoise_row: bool = True,
    with_progressive_row: bool = False,
    with_inpaint: bool = True,
    with_x0_quantized: bool = True,
) -> Dict[str, np.ndarray]:
    """batch: {'image' [B,H,W,3] in [-1,1], 'nn_embeddings' [B,n,k,D]}.
    Returns named uint8 grids."""
    cfg = model.config
    images = jnp.asarray(batch["image"][:max_images], dtype=jnp.float32)
    nns = jnp.asarray(batch["nn_embeddings"][:max_images],
                      dtype=jnp.float32)
    out: Dict[str, np.ndarray] = {}
    out["inputs"] = make_grid(to_uint8(images), n_row)

    # conditioning visualizations (reference ddpm.py:524-529 + the
    # patch_plotter hook, transformer.py:513-517): captions/class names
    # as text tiles; retrieved neighbor patches as a labeled grid
    for key in ("caption", "human_label"):
        if key in batch:
            txt = log_txt_as_img(
                (images.shape[2], images.shape[1]),
                list(batch[key][:max_images]))
            out["conditioning"] = make_grid(txt, n_row)
            break
    if "nn_patches" in batch:
        out["neighbors"] = neighbor_grid(
            batch, label_key="human_label", max_images=max_images)

    # first-stage reconstruction
    z = first_stage.apply(first_stage_params, images,
                          method=VQModel.encode_prequant) * cfg.scale_factor
    decode = lambda lat: first_stage.apply(
        first_stage_params, lat / cfg.scale_factor,
        force_not_quantize=False, method=VQModel.decode)
    out["reconstruction"] = make_grid(to_uint8(decode(z)), n_row)

    # forward diffusion row: one input image noised at increasing t
    ts = np.linspace(0, cfg.timesteps - 1, diffusion_row_steps).astype(
        np.int32)
    noised = []
    for t in ts:
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, z[:1].shape, dtype=jnp.float32)
        zt = q_sample(schedule, z[:1], jnp.asarray([t]), noise)
        noised.append(to_uint8(decode(zt))[0])
    out["diffusion_row"] = make_grid(np.stack(noised),
                                     diffusion_row_steps)

    # conditioned samples (+ optional denoise row of pred_x0)
    context = flatten_neighbors(nns)
    sampler = DDIMSamplerConfig(
        num_steps=ddim_steps, guidance_scale=guidance_scale,
        log_every_t=max(ddim_steps // diffusion_row_steps, 1)
        if with_denoise_row else 0)
    uncond = None
    if guidance_scale != 1.0:
        uncond = model.apply(params, context.shape[0], context.shape[1],
                             0.0, method=RDM.uncond_context)
    rng, sub = jax.random.split(rng)
    z_samp, interm = ddim_sample(
        lambda x, t, c: model.apply(params, x, t, c),
        schedule, sampler,
        (context.shape[0], cfg.image_size, cfg.image_size, cfg.channels),
        context, sub, uncond_context=uncond)
    out["samples"] = make_grid(to_uint8(decode(z_samp)), n_row)
    if with_denoise_row and interm is not None:
        row = [to_uint8(decode(interm[i][:1]))[0]
               for i in range(interm.shape[0])]
        out["denoise_row"] = make_grid(np.stack(row), len(row))

    # quantize-denoised samples (reference log_images
    # quantize_denoised=True -> "samples_x0_quantized", ddpm.py:567-575):
    # pred-x0 snapped to the VQ codebook each DDIM step. The diffusion
    # latent is scale_factor * prequant, so unscale around the lookup.
    # the extra chains below don't read intermediates — drop the
    # denoise-row sampler's log_every_t so the scans skip the per-step
    # pred-x0 capture buffers entirely
    import dataclasses as _dc
    sampler_plain = _dc.replace(sampler, log_every_t=0)
    if with_x0_quantized:
        qfn = lambda x0: cfg.scale_factor * first_stage.apply(
            first_stage_params, x0 / cfg.scale_factor,
            method=VQModel.quantize_latent)
        rng, sub = jax.random.split(rng)
        z_q, _ = ddim_sample(
            lambda x, t, c: model.apply(params, x, t, c),
            schedule, sampler_plain,
            (context.shape[0], cfg.image_size, cfg.image_size,
             cfg.channels),
            context, sub, uncond_context=uncond, quantize_fn=qfn)
        out["samples_x0_quantized"] = make_grid(to_uint8(decode(z_q)),
                                                n_row)

    # inpaint/outpaint grids (reference ddpm.py:578-597): keep the
    # latent where mask==1, regenerate the center hole (inpaint) or its
    # complement (outpaint — the reference's outpaint block reuses the
    # inpaint mask verbatim, an apparent upstream copy-paste slip; the
    # inverted mask is what outpainting means)
    if with_inpaint:
        hh = ww = cfg.image_size
        mask = np.ones((z.shape[0], hh, ww, 1), np.float32)
        mask[:, hh // 4:3 * hh // 4, ww // 4:3 * ww // 4, :] = 0.0
        mask = jnp.asarray(mask)
        for name, m in (("samples_inpainting", mask),
                        ("samples_outpainting", 1.0 - mask)):
            rng, sub = jax.random.split(rng)
            z_m, _ = ddim_sample(
                lambda x, t, c: model.apply(params, x, t, c),
                schedule, sampler_plain,
                (context.shape[0], hh, ww, cfg.channels),
                context, sub, uncond_context=uncond, mask=m, x0=z)
            out[name] = make_grid(to_uint8(decode(z_m)), n_row)
        out["mask"] = make_grid(to_uint8(
            np.tile(np.asarray(mask) * 2.0 - 1.0, (1, 1, 1, 3))), n_row)

    # progressive row: pred-x0 along the full-T ANCESTRAL trajectory for
    # one image (reference progressive_denoising, ddpm.py:599-605) —
    # expensive (T model calls), off by default
    if with_progressive_row:
        from rdm_tpu.sampling import ddpm_sample

        rng, sub = jax.random.split(rng)
        every = max(cfg.timesteps // diffusion_row_steps, 1)
        _, prog = ddpm_sample(
            lambda x, t, c: model.apply(params, x, t, c),
            schedule,
            (1, cfg.image_size, cfg.image_size, cfg.channels),
            context[:1], sub, log_every_t=every)
        row = [to_uint8(decode(prog[i]))[0] for i in range(prog.shape[0])]
        out["progressive_row"] = make_grid(np.stack(row), len(row))
    return out


def log_images_rarm(
    model,
    params,
    first_stage,
    first_stage_params,
    batch: Dict[str, Any],
    rng: jax.Array,
    *,
    n_row: int = 4,
    max_images: int = 4,
    top_k: int = 256,
    masking_probs: tuple = (),
) -> Dict[str, np.ndarray]:
    """RARM visual diagnostics — the reference's full/half/reconstruction
    grids (transformer.py:422-519): inputs, first-stage reconstruction,
    full samples from scratch, half samples (the top half of the
    ground-truth token grid kept, bottom half regenerated), and — when
    `masking_probs` is non-empty (reference default [0.5, 1.0]) —
    samples with the retro conditioning mask-token-dropped at each p.
    """
    from rdm_tpu.models.autoencoder import VQModel
    from rdm_tpu.models.rarm import RARM, sample_tokens, top_k_filter

    cfg = model.config
    images = jnp.asarray(batch["image"][:max_images], dtype=jnp.float32)
    nns = jnp.asarray(batch["nn_embeddings"][:max_images],
                      dtype=jnp.float32)
    b = images.shape[0]
    if nns.ndim == 4:
        nns = nns.reshape(b, -1, nns.shape[-1])
    out: Dict[str, np.ndarray] = {}
    out["inputs"] = make_grid(to_uint8(images), n_row)

    _, _, idx = first_stage.apply(first_stage_params, images,
                                  method=VQModel.encode)
    side = cfg.code_side
    decode_code = lambda grid: first_stage.apply(
        first_stage_params, grid, method=VQModel.decode_code)
    out["reconstruction"] = make_grid(to_uint8(decode_code(idx)), n_row)

    rng, r1, r2 = jax.random.split(rng, 3)
    full = sample_tokens(model, params, nns, r1, top_k=top_k)
    out["samples_full"] = make_grid(
        to_uint8(decode_code(full.reshape(b, side, side))), n_row)

    # half sampling: keep the first half of the true tokens, regenerate
    # the rest with teacher-forced prefix
    flat = idx.reshape(b, -1)
    keep = cfg.seq_len // 2
    toks = flat[:, :keep]
    cache = model.apply(params, b, nns, method=RARM.init_cache)
    prefix = jnp.concatenate(
        [jnp.full((b, 1), cfg.sos_token, dtype=jnp.int32),
         toks.astype(jnp.int32)], axis=1)
    logits = None
    for pos in range(prefix.shape[1]):
        logits, cache = model.apply(params, prefix[:, pos],
                                    jnp.int32(pos), cache,
                                    method=RARM.decode_step)
    gen = [toks.astype(jnp.int32)]
    cur = jax.random.categorical(
        r2, top_k_filter(logits, min(top_k, cfg.out_vocab))).astype(
        jnp.int32)
    for pos in range(keep + 1, cfg.seq_len + 1):
        gen.append(cur[:, None])
        if pos == cfg.seq_len:
            break
        rng, sub = jax.random.split(rng)
        logits, cache = model.apply(params, cur, jnp.int32(pos), cache,
                                    method=RARM.decode_step)
        cur = jax.random.categorical(
            sub, top_k_filter(logits, min(top_k, cfg.out_vocab))).astype(
            jnp.int32)
    half = jnp.concatenate(gen, axis=1)
    out["samples_half"] = make_grid(
        to_uint8(decode_code(half.reshape(b, side, side))), n_row)

    # masked-neighbor samples (reference p_sample grids,
    # transformer.py:463-472): each retro-conditioning element replaced
    # by the mask token with prob p — p_mask_max is prepended when the
    # model trains with masking, mirroring the reference's list fixup
    probs = list(masking_probs)
    if cfg.p_mask_max and probs and probs[0] >= cfg.p_mask_max:
        probs = [cfg.p_mask_max] + probs
    for p in probs:
        rng, rm, rs = jax.random.split(rng, 3)
        r_masked = jnp.where(
            jax.random.bernoulli(rm, p, nns.shape),
            jnp.float32(cfg.mask_token), nns)
        toks_p = sample_tokens(model, params, r_masked, rs, top_k=top_k)
        out[f"samples_full_p_{p:.2f}"] = make_grid(
            to_uint8(decode_code(toks_p.reshape(b, side, side))), n_row)
    return out
