"""Sample-fidelity comparison of approximate serving modes vs the exact
bf16 sampler.

Shared harness behind scripts/quality_eval.py and the CI envelope tests:
quantifies what `--int8_weights` (ops/quant.py) and `--encoder_reuse N`
(Faster Diffusion, arXiv 2312.09608; rdm_tpu/sampling.py) cost in sample
quality, so users can pick a mode from data instead of vibes. The
reference has no counterpart (it serves one fp32 eager path,
/root/reference/rdm/models/diffusion/ddim.py) — these modes and their
gates are TPU-framework extras.

Metrics (all computed against the exact run on IDENTICAL seeds/noise):
- per-step pred_x0 cosine similarity (trajectory-level agreement),
- final-latent PSNR and final-image PSNR (pixel-level agreement),
- optional CLIP image-image similarity when CLIP weights are provided
  (perceptual-level agreement).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float) -> float:
    """Peak signal-to-noise ratio in dB over the given dynamic range."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    mse = float(np.mean(np.square(a - b)))
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom else 0.0


def per_step_cosine(traj_a: np.ndarray, traj_b: np.ndarray) -> np.ndarray:
    """Per-step cosine similarity of two pred_x0 trajectories
    [steps, B, ...] (log_every_t=1 sampler output)."""
    steps = min(len(traj_a), len(traj_b))
    return np.asarray([cosine(traj_a[i], traj_b[i])
                       for i in range(steps)], np.float32)


def clip_similarity(clip_model, clip_params, imgs_a: np.ndarray,
                    imgs_b: np.ndarray) -> float:
    """Mean CLIP image-image cosine between two uint8 image batches."""
    import jax.numpy as jnp

    from rdm_tpu.models.clip import CLIP, preprocess

    def embed(imgs):
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        e = clip_model.apply(clip_params, preprocess(x),
                             method=CLIP.encode_image)
        e = np.asarray(e, np.float32)
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    ea, eb = embed(imgs_a), embed(imgs_b)
    return float(np.mean(np.sum(ea * eb, axis=-1)))


def compare_runs(exact: Dict[str, np.ndarray],
                 variant: Dict[str, np.ndarray],
                 clip_model=None, clip_params=None) -> Dict[str, Any]:
    """Fidelity record for one approximate mode vs the exact run.

    Each run dict: {"z": final latents, "images": uint8 pixels,
    "traj": pred_x0 trajectory or None}. Latent PSNR uses the exact
    run's observed dynamic range; image PSNR uses 255.
    """
    out: Dict[str, Any] = {}
    z_e = np.asarray(exact["z"], np.float32)
    z_v = np.asarray(variant["z"], np.float32)
    z_range = float(z_e.max() - z_e.min()) or 1.0
    out["latent_psnr_db"] = round(psnr(z_e, z_v, z_range), 2)
    out["latent_cosine"] = round(cosine(z_e, z_v), 6)
    out["image_psnr_db"] = round(
        psnr(exact["images"], variant["images"], 255.0), 2)
    if exact.get("traj") is not None and variant.get("traj") is not None:
        sc = per_step_cosine(exact["traj"], variant["traj"])
        out["pred_x0_cosine_per_step"] = [round(float(c), 4) for c in sc]
        out["pred_x0_cosine_min"] = round(float(sc.min()), 4)
        out["pred_x0_cosine_final"] = round(float(sc[-1]), 4)
    if clip_model is not None and clip_params is not None:
        out["clip_similarity"] = round(clip_similarity(
            clip_model, clip_params, exact["images"], variant["images"]), 4)
    return out
