"""BSR-style image degradation for blind super-resolution training pairs.

The reference's SuperresOpenImages datasets degrade HR crops with
`ldm.modules.image_degradation.degradation_fn_bsr{,_light}` (reference
rdm/data/openimages.py:14-15, 315-318) — the BSRGAN practical degradation
model (Zhang et al. 2021): a randomly ORDERED composition of isotropic /
anisotropic Gaussian blur, multi-step random-interpolation downsampling,
additive Gaussian noise, and JPEG compression, followed by a final resize
to the target LR size.

This is a from-scratch numpy/scipy/PIL implementation of that public
algorithm (no cv2/albumentations in this image). The "light" variant uses
the milder parameter ranges of `degradation_fn_bsr_light`.

All functions take and return float32 HWC images in [0, 1].
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np
from PIL import Image
from scipy import ndimage

_PIL_METHODS = (Image.NEAREST, Image.BILINEAR, Image.BICUBIC)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def _from_uint8(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 255.0


def _resize01(img: np.ndarray, hw, method) -> np.ndarray:
    h, w = hw
    pil = Image.fromarray(_to_uint8(img)).resize((w, h), method)
    return _from_uint8(np.asarray(pil))


def anisotropic_gaussian_kernel(sigma_x: float, sigma_y: float,
                                theta: float, ksize: int = 21
                                ) -> np.ndarray:
    """2-D Gaussian kernel with principal-axis stds (sigma_x, sigma_y)
    rotated by theta — the BSRGAN blur family."""
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    c, s = np.cos(theta), np.sin(theta)
    xr = c * xx + s * yy
    yr = -s * xx + c * yy
    k = np.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    return (k / k.sum()).astype(np.float32)


def random_blur(img: np.ndarray, rng: np.random.Generator,
                light: bool = False) -> np.ndarray:
    hi = 1.2 if light else 2.4
    if rng.random() < 0.5:  # isotropic
        sigma = float(rng.uniform(0.1, hi))
        k = anisotropic_gaussian_kernel(sigma, sigma, 0.0)
    else:  # anisotropic
        sx = float(rng.uniform(0.2, hi))
        sy = float(rng.uniform(0.2, hi))
        theta = float(rng.uniform(0.0, np.pi))
        k = anisotropic_gaussian_kernel(sx, sy, theta)
    out = np.stack([ndimage.convolve(img[..., c], k, mode="nearest")
                    for c in range(img.shape[-1])], axis=-1)
    return out.astype(np.float32)


def random_downsample(img: np.ndarray, rng: np.random.Generator,
                      sf: int) -> np.ndarray:
    """Downscale by a random factor in [1, sf] with a random
    interpolation — one of BSRGAN's two downsampling stages."""
    h, w = img.shape[:2]
    factor = float(rng.uniform(1.0, sf))
    nh = max(int(round(h / factor)), h // sf)
    nw = max(int(round(w / factor)), w // sf)
    method = _PIL_METHODS[int(rng.integers(len(_PIL_METHODS)))]
    return _resize01(img, (nh, nw), method)


def add_gaussian_noise(img: np.ndarray, rng: np.random.Generator,
                       light: bool = False) -> np.ndarray:
    hi = 8.0 if light else 25.0
    sigma = float(rng.uniform(1.0, hi)) / 255.0
    if rng.random() < 0.4:  # channel-correlated (gray) noise
        noise = rng.standard_normal(img.shape[:2] + (1,))
    else:
        noise = rng.standard_normal(img.shape)
    return np.clip(img + sigma * noise.astype(np.float32), 0.0,
                   1.0).astype(np.float32)


def jpeg_compress(img: np.ndarray, rng: np.random.Generator,
                  light: bool = False) -> np.ndarray:
    lo = 60 if light else 30
    quality = int(rng.integers(lo, 96))
    buf = io.BytesIO()
    Image.fromarray(_to_uint8(img)).save(buf, format="JPEG",
                                         quality=quality)
    buf.seek(0)
    return _from_uint8(np.asarray(Image.open(buf).convert("RGB")))


def degradation_bsr(hr: np.ndarray, sf: int = 4,
                    rng: Optional[np.random.Generator] = None,
                    light: bool = False) -> np.ndarray:
    """HR [H, W, 3] float [0,1] → degraded LR [H/sf, W/sf, 3].

    Randomly ordered {blur, blur, downsample, noise} pipeline, JPEG noise
    applied at a random position or at the end (as in BSRGAN), then a
    final resize to exactly H/sf x W/sf.
    """
    rng = rng or np.random.default_rng()
    h, w = hr.shape[:2]
    img = hr.astype(np.float32)
    ops = [lambda x: random_blur(x, rng, light),
           lambda x: random_blur(x, rng, light),
           lambda x: random_downsample(x, rng, sf),
           lambda x: add_gaussian_noise(x, rng, light)]
    order = rng.permutation(len(ops))
    jpeg_at_end = rng.random() < 0.75
    jpeg_pos = None if jpeg_at_end else int(rng.integers(len(ops) + 1))
    for i, idx in enumerate(order):
        if jpeg_pos is not None and i == jpeg_pos:
            img = jpeg_compress(img, rng, light)
        img = ops[idx](img)
    img = _resize01(img, (h // sf, w // sf), Image.BICUBIC)
    if jpeg_at_end or jpeg_pos == len(ops):
        img = jpeg_compress(img, rng, light)
    return img


def degradation_fn_bsr(hr: np.ndarray, sf: int = 4,
                       rng: Optional[np.random.Generator] = None
                       ) -> np.ndarray:
    return degradation_bsr(hr, sf=sf, rng=rng, light=False)


def degradation_fn_bsr_light(hr: np.ndarray, sf: int = 4,
                             rng: Optional[np.random.Generator] = None
                             ) -> np.ndarray:
    return degradation_bsr(hr, sf=sf, rng=rng, light=True)
