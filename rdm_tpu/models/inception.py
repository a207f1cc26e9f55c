"""FID InceptionV3 feature extractor (pool3, 2048-d), TPU-native.

The reference's published ImageNet FID/P/R numbers (README.md:150-165) were
computed with torch-fidelity (environment.yaml), i.e. Inception pool3
features from the TF-ported "2015-12-05" InceptionV3 — NOT CLIP features
(only the FFHQ row is CLIP-FID). This module re-implements that exact
network in flax/NHWC so `scripts/evaluate.py --features inception` produces
numbers comparable to the paper protocol, with weights converted from the
public pytorch-fid checkpoint (pt_inception-2015-12-05-6726825d.pth) by
`rdm_tpu.utils.torch_convert.convert_inception`.

Architecture: torchvision InceptionV3 with the pytorch-fid patches
(FIDInceptionA/C/E): average-pool branches use count_include_pad=False and
Mixed_7c's pool branch is a max pool. Submodule names mirror the torch
state-dict paths (Mixed_5b.branch1x1.conv/...) so conversion is mechanical.

Inference contract: `pool3_features(images)` takes float images in [-1, 1],
NHWC, any spatial size; resizes to 299x299 bilinear (no antialias, matching
torch F.interpolate defaults) and returns [B, 2048] float32 features.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv2d(nn.Module):
    """conv (no bias) -> BN(eps 1e-3, running stats) -> relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3(x):
    """3x3 stride-1 average pool, pad 1, count_include_pad=False — the
    pytorch-fid FIDInception* patch."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, pad, name: BasicConv2d(
            f, k, padding=pad, dtype=self.dtype, name=name)
        b1 = c(64, (1, 1), ((0, 0), (0, 0)), "branch1x1")(x)
        b5 = c(48, (1, 1), ((0, 0), (0, 0)), "branch5x5_1")(x)
        b5 = c(64, (5, 5), ((2, 2), (2, 2)), "branch5x5_2")(b5)
        b3 = c(64, (1, 1), ((0, 0), (0, 0)), "branch3x3dbl_1")(x)
        b3 = c(96, (3, 3), ((1, 1), (1, 1)), "branch3x3dbl_2")(b3)
        b3 = c(96, (3, 3), ((1, 1), (1, 1)), "branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3(x)
        bp = c(self.pool_features, (1, 1), ((0, 0), (0, 0)),
               "branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, s, pad, name: BasicConv2d(
            f, k, strides=s, padding=pad, dtype=self.dtype, name=name)
        b3 = c(384, (3, 3), (2, 2), ((0, 0), (0, 0)), "branch3x3")(x)
        bd = c(64, (1, 1), (1, 1), ((0, 0), (0, 0)), "branch3x3dbl_1")(x)
        bd = c(96, (3, 3), (1, 1), ((1, 1), (1, 1)), "branch3x3dbl_2")(bd)
        bd = c(96, (3, 3), (2, 2), ((0, 0), (0, 0)), "branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        c = lambda f, k, pad, name: BasicConv2d(
            f, k, padding=pad, dtype=self.dtype, name=name)
        p17 = ((0, 0), (3, 3))  # (1,7) kernel
        p71 = ((3, 3), (0, 0))  # (7,1) kernel
        p0 = ((0, 0), (0, 0))
        b1 = c(192, (1, 1), p0, "branch1x1")(x)
        b7 = c(c7, (1, 1), p0, "branch7x7_1")(x)
        b7 = c(c7, (1, 7), p17, "branch7x7_2")(b7)
        b7 = c(192, (7, 1), p71, "branch7x7_3")(b7)
        bd = c(c7, (1, 1), p0, "branch7x7dbl_1")(x)
        bd = c(c7, (7, 1), p71, "branch7x7dbl_2")(bd)
        bd = c(c7, (1, 7), p17, "branch7x7dbl_3")(bd)
        bd = c(c7, (7, 1), p71, "branch7x7dbl_4")(bd)
        bd = c(192, (1, 7), p17, "branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x)
        bp = c(192, (1, 1), p0, "branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, s, pad, name: BasicConv2d(
            f, k, strides=s, padding=pad, dtype=self.dtype, name=name)
        p0 = ((0, 0), (0, 0))
        b3 = c(192, (1, 1), (1, 1), p0, "branch3x3_1")(x)
        b3 = c(320, (3, 3), (2, 2), p0, "branch3x3_2")(b3)
        b7 = c(192, (1, 1), (1, 1), p0, "branch7x7x3_1")(x)
        b7 = c(192, (1, 7), (1, 1), ((0, 0), (3, 3)), "branch7x7x3_2")(b7)
        b7 = c(192, (7, 1), (1, 1), ((3, 3), (0, 0)), "branch7x7x3_3")(b7)
        b7 = c(192, (3, 3), (2, 2), p0, "branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # Mixed_7b: "avg" (FID patch), Mixed_7c: "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, pad, name: BasicConv2d(
            f, k, padding=pad, dtype=self.dtype, name=name)
        p0 = ((0, 0), (0, 0))
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = c(320, (1, 1), p0, "branch1x1")(x)
        b3 = c(384, (1, 1), p0, "branch3x3_1")(x)
        b3 = jnp.concatenate([
            c(384, (1, 3), p13, "branch3x3_2a")(b3),
            c(384, (3, 1), p31, "branch3x3_2b")(b3)], axis=-1)
        bd = c(448, (1, 1), p0, "branch3x3dbl_1")(x)
        bd = c(384, (3, 3), ((1, 1), (1, 1)), "branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            c(384, (1, 3), p13, "branch3x3dbl_3a")(bd),
            c(384, (3, 1), p31, "branch3x3dbl_3b")(bd)], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3(x)
        bp = c(192, (1, 1), p0, "branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """pool3 feature trunk of the FID InceptionV3 (no aux head, no fc)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, 299, 299, 3] float in [-1, 1] -> [B, 2048] float32."""
        d = self.dtype
        p0 = ((0, 0), (0, 0))
        p1 = ((1, 1), (1, 1))
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), (2, 2), p0, d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), (1, 1), p0, d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), (1, 1), p1, d, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), (1, 1), p0, d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), (1, 1), p0, d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, d, name="Mixed_5b")(x)
        x = InceptionA(64, d, name="Mixed_5c")(x)
        x = InceptionA(64, d, name="Mixed_5d")(x)
        x = InceptionB(d, name="Mixed_6a")(x)
        x = InceptionC(128, d, name="Mixed_6b")(x)
        x = InceptionC(160, d, name="Mixed_6c")(x)
        x = InceptionC(160, d, name="Mixed_6d")(x)
        x = InceptionC(192, d, name="Mixed_6e")(x)
        x = InceptionD(d, name="Mixed_7a")(x)
        x = InceptionE("avg", d, name="Mixed_7b")(x)
        x = InceptionE("max", d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg


def resize_bilinear_299(images: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(size=299, mode='bilinear', align_corners=False,
    antialias=False) equivalent."""
    b, _, _, c = images.shape
    return jax.image.resize(images.astype(jnp.float32), (b, 299, 299, c),
                            method="bilinear", antialias=False)


class InceptionEmbedder:
    """Callable embedder for eval.metrics.features_from_images: float
    [-1, 1] NHWC images -> [B, 2048] pool3 features."""

    def __init__(self, variables, dtype=jnp.float32):
        self.model = InceptionV3(dtype=dtype)
        self.variables = variables
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, resize_bilinear_299(x)))

    def __call__(self, images):
        return self._apply(self.variables, jnp.asarray(images))
