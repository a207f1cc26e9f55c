"""Generative-quality metrics: FID and improved precision/recall.

The reference ships only an unwired torch-fidelity adapter
(/root/reference/rdm/data/base.py:106-140 WrapForFID); the paper numbers
(README.md:150-165) came from external evaluation runs. This module makes
the evaluation harness first-class:

- `frechet_distance`: Fréchet distance between feature Gaussians — FID when
  the features are Inception pool3, "CLIP-FID" when they are CLIP image
  embeddings (the reference's FFHQ row explicitly uses CLIP features,
  README.md:155-157). Matrix sqrt via eigendecomposition (symmetrized
  product), float64.
- `precision_recall`: improved P/R (Kynkäänniemi et al. 2019): manifold
  radius = distance to the k-th NN within the same set; precision =
  fraction of generated samples inside the real manifold, recall = the
  reverse. Distances computed in blocks on device (one matmul per block).

Feature extraction runs through any embedder callable — typically
rdm_tpu.models.retrievers.ClipImageRetriever.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mean [D], covariance [D, D]) in float64."""
    f = np.asarray(features, dtype=np.float64)
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray) -> float:
    """||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1^1/2 C2 C1^1/2)^1/2).

    Uses the symmetrized form so the inner product stays PSD under
    floating-point noise (equivalent to tr sqrtm(C1 C2))."""
    diff = mu1 - mu2
    c1h = _sqrtm_psd(cov1)
    inner = _sqrtm_psd(c1h @ cov2 @ c1h)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(inner))


def fid_from_features(real: np.ndarray, generated: np.ndarray) -> float:
    return frechet_distance(*gaussian_stats(real),
                            *gaussian_stats(generated))


_PR_BLOCK = 2048


def _pad_rows(x: np.ndarray, block: int) -> np.ndarray:
    pad = (-len(x)) % block
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)])
    return x


@partial(jax.jit, static_argnames=("k",))
def _block_kth_nn(fb, start, f, sq, *, k):
    """k-th (excluding self) NN squared distance for one row block.

    fb [B, D] = rows start..start+B of f [N, D]; sq = rowwise ||f||^2.
    """
    d = (jnp.sum(fb * fb, 1)[:, None] + sq[None, :]
         - 2.0 * fb @ f.T)  # [B, N]
    row = start + jnp.arange(fb.shape[0])[:, None]
    d = jnp.where(jnp.arange(f.shape[0])[None, :] == row, jnp.inf,
                  jnp.maximum(d, 0.0))
    smallest = -jax.lax.top_k(-d, k)[0]  # k smallest, ascending last
    return smallest[:, k - 1]


@jax.jit
def _block_any_within(gb, f, sq, radii):
    """For each row of gb: is it within some f-point's radius?"""
    d = (jnp.sum(gb * gb, 1)[:, None] + sq[None, :] - 2.0 * gb @ f.T)
    return (jnp.maximum(d, 0.0) <= radii[None, :]).any(axis=1)


def _manifold_radii(feats: np.ndarray, nhood_size: int,
                    block: int = _PR_BLOCK) -> np.ndarray:
    """Distance to the k-th (excluding self) nearest neighbor per point.

    Blocked [B, N] device matmuls (one MXU dot + top_k per block) — the
    50k-sample FID protocol is minutes of O(N^2 D) work that a 1-core host
    cannot do in numpy. Features are passed as jit ARGUMENTS (never
    closures: big constants bake into the HLO)."""
    n = len(feats)
    f = jnp.asarray(np.asarray(feats, np.float32))
    sq = jnp.sum(f * f, axis=1)
    padded = _pad_rows(np.asarray(feats, np.float32), block)
    out = []
    for s in range(0, n, block):
        fb = jnp.asarray(padded[s:s + block])
        out.append(np.asarray(_block_kth_nn(fb, s, f, sq, k=nhood_size)))
    return np.concatenate(out)[:n]


def precision_recall(real: np.ndarray, generated: np.ndarray,
                     nhood_size: int = 3,
                     block: int = _PR_BLOCK) -> Tuple[float, float]:
    """Improved precision/recall over feature sets (Kynkäänniemi 2019).

    precision: fraction of generated samples lying inside at least one real
    sample's k-NN hypersphere; recall: the reverse. All pairwise work runs
    on device in row blocks.
    """
    radii_real = _manifold_radii(real, nhood_size, block)
    radii_gen = _manifold_radii(generated, nhood_size, block)

    def frac_within(points, manifold, radii):
        f = jnp.asarray(np.asarray(manifold, np.float32))
        sq = jnp.sum(f * f, axis=1)
        r = jnp.asarray(radii)
        n = len(points)
        padded = _pad_rows(np.asarray(points, np.float32), block)
        hits = []
        for s in range(0, n, block):
            gb = jnp.asarray(padded[s:s + block])
            hits.append(np.asarray(_block_any_within(gb, f, sq, r)))
        return float(np.concatenate(hits)[:n].mean())

    precision = frac_within(generated, real, radii_real)
    recall = frac_within(real, generated, radii_gen)
    return precision, recall


def evaluate_features(real: np.ndarray, generated: np.ndarray,
                      nhood_size: int = 3) -> dict:
    p, r = precision_recall(real, generated, nhood_size)
    return {"fid": fid_from_features(real, generated),
            "precision": p, "recall": r,
            "n_real": int(len(real)), "n_generated": int(len(generated))}


def features_from_images(images: Iterable[np.ndarray],
                         embedder: Callable,
                         batch_size: int = 64) -> np.ndarray:
    """Stream uint8/float images through an embedder in batches.

    images: iterable of HWC arrays (uint8 [0,255] or float [-1,1]).
    embedder: [B, H, W, 3] float [-1,1] → [B, D].
    """
    feats, buf = [], []
    for img in images:
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 127.5 - 1.0
        buf.append(arr)
        if len(buf) == batch_size:
            feats.append(np.asarray(embedder(np.stack(buf))))
            buf = []
    if buf:
        feats.append(np.asarray(embedder(np.stack(buf))))
    return np.concatenate(feats, axis=0)
