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

from typing import Callable, Iterable, Optional, Tuple

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


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray,
                       block: int = 4096) -> np.ndarray:
    """[N, D] x [M, D] → [N, M] squared euclidean, blocked matmuls."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    a2 = (a ** 2).sum(1)[:, None]
    b2 = (b ** 2).sum(1)[None, :]
    out = np.empty((a.shape[0], b.shape[0]), dtype=np.float32)
    for s in range(0, a.shape[0], block):
        e = min(s + block, a.shape[0])
        out[s:e] = a2[s:e] + b2 - 2.0 * (a[s:e] @ b.T)
    return np.maximum(out, 0.0)


def _manifold_radii(feats: np.ndarray, nhood_size: int) -> np.ndarray:
    """Distance to the k-th (excluding self) nearest neighbor per point."""
    d = _pairwise_sq_dists(feats, feats)
    np.fill_diagonal(d, np.inf)
    return np.partition(d, nhood_size - 1, axis=1)[:, nhood_size - 1]


def precision_recall(real: np.ndarray, generated: np.ndarray,
                     nhood_size: int = 3) -> Tuple[float, float]:
    """Improved precision/recall over feature sets.

    precision: fraction of generated samples lying inside at least one real
    sample's k-NN hypersphere; recall: the reverse.
    """
    radii_real = _manifold_radii(real, nhood_size)
    radii_gen = _manifold_radii(generated, nhood_size)
    d_gr = _pairwise_sq_dists(generated, real)  # [G, R]
    precision = float((d_gr <= radii_real[None, :]).any(axis=1).mean())
    recall = float((d_gr.T <= radii_gen[None, :]).any(axis=1).mean())
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
