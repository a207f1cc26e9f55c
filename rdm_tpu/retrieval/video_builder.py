"""Video retrieval-database construction — VideoDatasetBuilder equivalent.

The reference's video variant (/root/reference/rdm/data/retrieval_dataset/
dsetbuilder.py:658-1072) shares the image builder's skeleton but embeds
fixed-length frame clips and records (video_id, frame_start, frame_end,
patch box) provenance. Same re-design here: clips are sampled host-side,
embedded on device (per-frame embedder mean-pooled, or a native clip
embedder), and accumulated into the standard DataPool npz layout with
patch_coords = [x1, y1, x2, y2] and an extra `frame_ranges` column.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from rdm_tpu.retrieval.database import DataPool


class VideoClipSampler:
    """Wraps a video dataset yielding {'video': [T, H, W, C] float [-1,1]}
    into fixed-length clips with random spatial crops."""

    def __init__(self, dset, clip_len: int = 16, patch_size: int = 128,
                 clips_per_video: int = 4, seed: int = 0):
        self.data = dset
        self.clip_len = clip_len
        self.patch_size = patch_size
        self.clips_per_video = clips_per_video
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        video = self.data[idx]["video"]
        t, h, w = video.shape[:3]
        clips, coords, ranges = [], [], []
        for _ in range(self.clips_per_video):
            t0 = int(self.rng.integers(0, max(t - self.clip_len, 0) + 1))
            y0 = int(self.rng.integers(0, max(h - self.patch_size, 0) + 1))
            x0 = int(self.rng.integers(0, max(w - self.patch_size, 0) + 1))
            clip = video[t0:t0 + self.clip_len,
                         y0:y0 + self.patch_size,
                         x0:x0 + self.patch_size]
            # pad short/narrow videos
            pad = [(0, self.clip_len - clip.shape[0]),
                   (0, self.patch_size - clip.shape[1]),
                   (0, self.patch_size - clip.shape[2]), (0, 0)]
            clips.append(np.pad(clip, pad))
            coords.append([x0, y0, x0 + self.patch_size,
                           y0 + self.patch_size])
            ranges.append([t0, t0 + self.clip_len])
        return {
            "clip": np.stack(clips),  # [n, T, ps, ps, C]
            "patch_coords": np.asarray(coords, dtype=int),
            "frame_ranges": np.asarray(ranges, dtype=int),
            "img_id": np.full((len(clips),), idx, dtype=int),
        }


class VideoDatasetBuilder:
    """Builds a clip-level embedding pool. `embedder` maps frames
    [N, ps, ps, C] → [N, D]; clip embedding = mean over frames (the
    reference's frame-aggregation strategy), unless `clip_embedder` is
    given ([N, T, ps, ps, C] → [N, D])."""

    def __init__(self, sampler: VideoClipSampler,
                 embedder: Optional[Callable] = None,
                 clip_embedder: Optional[Callable] = None,
                 save_dir: Optional[str] = None,
                 batch_size: int = 8):
        assert embedder is not None or clip_embedder is not None
        self.sampler = sampler
        self.embedder = embedder
        self.clip_embedder = clip_embedder
        self.save_dir = save_dir
        self.batch_size = batch_size
        self.pool: Optional[DataPool] = None
        self.frame_ranges: Optional[np.ndarray] = None

    def _embed_clips(self, clips: np.ndarray) -> np.ndarray:
        n, t = clips.shape[:2]
        if self.clip_embedder is not None:
            return np.asarray(self.clip_embedder(clips))
        flat = clips.reshape((n * t,) + clips.shape[2:])
        emb = np.asarray(self.embedder(flat))
        return emb.reshape(n, t, -1).mean(axis=1)

    def build_data_pool(self) -> DataPool:
        embs, ids, coords, ranges = [], [], [], []
        for idx in range(len(self.sampler)):
            item = self.sampler[idx]
            embs.append(self._embed_clips(item["clip"]))
            ids.append(item["img_id"])
            coords.append(item["patch_coords"])
            ranges.append(item["frame_ranges"])
        self.pool = DataPool(
            embeddings=np.concatenate(embs).astype(np.float32),
            img_ids=np.concatenate(ids),
            patch_coords=np.concatenate(coords))
        self.frame_ranges = np.concatenate(ranges)
        if self.save_dir:
            files = self.pool.save(self.save_dir)
            np.save(os.path.join(self.save_dir, "frame_ranges.npy"),
                    self.frame_ranges)
        return self.pool
