"""Host-side data layer: image loading, patch sampling, neighbor joins.

Pure numpy + PIL (the reference leans on albumentations/cv2/kornia —
/root/reference/rdm/data/base.py:313, :357-401 — none of which exist here;
PIL bicubic reproduces the same geometry). Feeds numpy batches to the
jit-compiled device path; no torch on the data path (a torch DataLoader is
used opportunistically for multiprocess prefetch when available).

Reimplemented semantics (file:line into the reference):
- ImagePaths: file list → float32 [-1,1] HWC with smallest-max-size resize +
  center crop (base.py:1110-1174).
- PatcherDataset: random / aligned / annotation patch sampling with
  aspect-preserving resize + pad to patch_size (base.py:273-512).
- QueryDataset: training-time join of images and precomputed neighbor
  pickles keyed by n_patches_per_side, with corrupt-id resampling and
  k-slicing (base.py:826-1048).
- SubsetShard: per-rank strided subsets with label-range filtering — the
  SubsetSampler equivalent (base.py:143-248).
- dict_collation_fn: key-wise numpy stacking (rdm/data/util.py:57-95).
"""

from __future__ import annotations

import bisect
import glob as globlib
import os
import pickle
import random
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# image geometry helpers (albumentations equivalents)
# ---------------------------------------------------------------------------

def smallest_max_size(img: np.ndarray, size: int,
                      resample=Image.BICUBIC) -> np.ndarray:
    """Resize so the smaller side == size, preserving aspect ratio."""
    h, w = img.shape[:2]
    if min(h, w) == size:
        return img
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    return _resize(img, (nh, nw), resample)


def center_crop(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = img.shape[:2]
    y = max((h - ch) // 2, 0)
    x = max((w - cw) // 2, 0)
    return img[y:y + ch, x:x + cw]


def _resize(img: np.ndarray, hw: Tuple[int, int], resample=Image.BICUBIC
            ) -> np.ndarray:
    """float [-1,1] or uint8 HWC resize via PIL (per-channel for float)."""
    h, w = hw
    if img.dtype == np.uint8:
        return np.asarray(Image.fromarray(img).resize((w, h), resample))
    out = np.stack(
        [np.asarray(Image.fromarray(img[..., c], mode="F").resize(
            (w, h), resample)) for c in range(img.shape[-1])], axis=-1)
    return out.astype(img.dtype)


def load_image(path: str, size: Optional[int] = None) -> np.ndarray:
    """→ float32 [-1, 1] HWC RGB; optional smallest-max-size + center crop
    to a square `size` (the reference's canonical preprocessing)."""
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if size is not None:
        arr = smallest_max_size(arr, size)
        arr = center_crop(arr, size, size)
    return (arr.astype(np.float32) / 127.5) - 1.0


# ---------------------------------------------------------------------------
# datasets (plain __len__/__getitem__ protocol)
# ---------------------------------------------------------------------------

class ImagePaths:
    def __init__(self, paths: Sequence[str], size: Optional[int] = None,
                 labels: Optional[Dict[str, Sequence[Any]]] = None):
        self.paths = list(paths)
        self.size = size
        self.labels = labels or {}

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        out = {"image": load_image(self.paths[idx], self.size),
               "file_path_": self.paths[idx]}
        for k, v in self.labels.items():
            out[k] = v[idx]
        return out


class PatcherDataset:
    """Samples patches from a base dataset for retrieval-db construction.

    sampling_method: "random" (n_patches random crops), "aligned" (regular
    grid of patches_per_side²), or "annotation" (per-image bbox list under
    data['annotations'] as (x, y, w, h) fractions).
    """

    def __init__(self, dset, patch_size: int, img_size=None,
                 n_patches: Union[int, Sequence[int]] = 10,
                 sampling_method: str = "random",
                 keys: Optional[Sequence[str]] = None,
                 min_aspect_ratio: Optional[float] = None,
                 min_patch_size: Optional[int] = None,
                 patches_per_side: Union[int, Tuple[int, int]] = 1,
                 seed: Optional[int] = None):
        if sampling_method not in ("random", "aligned", "annotation"):
            raise NotImplementedError(sampling_method)
        self.data = dset
        self.patch_size = patch_size
        self.img_size = img_size
        self.n_patches = n_patches
        self.sampling_method = sampling_method
        self.keys = keys
        self.min_aspect_ratio = min_aspect_ratio or (1 / 224)
        self.min_patch_size = min_patch_size or 1
        if isinstance(patches_per_side, int):
            patches_per_side = (patches_per_side, patches_per_side)
        self.patches_per_side = patches_per_side
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.data)

    def get_patch(self, image: np.ndarray, bbox) -> np.ndarray:
        """Crop bbox, aspect-preserving bicubic resize so the longer side is
        patch_size, then zero-pad the shorter side symmetrically
        (base.py:357-401 semantics, "constant" padding mode)."""
        x_tl, y_tl, x_br, y_br = [int(v) for v in bbox]
        patch = image[y_tl:y_br, x_tl:x_br]
        ph, pw = patch.shape[:2]
        if pw == self.patch_size and ph == self.patch_size:
            return patch
        smaller = (min(ph, pw) * self.patch_size) // max(ph, pw)
        diff = self.patch_size - smaller
        if ph >= pw:
            patch = _resize(patch, (self.patch_size, smaller))
            pad = ((0, 0), (diff - diff // 2, diff // 2), (0, 0))
        else:
            patch = _resize(patch, (smaller, self.patch_size))
            pad = ((diff - diff // 2, diff // 2), (0, 0), (0, 0))
        patch = np.pad(patch, pad)
        return np.clip(patch, -1.0, 1.0)

    def _random_coords(self, h: int, w: int) -> Tuple[int, int]:
        y1 = int((h - self.patch_size) * self.rng.random())
        x1 = int((w - self.patch_size) * self.rng.random())
        return x1, y1

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        data = dict(self.data[idx])
        image = data["image"]
        h, w = image.shape[:2]
        smaller = min(h, w)
        coordinates: List[np.ndarray] = []

        if self.sampling_method == "random":
            if isinstance(self.n_patches, int):
                if self.patch_size >= smaller:
                    n_patches = 1
                    image = smallest_max_size(image, self.patch_size)
                    h, w = image.shape[:2]
                elif smaller < np.sqrt(self.n_patches) * self.patch_size:
                    n_patches = int((smaller // self.patch_size) ** 2)
                else:
                    n_patches = self.n_patches
            else:
                n_patches = int(self.n_patches[idx])
            for _ in range(n_patches):
                x1, y1 = self._random_coords(h, w)
                coordinates.append(np.asarray(
                    [x1, y1, x1 + self.patch_size, y1 + self.patch_size],
                    dtype=int))
        elif self.sampling_method == "aligned":
            px, py = self.patches_per_side
            dw, dh = w // px, h // py
            for i in range(px):
                for j in range(py):
                    coordinates.append(np.asarray(
                        [i * dw, j * dh, (i + 1) * dw, (j + 1) * dh],
                        dtype=int))
        else:  # annotation
            for annot in data["annotations"]:
                x_tl, y_tl, bw, bh = annot["bbox"] if isinstance(
                    annot, dict) else annot.bbox
                x_tl, y_tl = x_tl * w, y_tl * h
                x_br, y_br = int(x_tl + bw * w), int(y_tl + bh * h)
                x_tl, y_tl = int(x_tl), int(y_tl)
                pw, ph = x_br - x_tl, y_br - y_tl
                if max(pw, ph) < self.min_patch_size:
                    continue
                if min(ph, pw) / max(ph, pw) <= self.min_aspect_ratio:
                    continue
                coordinates.append(np.asarray([x_tl, y_tl, x_br, y_br],
                                              dtype=int))
            if not coordinates:
                # fall back to the largest centered square
                if w > h:
                    coords = [(w - h) // 2, 0, w - (w - h) // 2, h]
                elif h > w:
                    coords = [0, (h - w) // 2, w, h - (h - w) // 2]
                else:
                    coords = [0, 0, w, h]
                coordinates.append(np.asarray(coords, dtype=int))

        patches = np.stack([self.get_patch(image, b) for b in coordinates])
        coords = np.stack(coordinates)
        data.update({
            "patch": patches,
            "patch_coords": coords,
            "img_id": np.full((patches.shape[0],), idx, dtype=int),
        })
        if self.keys is not None:
            data = {k: data[k] for k in self.keys}
        return data


class QueryDataset:
    """Join of a base image dataset with precomputed neighbor pickles.

    nns: a pickle file mapping idx → relative neighbor-file path, or a
    directory containing `nn_paths_p*.p` shards (the output of
    scripts/search_neighbors.py). Each neighbor file holds
    {n_patches_per_side: {'embeddings' [n,k,D], 'img_ids', 'patch_coords',
    'nn_ids'}}. corrupts.txt ids are resampled away.

    Pixel neighbors (reference base.py:945-1026): with load_patches=True
    the sample additionally carries `nn_patches` [p², k, h, w, 3] float
    [-1,1] — either from the pre-saved PNGs indexed by
    `nns-{p²}_patches.p` (search_neighbors --save_patches pass 2), or by
    live re-crop from `rset` (the retrieval-side image dataset) using the
    stored (img_id, patch_coords).
    """

    def __init__(self, dset, nns: Optional[str] = None,
                 n_patches_per_side: int = 1, k: Optional[int] = None,
                 debug: bool = False, seed: Optional[int] = None,
                 load_patches: bool = False, rset=None):
        self.data = dset
        self.n_patches_per_side = n_patches_per_side
        self.k_nearest = k
        self.is_debug = debug
        self.nn_paths: Optional[Dict[int, str]] = None
        self.corrupt_ids: List[int] = []
        self.rng = np.random.default_rng(seed)
        self.load_patches = load_patches
        self.rset = rset
        self.patches_loaded = False
        self.patch_paths: Optional[Dict[int, np.ndarray]] = None
        if nns:
            if os.path.isdir(nns):
                self.basepath = nns
                shards = sorted(globlib.glob(
                    os.path.join(nns, "nn_paths_p*.p")))
                if not shards:
                    raise FileNotFoundError(
                        f"no nn_paths shards under {nns}")
                self.nn_paths = {}
                for s in shards:
                    with open(s, "rb") as f:
                        self.nn_paths.update(pickle.load(f))
            else:
                self.basepath = os.path.dirname(nns)
                with open(nns, "rb") as f:
                    self.nn_paths = pickle.load(f)
            if self.load_patches:
                patches_file = os.path.join(
                    self.basepath,
                    f"nns-{self.n_patches_per_side ** 2}_patches.p")
                if os.path.isfile(patches_file):
                    with open(patches_file, "rb") as f:
                        self.patch_paths = pickle.load(f)
                    self.patches_loaded = True
                elif self.rset is None:
                    raise ValueError(
                        "load_patches=True but neither a precomputed "
                        f"{patches_file} nor an rset for live re-crop "
                        "was provided")
            corrupts = os.path.join(self.basepath, "corrupts.txt")
            if os.path.isfile(corrupts):
                with open(corrupts) as f:
                    self.corrupt_ids = [int(l.strip()) for l in f if
                                        l.strip()]
                for cid in self.corrupt_ids:
                    self.nn_paths.pop(cid, None)
                    if self.patch_paths is not None:
                        self.patch_paths.pop(cid, None)

    def __len__(self):
        return len(self.data)

    def get_subset_by_label_range(self, label_range):
        """Delegate to the wrapped dataset (reference base.py:941-943) so
        SubsetShard label filtering works through the neighbor join."""
        return self.data.get_subset_by_label_range(label_range=label_range)

    def get_patches(self, idx: int) -> np.ndarray:
        """Pre-saved neighbor PNGs → [p², k, h, w, 3] float [-1,1]
        (reference base.py:949-958)."""
        rels = self.patch_paths[idx]
        patches = []
        for rel in rels:
            img = Image.open(os.path.join(self.basepath, rel)).convert(
                "RGB")
            patches.append(
                np.asarray(img, dtype=np.float32) / 127.5 - 1.0)
        n = self.n_patches_per_side ** 2
        return np.stack(patches).reshape(n, -1, *patches[0].shape)

    def crop_patches(self, nns: Dict[str, np.ndarray]) -> np.ndarray:
        """Live re-crop from the retrieval dataset by (img_id,
        patch_coords) (reference base.py:997-1026)."""
        img_ids = np.asarray(nns["img_ids"]).reshape(-1)
        coords = np.asarray(nns["patch_coords"]).reshape(-1, 4)
        patches = []
        for img_id, (x1, y1, x2, y2) in zip(img_ids, coords):
            image = self.rset[int(img_id)]["image"]
            patches.append(image[int(y1):int(y2), int(x1):int(x2)])
        k = np.asarray(nns["img_ids"]).shape[-1]
        out = np.stack(patches)
        return out.reshape(-1, k, *out.shape[1:])

    def load_nns(self, idx: int) -> Dict[str, np.ndarray]:
        fname = os.path.join(self.basepath, self.nn_paths[idx])
        with open(fname, "rb") as f:
            nns = pickle.load(f)[self.n_patches_per_side]
        return nns

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.corrupt_ids and idx in self.corrupt_ids:
            idx = int(self.rng.choice(list(self.nn_paths.keys())))
        out = dict(self.data[idx])
        if self.nn_paths is not None:
            try:
                nns = self.load_nns(idx)
            except Exception:
                if not self.is_debug:
                    raise
                k = self.k_nearest or 4
                n = self.n_patches_per_side ** 2
                nns = {
                    "embeddings": self.rng.random((n, k, 512)),
                    "img_ids": self.rng.integers(0, len(self.data), (n, k)),
                    "patch_coords": np.tile(
                        np.asarray([0, 0, 128, 128]), (n, k, 1)),
                }
            if self.k_nearest:
                nns = {key: v[:, :self.k_nearest]
                       for key, v in nns.items() if key != "nn_patches"}
            if self.load_patches:
                if self.patches_loaded:
                    nn_patches = self.get_patches(idx)
                else:
                    nn_patches = self.crop_patches(nns)
                if self.k_nearest:
                    nn_patches = nn_patches[:, :self.k_nearest]
                out["nn_patches"] = nn_patches.astype(np.float32)
            out["nn_embeddings"] = np.asarray(nns["embeddings"],
                                              dtype=np.float32)
            if "img_ids" in nns:
                out["nn_img_ids"] = nns["img_ids"]
        if "image" in out:
            image = out["image"]
            side = image.shape[0]
            ps = side // self.n_patches_per_side
            patches = [
                image[r * ps:(r + 1) * ps, c * ps:(c + 1) * ps]
                for r in range(self.n_patches_per_side)
                for c in range(self.n_patches_per_side)]
            out["patches"] = np.stack(patches)
        return out


class NNMemoryDataset:
    """Data-pool ids → self-search neighbor patches, with retry-on-bad-id
    (reference base.py:43-104): given a DatasetBuilder (pool + searcher +
    source patch dataset) and a pool index, embed the stored query row,
    search its k nearest neighbors, and re-crop their pixels. Bad ids are
    quarantined and a replacement drawn from `ids` up to max_trials times
    (debug=True substitutes random embeddings instead).
    """

    def __init__(self, builder, k_nn: int, ids: Optional[Sequence[int]]
                 = None, debug: bool = False, max_trials: int = 10,
                 seed: Optional[int] = None):
        self.builder = builder
        self.k_nn = k_nn
        self.ids = list(ids) if ids is not None else None
        self.is_debug = debug
        self.max_trials = max_trials
        self.invalids: set = set()
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.ids) if self.ids is not None
                else self.builder.pool.size)

    def __getitem__(self, idx: int, _trial: int = 0) -> Dict[str, Any]:
        pool = self.builder.pool
        try:
            q = np.asarray(pool.embeddings[idx], dtype=np.float32)
        except Exception:
            if self.is_debug:
                q = self.rng.random(pool.dim).astype(np.float32)
            else:
                if self.ids is None or len(self.ids) < 2:
                    raise
                self.invalids.add(idx)
                valid = list(set(self.ids) - self.invalids)
                if _trial >= self.max_trials or not valid:
                    raise
                nxt = int(self.rng.choice(valid))
                return self.__getitem__(nxt, _trial=_trial + 1)
        found = self.builder.search_k_nearest(q[None], k=self.k_nn)
        nns = np.asarray(found["nns"])  # [1, k]
        patches = self.builder.get_nn_patches(nns)[0]  # [k, h, w, 3]
        return {"mem_idx": idx, "nn_patches": patches}


class SubsetShard:
    """Strided per-rank subset with optional label-range filtering — the
    distributed-sampler equivalent for per-host input sharding."""

    def __init__(self, dset, rank: int = 0, world_size: int = 1,
                 label_key: Optional[str] = None,
                 label_range: Optional[Tuple[int, int]] = None,
                 indices: Optional[Sequence[int]] = None):
        self.data = dset
        if indices is None:
            if label_range is not None:
                assert label_key is not None
                getter = getattr(dset, "get_subset_by_label_range", None)
                if callable(getter):
                    indices = getter(label_range=label_range)
                else:
                    lo, hi = label_range
                    indices = [i for i in range(len(dset))
                               if lo <= dset[i][label_key] <= hi]
            else:
                indices = range(len(dset))
        self.indices = list(indices)[rank::world_size]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.data[self.indices[i]]


# ---------------------------------------------------------------------------
# collation / loading
# ---------------------------------------------------------------------------

def dict_collation_fn(samples: Sequence[Dict[str, Any]]
                      ) -> Dict[str, np.ndarray]:
    """Stack samples key-wise; numpy for arrays/scalars, lists otherwise."""
    keys = samples[0].keys()
    out: Dict[str, Any] = {}
    for k in keys:
        vals = [s[k] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


def propagate_epoch(ds, epoch: int, _seen=None) -> None:
    """Call set_epoch(epoch) on a dataset AND everything it wraps
    (.data / .dataset / .datasets chains), cycle-safe."""
    seen = _seen if _seen is not None else set()
    while ds is not None and id(ds) not in seen:
        seen.add(id(ds))
        fn = getattr(ds, "set_epoch", None)
        if callable(fn):
            fn(int(epoch))
        subs = getattr(ds, "datasets", None)
        if isinstance(subs, (list, tuple)):
            for sub in subs:
                propagate_epoch(sub, epoch, seen)
        ds = getattr(ds, "data", None) or getattr(ds, "dataset", None)


class DataLoader:
    """Minimal batching iterator: shuffling, drop_last, numpy collation.

    Uses torch.utils.data.DataLoader for multiprocess prefetch when
    num_workers > 0 and torch is importable; otherwise iterates serially —
    the device path only ever sees numpy dicts either way.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = True,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        # per-epoch augmentation: datasets exposing set_epoch fold the
        # pass number into their per-item RNG streams (openimages crops/
        # degradations); forked torch workers inherit the value. The
        # propagation WALKS wrapper chains (SubsetShard/QueryDataset/
        # Patcher/Concat/Mix hold the augmenting dataset under
        # .data/.datasets) — duck-typing only the outermost object would
        # silently freeze augmentation whenever a sampler config or host
        # shard wraps the dataset.
        propagate_epoch(self.dataset, self.epoch)
        if self.num_workers > 0:
            try:
                it = self._torch_iter()  # workers capture current epoch
                self.epoch += 1
                return it
            except ImportError:
                pass
        return self._serial_iter()

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        return order

    def _serial_iter(self):
        order = self._order()
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                return
            yield dict_collation_fn([self.dataset[int(i)] for i in idxs])

    def _torch_iter(self):
        import torch.utils.data as tud

        class _Wrap(tud.Dataset):
            def __init__(self, d):
                self.d = d

            def __len__(self):
                return len(self.d)

            def __getitem__(self, i):
                return self.d[i]

        def _worker_init(worker_id: int) -> None:
            # reseed numpy/python per worker so augmentations don't repeat
            # across workers (reference main.py:152-165 worker_init_fn +
            # PRNGMixin base.py:1096-1107)
            seed = (self.seed + self.epoch * 1000 + worker_id) % (2**31)
            np.random.seed(seed)
            random.seed(seed)

        loader = tud.DataLoader(
            _Wrap(self.dataset), batch_size=self.batch_size,
            shuffle=self.shuffle, num_workers=self.num_workers,
            drop_last=self.drop_last, collate_fn=dict_collation_fn,
            worker_init_fn=_worker_init, persistent_workers=False)
        return iter(loader)


class PrefetchLoader:
    """Background-thread batch prefetch around any batch iterable.

    The trainer dispatches device steps asynchronously (host-side step
    counter, no per-step sync), so the host's batch assembly is the only
    serial segment of the steady-state loop; decoding the NEXT batch on
    a daemon thread while the current step streams overlaps the two (the
    reference gets this from torch DataLoader worker processes,
    main.py:168-280 — a thread is the right shape here because the
    native image loader releases the GIL).

    depth: queue capacity (batches decoded ahead). Exceptions from the
    source iterator re-raise in the consumer.
    """

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        _END = object()

        def put(item) -> bool:
            # bounded put that notices consumer abandonment: without the
            # stop check an early `break` in the consumer would leave the
            # producer blocked in q.put forever, pinning the source
            # iterator (and any DataLoader worker processes) for the
            # process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in self.loader:
                    if not put(batch):
                        return
                put(_END)
            except BaseException as e:  # propagate to the consumer
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
