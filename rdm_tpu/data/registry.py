"""Config-target dataset instantiation — the reference's
`instantiate_from_config` (/root/reference/main.py:777-799, ldm.util) for
the data layer, so released training YAMLs drive training unmodified.

Reference `target:` import strings (rdm.data.*, taming.data.*) map onto
this framework's classes; `params:` are translated where the ctor shapes
differ (e.g. the reference ImageNet datasets auto-download and take
`config: {size: ...}`, ours read a staged `root` directory — resolved from
params["root"], $RDM_TPU_DATA_ROOT/<name>, or ./data/<name>).

`sampler_config` (reference main.py:220-228 + SubsetSampler base.py:143-248)
is applied by wrapping the dataset in SubsetShard.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

from rdm_tpu.data import faces, imagenet, openimages, wrappers
from rdm_tpu.data.base import ImagePaths, QueryDataset, SubsetShard


def _data_root(params: Dict[str, Any], name: str) -> str:
    if "root" in params:
        return params.pop("root")
    base = os.environ.get("RDM_TPU_DATA_ROOT", "data")
    return os.path.join(base, name)


def _flatten_config(params: Dict[str, Any]) -> Dict[str, Any]:
    """The reference taming-style datasets nest options under `config:`."""
    params = dict(params)
    nested = params.pop("config", None)
    if isinstance(nested, dict):
        for k, v in nested.items():
            params.setdefault(k, v)
    return params


def _imagenet(cls):
    def make(params):
        params = _flatten_config(params)
        root = _data_root(params, "imagenet")
        keep = {k: v for k, v in params.items()
                if k in ("size", "sub_indices", "load_clip_embeddings")}
        return cls(root=root, **keep)

    return make


def _rooted(cls, name, keys):
    def make(params):
        params = _flatten_config(params)
        root = _data_root(params, name)
        keep = {k: v for k, v in params.items() if k in keys}
        return cls(root=root, **keep)

    return make


def _query_dataset(params):
    params = dict(params)
    dset_cfg = params.pop("dset_config")
    rset_cfg = params.pop("rset_config", None)
    nns = params.pop("nns", None)
    if isinstance(nns, str) and nns.startswith("<"):  # config placeholder
        nns = None
    keep = {k: v for k, v in params.items()
            if k in ("n_patches_per_side", "k", "debug", "seed",
                     "load_patches")}
    rset = instantiate_dataset(rset_cfg) if rset_cfg else None
    return QueryDataset(instantiate_dataset(dset_cfg), nns=nns, rset=rset,
                        **keep)


def _image_paths(params):
    params = dict(params)
    filelist = params.pop("filelist", None)
    paths = params.pop("paths", None)
    if filelist:
        with open(filelist) as f:
            paths = [l.strip() for l in f if l.strip()]
    return ImagePaths(paths, size=params.get("size"),
                      labels=params.get("labels"))


_TARGETS: Dict[str, Callable[[Dict[str, Any]], Any]] = {
    "rdm.data.base.QueryDataset": _query_dataset,
    "rdm_tpu.data.base.ImagePaths": _image_paths,
    "rdm.data.imagenet.ImageNetTrain": _imagenet(imagenet.ImageNetTrain),
    "rdm.data.imagenet.ImageNetValidation":
        _imagenet(imagenet.ImageNetValidation),
    "rdm.data.imagenet.BigGANImageNetTrain":
        _imagenet(imagenet.BigGANImageNetTrain),
    "rdm.data.imagenet.BigGANImageNetValidation":
        _imagenet(imagenet.BigGANImageNetValidation),
    "rdm.data.openimages.FullOpenImagesTrain":
        _rooted(openimages.FullOpenImagesTrain, "openimages",
                ("size", "max_images")),
    "rdm.data.openimages.FullOpenImagesValidation":
        _rooted(openimages.FullOpenImagesValidation, "openimages",
                ("size", "max_images")),
    "rdm.data.openimages.SemanticOpenImagesTrain":
        _rooted(openimages.SemanticOpenImagesTrain, "openimages",
                ("size", "max_images", "n_labels")),
    "rdm.data.openimages.SemanticOpenImagesValidation":
        _rooted(openimages.SemanticOpenImagesValidation, "openimages",
                ("size", "max_images", "n_labels")),
    "rdm.data.openimages.SuperresOpenImagesTrain":
        _rooted(openimages.SuperresOpenImagesTrain, "openimages",
                ("size", "max_images", "down_factor", "degradation")),
    "rdm.data.openimages.SuperresOpenImagesValidation":
        _rooted(openimages.SuperresOpenImagesValidation, "openimages",
                ("size", "max_images", "down_factor", "degradation")),
    "rdm.data.openimages.OpenImagesBBoxTrain":
        _rooted(openimages.OpenImagesBBoxTrain, "openimages",
                ("size", "max_images")),
    "rdm.data.openimages.OpenImagesBBoxValidation":
        _rooted(openimages.OpenImagesBBoxValidation, "openimages",
                ("size", "max_images")),
    "rdm.data.faces.FFHQTrainRDM":
        _rooted(faces.FFHQTrainRDM, "ffhq", ("size",)),
    "rdm.data.faces.FFHQValidationRDM":
        _rooted(faces.FFHQValidationRDM, "ffhq", ("size",)),
    "taming.data.faces.FFHQTrain":
        _rooted(faces.FFHQTrainRDM, "ffhq", ("size",)),
    "taming.data.faces.FFHQValidation":
        _rooted(faces.FFHQValidationRDM, "ffhq", ("size",)),
}


def instantiate_dataset(cfg: Dict[str, Any]):
    """`{target:, params:}` → dataset instance.

    Falls back to a same-named class in rdm_tpu.data.wrappers /
    rdm_tpu.data.webdataset for targets not in the translation table.
    """
    if not isinstance(cfg, dict) or "target" not in cfg:
        raise ValueError(f"not an instantiable config: {cfg!r}")
    target = cfg["target"]
    params = dict(cfg.get("params") or {})
    fn = _TARGETS.get(target)
    if fn is not None:
        return fn(params)
    # fallback: same class name in this framework's data modules
    name = target.rsplit(".", 1)[-1]
    for mod in (wrappers, imagenet, openimages, faces):
        cls = getattr(mod, name, None)
        if cls is not None:
            return cls(**params)
    if name == "WebDataset":
        from rdm_tpu.data.webdataset import WebDataset
        return WebDataset(**params)
    raise KeyError(
        f"no rdm_tpu equivalent registered for target '{target}'")


def apply_sampler_config(dataset, sampler_cfg: Optional[Dict[str, Any]],
                         *, rank: int = 0, world_size: int = 1):
    """reference SubsetSampler (base.py:143-248) as a dataset wrapper:
    label-range filtering + per-rank strided sharding."""
    if not sampler_cfg:
        return dataset
    params = dict(sampler_cfg.get("params") or {})
    return SubsetShard(
        dataset, rank=rank, world_size=world_size,
        label_key=params.get("label_key"),
        label_range=tuple(params["label_range"])
        if params.get("label_range") else None)
