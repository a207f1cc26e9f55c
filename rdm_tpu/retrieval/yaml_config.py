"""Reference-schema YAML configs for the offline retrieval pipeline.

The reference drives scripts/search_neighbors.py with two OmegaConf
YAMLs (`-rc` dataset_builder, `-qc` query_datasets — reference
scripts/search_neighbors.py:456-470 and
configs/dataset_builder/openimages.yaml,
configs/query_datasets/imagenet.yaml). This module loads those exact
schemas onto the TPU stack so a user's existing builder/query YAMLs
port unmodified:

- `builder_from_config`: `builder.params` → DatasetBuilder (retrieval
  database dir from `saved_embeddings`, source dataset from `data`
  target via rdm_tpu.data.registry, retriever from `retriever_config`).
- `query_dataset_from_config`: `data.params[split].params.dset_config`
  → the query image dataset (n_patches_per_side is injected per phase by
  the CLI loop, reference :516-517).

Reference params that encode CUDA-host mechanics (`gpu`, `num_workers`,
`device`) are accepted and ignored; `img_size`, `max_pool_size` and
`load_patch_dataset` likewise (our DataPool is chunked npz, restartable
by construction). CLIP retrievers need a local checkpoint in the air
gap: `retriever_config.params.ckpt`, else $RDM_TPU_CLIP_CKPT, else the
CLI --clip_ckpt flag.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

from rdm_tpu.config import load_yaml

# reference retriever targets (rdm/modules/retrievers.py) → rdm_tpu ones;
# value is (class name in rdm_tpu.models.retrievers, is_text_capable)
_RETRIEVERS = {
    "ClipImageRetriever": ("ClipImageRetriever", True),
    "ClipTextRetriever": ("ClipTextRetriever", True),
    "VQGANRetriever": ("VQGANRetriever", False),
    "VAERetriever": ("VAERetriever", False),
}


def _resolve_ckpt(params: Dict[str, Any],
                  cli_ckpt: Optional[str]) -> Optional[str]:
    return (params.get("ckpt") or os.environ.get("RDM_TPU_CLIP_CKPT")
            or cli_ckpt)


def make_config_embedder(
    retriever_cfg: Dict[str, Any],
    cli_ckpt: Optional[str] = None,
) -> Tuple[Callable, Callable, str]:
    """`retriever_config` → (embed_images, embed_texts, retriever_name).

    Only CLIP retrievers embed text; the others raise if asked.
    """
    target = retriever_cfg.get("target", "")
    name = target.rsplit(".", 1)[-1]
    if name not in _RETRIEVERS:
        raise KeyError(f"unknown retriever target '{target}'")
    params = dict(retriever_cfg.get("params") or {})
    cls_name, has_text = _RETRIEVERS[name]
    if name.startswith("Clip"):
        ckpt = _resolve_ckpt(params, cli_ckpt)
        if not ckpt:
            raise ValueError(
                f"{name} needs a local CLIP checkpoint: set "
                "retriever_config.params.ckpt, $RDM_TPU_CLIP_CKPT, or "
                "--clip_ckpt (the reference's params.model names an "
                "auto-download, unavailable air-gapped)")
        from rdm_tpu.models.retrievers import (ClipImageRetriever,
                                               ClipTextRetriever)
        from rdm_tpu.utils.torch_convert import (convert_clip,
                                                 load_torch_state_dict)
        import numpy as np
        clip_params, clip_cfg = convert_clip(load_torch_state_dict(ckpt))
        img_r = ClipImageRetriever(clip_params, clip_cfg)
        txt_r = ClipTextRetriever(clip_params, clip_cfg)
        return (lambda images: np.asarray(img_r(images))), \
            (lambda captions: np.asarray(txt_r(captions))), name
    # autoencoder retrievers: need a converted first-stage checkpoint +
    # its model YAML (for the encoder architecture)
    ckpt = _resolve_ckpt(params, cli_ckpt)
    model_yaml = params.get("config")
    if not (ckpt and model_yaml):
        raise ValueError(f"{name} needs params.ckpt (first-stage torch "
                         "weights) and params.config (model YAML)")
    import numpy as np
    from rdm_tpu.config import first_stage_config_from_yaml
    from rdm_tpu.models import retrievers as rmod
    from rdm_tpu.models.autoencoder import VQModel, AutoencoderKL
    from rdm_tpu.utils.torch_convert import (convert_autoencoder,
                                             load_torch_state_dict)
    ae_cfg = first_stage_config_from_yaml(load_yaml(model_yaml))
    ae_params = convert_autoencoder(load_torch_state_dict(ckpt), ae_cfg)
    model = (VQModel if cls_name == "VQGANRetriever"
             else AutoencoderKL)(ae_cfg)
    size = int(params.get("size", 256))
    r = getattr(rmod, cls_name)(model, ae_params, size=size)

    def no_text(_):
        raise ValueError(f"{name} cannot embed captions")

    return (lambda images: np.asarray(r(images))), no_text, name


def builder_from_config(
    path: str,
    *,
    cli_ckpt: Optional[str] = None,
    embedder_override: Optional[Callable] = None,
):
    """Load a reference dataset_builder YAML and return
    (DatasetBuilder, retriever_name). `embedder_override` replaces the
    retriever (e.g. --random_embedder smoke runs)."""
    from rdm_tpu.data.base import PatcherDataset
    from rdm_tpu.data.registry import instantiate_dataset
    from rdm_tpu.retrieval.builder import DatasetBuilder

    cfg = load_yaml(path)
    b = cfg.get("builder") or {}
    p = dict(b.get("params") or {})

    if embedder_override is not None:
        embed, name = embedder_override, "random"
    else:
        rc = p.get("retriever_config")
        if not rc:
            raise ValueError(f"{path}: builder.params.retriever_config "
                             "missing")
        embed, _, name = make_config_embedder(rc, cli_ckpt)

    data_cfg = p.get("data")
    patcher = None
    if data_cfg:
        base = instantiate_dataset(data_cfg)
        patcher = PatcherDataset(
            base, patch_size=int(p.get("patch_size", 256)),
            n_patches=int(p.get("n_patches", 2)), seed=0)

    save_dir = p.get("saved_embeddings")
    if not save_dir:
        raise ValueError(f"{path}: builder.params.saved_embeddings "
                         "(database dir) missing")
    builder = DatasetBuilder(
        patcher, embed, save_dir=str(save_dir),
        batch_size=int(p.get("batch_size", 100)),
        chunk_size=int(float(p.get("chunk_size", 2e6))),
        k=int(p.get("k", 20)))
    return builder, name


def query_dataset_from_config(path: str, split: str = "train",
                              n_patches_per_side: int = 1):
    """Load a reference query_datasets YAML and return
    (query image dataset, k or None).

    The reference instantiates `data.params[split]` (a QueryDataset
    config) with `n_patches_per_side` injected and nns still unset
    (reference :516-517) — at search time only the underlying
    `dset_config` images are consumed, so that is what we instantiate;
    patch slicing happens in the CLI search loop.
    """
    from rdm_tpu.data.registry import instantiate_dataset

    cfg = load_yaml(path)
    data = (cfg.get("data") or {}).get("params") or {}
    if split not in data:
        raise KeyError(f"{path}: data.params has no split '{split}' "
                       f"(has {sorted(data)})")
    qcfg = data[split]
    params = dict(qcfg.get("params") or {})
    dset_cfg = params.get("dset_config")
    if not dset_cfg:
        raise ValueError(f"{path}: {split}.params.dset_config missing")
    k = params.get("k")
    del n_patches_per_side  # injected by the CLI per-n loop
    return instantiate_dataset(dset_cfg), (int(k) if k else None)
