"""Torch-free parameter serialization: flax pytree ↔ one npz file.

Converted released checkpoints are stored as flat npz (path-keyed) so
inference hosts never need torch: `scripts/convert_checkpoint.py` runs the
torch→JAX conversion once, pipelines then load the npz directly.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_SEP = "|"  # flax param names may contain '/', so use an illegal char


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    import ml_dtypes
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    payload = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype == ml_dtypes.bfloat16:  # npz has no bf16 encoding
            arr = arr.astype(np.float32)
        payload[_SEP.join(k)] = arr
    np.savez(path, **payload)


def load_params_npz(path: str) -> Dict[str, Any]:
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    flat = {tuple(k.split(_SEP)): data[k] for k in data.files}
    return unflatten_dict(flat)
