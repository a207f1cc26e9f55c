from rdm_tpu.data.base import (
    DataLoader,
    ImagePaths,
    PatcherDataset,
    QueryDataset,
    SubsetShard,
    dict_collation_fn,
)

__all__ = [
    "DataLoader", "ImagePaths", "PatcherDataset", "QueryDataset",
    "SubsetShard", "dict_collation_fn",
]
