from rdm_tpu.parallel.mesh import (
    DATA_AXIS,
    DB_AXIS,
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = ["DATA_AXIS", "DB_AXIS", "make_mesh", "shard_batch", "replicate"]
