from uegan_tpu.parallel.mesh import make_mesh, default_mesh
from uegan_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    spatial_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "batch_sharding",
    "replicated",
    "spatial_sharding",
    "shard_batch",
]
