from desenet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    spatial_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding",
           "spatial_sharding"]
