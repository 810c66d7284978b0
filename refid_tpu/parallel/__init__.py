from refid_tpu.parallel.mesh import (
    init_distributed, make_mesh, batch_sharding, replicate_sharding,
    replicate, shard_batch,
)

__all__ = ["init_distributed", "make_mesh", "batch_sharding",
           "replicate_sharding", "replicate", "shard_batch"]
