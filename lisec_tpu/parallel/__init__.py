from lisec_tpu.parallel.mesh import (
    ProcessShardDataset,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "ProcessShardDataset", "batch_sharding", "initialize_distributed",
    "make_mesh", "replicated_sharding", "shard_batch",
]
