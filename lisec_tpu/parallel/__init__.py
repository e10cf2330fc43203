from lisec_tpu.parallel.mesh import (
    ProcessShardDataset,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from lisec_tpu.parallel.point_sharded import (
    ball_query_sharded,
    fps_sharded,
)

__all__ = [
    "ProcessShardDataset", "batch_sharding", "initialize_distributed",
    "make_mesh", "replicated_sharding", "shard_batch",
    "ball_query_sharded", "fps_sharded",
]
