"""Device-mesh parallelism: sharded posterior, mesh helpers."""
from .sharding import (
    make_mesh, shard_rime, shard_visdata, shard_pixels, ShardedLogProb,
    DistributedLogProb, replicate,
)
