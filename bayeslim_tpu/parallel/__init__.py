"""Device-mesh parallelism: sharded posterior, mesh helpers, multi-host."""
from .sharding import (
    make_mesh, shard_rime, shard_visdata, shard_pixels, ShardedLogProb,
    DistributedLogProb, replicate,
)
from . import multihost
