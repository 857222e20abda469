from .mesh import make_mesh, batch_sharding, replicated, shard_batch
from .multihost import (
    global_batch,
    host_batch_size,
    host_shard,
    initialize_if_needed,
)
