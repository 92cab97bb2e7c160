from .mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
