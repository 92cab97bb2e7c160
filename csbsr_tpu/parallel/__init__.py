from .mesh import (
    batch_sharding,
    init_distributed,
    leaf_shard_spec,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
    shard_state_zero1,
    zero1_shardings,
)
