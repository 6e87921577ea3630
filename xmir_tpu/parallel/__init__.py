from .mesh import (
    auto_param_shardings,
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fsdp_state_shardings,
    gallery_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
