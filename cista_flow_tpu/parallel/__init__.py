from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_config,
    replicate_tree,
    replicated,
    shard_seq_batch,
)
from .train_step import make_optimizer, make_train_step, set_lr, step_lr
