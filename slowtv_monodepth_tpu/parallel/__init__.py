from .mesh import (
    make_mesh, replicated, batch_sharding, shard_batch, make_train_step,
    unreplicate,
)
from .multihost import (
    global_batch_sharding, initialize_distributed, is_main_process, process_info,
)
from .zero import shard_state, state_shardings, zero_leaf_spec

__all__ = ['make_mesh', 'replicated', 'batch_sharding', 'shard_batch',
           'make_train_step', 'unreplicate',
           'global_batch_sharding', 'initialize_distributed', 'is_main_process',
           'process_info',
           'shard_state', 'state_shardings', 'zero_leaf_spec']
