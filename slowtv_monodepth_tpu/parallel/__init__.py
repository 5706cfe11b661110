from .mesh import (
    make_mesh, replicated, batch_sharding, shard_batch, make_train_step,
    unreplicate,
)
from .multihost import (
    global_batch_sharding, initialize_distributed, is_main_process, process_info,
)
from .tp import shard_variables_tp, tp_leaf_spec, tp_shardings
from .zero import shard_state, state_shardings, zero_leaf_spec

__all__ = ['make_mesh', 'replicated', 'batch_sharding', 'shard_batch',
           'make_train_step', 'unreplicate',
           'global_batch_sharding', 'initialize_distributed', 'is_main_process',
           'process_info',
           'shard_variables_tp', 'tp_leaf_spec', 'tp_shardings',
           'shard_state', 'state_shardings', 'zero_leaf_spec']
