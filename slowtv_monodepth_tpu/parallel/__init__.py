from .mesh import (
    make_mesh, replicated, batch_sharding, shard_batch, make_train_step,
    unreplicate,
)
from .multihost import (
    global_batch_sharding, initialize_distributed, is_main_process, process_info,
)
from .spatial import (
    shard_batch_spatial, spatial_batch_sharding, spatial_image_spec,
)
from .tp import shard_variables_tp, tp_leaf_spec, tp_shardings
from .zero import shard_state, state_shardings, zero_leaf_spec

__all__ = ['make_mesh', 'replicated', 'batch_sharding', 'shard_batch',
           'make_train_step', 'unreplicate',
           'global_batch_sharding', 'initialize_distributed', 'is_main_process',
           'process_info',
           'shard_batch_spatial', 'spatial_batch_sharding', 'spatial_image_spec',
           'shard_variables_tp', 'tp_leaf_spec', 'tp_shardings',
           'shard_state', 'state_shardings', 'zero_leaf_spec']
