from .mesh import (
    make_mesh, replicated, batch_sharding, shard_batch, make_train_step,
    unreplicate,
)

__all__ = ['make_mesh', 'replicated', 'batch_sharding', 'shard_batch',
           'make_train_step', 'unreplicate']
