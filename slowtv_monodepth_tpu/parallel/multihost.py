"""Multi-host (multi-slice / DCN) runtime helpers.

The reference's multi-GPU story is single-node Lightning DDP (SURVEY §2.9).
The TPU-native scale-out axis is multi-host SPMD: every host runs the same
program, `jax.distributed.initialize` wires the hosts into one runtime, the
global mesh spans all chips (DP gradients allreduce over ICI within a slice
and DCN across slices via the same `psum`), and each host feeds only its own
shard of the batch (`ShardedSampler(shard_id=process_index)`).

Host-side effects (logging, checkpoint writes, marker files) gate on
`is_main_process()`, the `rank_zero_only` equivalent
(ref `src/core/trainer.py:186`).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ['initialize_distributed', 'is_main_process', 'process_info',
           'global_batch_sharding', 'gather_for_save']


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime (no-op single-host).

    Args default from the standard env vars (`JAX_COORDINATOR_ADDRESS`,
    `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`); TPU pods auto-detect when none
    are provided.
    """
    coordinator_address = coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes or _int_env('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None else _int_env('JAX_PROCESS_ID')

    if coordinator_address is None and num_processes is None:
        return  # Single-host; nothing to join.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_info() -> tuple:
    """(shard_id, num_shards) for the host input pipeline."""
    return jax.process_index(), jax.process_count()


def gather_for_save(tree):
    """Make every array leaf fully addressable so a single host can write it.

    With `trainer.zero >= 1` on a multi-process run, params/opt_state shards
    span hosts; fetching such a leaf with `np.asarray` raises. This gathers
    those leaves to host numpy via `process_allgather`. It is a COLLECTIVE:
    every process must call it (before any `is_main_process()` gate), exactly
    like the torchmetrics all-reduce that precedes the reference's
    rank-zero-gated checkpoint write (ref `src/core/trainer.py:186`).

    Single-process (or fully-addressable) trees pass through untouched.
    """
    if jax.process_count() == 1:
        return tree

    from jax.experimental import multihost_utils

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.tree_util.tree_map(gather, tree)


def host_local_tree(tree):
    """Drop committed device placements before a multi-process `device_put`.

    `jax.device_put` from a COMMITTED process-local array to a sharding that
    spans other processes demands a cross-host device transfer (the runtime
    cannot know every process holds the same value), which most backends
    refuse. At the points this is used (state placement onto the global mesh
    in `MonoDepthLoop._init_state`), every process provably holds the full
    value — fresh init is identical across processes (same PRNGKey) and
    checkpoint restores are process-local reads of the shared directory — so
    fetching leaves to host numpy lets each process place its own addressable
    shards with no transfer. No-op single-process (placement stays on-device).
    """
    if jax.process_count() == 1:
        return tree
    import numpy as np

    return jax.tree_util.tree_map(
        lambda v: np.asarray(v) if isinstance(v, jax.Array) else v, tree)


def global_batch_sharding(mesh, batch, axis: str = 'data',
                          spatial: bool = False):
    """Assemble a globally-sharded batch from this host's local shard.

    Each host passes its local numpy batch; the result is a global array
    sharded over the mesh's data axis (`jax.make_array_from_process_local_data`).
    Single-host meshes fall back to a plain device_put. With `spatial=True`
    image heights additionally shard over the mesh's `spatial` axis
    (`parallel/spatial.py`).
    """
    from .mesh import batch_sharding, shard_batch
    from .spatial import shard_batch_spatial, spatial_batch_sharding
    if jax.process_count() == 1:
        return (shard_batch_spatial(mesh, batch, data_axis=axis) if spatial
                else shard_batch(mesh, batch, axis))
    shardings = (spatial_batch_sharding(mesh, batch, data_axis=axis) if spatial
                 else batch_sharding(mesh, batch, axis))
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, x),
        batch, shardings)
