"""Data-parallel runtime over a `jax.sharding.Mesh`.

The TPU-native equivalent of the reference's only parallelism — single-node
PyTorch-Lightning DDP over NCCL (`api/train/train.py:105-112`,
`src/tools/parsers.py:191-202`; inventory in SURVEY.md §2.9):

- 1-D `data` mesh over all local devices (ICI within a slice).
- Batches sharded on the leading batch axis; params/opt-state replicated.
- The step function is compiled with `jax.jit` + `NamedSharding` constraints,
  so XLA inserts the gradient all-reduce over ICI itself (the `psum` the
  reference gets implicitly from DDP autograd hooks).
- State buffers are donated: params/opt-state update in place in HBM.

Per-host input sharding (the `DistributedSampler` equivalent) lives in the
data pipeline; metric reduction uses the same mean over the batch axis, which
under this sharding is already a cross-device reduction.

Support-frame images ride on axis 1 ((n, b, ...) layout), so `shard_batch`
shards dim 1 for rank-5 arrays and dim 0 otherwise.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'replicated', 'batch_sharding', 'shard_batch',
           'make_train_step', 'unreplicate']


def make_mesh(n_devices=None, axis='data',
              platform: Optional[str] = None) -> Mesh:
    """Device mesh over the first devices of a backend.

    :param n_devices: `int` (or None = all) for a 1-D mesh, or a shape tuple
        for an N-D mesh — e.g. `make_mesh((2, 4), ('data', 'model'))` for
        2-way data x 4-way tensor parallelism (`parallel/tp.py`).
    :param axis: Axis name, or a name tuple matching a shape-tuple `n_devices`.
    :param platform: Backend to take devices from ('cpu', 'tpu', None=default).
        When the default backend has fewer than `n_devices`, falls back to the
        host CPU devices (the `--xla_force_host_platform_device_count` pool) —
        the standard recipe for validating shardings without real chips.
    """
    import numpy as np
    shape = tuple(n_devices) if isinstance(n_devices, (tuple, list)) else None
    want = int(np.prod(shape)) if shape else n_devices
    devs = jax.devices(platform)
    if want is not None and len(devs) < want and platform is None:
        devs = jax.devices('cpu')
    if want is not None:
        if len(devs) < want:
            raise ValueError(f'Need {want} devices, have {len(devs)} '
                             f'({devs[0].platform}).')
        devs = devs[:want]
    if shape:
        axes = tuple(axis) if isinstance(axis, (tuple, list)) else None
        if not axes or len(axes) != len(shape):
            raise ValueError(f'Mesh shape {shape} needs one axis name per '
                             f'dim, got {axis!r}.')
        return Mesh(np.asarray(devs).reshape(shape), axes)
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for(x, axis: str) -> P:
    """Batch axis spec: rank-5 (n, b, h, w, c) shards dim 1, else dim 0."""
    ndim = jnp.ndim(x)
    if ndim >= 5:
        return P(None, axis)
    if ndim >= 1:
        return P(axis)
    return P()


def batch_sharding(mesh: Mesh, batch, axis: str = 'data'):
    """Per-leaf NamedSharding pytree for an (x, y) batch."""
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(mesh, _spec_for(v, axis)), batch)


def shard_batch(mesh: Mesh, batch, axis: str = 'data'):
    """Place a host batch onto the mesh, sharded over the batch axis."""
    return jax.device_put(batch, batch_sharding(mesh, batch, axis))


def unreplicate(tree):
    """Fetch a replicated pytree to host numpy."""
    return jax.tree_util.tree_map(lambda v: jax.device_get(v), tree)


def make_train_step(trainer, supp_idxs: tuple, tx, mesh: Optional[Mesh] = None,
                    train: bool = True, axis: str = 'data', donate: bool = True,
                    zero: int = 0, spatial: bool = False):
    """Compile the trainer's step function, optionally sharded over `mesh`.

    :param trainer: `core.MonoDepthTrainer`.
    :param supp_idxs: Static support-frame indices (fixed per dataset).
    :param tx: optax transformation (ignored when `train=False`).
    :param mesh: Device mesh; `None` compiles single-device.
    :param zero: ZeRO stage for the carried state (`parallel.zero`): 0 =
        replicate params+opt (plain DDP), 1 = shard opt state over `axis`,
        3 = shard opt state + params. Place the state with
        `zero.shard_state(mesh, state, zero)` before the first call.
    :param spatial: Additionally shard image HEIGHTS over the mesh's
        `spatial` axis (`parallel/spatial.py`) — activation memory scales
        down with the spatial axis size, so resolutions whose train-step
        live set OOMs one chip train unmodified. XLA partitions the convs
        with halo exchanges; the hand-written Pallas warp/photo kernels have
        no GSPMD partitioning rule, so by default they stay alive through
        shard_map dispatch (`dispatch.spatial_{warp,photo}_shardmap` — see
        the comment block below). Setting SLOWTV_SPATIAL_SHARDMAP_WARP=0 /
        SLOWTV_SPATIAL_SHARDMAP_PHOTO=0 (or hitting an indivisible shape)
        pins the exact XLA fallbacks instead (`tests/test_spatial.py` pins
        loss equality either way).
    :return: step(state, x, y, rng) -> (state, scalars) jitted.
    """
    step = trainer.make_step_fn(tuple(supp_idxs), tx, train=train)
    donate_args = (0,) if (donate and train) else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_args)

    repl = replicated(mesh)
    if spatial and 'spatial' not in mesh.axis_names:
        raise ValueError(f'spatial=True needs a "spatial" mesh axis, got '
                         f'{mesh.axis_names}.')

    def _batch_shardings(tree):
        if spatial:
            from .spatial import spatial_batch_sharding
            return spatial_batch_sharding(mesh, tree, data_axis=axis)
        return batch_sharding(mesh, tree, axis)

    def sharded_step(state, x, y, rng):
        # Constrain inputs: batch over devices (and heights over `spatial`
        # when requested), state per the ZeRO stage (zero=0: everything
        # replicated). XLA derives the collectives over ICI from these
        # shardings: grad all-reduce at zero=0, grad reduce-scatter + param
        # all-gather at zero>=1, conv halo exchanges under `spatial`.
        x = jax.lax.with_sharding_constraint(x, _batch_shardings(x))
        y = jax.lax.with_sharding_constraint(y, _batch_shardings(y))
        new_state, scalars = step(state, x, y, rng)
        if zero:
            from .zero import state_shardings
            out_sh = state_shardings(mesh, new_state, zero, axis)
        else:
            out_sh = jax.tree_util.tree_map(lambda _: repl, new_state)
        new_state = jax.lax.with_sharding_constraint(new_state, out_sh)
        return new_state, scalars

    jitted = jax.jit(sharded_step, donate_argnums=donate_args)
    if not spatial:
        return jitted

    import os

    from ..ops.dispatch import (disable_pallas, spatial_photo_shardmap,
                                spatial_sharding_hint, spatial_warp_shardmap)

    # Kernel dispatch under spatial sharding, applied at TRACE time
    # (`ops/sample.py:grid_sample`, `losses/photometric.py:_fused_ok`;
    # contextvar-scoped, so a concurrent trace on another thread never
    # observes the flip — unlike the os.environ mutation this replaces;
    # no-op after the first per-shape compile). The full XLA fallback for
    # the warp+photo kernel set costs 5.3x on the whole step (STATUS round
    # 4), so both kernels stay alive through shard_map partitioning rules:
    # - warp: batch-resharded (or source-replicated) shard_map keeps the
    #   Pallas kernel running per device (`dispatch.spatial_warp_shardmap`).
    #   Opt out with SLOWTV_SPATIAL_SHARDMAP_WARP=0 (pins the XLA fallback).
    # - photo (fused SSIM+L1): batch-resharding shard_map — memory-neutral,
    #   no psum (`dispatch.spatial_photo_shardmap`). Opt out with
    #   SLOWTV_SPATIAL_SHARDMAP_PHOTO=0; indivisible batches fall back to
    #   the exact XLA path automatically (`PhotoError._fused_ok`).
    # `spatial_sharding_hint` pins encoder pyramid layouts so the SPMD
    # partitioner never hits its full-remat fallback (r03 weak #4).
    def _dispatch_ctx():
        from contextlib import ExitStack
        stack = ExitStack()
        if os.environ.get('SLOWTV_SPATIAL_SHARDMAP_WARP', '1') == '0':
            stack.enter_context(disable_pallas('warp'))
        else:
            stack.enter_context(spatial_warp_shardmap(mesh, data_axis=axis))
        if os.environ.get('SLOWTV_SPATIAL_SHARDMAP_PHOTO', '1') == '0':
            stack.enter_context(disable_pallas('photo'))
        else:
            stack.enter_context(spatial_photo_shardmap(mesh, data_axis=axis))
        stack.enter_context(spatial_sharding_hint(mesh, data_axis=axis))
        return stack

    def spatial_step(state, x, y, rng):
        with _dispatch_ctx():
            return jitted(state, x, y, rng)

    def lower(*args, **kwargs):
        with _dispatch_ctx():
            return jitted.lower(*args, **kwargs)

    # Keep the jit object's AOT surface usable (.lower traces under the same
    # kernel dispatch the live call uses).
    spatial_step.lower = lower
    return spatial_step
