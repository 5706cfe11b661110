"""Spatial partitioning for inference — the sequence-parallel analogue.

SURVEY.md §5.7: the reference has no sequence axis; its long-context
dimension is SPATIAL resolution (native 720x1280 SlowTV frames, the large
eval shapes of `src/core/predictors.py:152-207`). The reference handles it
by cropping/resizing into a per-GPU pixel budget (`src/core/
aspect_ratio.py:36-64`) because one GPU must hold the whole activation set.

On a TPU mesh the image itself can shard: place the batch with its HEIGHT
dimension split over a `spatial` mesh axis and XLA's SPMD partitioner turns
every convolution into shard-local convs plus halo exchanges
(collective-permutes of the kernel-overlap rows) riding ICI — the CNN
equivalent of ring attention's neighbor exchange. Activations, not just
batches, then scale with chip count: a resolution whose activations OOM a
single chip serves on 2/4/8 chips with NO module changes (the partitioner
derives the halo program from the input sharding alone).

Usage:
    mesh = make_mesh((d, s), ('data', 'spatial'))
    imgs = shard_batch_spatial(mesh, imgs)      # (b, h, w, c): b->data, h->spatial
    pred = jitted_forward(net_variables, imgs)  # plain forward, no changes

Heights that don't divide the `spatial` axis fall back to replicated-H
placement (still data-sharded) rather than erroring — the standard eval
shapes (192..512, multiples of 32) divide any power-of-two axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import get_logger

__all__ = ['spatial_image_spec', 'spatial_batch_sharding', 'shard_batch_spatial']

logger = get_logger('spatial')
_warned_heights = set()


def spatial_image_spec(x, mesh: Mesh, data_axis: str = 'data',
                       spatial_axis: str = 'spatial', quiet: bool = False) -> P:
    """PartitionSpec for an image batch over (data x spatial) mesh axes.

    Rank-4 `(b, h, w, c)` shards b over `data_axis` and h over
    `spatial_axis`; rank-5 `(n, b, h, w, c)` support stacks shard dims 1/2.
    Axes absent from the mesh are skipped; a height not divisible by the
    spatial axis size leaves h replicated (logged once per height, unless
    `quiet` — intermediate feature maps constrain through here too).
    """
    shape = jnp.shape(x)
    ndim = len(shape)
    if ndim < 4:
        return P(data_axis) if (ndim >= 1 and data_axis in mesh.axis_names) else P()
    b_dim, h_dim = (1, 2) if ndim >= 5 else (0, 1)
    spec = [None] * ndim
    if data_axis in mesh.axis_names:
        spec[b_dim] = data_axis
    if spatial_axis in mesh.axis_names:
        n = int(mesh.shape[spatial_axis])
        if n > 1 and shape[h_dim] % n == 0:
            spec[h_dim] = spatial_axis
        elif n > 1 and not quiet and shape[h_dim] not in _warned_heights:
            _warned_heights.add(shape[h_dim])
            logger.warning(f'Height {shape[h_dim]} not divisible by the '
                           f'{n}-way spatial axis; leaving it unsharded.')
    return P(*spec)


def spatial_batch_sharding(mesh: Mesh, batch, data_axis: str = 'data',
                           spatial_axis: str = 'spatial'):
    """Per-leaf `NamedSharding` pytree: batch over data, height over spatial."""
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(
            mesh, spatial_image_spec(v, mesh, data_axis, spatial_axis)), batch)


def shard_batch_spatial(mesh: Mesh, batch, data_axis: str = 'data',
                        spatial_axis: str = 'spatial'):
    """Place a host image batch onto the mesh, batch- and height-sharded.

    On a mesh without a `spatial` axis this reduces exactly to
    `shard_batch` (batch-axis sharding only).
    """
    return jax.device_put(
        batch, spatial_batch_sharding(mesh, batch, data_axis, spatial_axis))
