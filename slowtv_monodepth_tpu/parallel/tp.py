"""Tensor-parallel (Megatron-style) parameter sharding for transformer trunks.

The reference serves its big DPT baselines (MiDaS ViT-L, NeWCRFs Swin-L;
`src/core/predictors.py:212-284`) strictly single-GPU. On a TPU slice the
same Flax modules can run model-sharded with NO module changes: annotate the
attention/MLP weights with a `model` mesh axis and let XLA's SPMD partitioner
derive the classic tensor-parallel program — per-head attention shards, a
column-split MLP up-projection, a row-split down-projection, and one
all-reduce per block riding ICI. Combined with a `data` axis on the batch
this gives 2-D (data x model) serving for encoders whose activations at
large eval resolutions don't fit one chip.

Rules are name-based over the param-tree paths our encoders use:

- separate-head attention (`flax.linen.MultiHeadDotProductAttention` inside
  a `...attn` scope, timm-ViT layout — `models/encoders/vit.py`): q/k/v
  kernels `(dim, heads, head_dim)` shard the head axis; the out-projection
  kernel `(heads, head_dim, dim)` shards its head input axis, so each shard
  produces a partial sum and XLA inserts the block's single all-reduce.
- fused-qkv attention (BEiT `models/encoders/beit.py:59`, Swin(V2)
  `models/encoders/swin.py:96,140`): only the `(dim, dim)` output projection
  shards (rows -> partial sums). The fused `(dim, 3*dim)` qkv kernel's
  columns interleave (3, heads, head_dim) blocks, so a contiguous column
  shard crosses q/k/v boundaries — GSPMD would stay correct but reshard at
  the head reshape every block, so it replicates instead (it is also the
  smallest of the block's three matmuls).
- MLPs (`fc1`/`fc2` in every trunk — 2/3 of a ViT block's FLOPs): `fc1`
  shards its hidden output axis (+ bias), `fc2` shards its hidden input axis.

Everything unmatched — convs, norms, tables, decoders — replicates: that is
always CORRECT under SPMD (the partitioner inserts whatever collectives the
mismatch needs); the trunk matmuls are where the memory and FLOPs live.
Leaves whose target axis is not divisible by the mesh axis size also fall
back to replication, so any head count / mesh combination runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['tp_leaf_spec', 'tp_shardings', 'shard_variables_tp']

_QKV = ('query', 'key', 'value')


def _names(path) -> list:
    """KeyPath -> list of plain string keys ('params', 'block0', 'attn', ...)."""
    out = []
    for k in path:
        out.append(str(getattr(k, 'key', getattr(k, 'idx', k))))
    return out


def tp_leaf_spec(path, x, n: int, axis: str = 'model') -> P:
    """PartitionSpec for one param leaf under `n`-way tensor parallelism.

    :param path: `jax.tree_util` KeyPath of the leaf inside the variables tree.
    :param x: The leaf (or anything with `.shape`).
    :param n: Mesh size along `axis`.
    :param axis: Mesh axis name to shard over.
    """
    names = _names(path)
    if 'params' not in names:  # batch_stats etc. stay replicated.
        return P()
    shape = jnp.shape(x)
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ''
    grand = names[-3] if len(names) >= 3 else ''

    def spec(dim: int) -> P:
        if shape[dim] % n:
            return P()
        s = [None] * len(shape)
        s[dim] = axis
        return P(*s)

    # -- Separate-head attention (flax MHDPA: kernels carry an explicit
    #    head axis). q/k/v shard heads; `out` contracts heads -> row split.
    if grand == 'attn' and parent in _QKV:
        if leaf == 'kernel' and len(shape) == 3:
            return spec(1)
        if leaf == 'bias' and len(shape) == 2:
            return spec(0)
    if grand == 'attn' and parent == 'out' and leaf == 'kernel' and len(shape) == 3:
        return spec(0)

    # -- Fused-qkv attention (BEiT / Swin): only the output projection
    #    shards (rows -> partial sums); the fused qkv kernel's column layout
    #    interleaves q/k/v per head, so it replicates (see module docstring).
    if grand == 'attn' and parent == 'proj' and leaf == 'kernel' and len(shape) == 2:
        return spec(0)

    # -- MLPs: column-split up-projection, row-split down-projection.
    if parent == 'fc1':
        if leaf == 'kernel' and len(shape) == 2:
            return spec(1)
        if leaf == 'bias' and len(shape) == 1:
            return spec(0)
    if parent == 'fc2' and leaf == 'kernel' and len(shape) == 2:
        return spec(0)

    return P()


def tp_shardings(mesh: Mesh, variables, axis: str = 'model'):
    """Per-leaf `NamedSharding` pytree for a Flax variables dict.

    The matched (sharded) paths are logged once per call: the rules are
    name-based ('fc1'/'fc2', 'attn'/'proj'), so a future non-trunk module
    reusing those names would get silently tensor-sharded — value-correct
    under GSPMD but with unintended per-call collectives. The log makes any
    unexpected match visible instead of silent (advisor finding r03).
    """
    n = mesh.shape[axis]
    sharded: list = []

    def shard(path, v):
        s = tp_leaf_spec(path, v, n, axis)
        if s != P():
            sharded.append('/'.join(_names(path)))
        return NamedSharding(mesh, s)

    out = jax.tree_util.tree_map_with_path(shard, variables)
    if sharded:
        from .. import LOGGER
        LOGGER.info(f'TP: sharding {len(sharded)} leaves over "{axis}" '
                    f'(x{n}): {sharded[:6]}{"..." if len(sharded) > 6 else ""}')
    return out


def shard_variables_tp(mesh: Mesh, variables, axis: str = 'model'):
    """Place Flax variables onto the mesh under tensor-parallel sharding.

    Axes of `mesh` other than `axis` (e.g. a `data` batch axis) replicate the
    params; activations shard per the batch sharding the caller applies.
    """
    return jax.device_put(variables, tp_shardings(mesh, variables, axis))
