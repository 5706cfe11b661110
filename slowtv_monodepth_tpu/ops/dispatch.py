"""Trace-time Pallas kernel dispatch control, thread/context-safe.

The hand-written Pallas kernels (warp `ops/pallas_warp.py`, fused photometric
`ops/pallas_photo.py`) are selected at TRACE time. Two mechanisms disable
them in favor of the exact XLA fallbacks:

- `SLOWTV_DISABLE_PALLAS_{WARP,PHOTO}` env vars — the user-facing, process-
  wide switch (also used by tests).
- `disable_pallas('warp', 'photo')` — a `contextvars`-scoped override for
  programmatic call sites (e.g. the spatial-sharded train step, whose SPMD
  partitioner cannot partition the custom kernels). Context-local, so a
  concurrent trace on another thread can NEVER observe the flipped state —
  unlike the `os.environ` mutation this replaces (advisor finding r03:
  `parallel/mesh.py:156`).
"""
from __future__ import annotations

import os
from contextlib import contextmanager
from contextvars import ContextVar

__all__ = ['pallas_disabled', 'disable_pallas', 'spatial_sharding_hint',
           'constrain_spatial', 'spatial_warp_shardmap', 'spatial_warp_context',
           'spatial_photo_shardmap', 'spatial_photo_context']

_DISABLED: ContextVar[frozenset] = ContextVar('slowtv_disabled_pallas',
                                              default=frozenset())
_SPATIAL_HINT: ContextVar[tuple | None] = ContextVar('slowtv_spatial_hint',
                                                     default=None)
_SPATIAL_WARP: ContextVar[tuple | None] = ContextVar('slowtv_spatial_warp',
                                                     default=None)
_SPATIAL_PHOTO: ContextVar[tuple | None] = ContextVar('slowtv_spatial_photo',
                                                      default=None)


def pallas_disabled(kind: str) -> bool:
    """Is the `kind` Pallas kernel ('warp'/'photo'/...) disabled here?"""
    if kind in _DISABLED.get():
        return True
    return bool(os.environ.get(f'SLOWTV_DISABLE_PALLAS_{kind.upper()}'))


@contextmanager
def disable_pallas(*kinds: str):
    """Scope-local disable: affects only traces under this context (and only
    this thread/task), composing with any outer disables."""
    token = _DISABLED.set(_DISABLED.get() | frozenset(kinds))
    try:
        yield
    finally:
        _DISABLED.reset(token)


@contextmanager
def spatial_sharding_hint(mesh, data_axis: str = 'data',
                          spatial_axis: str = 'spatial'):
    """Trace-scoped hint that activations are height-sharded over `mesh`.

    While active, `constrain_spatial` pins feature-map shardings to
    (batch->data, height->spatial-iff-divisible). Without it, GSPMD's
    propagation can pick a height-sharded layout for a deep feature map whose
    height is SMALLER than the spatial axis (e.g. the stride-32 stage of a
    64-px dry-run image), and the backward pass then needs a batch->height
    reshard it can only do by "involuntary full rematerialization"
    (spmd_partitioner.cc:652, MULTICHIP_r03.json tail). Contextvar-scoped for
    the same thread-safety reasons as `disable_pallas`.
    """
    token = _SPATIAL_HINT.set((mesh, data_axis, spatial_axis))
    try:
        yield
    finally:
        _SPATIAL_HINT.reset(token)


@contextmanager
def spatial_warp_shardmap(mesh, data_axis: str = 'data',
                          spatial_axis: str = 'spatial'):
    """Trace-scoped: route `ops.sample.grid_sample` through a `shard_map`
    over `mesh` so the Pallas warp kernel stays alive under spatial (height)
    sharding.

    The kernel has no GSPMD partitioning rule, so the height-sharded train
    step used to pin its XLA fallback — measured at 5.3x the whole-step cost
    (STATUS round 4). Inside the shard_map region each device holds the FULL
    source image (GSPMD all-gathers it over the spatial axis, trading back
    the warp-source memory saving) and its own height-slice of the sample
    grid, so warp COMPUTE shards over the spatial axis and the kernel runs
    shard-locally. Exact: same math, same kernel, different partitioning.
    """
    token = _SPATIAL_WARP.set((mesh, data_axis, spatial_axis))
    try:
        yield
    finally:
        _SPATIAL_WARP.reset(token)


def spatial_warp_context():
    """The active (mesh, data_axis, spatial_axis) for shard_map warps."""
    return _SPATIAL_WARP.get()


@contextmanager
def spatial_photo_shardmap(mesh, data_axis: str = 'data',
                           spatial_axis: str = 'spatial'):
    """Trace-scoped: route the fused SSIM+L1 Pallas photo kernel through a
    batch-resharding `shard_map` so it stays alive under spatial (height)
    sharding.

    The photometric error is independent per image plane, so the flattened
    (n_supp x n_scales x b) stack can repartition its BATCH axis over all
    mesh devices with full height per image (GSPMD inserts the all-to-all at
    the shard_map boundary). Memory-neutral — each device holds 1/N of the
    stack either way — and the backward needs no psum (no replicated
    operands). Exact: same kernel per image, different partitioning.
    """
    token = _SPATIAL_PHOTO.set((mesh, data_axis, spatial_axis))
    try:
        yield
    finally:
        _SPATIAL_PHOTO.reset(token)


def spatial_photo_context():
    """The active (mesh, data_axis, spatial_axis) for shard_map photo err."""
    return _SPATIAL_PHOTO.get()


def constrain_spatial(x):
    """Pin a (b, h, w, c) feature map's sharding under an active spatial hint.

    No-op (zero trace cost) unless inside `spatial_sharding_hint`. The height
    axis is pinned to the spatial mesh axis even when not divisible (GSPMD
    pads the trailing shard): the conv TRANSPOSE at a stage boundary always
    wants its incoming cotangent height-sharded to partition the halo
    program, so any other layout forces an elementwise reshard the
    partitioner can only do by full rematerialization
    (spmd_partitioner.cc:652, MULTICHIP_r03.json tail).
    """
    hint = _SPATIAL_HINT.get()
    if hint is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, da, sa = hint
    ndim = getattr(x, 'ndim', 0)
    if ndim < 4:
        return x
    spec = [None] * ndim
    b_dim, h_dim = (1, 2) if ndim >= 5 else (0, 1)
    if da in mesh.axis_names:
        spec[b_dim] = da
    if sa in mesh.axis_names and mesh.shape[sa] > 1:
        spec[h_dim] = sa
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
