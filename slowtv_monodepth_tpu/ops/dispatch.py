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
           'constrain_spatial']

_DISABLED: ContextVar[frozenset] = ContextVar('slowtv_disabled_pallas',
                                              default=frozenset())
_SPATIAL_HINT: ContextVar[tuple | None] = ContextVar('slowtv_spatial_hint',
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
