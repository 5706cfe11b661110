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

__all__ = ['pallas_disabled', 'disable_pallas']

_DISABLED: ContextVar[frozenset] = ContextVar('slowtv_disabled_pallas',
                                              default=frozenset())


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
