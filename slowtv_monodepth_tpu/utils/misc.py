"""Dependency-free base helpers (reference: `src/utils/misc.py`)."""
from __future__ import annotations

import logging
from typing import Any, Mapping

__all__ = ['flatten_dict', 'sort_dict', 'get_logger']


def flatten_dict(d: Mapping, parent: str = '', sep: str = '/') -> dict[str, Any]:
    """Flatten a nested dict into `parent/child` keys (ref `misc.py:28-37`)."""
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f'{parent}{sep}{k}' if parent else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_dict(v, parent=key, sep=sep))
        else:
            out[key] = v
    return out


def sort_dict(d: Mapping) -> dict:
    """Return a dict sorted by key (stable ordering for multi-scale outputs)."""
    return {k: d[k] for k in sorted(d)}


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(f'slowtv_tpu.{name}')
    logger.setLevel(level)
    return logger
