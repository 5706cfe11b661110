"""Dataset/model root resolution.

Equivalent to the reference's `src/paths.py:18-113`: optional user-provided
roots in a repo-level `PATHS.yaml` take priority over the repo-relative
defaults; `find_data_dir`/`find_model_file` resolve by first hit.
"""
from __future__ import annotations

import os
from pathlib import Path

import yaml

__all__ = ['REPO_ROOT', 'MODEL_ROOTS', 'DATA_ROOTS', 'find_data_dir', 'find_model_file']

REPO_ROOT = Path(__file__).resolve().parent.parent

_DEFAULT_MODEL_ROOTS = [REPO_ROOT / 'models']
_DEFAULT_DATA_ROOTS = [REPO_ROOT / 'data']


def _load_user_paths() -> dict:
    f = REPO_ROOT / 'PATHS.yaml'
    if not f.is_file():
        return {}
    with open(f) as fh:
        return yaml.safe_load(fh) or {}


def _build_roots(key: str, defaults: list[Path]) -> list[Path]:
    user = _load_user_paths().get(key) or []
    if isinstance(user, (str, os.PathLike)):
        user = [user]
    return [Path(p) for p in user] + defaults


MODEL_ROOTS = _build_roots('MODEL_ROOTS', _DEFAULT_MODEL_ROOTS)
DATA_ROOTS = _build_roots('DATA_ROOTS', _DEFAULT_DATA_ROOTS)


def find_data_dir(name: str) -> Path:
    """Return the first existing `<root>/<name>` data directory."""
    for root in DATA_ROOTS:
        d = root / name
        if d.is_dir():
            return d
    raise FileNotFoundError(f'Data dir "{name}" not found in any root: {DATA_ROOTS}')


def find_model_file(name: str) -> Path:
    """Return the first existing `<root>/<name>` model file or directory."""
    for root in MODEL_ROOTS:
        f = root / name
        if f.exists():
            return f
    raise FileNotFoundError(f'Model "{name}" not found in any root: {MODEL_ROOTS}')
