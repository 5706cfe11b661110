"""Orbax checkpointing with the reference's best/last policy.

TPU-native equivalent of Lightning's ModelCheckpoint + hyperparameter
embedding (ref `api/train/train.py:55-63`, `src/core/trainer.py:34`):
`best` on a monitored metric (max-mode iff the name contains 'Acc',
`train.py:58-60`), `last` every epoch, and the full cfg dict stored alongside
the arrays so a checkpoint alone can rebuild the network (what enables
`quickstart/run.py:27-31` and `BenchmarkPredictor.load_model`).

Layout: `<ckpt_dir>/{best,last}/` orbax PyTree + `<ckpt_dir>/{best,last}.yaml`
holding {cfg, step, epoch, monitor}.
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import yaml

from .. import LOGGER
from .trainer import TrainState

__all__ = ['save_checkpoint', 'load_checkpoint', 'CheckpointManager', 'get_latest_ckpt']


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda v: np.asarray(v), tree)


def save_checkpoint(path, state: TrainState, cfg: dict, epoch: int = 0,
                    monitor: Optional[float] = None) -> None:
    """Save {params, aux, opt_state, step} + cfg metadata to `path`."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            'params': _tree_to_numpy(state.params),
            'aux': _tree_to_numpy(state.aux),
            'opt_state': _tree_to_numpy(state.opt_state),
            'step': int(state.step),
        })
    meta = {'cfg': cfg, 'epoch': int(epoch), 'step': int(state.step),
            'monitor': None if monitor is None else float(monitor)}
    with open(path.with_suffix('.yaml'), 'w') as f:
        yaml.safe_dump(meta, f)


def load_checkpoint(path, state: Optional[TrainState] = None):
    """Load a checkpoint; returns (TrainState, meta dict).

    :param state: Template state for dtype/sharding restoration. When None,
        arrays load as host numpy (e.g. for inference-only use).
    """
    import orbax.checkpoint as ocp
    path = Path(path).absolute()

    with ocp.StandardCheckpointer() as ckptr:
        if state is not None:
            target = {
                'params': state.params, 'aux': state.aux,
                'opt_state': state.opt_state, 'step': int(state.step),
            }
            tree = ckptr.restore(path, target)
        else:
            tree = ckptr.restore(path)

    meta_file = path.with_suffix('.yaml')
    meta = {}
    if meta_file.is_file():
        with open(meta_file) as f:
            meta = yaml.safe_load(f)

    new_state = TrainState(
        step=jax.numpy.asarray(tree['step'], jax.numpy.int32),
        params=tree['params'], aux=tree['aux'], opt_state=tree['opt_state'],
        bad_step=jax.numpy.asarray(-1, jax.numpy.int32))
    return new_state, meta


def get_latest_ckpt(ckpt_dir) -> Optional[Path]:
    """Last checkpoint in a run dir (ref `src/tools/ops.py:35-60` role)."""
    last = Path(ckpt_dir) / 'last'
    return last if last.is_dir() else None


class CheckpointManager:
    """best/last policy around `save_checkpoint` (ref `api/train/train.py:55-63`).

    :param ckpt_dir: Run checkpoint directory.
    :param monitor: Metric name to track for `best` (e.g. 'AbsRel', 'loss').
    :param mode: 'min'/'max'/None; None infers max iff 'Acc' in the name.
    """

    def __init__(self, ckpt_dir, monitor: str = 'loss', mode: Optional[str] = None):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode or ('max' if 'Acc' in monitor else 'min')
        self.best: Optional[float] = None

    def is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == 'max' else value < self.best

    def step(self, state: TrainState, cfg: dict, epoch: int,
             metrics: dict) -> None:
        """End-of-epoch hook: always refresh `last`, update `best` on improvement."""
        save_checkpoint(self.ckpt_dir / 'last', state, cfg, epoch,
                        metrics.get(self.monitor))
        value = metrics.get(self.monitor)
        if value is not None and self.is_better(float(value)):
            self.best = float(value)
            LOGGER.info(f'New best {self.monitor}={self.best:.4f} @ epoch {epoch}')
            save_checkpoint(self.ckpt_dir / 'best', state, cfg, epoch, self.best)

    def restore_best_value(self) -> None:
        """Recover the tracked best value after a resume."""
        meta_file = self.ckpt_dir / 'best.yaml'
        if meta_file.is_file():
            with open(meta_file) as f:
                self.best = (yaml.safe_load(f) or {}).get('monitor')
