"""Orbax checkpointing with the reference's best/last policy.

TPU-native equivalent of Lightning's ModelCheckpoint + hyperparameter
embedding (ref `api/train/train.py:55-63`, `src/core/trainer.py:34`):
`best` on a monitored metric (max-mode iff the name contains 'Acc',
`train.py:58-60`), `last` every epoch, and the full cfg dict stored alongside
the arrays so a checkpoint alone can rebuild the network (what enables
`quickstart/run.py:27-31` and `BenchmarkPredictor.load_model`).

Layout: `<ckpt_dir>/{best,last}/` orbax PyTree + `<ckpt_dir>/{best,last}.yaml`
holding {cfg, step, epoch, monitor}.

Async saves (`CheckpointManager(async_save=True)` / `trainer.async_ckpt`):
the save snapshots the state with on-device copies (~ms; the copies are NOT
part of the state the donated train step mutates, so later steps can't
invalidate them) and runs the device->host fetch + orbax write on a
background thread — training continues through the multi-hundred-MB save.
Ordering is preserved (a new save waits for the previous one) and errors
re-raise at the next save or at `finalize()`.
"""
from __future__ import annotations

import shutil
import threading
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .. import LOGGER
from .trainer import TrainState

__all__ = ['save_checkpoint', 'load_checkpoint', 'CheckpointManager',
           'get_latest_ckpt', 'AsyncSaver']


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda v: np.asarray(v), tree)


class AsyncSaver:
    """One-slot background writer: at most one save in flight; `submit` joins
    the previous save first, `wait` re-raises any background failure."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def submit(self, fn: Callable[[], None]) -> None:
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — surfaced on next wait()
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True,
                                        name='ckpt-saver')
        self._thread.start()


def _local_checkpointer():
    """A `StandardCheckpointer` whose barriers are PROCESS-LOCAL.

    Checkpoint writes are gated to process 0 (`MonoDepthLoop.fit`, the
    reference's rank-zero ModelCheckpoint semantics) and operate on
    already-gathered host numpy trees — but a default orbax checkpointer
    issues `sync_global_processes` barriers that every process must join, so
    a process-0-only save deadlocks/mismatches a multi-process run (caught by
    `tests/test_multihost.py::test_two_process_loop_fit`). Scoping
    `active_processes` to THIS process makes every barrier trivial; the write
    itself was always process-local data.
    """
    import orbax.checkpoint as ocp
    pid = jax.process_index()
    opts = ocp.options.MultiprocessingOptions(
        primary_host=pid, active_processes={pid},
        barrier_sync_key_prefix=f'proc{pid}')
    return ocp.StandardCheckpointer(multiprocessing_options=opts)


def _write_checkpoint(path: Path, tree: dict, cfg: dict, epoch: int,
                      step: int, monitor: Optional[float]) -> None:
    if path.exists():
        shutil.rmtree(path)
    with _local_checkpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(lambda v: np.asarray(v), tree))
    meta = {'cfg': cfg, 'epoch': int(epoch), 'step': int(step),
            'monitor': None if monitor is None else float(monitor)}
    with open(path.with_suffix('.yaml'), 'w') as f:
        yaml.safe_dump(meta, f)


def save_checkpoint(path, state: TrainState, cfg: dict, epoch: int = 0,
                    monitor: Optional[float] = None,
                    saver: Optional[AsyncSaver] = None) -> None:
    """Save {params, aux, opt_state, step} + cfg metadata to `path`.

    :param saver: When given, snapshot the state with on-device copies and
        return immediately; the fetch + write happen on `saver`'s thread.
    """
    path = Path(path).absolute()
    step = int(state.step)
    tree = {'params': state.params, 'aux': state.aux,
            'opt_state': state.opt_state, 'step': step}
    if saver is None:
        _write_checkpoint(path, tree, cfg, epoch, step, monitor)
        return
    # Donation-safe snapshot: jnp.copy allocates fresh device buffers that no
    # jitted step holds, so the background fetch can't race a donated update.
    snap = jax.tree_util.tree_map(
        lambda v: jnp.copy(v) if isinstance(v, jax.Array) else v, tree)
    saver.submit(lambda: _write_checkpoint(path, snap, cfg, epoch, step, monitor))


def load_checkpoint(path, state: Optional[TrainState] = None):
    """Load a checkpoint; returns (TrainState, meta dict).

    :param state: Template state for dtype/sharding restoration. When None,
        arrays load as host numpy (e.g. for inference-only use).
    """
    path = Path(path).absolute()

    # Process-local reads: every process restores the full host tree from the
    # shared directory with no cross-process barriers (see _local_checkpointer
    # — asymmetric orbax barriers would couple process schedules).
    with _local_checkpointer() as ckptr:
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
    :param async_save: Overlap fetch + write with training (see module doc);
        call `finalize()` before reading the files or ending the run.
    """

    def __init__(self, ckpt_dir, monitor: str = 'loss', mode: Optional[str] = None,
                 async_save: bool = False):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode or ('max' if 'Acc' in monitor else 'min')
        self.best: Optional[float] = None
        self.saver = AsyncSaver() if async_save else None

    def is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == 'max' else value < self.best

    def step(self, state: TrainState, cfg: dict, epoch: int,
             metrics: dict) -> None:
        """End-of-epoch hook: always refresh `last`, update `best` on improvement."""
        save_checkpoint(self.ckpt_dir / 'last', state, cfg, epoch,
                        metrics.get(self.monitor), saver=self.saver)
        value = metrics.get(self.monitor)
        if value is not None and self.is_better(float(value)):
            self.best = float(value)
            LOGGER.info(f'New best {self.monitor}={self.best:.4f} @ epoch {epoch}')
            save_checkpoint(self.ckpt_dir / 'best', state, cfg, epoch, self.best,
                            saver=self.saver)

    def finalize(self) -> None:
        """Drain any in-flight async save (no-op when synchronous)."""
        if self.saver is not None:
            self.saver.wait()

    def restore_best_value(self) -> None:
        """Recover the tracked best value after a resume."""
        meta_file = self.ckpt_dir / 'best.yaml'
        if meta_file.is_file():
            with open(meta_file) as f:
                self.best = (yaml.safe_load(f) or {}).get('monitor')
