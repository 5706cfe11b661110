"""Training loop runner: the thin imperative shell around the pure train step.

Replaces the reference's PyTorch-Lightning `Trainer` + callback zoo
(`api/train/train.py:58-129`) with an explicit loop:

- epoch iteration over the (multi-dataset round-robin) host loader,
- on-device batch placement (sharded over the mesh when given),
- KBR aspect-ratio augmentation applied per batch (host samples the bucketed
  shape, device resamples; one XLA compile per shape bucket, then cached),
- scalar logging every `log_every_n_steps` (host sync only at log steps),
- non-finite-loss detection at sync points (`DetectAnomaly`,
  ref `src/utils/callbacks.py:27-31`),
- best/last orbax checkpoints + resume (`resume_training`),
- `TrainingManager` marker files (training_<epoch>_<host> / finished,
  ref `callbacks.py:34-87`) so runs can't double-start and eval scripts can
  trust completed checkpoints,
- DP LR scaling by mesh size x grad accumulation (`auto_scale_lr`,
  ref `api/train/train.py:125-128`).
"""
from __future__ import annotations

import math
import random as _random
import signal
import socket
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import LOGGER, parsers
from ..parallel import make_train_step, shard_batch
from ..parallel.multihost import (gather_for_save, global_batch_sharding,
                                  is_main_process)
from ..utils import MultiLevelTimer, flatten_dict
from .aspect_ratio import aspect_ratio_aug
from .device_transform import derive_batch, needs_derive
from .checkpoint import CheckpointManager, get_latest_ckpt, load_checkpoint
from .trainer import MonoDepthTrainer

__all__ = ['MonoDepthLoop', 'TrainingManager']


class TrainingManager:
    """Run marker files + SIGTERM cleanup (ref `src/utils/callbacks.py:34-87`)."""

    def __init__(self, ckpt_dir):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(exist_ok=True, parents=True)
        self.host = socket.gethostname()
        self.ftrain: Optional[Path] = None
        self.fend = self.ckpt_dir / 'finished'

        existing = sorted(self.ckpt_dir.glob('training*'))
        if existing:
            raise ValueError(f'Training already in progress! ({existing[0]})')
        if self.fend.is_file():
            raise ValueError(f'Training already finished! ({self.fend})')
        signal.signal(signal.SIGTERM, self._on_sigterm)

    def on_epoch_start(self, epoch: int) -> None:
        if self.ftrain:
            self.ftrain.unlink(missing_ok=True)
        self.ftrain = self.ckpt_dir / f'training_{epoch}_{self.host}'
        self.ftrain.touch()

    def on_fit_end(self) -> None:
        self.cleanup()
        self.fend.touch()

    def cleanup(self) -> None:
        if self.ftrain:
            self.ftrain.unlink(missing_ok=True)

    def _on_sigterm(self, signum, frame) -> None:
        raise SystemExit


class MonoDepthLoop:
    """:param cfg: Full merged YAML cfg (net/loss/dataset/loader/optimizer/
        scheduler/trainer sections).
    :param ckpt_dir: Run directory for checkpoints + markers.
    :param mesh: Optional device mesh for data parallelism.
    :param writer: Optional scalar logger with `.add_scalar(tag, val, step)`.
    :param shard_id/num_shards: Host shard for multi-host input pipelines.
    """

    def __init__(self, cfg: dict, ckpt_dir, mesh=None, writer=None,
                 shard_id: int = 0, num_shards: int = 1,
                 use_markers: bool = True, heavy_logger=None):
        self.cfg = cfg
        self.ckpt_dir = Path(ckpt_dir)
        self.mesh = mesh
        # A mesh with a `spatial` axis additionally shards image HEIGHTS over
        # it (`parallel/spatial.py`): the train step's activation live-set
        # scales down with the axis size, so resolutions that OOM one chip
        # train unmodified (XLA derives the conv halo exchanges).
        self.spatial = mesh is not None and 'spatial' in mesh.axis_names
        self.writer = writer
        self.shard_id, self.num_shards = shard_id, num_shards

        tcfg = cfg.get('trainer', {})
        # `trainer.matmul` mirrors the reference's
        # torch.set_float32_matmul_precision (`api/train/train.py`): 'high'
        # -> 3-pass bf16 MXU, 'medium' -> single-pass bf16, 'highest' ->
        # full f32. Unset keeps JAX's default.
        matmul = tcfg.get('matmul')
        if matmul:
            jax.config.update('jax_default_matmul_precision', {
                'highest': 'float32', 'high': 'bfloat16_3x',
                'medium': 'bfloat16'}.get(str(matmul), str(matmul)))
        self.max_epochs = tcfg.get('max_epochs', 60)
        self.log_every_n = tcfg.get('log_every_n_steps', 100)
        self.limit_val_batches = tcfg.get('limit_val_batches', 200)
        self.monitor = tcfg.get('monitor', 'AbsRel')
        self.grad_clip = tcfg.get('gradient_clip_val')
        self.accumulate = tcfg.get('accumulate_grad_batches', 1) or 1
        # ZeRO stage for the carried state on a mesh (`parallel/zero.py`):
        # 0 = replicated DDP (reference-equivalent), 1 = shard optimizer
        # state, 3 = shard optimizer state + master params (FSDP-style).
        self.zero = int(tcfg.get('zero', 0) or 0)
        # jax.profiler trace capture (SURVEY §5.1's TPU-native tracing):
        # set `trainer.profile_dir` to dump a TensorBoard-viewable trace of
        # steps [5, 5 + profile_steps) from the first epoch.
        self.profile_dir = tcfg.get('profile_dir')
        self.profile_steps = tcfg.get('profile_steps', 10)
        # Optional callbacks (ref `api/train/train.py:77-81`): early stopping
        # on the monitored metric, and stochastic weight averaging over the
        # last 25% of epochs (functional: a running mean of param pytrees).
        self.early_stopping = tcfg.get('early_stopping')  # None | patience int/True.
        self.use_swa = bool(tcfg.get('swa'))
        self._swa_sum = None
        self._swa_n = 0
        self._es_best = None
        self._es_bad_epochs = 0

        self.ar_aug = partial(
            aspect_ratio_aug,
            p=tcfg.get('aspect_ratio_aug_prob', 0.0),
            crop_min=tcfg.get('aspect_ratio_min', 0.5),
            crop_max=tcfg.get('aspect_ratio_max', 1.0),
            ref_shape=tcfg.get('aspect_ratio_ref_shape'),
        )

        self.trainer = MonoDepthTrainer(cfg)

        self.train_dl = parsers.get_dl('train', cfg['dataset'], cfg['loader'],
                                       shard_id=shard_id, num_shards=num_shards)
        try:
            self.val_dl = parsers.get_dl('val', cfg['dataset'], cfg['loader'],
                                         shard_id=shard_id, num_shards=num_shards)
        except (FileNotFoundError, ValueError):
            self.val_dl = None
        LOGGER.info(f'-> Train dataloader: {len(self.train_dl)}')

        n_dev = mesh.devices.size if mesh is not None else 1
        lr_scale = (n_dev * self.accumulate) if tcfg.get('auto_scale_lr') else 1.0
        steps_per_epoch = max(len(self.train_dl) // self.accumulate, 1)
        self.tx = parsers.make_optimizer(
            cfg, steps_per_epoch=steps_per_epoch, lr_scale=lr_scale,
            grad_clip=self.grad_clip, accumulate=self.accumulate)

        # Host-side effects only on process 0 (rank_zero_only equivalent).
        self.is_main = is_main_process()
        if not self.is_main:
            self.writer = None
        self.ckpt = CheckpointManager(self.ckpt_dir, monitor=self.monitor,
                                      async_save=bool(tcfg.get('async_ckpt')))
        self.manager = TrainingManager(self.ckpt_dir) if (use_markers and self.is_main) else None

        self._steps: dict = {}  # (supp_idxs, train) -> jitted step fn.
        self.state = None
        self.start_epoch = 0
        self.global_step = 0
        self.timer = MultiLevelTimer(name='Loop', as_ms=True)
        self.heavy_logger = heavy_logger
        self.current_batch: dict = {}  # mode -> last (x, y, m) + supp_idxs.

    # ------------------------------------------------------------------ setup
    def _step_fn(self, supp_idxs: tuple, train: bool):
        key = (tuple(supp_idxs), train)
        if key not in self._steps:
            # Donate the state: params/opt-state update in place in HBM.
            self._steps[key] = make_train_step(
                self.trainer, tuple(supp_idxs), self.tx, mesh=self.mesh,
                train=train, donate=train, zero=self.zero,
                spatial=self.spatial)
        return self._steps[key]

    def _init_state(self, batch) -> None:
        x, y, m = batch
        supp_idxs = tuple(int(i) for i in x.get('supp_idxs', ()))
        # Params are spatial-size agnostic; trace init on a multiple-of-32
        # crop. The raw dataset shape may be conv-hostile (e.g. SlowTV's
        # native 720x1280, which only ever reaches the nets after the
        # aspect-ratio aug resizes it to a mult-of-32 bucket).
        # Under `device_transform` the host x has no images; y's raw images
        # share the shape, and init only needs shapes. Widen a
        # `transfer_uint8` batch so the init trace sees float inputs.
        img = jax.numpy.asarray((x['imgs'] if 'imgs' in x else y['imgs'])[:1])
        if img.dtype == jax.numpy.uint8:
            img = img.astype(jax.numpy.float32) / 255.0
        h32 = max(32, img.shape[1] // 32 * 32)
        w32 = max(32, img.shape[2] // 32 * 32)
        xd = {'imgs': img[:, :h32, :w32]}
        rng = jax.random.PRNGKey(self.cfg.get('seed', 42))
        self.state = self.trainer.init_state(rng, xd, supp_idxs, self.tx)

        if load := self.cfg.get('trainer', {}).get('load_ckpt'):
            LOGGER.info(f'Warm-starting from {load}...')
            self.state, _ = load_checkpoint(load, self.state)
            self.state = self.state.replace(step=jax.numpy.asarray(0, jax.numpy.int32))

        if self.cfg.get('trainer', {}).get('resume_training', True):
            if last := get_latest_ckpt(self.ckpt_dir):
                self.state, meta = load_checkpoint(last, self.state)
                self.start_epoch = int(meta.get('epoch', -1)) + 1
                self.global_step = int(meta.get('step', 0))
                self.ckpt.restore_best_value()
                LOGGER.info(f'Resumed from {last} @ epoch {self.start_epoch}')

        if self.mesh is not None:
            # Place BEFORE the first step: the step's jit cache keys on
            # input shardings, so a single-device state would compile the
            # whole step twice (once for the host-placed state, once for the
            # mesh-placed state it returns). ZeRO stages shard the opt state
            # (and params at stage 3) here instead of replicating. Multi-
            # process runs route through host numpy first: device_put from a
            # committed local array (e.g. a resumed checkpoint) to a global
            # sharding would demand a cross-host transfer
            # (`parallel/multihost.py:host_local_tree`; caught by
            # `tests/test_multihost.py::test_two_process_loop_fit` resume).
            from ..parallel.multihost import host_local_tree
            self.state = host_local_tree(self.state)
            if self.zero:
                from ..parallel import shard_state
                self.state = shard_state(self.mesh, self.state, self.zero)
            else:
                from ..parallel import replicated
                self.state = jax.device_put(self.state, replicated(self.mesh))

    def _place(self, x: dict, y: dict):
        """Host numpy batch -> device (sharded over the mesh when present).

        Datasets with `device_transform: true` ship only the raw `y` images;
        the standardized `x` images are recreated here on device
        (`device_transform.derive_x`) BEFORE the aspect-ratio aug, preserving
        the host pipeline's jiggle -> standardize -> crop order.
        """
        x = {k: v for k, v in x.items() if k != 'supp_idxs'}
        if self.mesh is not None:
            xb, yb = global_batch_sharding(self.mesh, (x, y),
                                           spatial=self.spatial)
        else:
            xb, yb = jax.device_put((x, y))
        if needs_derive(xb):
            xb, yb = derive_batch(xb, yb)
        return xb, yb

    def _precompile_buckets(self) -> None:
        """AOT-compile the train step for every aspect-ratio-aug bucket.

        XLA compiles once per unique batch shape; with the persistent compile
        cache this front-loads the whole (bounded) shape family instead of
        stalling training at each first occurrence. Opt in with
        `trainer.precompile_buckets: True`.
        """
        from .aspect_ratio import all_output_shapes
        tcfg = self.cfg.get('trainer', {})
        ref = tcfg.get('aspect_ratio_ref_shape')
        if not ref:
            return
        b = self.cfg['loader']['batch_size']
        for name, dcfg in self.cfg['dataset'].items():
            shape = (dcfg.get('train') or {}).get('shape') or dcfg.get('shape')
            supp = tuple(dcfg.get('supp_idxs', ()))
            if not shape or not supp:
                continue
            buckets = sorted(all_output_shapes(
                [shape], ref, tcfg.get('aspect_ratio_min', 0.5),
                tcfg.get('aspect_ratio_max', 1.0)))
            LOGGER.info(f'Precompiling {len(buckets)} buckets for "{name}"...')
            step = self._step_fn(supp, train=True)
            for bi, (h, w) in enumerate(buckets):
                LOGGER.info(f'  bucket {bi + 1}/{len(buckets)}: {h}x{w}')
                imgs = jnp.zeros((b, h, w, 3), jnp.float32)
                sup = jnp.zeros((len(supp), b, h, w, 3), jnp.float32)
                K = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
                x = {'imgs': imgs, 'supp_imgs': sup}
                y = {'imgs': imgs, 'supp_imgs': sup, 'K': K}
                try:
                    step.lower(self.state, x, y,
                               jax.random.PRNGKey(0)).compile()
                except AttributeError:  # Non-jitted step (mesh wrapper).
                    return

    # ------------------------------------------------------------------- fit
    def fit(self) -> None:
        try:
            if self.state is None:
                # Initialize (and maybe resume) from the first batch's shapes
                # before the epoch loop so `start_epoch` is honored.
                self._init_state(next(iter(self.train_dl)))
            if self.cfg.get('trainer', {}).get('precompile_buckets'):
                self._precompile_buckets()
            for epoch in range(self.start_epoch, self.max_epochs):
                if self.manager:
                    self.manager.on_epoch_start(epoch)
                self.train_epoch(epoch)
                metrics = self.val_epoch(epoch) if self.val_dl else {}
                # Collective on all processes: ZeRO-sharded leaves span hosts
                # and must gather BEFORE the process-0 write gate.
                state_save = gather_for_save(self.state)
                if self.is_main:
                    self.ckpt.step(state_save, self.cfg, epoch, metrics)
                self._swa_update(epoch)
                if self._should_early_stop(metrics):
                    LOGGER.info(f'Early stopping at epoch {epoch}.')
                    break
            self._swa_finalize()
            self.ckpt.finalize()  # Drain any in-flight async save.
            if self.manager:
                self.manager.on_fit_end()
            if jax.process_count() > 1:
                # End-of-fit barrier (Lightning's DDP teardown equivalent):
                # non-main processes must not return — and e.g. read the
                # `finished` marker or the final checkpoints — before
                # process 0 has written them. Success path only, by design:
                # if a peer raises mid-fit the remaining processes block
                # here until the jax.distributed coordinator/heartbeat
                # timeout tears the job down. That is the intended failure
                # mode for SPMD (any mid-step failure already wedges the
                # next collective); a bounded barrier would only shift where
                # the timeout fires.
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices('slowtv_fit_end')
        except BaseException:
            try:
                self.ckpt.finalize()
            except Exception:  # noqa: BLE001 — don't mask the original error.
                LOGGER.exception('Async checkpoint save failed during cleanup.')
            if self.manager:
                self.manager.cleanup()
            raise

    # ----------------------------------------------------------------- epochs
    def train_epoch(self, epoch: int) -> None:
        self.train_dl.set_epoch(epoch)
        # Both per-step RNG streams are seeded by (cfg seed, epoch) so every
        # process draws the SAME sequence: under multi-process SPMD the
        # AR-aug bucket shape and the step's PRNG key are inputs to one
        # global computation — a per-process draw would trace different
        # programs per host (shape divergence) or feed divergent replicated
        # values (undefined results). Proven by the 2-process loop test
        # (`tests/test_multihost.py::test_two_process_loop_fit`).
        seed = int(self.cfg.get('seed', 42))
        rng = np.random.default_rng(seed + 1000003 * epoch)
        ar_rng = _random.Random(seed * 7919 + epoch)
        last_scalars = None

        for i, (x, y, m) in enumerate(self.train_dl):
            if self.state is None:
                self._init_state((x, y, m))

            supp_idxs = tuple(int(v) for v in x.get('supp_idxs', ()))
            xb, yb = self._place(x, y)
            batch = self.ar_aug((xb, yb, m), rng=ar_rng)
            xb, yb, m = batch

            step = self._step_fn(supp_idxs, train=True)
            key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
            self.state, scalars = step(self.state, xb, yb, key)
            last_scalars = scalars
            self.current_batch['train'] = ((xb, yb, m), supp_idxs)
            self.global_step += 1

            if self.profile_dir and self.is_main:
                if self.global_step == 5:
                    jax.profiler.start_trace(str(self.profile_dir))
                elif self.global_step == 5 + self.profile_steps:
                    jax.block_until_ready(scalars['loss'])
                    jax.profiler.stop_trace()
                    LOGGER.info(f'Profiler trace written to {self.profile_dir}')

            if self.global_step % self.log_every_n == 0:
                self._log('train', scalars, m)

        # Epoch-end anomaly check (sync point; the carried `bad_step` flag
        # reports the FIRST bad step, not just the last one of the epoch).
        if last_scalars is not None:
            float(last_scalars['loss'])  # Sync before reading the flag.
            self._check_anomaly()

        if self.heavy_logger is not None and 'train' in self.current_batch:
            batch, supp_idxs = self.current_batch['train']
            self.heavy_logger.log_step(self.trainer, self.state, batch, supp_idxs,
                                       self.writer, epoch, mode='train')

    def val_epoch(self, epoch: int) -> dict:
        if self.val_dl is None or self.state is None:
            return {}
        self.val_dl.set_epoch(epoch)
        acc: dict = {}
        n = 0
        for i, (x, y, m) in enumerate(self.val_dl):
            if i >= self.limit_val_batches:
                break
            supp_idxs = tuple(int(v) for v in x.get('supp_idxs', ()))
            xb, yb = self._place(x, y)
            step = self._step_fn(supp_idxs, train=False)
            _, scalars = step(self.state, xb, yb, jax.random.PRNGKey(epoch))
            for k, v in scalars.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        metrics = {k: v / max(n, 1) for k, v in acc.items()}
        if metrics:
            self._log_dict('val', metrics)
            LOGGER.info(f"Epoch {epoch}: val loss={metrics.get('loss'):.4f} "
                        + ' '.join(f'{k}={v:.3f}' for k, v in metrics.items()
                                   if k in ('AbsRel', 'MAE', 'RMSE')))
        return metrics

    # ---------------------------------------------------------------- logging
    def _check_anomaly(self) -> None:
        """Raise if any step since init saw a non-finite loss (device-side
        `bad_step` tripwire; reference `DetectAnomaly`, `src/utils/callbacks.py:27-31`).
        Only called where a host fetch happens anyway — zero steady-state cost."""
        state = getattr(self, 'state', None)
        bad = getattr(state, 'bad_step', None) if state is not None else None
        if bad is not None and int(bad) >= 0:
            raise ValueError(f'Detected NaN/Infinite loss (first at step {int(bad)})')

    def _log(self, mode: str, scalars: dict, m: dict) -> None:
        vals = {k: float(v) for k, v in scalars.items()}
        self._check_anomaly()
        loss = vals.get('loss', float('nan'))
        if not math.isfinite(loss):
            raise ValueError(f'Detected NaN/Infinite loss: "{loss}"')
        out = {f'{mode}_losses/{k.replace("loss_", "")}' if k.startswith('loss') else
               f'{mode}_monitor/{k}': v for k, v in vals.items()}
        if 'timer_data' in m and m['timer_data']:
            t0 = m['timer_data'][0]
            out.update({f'{mode}_timer/Data/{k}': v
                        for k, v in t0.mean_elapsed(m['timer_data']).items()})
        self._log_dict(mode, out, raw=True)
        LOGGER.info(f'step {self.global_step}: loss={loss:.4f}')

    def _log_dict(self, mode: str, metrics: dict, raw: bool = False) -> None:
        if self.writer is None:
            return
        items = metrics if raw else flatten_dict({f'{mode}_metrics': metrics})
        for k, v in items.items():
            if isinstance(v, (int, float)) and math.isfinite(v):
                self.writer.add_scalar(k, v, self.global_step)

    # -------------------------------------------------------------- callbacks
    def _swa_update(self, epoch: int) -> None:
        """Accumulate the SWA running mean over the last 25% of epochs
        (ref SWA start 0.75, `api/train/train.py:77-78`)."""
        if not self.use_swa or self.state is None:
            return
        if epoch < int(0.75 * self.max_epochs):
            return
        p = self.state.params
        if self._swa_sum is None:
            self._swa_sum = jax.tree_util.tree_map(lambda v: v.astype(jax.numpy.float32), p)
            self._swa_n = 1
        else:
            self._swa_sum = jax.tree_util.tree_map(lambda a, b: a + b, self._swa_sum, p)
            self._swa_n += 1

    def _swa_finalize(self) -> None:
        if not self.use_swa or self._swa_sum is None:
            return
        from .checkpoint import save_checkpoint
        avg = jax.tree_util.tree_map(lambda a: a / self._swa_n, self._swa_sum)
        swa_state = gather_for_save(self.state.replace(params=avg))
        if not self.is_main:
            return
        save_checkpoint(self.ckpt_dir / 'swa', swa_state, self.cfg,
                        epoch=self.max_epochs)
        LOGGER.info(f'SWA checkpoint over {self._swa_n} epochs -> {self.ckpt_dir / "swa"}')

    def _should_early_stop(self, metrics: dict) -> bool:
        """Patience-based early stopping on the monitor (ref EarlyStopping
        patience=5, `api/train/train.py:80-81`)."""
        if not self.early_stopping or not metrics:
            return False
        patience = 5 if self.early_stopping is True else int(self.early_stopping)
        value = metrics.get(self.monitor)
        if value is None:
            return False
        better = self._es_best is None or (
            value > self._es_best if self.ckpt.mode == 'max' else value < self._es_best)
        if better:
            self._es_best = value
            self._es_bad_epochs = 0
        else:
            self._es_bad_epochs += 1
        return self._es_bad_epochs >= patience
