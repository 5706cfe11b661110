"""Config-dict -> instance parsers (the reference `src/tools/parsers.py` role).

- `get_net` (ref `:36-69`): registered Flax module definitions per cfg key.
- `get_loss` (ref `:72-106`): loss callables + static weight dict.
- `get_opt` (ref `:205-241`): an `optax` transformation chain with the
  reference's `backbone_lr` param-group split (smaller LR on any param whose
  path contains `encoder`) and `frozen_bn` (zero grads on BatchNorm
  scale/bias).
- `get_sched` (ref `:246-269`): steplr + linear-warmup composed into a single
  `optax` schedule of the *epoch*, converted to steps by `steps_per_epoch`
  (the reference steps its ChainedScheduler once per epoch).

TPU-first: optimizers are pure optax transforms over the param pytree; "param
groups" are expressed as `optax.multi_transform` masks over tree paths.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax

from . import (DATA_REG, LOGGER, LOSS_REG, NET_REG, trigger_datasets,
               trigger_losses, trigger_networks)

__all__ = ['get_net', 'get_loss', 'get_ds', 'get_dl', 'get_opt', 'get_sched',
           'make_optimizer']


def _listify(v):
    return tuple(v) if isinstance(v, list) else v


def get_net(cfg: dict) -> dict:
    """Instantiate network module definitions from the cfg `net` section.

    `~` (None) values delete a component (ref `parsers.py:44-45`).
    """
    trigger_networks()
    nets = {}
    for k, kw in cfg.items():
        if kw is None:
            continue
        if k not in NET_REG:
            raise KeyError(f'Unknown network "{k}". ({sorted(NET_REG)})')
        kw = {key: _listify(v) for key, v in kw.items()}
        nets[k] = NET_REG[k](**kw)
        LOGGER.info(f"-> Net: {k} ({kw})")
    return nets


def get_loss(cfg: dict) -> tuple[dict, dict]:
    """Instantiate losses + static weights from the cfg `loss` section.

    Weights are plain floats (the reference stores them as frozen
    `nn.Parameter`s purely so they appear in the ckpt, `parsers.py:98-103`).
    """
    trigger_losses()
    losses, weights = {}, {}
    for k, kw in cfg.items():
        if kw is None:
            continue
        if k not in LOSS_REG:
            raise KeyError(f'Unknown loss "{k}". ({sorted(LOSS_REG)})')
        kw = dict(kw)
        weights[k] = float(kw.pop('weight', 1.0))
        losses[k] = LOSS_REG[k](**kw)
        LOGGER.info(f"-> Loss: {k} (weight={weights[k]}, {kw})")
    return losses, weights


# DATASETS / LOADERS
# -----------------------------------------------------------------------------
_MODES = {'train', 'val', 'test'}


def get_ds(cfg: dict, mode: Optional[str] = None) -> dict:
    """Instantiate datasets from the cfg `dataset` section with per-mode
    overrides merged in (ref `parsers.py:109-151`)."""
    trigger_datasets()
    ds = {}
    for t, kw in cfg.items():
        if kw is None:
            continue
        if not isinstance(kw, dict):
            raise TypeError(f"Expected dict of dicts. Got '{kw}'.")
        if t not in DATA_REG:
            raise KeyError(f'Unknown dataset "{t}". ({sorted(DATA_REG)})')
        c = {k: v for k, v in kw.items() if k not in _MODES}
        if mode:
            c.update(kw.get(mode, {}))
        ds[t] = DATA_REG[t](**c)
    return ds


def get_dl(mode: str, cfg_ds: dict, cfg_dl: dict,
           shard_id: int = 0, num_shards: int = 1):
    """Build the (multi-)dataset loader for a mode (ref `parsers.py:154-202`).

    Multi-dataset configs interleave via `ConcatDataLoader` (single-dataset
    batches — shapes differ per dataset). Host sharding replaces the
    reference's `DistributedSampler` plumbing, with the same per-dataset seed
    offsets (`seed * 10**i`, ref `:191-199`).
    """
    from .data import ConcatDataLoader, DataLoader
    datasets = list(get_ds(cfg_ds, mode).values())
    if not datasets:
        raise ValueError('No datasets configured.')

    cfg = {k: v for k, v in cfg_dl.items() if k not in _MODES} | (cfg_dl.get(mode) or {})
    cfg.pop('pin_memory', None)  # torch-ism kept for cfg compatibility.
    cfg.pop('use_ddp', None)     # Host sharding is always explicit here.
    seed = cfg.pop('seed', 42)

    dls = [
        DataLoader(d, seed=seed * 10 ** i, shard_id=shard_id, num_shards=num_shards, **cfg)
        for i, d in enumerate(datasets)
    ]
    return dls[0] if len(dls) == 1 else ConcatDataLoader(dls)


# OPTIMIZER / SCHEDULER
# -----------------------------------------------------------------------------
_OPTS: dict[str, Callable] = {
    'adamw': optax.adamw,
    'adam': optax.adam,
    'sgd': optax.sgd,
    'lamb': optax.lamb,
    'adabelief': optax.adabelief,
    'rmsprop': optax.rmsprop,
}


def _path_has(path, name: str) -> bool:
    return any(name in str(getattr(p, 'key', getattr(p, 'name', p))) for p in path)


def _decay_mask(params):
    """timm `param_groups_weight_decay` split: decay only ndim>1 params."""
    return jax.tree_util.tree_map(lambda p: jax.numpy.ndim(p) > 1, params)


def get_sched(cfg: Optional[dict], lr: float, steps_per_epoch: int) -> Any:
    """Compose cfg schedulers into one optax schedule over *steps*.

    Registered factories (`core.schedules`: steplr/linear/cosine) each give a
    per-epoch multiplicative factor; factors multiply together, which is
    exactly what the reference's `ChainedScheduler` does
    (`src/core/trainer.py:85-94`).
    """
    if not cfg:
        return lr

    from . import SCHED_REG, trigger_scheds
    trigger_scheds()
    factors = []
    for k, kw in cfg.items():
        if kw is None:
            continue
        if k not in SCHED_REG:
            raise KeyError(f'Unknown scheduler "{k}". ({sorted(SCHED_REG)})')
        factors.append(SCHED_REG[k](**kw))

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        val = lr
        for f in factors:
            val = val * f(epoch)
        return val

    return schedule


def get_opt(cfg: dict, steps_per_epoch: int = 1, sched_cfg: Optional[dict] = None,
            lr_scale: float = 1.0) -> optax.GradientTransformation:
    """Build the optax optimizer chain from the cfg `optimizer` section.

    :param cfg: {type, lr, weight_decay, backbone_lr?, frozen_bn?, ...}.
    :param steps_per_epoch: For converting per-epoch schedules to steps.
    :param sched_cfg: Optional cfg `scheduler` section.
    :param lr_scale: DP LR scaling (devices x accumulation, ref
        `api/train/train.py:125-128`).
    """
    cfg = dict(cfg)
    name = cfg.pop('type', cfg.pop('opt', None))
    if name is None:
        raise KeyError('Must provide an optimizer `type`.')
    if name not in _OPTS:
        raise KeyError(f'Unknown optimizer "{name}". ({sorted(_OPTS)})')

    lr = float(cfg.pop('lr', 1e-3)) * lr_scale
    blr = cfg.pop('backbone_lr', None)
    frozen_bn = cfg.pop('frozen_bn', False)
    flatten = bool(cfg.pop('flatten', False))

    def make(lr_val, filter_wd):
        sched = get_sched(sched_cfg, lr_val, steps_per_epoch)
        kw = dict(cfg)
        # timm `filter_bias_and_bn=True` semantics: the reference builds its
        # optimizer via `create_optimizer_v2(module, ...)` (ref
        # `src/tools/parsers.py:243`), which excludes biases and norm
        # scales/biases (any ndim<=1 param) from weight decay. The KBR recipe
        # (adamw, wd=1e-3, no backbone_lr) hits exactly this path. When
        # `backbone_lr` creates explicit param groups the reference passes a
        # plain list and timm does NOT filter — gate identically.
        use_mask = filter_wd and kw.get('weight_decay') and name in ('adamw', 'lamb')
        if flatten and name in ('adam', 'adamw'):
            # Update-equivalent decomposition of adam(w) with the moment
            # update over ONE flat buffer instead of ~200 per-tensor ops
            # (fewer fusions/launches per step); weight decay and the LR
            # schedule stay tree-level so the wd mask semantics are
            # untouched. Opt-in perf experiment: `optimizer.flatten: true`.
            wd = float(kw.pop('weight_decay', 0.0) or 0.0)
            parts = [optax.flatten(optax.scale_by_adam(
                b1=kw.pop('b1', 0.9), b2=kw.pop('b2', 0.999),
                eps=kw.pop('eps', 1e-8), eps_root=kw.pop('eps_root', 0.0)))]
            if wd and name == 'adamw':
                parts.append(optax.add_decayed_weights(
                    wd, mask=_decay_mask if use_mask else None))
            parts.append(optax.scale_by_learning_rate(sched))
            return optax.chain(*parts)
        if use_mask:
            kw['mask'] = _decay_mask
        return _OPTS[name](learning_rate=sched, **kw)

    if blr:
        blr = float(blr) * lr_scale
        if blr == lr:
            raise ValueError('Backbone LR must be different from the main LR')
        LOGGER.info(f'Setting backbone LR to {blr} with base LR {lr}...')
        tx = optax.multi_transform(
            {'backbone': make(blr, filter_wd=False), 'main': make(lr, filter_wd=False)},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: 'backbone' if _path_has(path, 'encoder') else 'main', params),
        )
    else:
        tx = make(lr, filter_wd=True)

    if frozen_bn:
        # Zero out grads on BatchNorm affine params (ref `parsers.py:225-231`).
        def is_bn(path, _):
            return 'frozen' if _path_has(path, 'bn') or _path_has(path, 'BatchNorm') else 'free'
        tx = optax.chain(
            optax.multi_transform(
                {'frozen': optax.set_to_zero(), 'free': optax.identity()},
                lambda params: jax.tree_util.tree_map_with_path(is_bn, params)),
            tx,
        )
    return tx


def make_optimizer(cfg: dict, steps_per_epoch: int = 1, lr_scale: float = 1.0,
                   grad_clip: Optional[float] = None,
                   accumulate: int = 1) -> optax.GradientTransformation:
    """Full training transformation: clip -> optimizer -> grad accumulation."""
    tx = get_opt(cfg.get('optimizer', {}), steps_per_epoch, cfg.get('scheduler'), lr_scale)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate and accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate))
    return tx
