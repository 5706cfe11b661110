"""Component registries mapping config keys to classes/factories.

Equivalent capability to the reference registry (`src/registry.py:7-138`): six
registries (net/loss/data/pred/dec/sched), a `@register` decorator with
name-suffix type guessing, and lazy `trigger_*` import hooks that populate each
registry on first use so config parsing never needs eager imports.
"""
from __future__ import annotations

import importlib
from typing import Callable, Iterable, Union

__all__ = [
    'NET_REG', 'LOSS_REG', 'DATA_REG', 'PRED_REG', 'DEC_REG', 'SCHED_REG',
    'register',
    'trigger_networks', 'trigger_losses', 'trigger_datasets', 'trigger_decoders',
    'trigger_preds', 'trigger_scheds',
]

NET_REG: dict[str, type] = {}
LOSS_REG: dict[str, type] = {}
DATA_REG: dict[str, type] = {}
PRED_REG: dict[str, type] = {}
DEC_REG: dict[str, type] = {}
SCHED_REG: dict[str, Callable] = {}

_TYPE2REG = {
    'net': NET_REG, 'loss': LOSS_REG, 'data': DATA_REG,
    'pred': PRED_REG, 'dec': DEC_REG, 'sched': SCHED_REG,
}

# Suffix-based registry guessing for common naming conventions.
_NAME2TYPE = {
    'Net': 'net',
    'Loss': 'loss', 'Reg': 'loss',
    'Dataset': 'data',
    'Predictor': 'pred',
    'Decoder': 'dec',
    'Scheduler': 'sched',
}


def _guess_type(cls) -> str:
    name = getattr(cls, '__name__', str(cls))
    for suffix, t in _NAME2TYPE.items():
        if name.endswith(suffix):
            return t
    raise ValueError(
        f'Could not guess registry for "{name}". Pass `type=` explicitly '
        f'(one of {sorted(_TYPE2REG)}).'
    )


def register(name: Union[str, Iterable[str]], type: str = None):  # noqa: A002
    """Class decorator adding the target to a registry under one or more names.

    :param name: Registry key (or several keys) the class is exposed as.
    :param type: Registry to use {net, loss, data, pred, dec, sched}. Guessed
        from the class-name suffix when omitted.
    """
    names = [name] if isinstance(name, str) else list(name)

    def wrapper(cls):
        reg = _TYPE2REG[type or _guess_type(cls)]
        for n in names:
            if n in reg and reg[n] is not cls:
                raise KeyError(f'Duplicate registry key "{n}" ({reg[n]} vs. {cls}).')
            reg[n] = cls
        return cls

    return wrapper


def _trigger(module: str):
    importlib.import_module(module, package=__package__)


def trigger_networks():
    """Populate NET_REG + DEC_REG by importing the models package."""
    _trigger('.models')


def trigger_decoders():
    _trigger('.models.decoders')


def trigger_losses():
    _trigger('.losses')


def trigger_datasets():
    _trigger('.data')


def trigger_preds():
    _trigger('.core.predictors')


def trigger_scheds():
    _trigger('.core.schedules')
