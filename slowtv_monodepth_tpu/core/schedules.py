"""Registered LR schedule factories (the reference SCHED_REG equivalents).

The reference registers torch schedulers (`steplr`, `linear`, ...) into
`SCHED_REG` and chains them per epoch (`src/tools/parsers.py:246-269`). Here
each factory returns a multiplicative *schedule of the epoch*; `parsers.
get_sched` composes the configured factories into one optax step schedule.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import register

__all__ = ['steplr', 'linear', 'cosine']


@register('steplr', type='sched')
def steplr(step_size: int, gamma: float = 0.1):
    """Decay by `gamma` every `step_size` epochs (torch StepLR)."""
    def factor(epoch):
        return gamma ** (epoch // step_size)
    return factor


@register('linear', type='sched')
def linear(start_factor: float = 1. / 3, total_iters: int = 5, end_factor: float = 1.0):
    """Linear warmup from `start_factor` over `total_iters` epochs (torch LinearLR)."""
    def factor(epoch):
        t = jnp.minimum(epoch / total_iters, 1.0)
        return start_factor + (end_factor - start_factor) * t
    return factor


@register('cosine', type='sched')
def cosine(total_iters: int, min_factor: float = 0.0):
    """Cosine decay to `min_factor` over `total_iters` epochs."""
    def factor(epoch):
        t = jnp.minimum(epoch / total_iters, 1.0)
        return min_factor + (1 - min_factor) * 0.5 * (1 + jnp.cos(jnp.pi * t))
    return factor
