"""Supervised regression losses (proxy depth hints / virtual stereo consistency).

Parity with `src/losses/regression.py:11-75`: l1 / log-l1 / berHu (dynamic
delta = 0.2·max-error) criteria, optional disparity-space inversion, and a
valid-pixel mask normalizing the summed error.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import register
from ..ops import eps
from ..ops.geometry import to_inv

__all__ = ['l1_loss', 'log_l1_loss', 'berhu_loss', 'RegressionLoss']


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def log_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.log1p(l1_loss(pred, target))


def berhu_loss(pred: jnp.ndarray, target: jnp.ndarray,
               delta: float = 0.2, dynamic: bool = True) -> jnp.ndarray:
    """berHu: L1 below delta, scaled L2 above (ref `regression.py:23-37`)."""
    diff = l1_loss(pred, target)
    d = delta * diff.max() if dynamic else jnp.asarray(delta, pred.dtype)
    diff_delta = (diff ** 2 + d ** 2) / (2 * d + eps(pred))
    return jnp.where(diff <= d, diff, diff_delta)


@register(('depth_regr', 'stereo_const'))
class RegressionLoss:
    """Masked dense regression loss (ref `regression.py:41-75`).

    :param loss_name: Criterion {l1, log_l1, berhu}.
    :param invert: If True, convert depth inputs into disparity first.
    :param use_automask: If True, the trainer computes the DepthHints automask
        (ref note `regression.py:44-46`: the automask lives in the step fn).
    """

    def __init__(self, loss_name: str = 'berhu', invert: bool = False,
                 use_automask: bool = False):
        self.loss_name = loss_name
        self.invert = invert
        self.use_automask = use_automask
        self.criterion = {'l1': l1_loss, 'log_l1': log_l1_loss, 'berhu': berhu_loss}[loss_name]

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None):
        if self.invert:
            pred, target = to_inv(pred), to_inv(target)
        if mask is None:
            mask = jnp.ones_like(target)
        mask = mask.astype(pred.dtype)
        err = mask * self.criterion(pred, target)
        loss = err.sum() / jnp.clip(mask.sum(), min=1.0)
        return loss, {'err_regr': err, 'mask_regr': mask}
