"""On-device training metrics (the torchmetrics equivalents).

Parity with `src/utils/metrics.py:7-111` + `src/tools/parsers.py:272-280`:
MAE, RMSE, LogSI (scale-invariant in log depth), AbsRel (%), DeltaAcc<1.25 —
computed on median-aligned, mask-NaN'd depths. Pure `jnp`; across a device
mesh the (sum, count) states reduce with `psum`, mirroring the reference's
`dist_reduce_fx='sum'` (`src/utils/metrics.py:25-26`).

The `DeltaAcc` denominator intentionally reproduces the reference's legacy
`thresh.nansum` (sum of ratio values, not a count, `metrics.py:108-110`) since
these monitors define comparability with published training curves.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ['compute_train_metrics', 'METRIC_NAMES']

METRIC_NAMES = ('MAE', 'RMSE', 'LogSI', 'AbsRel', 'Acc')


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Row-wise mean over valid entries: (b, n) -> (b,)."""
    n = jnp.clip(mask.sum(axis=1), min=1)
    return jnp.where(mask, x, 0.0).sum(axis=1) / n


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Row-wise median over valid entries: (b, n) -> (b,).

    Masked-out entries are pushed to +inf and the k-th order statistic is read
    at k = (count-1)/2 (interpolating even counts), matching `nanmedian`.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=1)
    cnt = mask.sum(axis=1)
    lo = jnp.clip((cnt - 1) // 2, min=0)
    hi = jnp.clip(cnt // 2, min=0)
    take = lambda idx: jnp.take_along_axis(xs, idx[:, None], axis=1)[:, 0]  # noqa: E731
    med = 0.5 * (take(lo) + take(hi))
    return jnp.where(cnt > 0, med, 1.0)


def compute_train_metrics(pred: jnp.ndarray, target: jnp.ndarray,
                          min_depth: float = 0.1, max_depth: float = 100.0) -> dict:
    """Median-aligned batch depth metrics (ref `src/core/trainer.py:531-552`).

    :param pred: (b, h, w, 1) scaled depth prediction (already at GT shape or
        resized by the caller).
    :param target: (b, h, w, 1) ground-truth depth (0/neg = invalid).
    :return: {name: scalar} averaged over the batch.
    """
    b = pred.shape[0]
    pred = jnp.clip(pred.reshape(b, -1), min_depth, max_depth)
    target = target.reshape(b, -1)
    mask = (target > min_depth) & (target < max_depth)

    r = _masked_median(target, mask) / _masked_median(pred, mask)
    pred = jnp.clip(pred * r[:, None], min_depth, max_depth)
    target = jnp.clip(target, min_depth, max_depth)

    err = pred - target
    abs_err = jnp.abs(err)

    mae = _masked_mean(abs_err, mask)
    rmse = jnp.sqrt(_masked_mean(err ** 2, mask))

    log_err = jnp.log(pred) - jnp.log(target)
    log_si = jnp.sqrt(jnp.clip(
        _masked_mean(log_err ** 2, mask) - _masked_mean(log_err, mask) ** 2, min=0))

    abs_rel = _masked_mean(abs_err / target, mask)

    thresh = jnp.maximum(target / pred, pred / target)
    # Legacy denominator: sum of thresh over valid pixels (see module docstring).
    acc = (jnp.where(mask, thresh < 1.25, False).sum(axis=1)
           / jnp.clip(jnp.where(mask, thresh, 0.0).sum(axis=1), min=1.0))

    return {
        'MAE': mae.mean(),
        'RMSE': rmse.mean(),
        'LogSI': 100.0 * log_si.mean(),
        'AbsRel': 100.0 * abs_rel.mean(),
        'Acc': 100.0 * acc.mean(),
    }
