"""Regularizers: disparity smoothness, feature peakiness/smoothness, occlusion, mask.

Parity with `src/regularizers/{smooth,occlusion,mask}.py`:
- `SmoothReg` mean-normalizes the disparity first ("Important! Otherwise
  degenerates to zero", `smooth.py:84`), uses forward differences with
  trailing zero padding (`smooth.py:23-27`), and optional edge-aware
  e^{-|∇I|} weighting (`smooth.py:91-94`).
- `FeatPeakReg` is a *negative* first-order loss (`smooth.py:135`).
- `OccReg` is a signed disparity mean (`occlusion.py:30-40`).
- `MaskReg` is BCE(mask, 1) (`mask.py:20-30`).

All inputs NHWC; channel-mean maps to the trailing axis.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import register
from ..ops import eps, mean_normalize

__all__ = ['compute_grad', 'compute_laplacian', 'SmoothReg', 'FeatPeakReg',
           'FeatSmoothReg', 'OccReg', 'MaskReg']


def _gaussian_blur3x3(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Separable 3x3 Gaussian blur with reflect padding (kornia-equivalent)."""
    r = jnp.arange(-1, 2, dtype=x.dtype)
    k = jnp.exp(-(r ** 2) / (2 * sigma ** 2))
    k = k / k.sum()
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode='reflect')
    x = k[0] * xp[:, :-2] + k[1] * xp[:, 1:-1] + k[2] * xp[:, 2:]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode='reflect')
    return k[0] * xp[:, :, :-2] + k[1] * xp[:, :, 1:-1] + k[2] * xp[:, :, 2:]


def compute_grad(x: jnp.ndarray, use_blur: bool = False, ch_mean: bool = False):
    """Absolute forward-difference gradients, zero-padded to input shape.

    :param x: (b, h, w, c) input.
    :return: (dx, dy) each (b, h, w, c|1).
    """
    if use_blur:
        x = _gaussian_blur3x3(x)
    dx = jnp.abs(x[:, :, :-1] - x[:, :, 1:])
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    dy = jnp.abs(x[:, :-1] - x[:, 1:])
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    if ch_mean:
        dx = dx.mean(axis=-1, keepdims=True)
        dy = dy.mean(axis=-1, keepdims=True)
    return dx, dy


def compute_laplacian(x: jnp.ndarray, use_blur: bool = False, ch_mean: bool = False):
    """Absolute second-order gradients (xx, yy, xy, yx) (ref `smooth.py:33-48`)."""
    dx, dy = compute_grad(x, use_blur=use_blur)
    dxx, dxy = compute_grad(dx, use_blur=use_blur)
    dyx, dyy = compute_grad(dy, use_blur=use_blur)
    if ch_mean:
        dxx, dxy, dyx, dyy = (d.mean(axis=-1, keepdims=True) for d in (dxx, dxy, dyx, dyy))
    return dxx, dyy, dxy, dyx


@register('disp_smooth')
class SmoothReg:
    """Edge-aware disparity smoothness (ref `smooth.py:52-97`)."""

    def __init__(self, use_edges: bool = False, use_laplacian: bool = False,
                 use_blur: bool = False):
        self.use_edges = use_edges
        self.use_laplacian = use_laplacian
        self.use_blur = use_blur
        self._fn = compute_laplacian if use_laplacian else compute_grad

    def __call__(self, disp: jnp.ndarray, img: jnp.ndarray):
        """:param disp: (b, h, w, 1) sigmoid disparity; img (b, h, w, 3)."""
        disp = mean_normalize(disp)  # Important! Otherwise degenerates to zero.
        disp_dx, disp_dy = self._fn(disp, use_blur=self.use_blur)[:2]
        disp_grad = jnp.sqrt(jnp.clip(disp_dx ** 2 + disp_dy ** 2, min=eps(disp)))

        img_dx, img_dy = self._fn(img, use_blur=self.use_blur, ch_mean=True)[:2]
        img_grad = jnp.sqrt(jnp.clip(img_dx ** 2 + img_dy ** 2, min=eps(disp)))

        if self.use_edges:
            disp_dx = disp_dx * jnp.exp(-img_dx)
            disp_dy = disp_dy * jnp.exp(-img_dy)

        loss = disp_dx.mean() + disp_dy.mean()
        return loss, {'disp_grad': disp_grad, 'image_grad': img_grad}


@register('feat_peaky')
class FeatPeakReg:
    """First-order feature peakiness (negative loss; ref `smooth.py:101-136`)."""

    def __init__(self, use_edges: bool = False):
        self.use_edges = use_edges

    def __call__(self, feat: jnp.ndarray, img: jnp.ndarray):
        feat_dx, feat_dy = compute_grad(feat)
        feat_grad = jnp.sqrt(jnp.clip(feat_dx ** 2 + feat_dy ** 2, min=eps(feat)))
        if self.use_edges:
            dx, dy = compute_grad(img, ch_mean=True)
            feat_dx = feat_dx * jnp.exp(-dx)
            feat_dy = feat_dy * jnp.exp(-dy)
        loss = -(feat_dx.mean() + feat_dy.mean())
        return loss, {'feat_grad': feat_grad}


@register('feat_smooth')
class FeatSmoothReg:
    """Second-order feature smoothness (ref `smooth.py:140-176`)."""

    def __init__(self, use_edges: bool = False):
        self.use_edges = use_edges

    def __call__(self, feat: jnp.ndarray, img: jnp.ndarray):
        feat_dxx, feat_dyy, feat_dxy, feat_dyx = compute_laplacian(feat)
        feat_grad = jnp.sqrt(jnp.clip(feat_dxx ** 2 + feat_dyy ** 2, min=eps(feat)))
        if self.use_edges:
            dxx, dyy, dxy, dyx = compute_laplacian(img, ch_mean=True)
            feat_dxx = feat_dxx * jnp.exp(-dxx)
            feat_dyy = feat_dyy * jnp.exp(-dyy)
            feat_dxy = feat_dxy * jnp.exp(-dxy)
            feat_dyx = feat_dyx * jnp.exp(-dyx)
        loss = feat_dxx.mean() + feat_dyy.mean() + feat_dxy.mean() + feat_dyx.mean()
        return loss, {'feat_grad': feat_grad}


@register('disp_occ')
class OccReg:
    """Disparity occlusion regularizer (ref `occlusion.py:10-40`)."""

    def __init__(self, invert: bool = False):
        self.invert = invert
        self._sign = -1.0 if invert else 1.0

    def __call__(self, x: jnp.ndarray):
        return self._sign * x.mean(), {}


@register('disp_mask')
class MaskReg:
    """BCE(mask, 1) explainability regularizer (ref `mask.py:12-30`)."""

    def __call__(self, x: jnp.ndarray):
        x = jnp.clip(x, eps(x), 1.0)
        loss = -jnp.log(x).mean()
        return loss, {}
