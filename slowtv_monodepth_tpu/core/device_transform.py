"""Device-side derivation of the standardized net inputs `x` from the raw
loss targets `y` (TPU-native input-pipeline halving of host->device traffic).

The reference pipeline (ref `src/datasets/base_mde.py:246-281`) ships TWO
float32 copies of every image to the accelerator: the raw `y` images (loss
targets / warp sources) and the photometrically-jittered + ImageNet-
standardized `x` images (network inputs). The `x` copy is a pure elementwise
function of `y` plus a handful of per-item scalars, so with
`device_transform: true` on a dataset the loader ships ONLY `y` (plus a
(b, 4) op order, (b, 4) factors and a (b,) gate) and this module recreates
`x` on device — halving H2D bytes with no numeric change beyond float
reduction order (the jiggle math mirrors `data/augment.py` term for term).

Order of operations is preserved exactly: derive runs right after
`device_put` and BEFORE the aspect-ratio augmentation, so the chain is
jiggle -> standardize -> crop/resize, the same as the host pipeline
(clipping does not commute with resizing, so deriving after AR-aug would
not be equivalent).

Items whose photo augmentation did not fire pass through via a select on the
per-item gate — the hue HSV round trip is not an exact identity at shift 0,
so an "identity factors" encoding would perturb non-augmented items.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.base_mde import IMAGENET_MEAN, IMAGENET_STD

__all__ = ['derive_batch', 'derive_x', 'needs_derive']

_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _brightness(img, factor):
    return jnp.clip(img * factor, 0, 1)


def _contrast(img, factor):
    # Joint mean over the item's whole (target + support) stack — matches the
    # host `adjust_contrast` applied to the stacked array.
    mean = (img[..., :3] @ _GRAY).mean()
    return jnp.clip((img - mean) * factor + mean, 0, 1)


def _saturation(img, factor):
    gray = (img[..., :3] @ _GRAY)[..., None]
    return jnp.clip(gray + (img - gray) * factor, 0, 1)


def _hue(img, shift):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img[..., :3].max(-1)
    minc = img[..., :3].min(-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0)

    dc = jnp.where(deltac == 0, 1, deltac)
    rc, gc, bc = (maxc - r) / dc, (maxc - g) / dc, (maxc - b) / dc
    h = jnp.select(
        [maxc == r, maxc == g], [bc - gc, 2.0 + rc - bc], default=4.0 + gc - rc)
    h = (h / 6.0) % 1.0
    h = jnp.where(deltac == 0, 0.0, h)

    h = (h + shift) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6

    conds = [i == k for k in range(6)]
    r2 = jnp.select(conds, [v, q, p, p, t, v])
    g2 = jnp.select(conds, [t, v, v, q, p, p])
    b2 = jnp.select(conds, [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1).astype(img.dtype)


_OPS = (_brightness, _contrast, _saturation, _hue)


def _jiggle(stack: jnp.ndarray, order: jnp.ndarray, factors: jnp.ndarray,
            on: jnp.ndarray) -> jnp.ndarray:
    """One item's (1+n, h, w, 3) stack through its sampled op sequence."""
    out = stack
    for slot in range(4):
        out = jax.lax.switch(order[slot], _OPS, out, factors[slot])
    return jnp.where(on, out, stack)


def needs_derive(x: dict) -> bool:
    """True when the loader shipped a derive-on-device batch (no x images)."""
    return 'imgs' not in x and 'photo_order' in x


@jax.jit
def derive_batch(x: dict, y: dict):
    """Full on-device batch restoration: widen uint8-shipped `y` images
    (`transfer_uint8` datasets, a further 4x H2D cut) to f32 [0, 1], then
    recreate `x`. Non-image y keys (depth, K, T_stereo, ...) pass through.
    """
    y = dict(y)
    for k in ('imgs', 'supp_imgs'):
        if k in y and y[k].dtype == jnp.uint8:
            y[k] = y[k].astype(jnp.float32) / 255.0
    return derive_x(x, y), y


@jax.jit
def derive_x(x: dict, y: dict) -> dict:
    """Recreate the standardized net-input dict from the raw `y` images.

    :param x: Collated x WITHOUT images: photo_order (b, 4) int32,
        photo_factors (b, 4) f32, photo_on (b,) bool (+ any passthrough keys).
    :param y: Raw loss-target dict: imgs (b, h, w, 3) [+ supp_imgs (n, b, ...)].
    :return: x with imgs/supp_imgs jiggled + ImageNet-standardized.
    """
    imgs = y['imgs']
    supp = y.get('supp_imgs')
    stack = imgs[None] if supp is None else jnp.concatenate([imgs[None], supp], 0)

    stack = jax.vmap(_jiggle, in_axes=(1, 0, 0, 0), out_axes=1)(
        stack, x['photo_order'], x['photo_factors'], x['photo_on'])
    stack = (stack - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    out = {k: v for k, v in x.items()
           if k not in ('photo_order', 'photo_factors', 'photo_on')}
    out['imgs'] = stack[0]
    if supp is not None:
        out['supp_imgs'] = stack[1:]
    return out
