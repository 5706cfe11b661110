"""Array utilities shared across the framework (JAX, NHWC layout).

Behavioural equivalents of the reference's `src/tools/ops.py` helpers that the
compute path needs (eps `ops.py:63`, standardize `:250-267`, mean_normalize
`:279-286`, eye_like `:292-308`, interpolate_like `:311-314`), re-designed for
XLA: everything is shape-static, functional, and NHWC.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

__all__ = [
    'eps', 'standardize', 'unstandardize', 'to_gray', 'mean_normalize',
    'eye_like', 'resize', 'resize_like', 'upsample2x_nearest',
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
_GRAY_COEFFS = (0.299, 0.587, 0.114)


def eps(x: Union[jnp.ndarray, jnp.dtype, None] = None) -> float:
    """Machine epsilon for the input's dtype (default float32 ~1.19e-7)."""
    dtype = jnp.float32 if x is None else (x.dtype if hasattr(x, 'dtype') else x)
    return float(jnp.finfo(dtype).eps)


def standardize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """ImageNet-standardize an NHWC (or HWC) image in [0, 1]."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def unstandardize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return x * std + mean


def to_gray(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """RGB (…, 3) -> grayscale (…, 1|)."""
    coeffs = jnp.asarray(_GRAY_COEFFS, x.dtype)
    return (x * coeffs).sum(axis=-1, keepdims=keepdims)


def mean_normalize(x: jnp.ndarray, axis: Sequence[int] = (1, 2)) -> jnp.ndarray:
    """Divide by the spatial mean (ref `ops.py:279-286`; NHWC axes (1, 2))."""
    m = x.mean(axis=tuple(axis), keepdims=True)
    return x / jnp.clip(m, min=eps(x))


def eye_like(x: jnp.ndarray) -> jnp.ndarray:
    """Identity matrix broadcast to the input's (*, n, n) batch shape."""
    n = x.shape[-1]
    if x.ndim < 2 or x.shape[-2] != n:
        raise ValueError(f'Input must be (*, n, n). Got {x.shape}')
    return jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), x.shape)


def _linear_resize_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """1-D linear resample along `axis`, torch `F.interpolate(bilinear,
    align_corners=False)` semantics: 2-tap at half-pixel centers with the
    source coordinate clamped to >= 0 (aten `area_pixel_compute_source_index`)
    — NO antialiasing on downsample, unlike `jax.image.resize('linear')`,
    whose scale-widened triangle kernel diverges from torch by O(0.1) on
    unit-range images at 2x downsampling (caught by
    tests/test_convergence_horizon.py: a 1.7% disp_smooth offset hiding
    under the 1e-3 loss weight)."""
    n = x.shape[axis]
    if n == out_size:
        return x
    if n % out_size == 0:
        # Integer-factor downsample: src = (i + 0.5)s - 0.5 = si + (s-1)/2.
        # Even s -> mean of the two middle samples of each group; odd s ->
        # the middle sample. Reshape + slice: no gather in the hot train
        # step (the disp_smooth image pyramid is all integer factors).
        s = n // out_size
        shape = x.shape[:axis] + (out_size, s) + x.shape[axis + 1:]
        g = x.reshape(shape)
        lo = jnp.take(g, (s - 1) // 2, axis=axis + 1)
        if s % 2 == 0:
            hi = jnp.take(g, s // 2, axis=axis + 1)
            half = jnp.asarray(0.5, x.dtype)
            return (lo + hi) * half
        return lo
    idx = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (n / out_size) - 0.5
    idx = jnp.clip(idx, 0.0, n - 1)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = (idx - lo).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w


def resize(x: jnp.ndarray, shape: tuple[int, int], method: str = 'bilinear') -> jnp.ndarray:
    """Resize NHWC images to `shape=(h, w)`.

    `bilinear` matches torch's `align_corners=False` exactly, up AND down
    (separable 2-tap; see `_linear_resize_axis` for why `jax.image.resize`
    is wrong on downsampling). The reference uses `F.interpolate` defaults
    everywhere (`src/tools/ops.py:interpolate_like`).
    """
    if x.shape[1:3] == tuple(shape):
        return x
    if method == 'bilinear':
        x = _linear_resize_axis(x, shape[0], axis=1)
        return _linear_resize_axis(x, shape[1], axis=2)
    jax_method = {'nearest': 'nearest', 'bicubic': 'cubic'}[method]
    out_shape = (x.shape[0], shape[0], shape[1], x.shape[3])
    return jax.image.resize(x, out_shape, method=jax_method)


def resize_like(x: jnp.ndarray, other: jnp.ndarray, method: str = 'bilinear') -> jnp.ndarray:
    """Resize `x` to the spatial size of `other` (ref `interpolate_like`)."""
    return resize(x, other.shape[1:3], method=method)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Fast 2x nearest upsample for NHWC (decoder hot path; avoids gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def dilate_mask(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Morphological dilation of a boolean mask (ref `src/tools/ops.py:213-223`).

    :param mask: (b, h, w, 1) boolean mask (NHWC).
    """
    from jax import lax
    pad = kernel_size // 2
    out = lax.reduce_window(
        mask.astype(jnp.float32), -jnp.inf, lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return out > 0


def erode_mask(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Morphological erosion via inverted dilation (ref `ops.py:226-238`)."""
    return ~dilate_mask(~mask, kernel_size=kernel_size)
