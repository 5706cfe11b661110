"""Batch-level aspect-ratio augmentation (the KBR contribution).

Behavioral parity with `src/core/aspect_ratio.py:14-186`: sample one of 16
aspect ratios, take a random-size centre crop, then resize so the output has
at most `eps x ref_shape` pixels and dims that are multiples of 32; adjust K
accordingly.

TPU-first redesign for XLA's static-shape compilation model:

- Shape *sampling* happens on host with numpy RNG (`sample_crop`,
  `sample_resize` reproduce the reference's distributions).
- The output (resize) shape is the only static quantity; the centre-crop box
  is passed to the device as a *traced* float pair, so a new crop size does
  NOT trigger recompilation.
- Crop + resize fuse into ONE bilinear resample (`crop_resize`): output pixel
  centers map linearly into the crop window (both the reference's kornia
  `center_crop` and `F.interpolate(align_corners=False)` are half-pixel-center
  bilinear maps, so the composition is a single affine resample).
- The set of possible output shapes is finite (multiples of 32 under the
  ref-pixel budget per aspect ratio) => a bounded warm-up compile set; use
  `all_output_shapes` to pre-compile.
"""
from __future__ import annotations

import random as _random
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample

__all__ = ['RATIOS', 'LABELS', 'sample_crop', 'sample_resize', 'crop_resize',
           'aspect_ratio_aug', 'all_output_shapes']

LABELS = [
    '6/13', '9/16', '3/5', '2/3', '4/5', '1/1',  # Portrait
    '5/4', '4/3', '3/2', '14/9', '5/3', '16/9', '2/1', '24/10', '33/10', '18/5',  # Landscape
]
RATIOS = [eval(i) for i in LABELS]  # noqa: S307 (static fraction strings)
RATIO2LABEL = dict(zip(RATIOS, LABELS))


def _find_closest_multiple(i: float, n: int = 32) -> int:
    return round(i / n) * n


def sample_crop(shape: Sequence[int], min: float = 0.5, max: float = 1.0,  # noqa: A002
                rng: Optional[_random.Random] = None) -> tuple[tuple[int, int], float]:
    """Sample a centre-crop shape with a random aspect ratio
    (ref `aspect_ratio.py:100-127`, same candidate-set construction)."""
    assert max >= min
    rng = rng or _random
    n = 10
    hs = np.array([rng.randrange(int(shape[0] * min), int(shape[0] * max)) for _ in range(n)])
    ws = np.array([rng.randrange(int(shape[1] * min), int(shape[1] * max)) for _ in range(n)])

    r = rng.choice(RATIOS)
    hs, ws = (np.concatenate([hs, (ws / r).astype(int)]),
              np.concatenate([(r * hs).astype(int), ws]))

    valid = (hs >= 0) & (hs <= shape[0]) & (ws >= 0) & (ws <= shape[1])
    i = rng.choice(list(np.nonzero(valid)[0]))
    return (int(hs[i]), int(ws[i])), r


def sample_resize(shape: Sequence[int], ref_shape: Sequence[int],
                  eps: float = 0.8) -> tuple[int, int]:
    """Resize shape with ~ref pixel count, multiple-of-32 dims
    (ref `aspect_ratio.py:169-186`)."""
    mul = 32
    n, n_ref = shape[0] * shape[1], ref_shape[0] * ref_shape[1]
    r = (n_ref / n) ** 0.5
    res = [_find_closest_multiple(r * i, n=mul) for i in shape]
    while res[0] * res[1] > n_ref * eps:
        res = [i - mul for i in res]
    # Departure from the reference: clamp dims to >=32. At production shapes
    # this never triggers; at toy scales extreme ratios could snap a dim to 0.
    return tuple(max(i, mul) for i in res)


@partial(jax.jit, static_argnames=('out_shape',))
def crop_resize(img: jnp.ndarray, crop_hw: jnp.ndarray, out_shape: tuple[int, int]) -> jnp.ndarray:
    """Fused centre-crop + bilinear resize (align_corners=False semantics).

    :param img: (b, h, w, c).
    :param crop_hw: (2,) traced float crop size (h_c, w_c) — centre-anchored.
    :param out_shape: Static output (h, w).
    :return: (b, out_h, out_w, c).
    """
    b, h, w, _ = img.shape
    oh, ow = out_shape
    ch, cw = crop_hw[0], crop_hw[1]

    # Output pixel centers -> crop coords -> source coords (half-pixel centers).
    ys = (jnp.arange(oh, dtype=img.dtype) + 0.5) * (ch / oh) - 0.5 + (h - ch) / 2
    xs = (jnp.arange(ow, dtype=img.dtype) + 0.5) * (cw / ow) - 0.5 + (w - cw) / 2

    # Normalize to [-1, 1] for grid_sample (align_corners=False inverse map).
    gy = (2 * ys + 1) / h - 1
    gx = (2 * xs + 1) / w - 1
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing='xy'), axis=-1)  # (oh, ow, 2)
    grid = jnp.broadcast_to(grid, (b, oh, ow, 2))
    return grid_sample(img, grid, padding_mode='border')


def _adjust_K(K: jnp.ndarray, crop_hw, shape, out_shape) -> jnp.ndarray:
    """centre_crop_K + resize_K with a traced crop (ref `geometry.py:232-263`)."""
    ch, cw = crop_hw[0], crop_hw[1]
    # Centre crop: principal point shifts by the crop ratio.
    K = K.at[..., 0, 2].multiply(cw / shape[1])
    K = K.at[..., 1, 2].multiply(ch / shape[0])
    # Resize: rows scale to the new shape.
    K = K.at[..., 0, :].multiply(out_shape[1] / cw)
    K = K.at[..., 1, :].multiply(out_shape[0] / ch)
    return K


def aspect_ratio_aug(batch: tuple, p: float = 1.0, crop_min: float = 0.5,
                     crop_max: float = 1.0, ref_shape: Optional[Sequence[int]] = None,
                     rng: Optional[_random.Random] = None) -> tuple:
    """Apply the full AR augmentation to an on-device batch
    (ref `aspect_ratio.py:36-64`).

    :param batch: (x, y, m) with NHWC images; `x/y['supp_imgs']` are (n, b, ...).
    :return: Augmented (x, y, m); images at a bucketed static shape.
    """
    rng = rng or _random
    x, y, m = batch
    sh = tuple(x['imgs'].shape[1:3])

    if rng.random() > p:
        if ref_shape and tuple(ref_shape) != sh:
            return _apply(batch, crop_hw=sh, out_shape=sample_resize(sh, ref_shape, eps=1.0))
        return batch

    ref_shape = tuple(ref_shape or sh)
    crop_shape, ratio = sample_crop(sh, crop_min, crop_max, rng=rng)
    out_shape = sample_resize(crop_shape, ref_shape, eps=0.8)
    m.setdefault('augs', []).append(
        f'{list(sh)} -> {list(crop_shape)} -> {RATIO2LABEL[ratio]} -> {list(out_shape)}')
    return _apply(batch, crop_hw=crop_shape, out_shape=out_shape)


def _apply(batch: tuple, crop_hw, out_shape: tuple[int, int]) -> tuple:
    """Resample every spatial tensor in the batch to `out_shape`."""
    x, y, m = batch
    x, y = dict(x), dict(y)
    sh = tuple(x['imgs'].shape[1:3])
    crop = jnp.asarray(crop_hw, x['imgs'].dtype)

    fn = lambda img: crop_resize(img, crop, out_shape)  # noqa: E731
    fn5 = lambda img: crop_resize(  # noqa: E731
        img.reshape((-1,) + img.shape[2:]), crop, out_shape
    ).reshape(img.shape[:2] + out_shape + img.shape[-1:])

    for d in (x, y):
        if 'imgs' in d:
            d['imgs'] = fn(d['imgs'])
        if 'supp_imgs' in d:
            d['supp_imgs'] = fn5(d['supp_imgs'])
    if 'depth' in y:
        y['depth'] = fn(y['depth'])
    if 'depth_hints' in y:
        raise RuntimeError('Geometric augmentation should not be combined with '
                           'depth hints (interpolating depth is ill-defined).')
    if 'K' in y:
        y['K'] = _adjust_K(y['K'], crop, sh, out_shape)
    return x, y, m


def all_output_shapes(src_shapes: Sequence[Sequence[int]], ref_shape: Sequence[int],
                      crop_min: float = 0.5, crop_max: float = 1.0) -> set:
    """Enumerate the bucketed output shapes the augmentation can emit, for
    warm-up compilation. Conservative: scans crop sizes at 8px granularity."""
    shapes = set()
    for sh in src_shapes:
        shapes.add(sample_resize(sh, ref_shape, eps=1.0))  # p-miss path
        for r in RATIOS:
            for hh in range(int(sh[0] * crop_min), int(sh[0] * crop_max) + 1, 8):
                ww = int(r * hh)
                if 0 < ww <= sh[1]:
                    shapes.add(sample_resize((hh, ww), ref_shape, eps=0.8))
            for ww in range(int(sh[1] * crop_min), int(sh[1] * crop_max) + 1, 8):
                hh = int(ww / r)
                if 0 < hh <= sh[0]:
                    shapes.add(sample_resize((hh, ww), ref_shape, eps=0.8))
    return shapes
