"""Pallas TPU kernel: bilinear grid sampling with border padding.

The hot op of the photometric loss (`ops.view_synth` -> grid_sample; ref
`src/tools/geometry.py:353-391` uses `F.grid_sample`). The XLA path lowers to
four independent gathers over the full image; this kernel keeps one image
resident in VMEM per grid step and performs all four neighbor reads + the
bilinear blend in a single pass, halving HBM traffic for the support frames.

Semantics match `ops.sample.grid_sample(..., padding_mode='border')`
exactly: align_corners=False normalization, clamp-to-edge, NHWC.

The kernel requires the source image to fit VMEM ((h*w*c+out) * 4B; fine for
the loss path at <=384x640 RGB). `grid_sample_fused` falls back to the XLA
gather implementation when the footprint is too large or Pallas is
unavailable (CPU tests run the interpreter).

STATUS: numerically validated in interpreter mode; current Mosaic rejects the
compiled path ("Not implemented: Multiple source vregs along gather
dimension" — its vector gather cannot index across vregs, i.e. a >8-row
source axis). `grid_sample_fused` therefore transparently uses the XLA
gather path on TPU today; the kernel + dispatch stay in place for a
DMA-indexed rewrite once per-row descriptor DMA lands here.

PERF NOTE (measured on v5e, KBR step b4 @384x640, HONEST host-fetch sync —
`block_until_ready` is a no-op over the axon tunnel): the warp gathers are
THE step bottleneck. The original 4-corner `take_along_axis` formulation
cost ~645 ms of an ~860 ms step (TPU gathers are descriptor-rate bound,
~20-27 ns/index); `ops/sample.py` now packs the 4 corners into the operand
channel axis via edge-replicated shifts so ONE gather fetches the full 2x2
neighborhood, cutting the step to ~434 ms. Per-pixel index count is already
minimal; a Pallas kernel cannot beat the DMA descriptor rate for arbitrary
random access while Mosaic's vector gather stays single-vreg, so the XLA
packed gather is the production path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sample import grid_sample as _grid_sample_xla

__all__ = ['grid_sample_pallas', 'grid_sample_fused']

_VMEM_BUDGET = 12 * 1024 * 1024  # Leave headroom out of ~16MB/core.


def _kernel(img_ref, grid_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401 (kernel scope)

    img = img_ref[0]        # (h, w, c) — block is (1, h, w, c).
    grid = grid_ref[0]      # (oh, ow, 2)
    h, w, c = img.shape
    oh, ow, _ = grid.shape

    # align_corners=False: x = ((gx + 1) * w - 1) / 2.
    fx = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    fy = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = img.reshape(h * w, c)

    def take(yi, xi):
        # Mosaic lowers gathers in take_along_axis form: indices broadcast to
        # the output shape, gathered along one axis.
        idx = (yi * w + xi).reshape(-1)
        idx2 = jnp.broadcast_to(idx[:, None], (oh * ow, c))
        return jnp.take_along_axis(flat, idx2, axis=0).reshape(oh, ow, c)

    top = take(y0i, x0i) * (1 - wx) + take(y0i, x1i) * wx
    bot = take(y1i, x0i) * (1 - wx) + take(y1i, x1i) * wx
    out_ref[0] = top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=('interpret',))
def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas bilinear border sampler.

    :param img: (b, h, w, c) source images.
    :param grid: (b, oh, ow, 2) sample coords in [-1, 1] as (x, y).
    :return: (b, oh, ow, c) sampled output.
    """
    from jax.experimental import pallas as pl

    b, h, w, c = img.shape
    _, oh, ow, _ = grid.shape

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, oh, ow, 2), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), img.dtype),
        interpret=interpret,
    )(img, grid)


def grid_sample_fused(img: jnp.ndarray, grid: jnp.ndarray,
                      padding_mode: str = 'border') -> jnp.ndarray:
    """Pallas sampler when profitable/possible, else the XLA gather path."""
    if padding_mode != 'border':
        return _grid_sample_xla(img, grid, padding_mode)
    b, h, w, c = img.shape
    footprint = (h * w * c + grid.shape[1] * grid.shape[2] * (c + 2)) * img.dtype.itemsize
    if footprint > _VMEM_BUDGET:
        return _grid_sample_xla(img, grid, padding_mode)
    try:
        return grid_sample_pallas(img, grid)
    except Exception:  # Unsupported backend/lowering: fall back.
        return _grid_sample_xla(img, grid, padding_mode)
