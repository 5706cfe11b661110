"""Differentiable bilinear grid sampling (the `F.grid_sample` equivalent).

JAX has no native grid sampler; this is a gather-based implementation with
semantics matching the reference's hot op exactly
(`src/tools/geometry.py:364`):
``F.grid_sample(mode='bilinear', padding_mode='border', align_corners=False)``.

Conventions (torch-parity, verified by golden tests vs torch CPU):
- `grid` holds normalized coords in [-1, 1] ordered (x, y), shape (b, h, w, 2).
- align_corners=False: pixel coord ``p = ((g + 1) * size - 1) / 2``.
- border padding: coords are clamped to [0, size-1] BEFORE computing corner
  weights (so out-of-image gradients w.r.t. the grid are zero, as in torch).
- zeros padding: corners outside the image contribute zero.

Two execution paths, identical semantics:
- TPU border mode (the training hot loop) runs the adaptive Pallas warp
  kernel (`ops/pallas_warp.py`) via a custom_vjp whose grid gradient is a
  pure elementwise product of the kernel's emitted ddx/ddy.
- Everywhere else: a single packed XLA gather (the 4 bilinear corners ride
  the channel axis via edge-replicated shifts — TPU gathers are
  descriptor-rate bound, so one 4c-wide gather beats four c-wide ones ~4x).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['grid_sample']


def _sample_border_fused(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Border-mode bilinear sample via ONE packed-corner gather (XLA path).

    Profiling the KBR step showed four independent corner gathers at ~72% of
    step time (TPU gathers are descriptor-rate bound, ~20ns/index on v5e);
    packing the 2x2 neighborhood into the operand channels makes it one
    gather. Border semantics: clamp the CONTINUOUS coordinate first (exactly
    torch's border mode) and edge-replicate the +1 shifts.

    :param img: (b, h, w, c); :param x/y: (b, n) pixel coords (unclamped).
    :return: (b, n, c) samples.
    """
    b, h, w, c = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    # Pack the 4 bilinear corners into the channel axis with edge-replicated
    # +1 shifts: one gather fetches the whole 2x2 neighborhood. TPU gathers
    # are descriptor-rate bound (~20ns/index on v5e), so one 4c-wide gather
    # is ~4x faster than four c-wide ones; the shifts are cheap vectorized
    # copies. Edge replication IS border padding for the +1 corners, and the
    # continuous-coord clamp above handles the rest — semantics stay exactly
    # torch `padding_mode='border', align_corners=False`.
    sx = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    sy = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    sxy = jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)
    # (Measured v5e gather cliff: rows of 9..63 f32 lanes run at 27-57
    # ns/index vs ~17 for <=8 / >=64. Padding the 12-lane row to 64 rides
    # the fast path but materializes a (b, n, 64) = 2 GB gather output and
    # OOMs inside the train step, so the 12-lane form stays.)
    packed = jnp.concatenate([img, sx, sy, sxy], axis=-1)  # (b, h, w, 4c)

    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32))[..., None]
    g4 = jnp.take_along_axis(packed.reshape(b, h * w, 4 * c), idx, axis=1)

    v00, v01, v10, v11 = (g4[..., i * c:(i + 1) * c] for i in range(4))
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _unnormalize(g: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> pixel coords, align_corners=False convention."""
    return ((g + 1.0) * size - 1.0) / 2.0


def _gather_2d(img_flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, w: int) -> jnp.ndarray:
    """Gather (b, n, c) pixels from flattened (b, h*w, c) images."""
    idx = iy * w + ix  # (b, n)
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1)


@jax.custom_vjp
def _warp_pallas_core(img, fx, fy):
    from .pallas_warp import warp_bilinear_pallas
    out, _, _ = warp_bilinear_pallas(img, fx, fy)
    return out


def _warp_pallas_fwd(img, fx, fy):
    from .pallas_warp import warp_bilinear_pallas
    out, ddx, ddy = warp_bilinear_pallas(img, fx, fy)
    return out, (img, fx, fy, ddx, ddy)


def _warp_pallas_bwd(res, g):
    img, fx, fy, ddx, ddy = res
    shape, dtype = img.shape, img.dtype
    gfx = (g * ddx).sum(-1)
    gfy = (g * ddy).sum(-1)
    # Image cotangent via XLA scatter-add — only reachable from the feature/
    # autoencoder reconstruction losses; XLA dead-code-eliminates it when the
    # image is a constant (the photometric path).
    b, h, w, c = shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = jnp.zeros((b, h * w, c), jnp.float32)
    n = fx.shape[1] * fx.shape[2]
    gf = g.reshape(b, n, c)
    for yi, xi, ww in ((y0i, x0i, (1 - wx) * (1 - wy)),
                      (y0i, x1i, wx * (1 - wy)),
                      (y1i, x0i, (1 - wx) * wy),
                      (y1i, x1i, wx * wy)):
        idx = (yi * w + xi).reshape(b, n)
        flat = flat.at[jnp.arange(b)[:, None], idx].add(
            gf * ww.reshape(b, n, 1))
    return flat.reshape(shape).astype(dtype), gfx, gfy


_warp_pallas_core.defvjp(_warp_pallas_fwd, _warp_pallas_bwd)


def _use_pallas_warp(img_shape) -> bool:
    import os

    from .dispatch import pallas_disabled
    if pallas_disabled('warp'):
        return False
    if img_shape[-1] > 8:  # Kernel unrolls channels; keep it image-sized.
        return False
    from .pallas_warp import pallas_warp_supported
    if os.environ.get('SLOWTV_FORCE_PALLAS_WARP'):  # Tests (interpret mode).
        return pallas_warp_supported(img_shape, 'tpu')
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return pallas_warp_supported(img_shape, backend)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = 'border') -> jnp.ndarray:
    """Sample `img` (b, h, w, c) at `grid` (b, gh, gw, 2) locations.

    :param img: (b, h, w, c) Source image (NHWC).
    :param grid: (b, gh, gw, 2) Normalized sample coords in [-1, 1] as (x, y).
    :param padding_mode: {'border', 'zeros'} Out-of-image behaviour.
    :return: (b, gh, gw, c) Sampled image.

    On TPU the border path runs the Pallas warp kernel (`ops/pallas_warp.py`,
    ~5x the XLA gather on video-like warps); elsewhere (and for `zeros`) the
    XLA gather path below is used. Both match torch
    `grid_sample(bilinear, border/zeros, align_corners=False)` exactly.

    Under an active `dispatch.spatial_warp_shardmap` context (the spatial-
    sharded train step), the call routes through a `shard_map` that keeps the
    Pallas kernel alive per height shard — see `_grid_sample_spatial`.
    """
    from .dispatch import spatial_warp_context
    ctx = spatial_warp_context()
    if ctx is not None:
        return _grid_sample_spatial(img, grid, padding_mode, ctx)
    return _grid_sample_impl(img, grid, padding_mode)


def _shard_map():
    try:
        from jax import shard_map
        return shard_map, {'check_vma': False}
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map
        return shard_map, {'check_rep': False}


def _grid_sample_spatial(img, grid, padding_mode: str, ctx) -> jnp.ndarray:
    """`grid_sample` under spatial (height) sharding, Pallas kernel alive.

    The warp is a data-dependent gather: an output row can read ANY source
    row, so a height-sharded source cannot feed the kernel shard-locally.
    Two shard_map partitionings keep the kernel running, tried in order:

    1. **Batch reshard** (b divides n_data*n_spatial — the training case: the
       warp runs on the (n_supp x n_scales x batch)-flattened stack): both
       operands repartition their BATCH axis over ALL mesh devices with full
       height per image (in_specs `P((da, sa))`; GSPMD inserts the
       all-to-all). Memory-neutral — each device holds 1/N of the stack
       either way — and the backward needs no psum. Feeds the photo kernel's
       identical layout downstream with no intermediate reshard.
    2. **Source replication** (batch too small, grid height divisible): the
       SOURCE replicates over the spatial axis (GSPMD all-gathers it — n_s x
       the source memory) while the GRID keeps its height sharding, so each
       device samples only its own output rows with the full source
       resident. Transposition: the source's cotangent contributions psum
       over the spatial axis (shard_map inserts this for inputs whose spec
       omits the axis).

    The local call is the ordinary `_grid_sample_impl`: same kernel, same
    math, measured exact incl. gradients (`tests/test_spatial.py`). Falls
    back to the plain (GSPMD-partitioned, Pallas-disabled) path when neither
    divisibility holds.
    """
    from jax.sharding import PartitionSpec as P

    from .dispatch import disable_pallas

    shard_map, strict_kw = _shard_map()
    mesh, da, sa = ctx
    b, gh = img.shape[0], grid.shape[1]
    n_s = int(mesh.shape[sa]) if sa in mesh.axis_names else 1
    n_d = int(mesh.shape[da]) if da in mesh.axis_names else 1

    def local(im, g):
        return _grid_sample_impl(im, g, padding_mode)

    if n_s <= 1:
        return _grid_sample_impl(img, grid, padding_mode)
    if b % (n_d * n_s) == 0:
        return shard_map(local, mesh=mesh,
                         in_specs=(P((da, sa)), P((da, sa))),
                         out_specs=P((da, sa)), **strict_kw)(img, grid)
    if gh % n_s == 0 and b % n_d == 0:
        return shard_map(local, mesh=mesh,
                         in_specs=(P(da), P(da, sa)),
                         out_specs=P(da, sa), **strict_kw)(img, grid)
    with disable_pallas('warp'):
        return _grid_sample_impl(img, grid, padding_mode)


def _grid_sample_impl(img: jnp.ndarray, grid: jnp.ndarray,
                      padding_mode: str = 'border') -> jnp.ndarray:
    if padding_mode not in ('border', 'zeros'):
        raise ValueError(f'Invalid padding_mode: {padding_mode}')
    b, h, w, c = img.shape
    gh, gw = grid.shape[1:3]

    # Kernel vreg tiling is f32-only; bf16 images run the packed-plane kernel
    # (bf16 payloads ride f32 bit halves — `pallas_warp._kernel_packed`).
    if (padding_mode == 'border' and h >= 2 and w >= 2
            and img.dtype in (jnp.float32, jnp.bfloat16)
            and _use_pallas_warp(img.shape)):
        fx = jnp.clip(_unnormalize(grid[..., 0], w), 0.0, w - 1.0)
        fy = jnp.clip(_unnormalize(grid[..., 1], h), 0.0, h - 1.0)
        return _warp_pallas_core(img, fx, fy)
    if img.dtype == jnp.bfloat16:
        # Off-TPU/fallback: widen after the bf16 quantization so every path
        # samples the SAME quantized source the packed kernel sees.
        img = img.astype(jnp.float32)

    x = _unnormalize(grid[..., 0].reshape(b, -1), w)  # (b, n)
    y = _unnormalize(grid[..., 1].reshape(b, -1), h)

    if padding_mode == 'border':
        if h >= 2 and w >= 2:  # The hot path: single fused slice-gather.
            out = _sample_border_fused(img, x, y)
            return out.reshape(b, gh, gw, c)
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0  # Fractional offsets -> bilinear weights.
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == 'zeros':
        # Per-corner validity before clamping the gather indices.
        vx0 = (x0i >= 0) & (x0i < w)
        vx1 = (x1i >= 0) & (x1i < w)
        vy0 = (y0i >= 0) & (y0i < h)
        vy1 = (y1i >= 0) & (y1i < h)

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    img_flat = img.reshape(b, h * w, c)
    v00 = _gather_2d(img_flat, x0c, y0c, w)  # (b, n, c)
    v01 = _gather_2d(img_flat, x1c, y0c, w)
    v10 = _gather_2d(img_flat, x0c, y1c, w)
    v11 = _gather_2d(img_flat, x1c, y1c, w)

    w00 = ((1 - wx) * (1 - wy))[..., None]
    w01 = (wx * (1 - wy))[..., None]
    w10 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    if padding_mode == 'zeros':
        w00 = w00 * (vx0 & vy0)[..., None]
        w01 = w01 * (vx1 & vy0)[..., None]
        w10 = w10 * (vx0 & vy1)[..., None]
        w11 = w11 * (vx1 & vy1)[..., None]

    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape(b, gh, gw, c)
