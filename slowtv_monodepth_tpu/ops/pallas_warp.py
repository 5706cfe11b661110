"""Pallas TPU kernel: bilinear border-mode warp (the photometric hot op).

WHY: XLA lowers `grid_sample` to an HBM gather that is descriptor-rate bound
(~17-27 ns per output pixel on v5e) — it dominated the KBR train step (222 of
~430 ms even after packing the 4 corners into one gather; see
`ops/sample.py`). Mosaic *can* do arbitrary per-element selection inside one
(8, 128) vreg, so this kernel keeps the whole source image resident in VMEM
and resolves each output tile with vector gathers instead of DMA descriptors.

DESIGN (exact for arbitrary warps, adaptive cost):
- The kernel grid is (batch, out_row_tiles, out_col_tiles). For each output
  tile it reduces the tile's integer source coords to min/max bounds IN
  KERNEL and runs a dynamic `fori_loop` over only the source (8, 128) tiles
  the warp actually touches — near-identity video warps visit ~1-6 source
  tiles per output tile, while the worst case degrades gracefully to a full
  scan (still exact).
- Per-element 2D selection within a source vreg: lane-gather EVERY sublane
  at the column index, then select the sublane by the row index. (A
  sublane-then-lane gather chain is WRONG for per-element 2D indices — the
  second gather re-indexes the first's output at a different lane.)
- The 2x2 bilinear footprint can cross the source tile's right/bottom edge;
  the boundary column (+ row, + diagonal corner) of the neighboring tiles
  are pulled as thin aligned slices and selected in. Border padding falls
  out of `x1 = min(x0+1, w-1)` / `y1 = min(y0+1, h-1)`.
- Layout is channel-major (b, c, h, w) so every VMEM block is a clean
  (8, 128) vreg tile (channel-minor blocks would pad 3 -> 128 lanes).
- Besides the warped image the kernel emits d(out)/dx and d(out)/dy (the
  corner differences), making the grid VJP a pure elementwise product —
  `ops.sample` wraps this in a `custom_vjp`.

The source image must fit VMEM channel-major f32 (h_pad * w_pad * c * 4B
<= ~12MB: true up to 720x1280 RGB, i.e. every training/eval/AR-aug shape).
`ops/sample.py` falls back to the XLA gather path otherwise and off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['warp_bilinear_pallas', 'pallas_warp_supported']

_VMEM_IMG_BUDGET = 13 * 1024 * 1024


def pallas_warp_supported(img_shape, backend: str) -> bool:
    """Static dispatch check for `ops.sample.grid_sample`.

    Pallas double-buffers the (whole-image) input block, so the effective
    VMEM footprint is 2x the padded image. Images whose full channel stack
    doesn't fit are dispatched per channel (see `warp_bilinear_pallas`), so
    the budget only has to hold ONE channel plane — native 720x1280 RGB
    (AR-aug) still qualifies; 1080p does not and falls back to XLA.
    """
    b, h, w, c = img_shape
    if backend != 'tpu':
        return False
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    return 2 * hp * wp * 4 <= _VMEM_IMG_BUDGET  # Single-channel plane.


def _fits_whole(h: int, w: int, c: int) -> bool:
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    return 2 * hp * wp * c * 4 <= _VMEM_IMG_BUDGET


def _select_rows(vr, vb, idx, use_b):
    """Pick per-element from the 8 row-gathers (or the boundary gather)."""
    v = vr[0]
    for r in range(1, 8):
        v = jnp.where(idx == r, vr[r], v)
    return jnp.where(use_b, vb, v)


def _tile_corners(img_ref, plane: int, rbase, cbase, next_r, next_c,
                  lxc, lxc1, lyc, lyc1, ly, ly1, x_over, y_over):
    """Gather the 4 bilinear corner value-tiles of one source plane.

    Pure data movement (lane/sublane gathers + selects) — safe for packed
    bit-pattern planes as well as real f32 values.
    """
    a = img_ref[0, plane,
                pl.ds(pl.multiple_of(rbase, 8), 8),
                pl.ds(pl.multiple_of(cbase, 128), 128)]
    brow = img_ref[0, plane,
                   pl.ds(pl.multiple_of(next_r, 8), 1),
                   pl.ds(pl.multiple_of(cbase, 128), 128)]
    bcol = img_ref[0, plane,
                   pl.ds(pl.multiple_of(rbase, 8), 8),
                   pl.ds(pl.multiple_of(next_c, 128), 1)]
    # Next-row-tile column at next_c; its row 0 is the diagonal
    # corner. (Routed through an (8,1) broadcast + index-0
    # sublane gather: Mosaic rejects (1,1)->(8,128) broadcasts.)
    bcol2 = img_ref[0, plane,
                    pl.ds(pl.multiple_of(next_r, 8), 8),
                    pl.ds(pl.multiple_of(next_c, 128), 1)]

    # Lane-gather every source sublane at both column indices.
    vr0 = [jnp.take_along_axis(
        jnp.broadcast_to(a[r:r + 1], (8, 128)), lxc, axis=1)
        for r in range(8)]
    vr1 = [jnp.take_along_axis(
        jnp.broadcast_to(a[r:r + 1], (8, 128)), lxc1, axis=1)
        for r in range(8)]
    br0 = jnp.take_along_axis(
        jnp.broadcast_to(brow, (8, 128)), lxc, axis=1)
    br1 = jnp.take_along_axis(
        jnp.broadcast_to(brow, (8, 128)), lxc1, axis=1)
    # Boundary column at the pixel's row(s): sublane gather.
    bc = jnp.broadcast_to(bcol, (8, 128))
    bc0 = jnp.take_along_axis(bc, lyc, axis=0)
    bc1 = jnp.take_along_axis(bc, lyc1, axis=0)
    cor = jnp.take_along_axis(
        jnp.broadcast_to(bcol2, (8, 128)),
        jnp.zeros((8, 128), jnp.int32), axis=0)

    v00 = _select_rows(vr0, br0, ly, False)
    v01 = _select_rows(vr1, br1, ly, False)
    v01 = jnp.where(x_over, bc0, v01)
    v10 = _select_rows(vr0, br0, ly1, y_over)
    v11 = _select_rows(vr1, br1, ly1, y_over)
    v11 = jnp.where(x_over, jnp.where(y_over, cor, bc1), v11)
    return v00, v01, v10, v11


def _kernel(img_ref, fx_ref, fy_ref, out_ref, ddx_ref, ddy_ref, *, c: int,
            h: int, w: int):
    """One (8, 128) output tile: adaptive scan of touched source tiles.

    img_ref: (1, c, hp, wp) channel-major source image.
    fx/fy_ref: (1, 8, 128) continuous coords (already border-clamped).
    out/ddx/ddy_ref: (1, c, 8, 128).
    """
    fx = fx_ref[0]
    fy = fy_ref[0]
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    wx = fx - x0f
    wy = fy - y0f
    x0 = x0f.astype(jnp.int32)        # in [0, w-1]
    y0 = y0f.astype(jnp.int32)        # in [0, h-1]
    # Border-clamped second row/column: keeps d(out)/dx|dy == 0 at the
    # right/bottom edges exactly like the XLA clamped-index formulation.
    x1g = jnp.minimum(x0 + 1, w - 1)
    y1g = jnp.minimum(y0 + 1, h - 1)

    # Touched source-tile ranges (inclusive), computed in-kernel.
    rt0 = jnp.min(y0) // 8
    rt1 = jnp.max(y0) // 8
    ct0 = jnp.min(x0) // 128
    ct1 = jnp.max(x0) // 128

    hp = img_ref.shape[2]
    wp = img_ref.shape[3]

    def col_body(ct, acc):
        cbase = ct * 128
        lx = x0 - cbase
        lx1 = x1g - cbase                 # in [0, 128] for valid pixels.
        vx = (lx >= 0) & (lx < 128)
        lxc = jnp.clip(lx, 0, 127)
        lxc1 = jnp.clip(lx1, 0, 127)
        x_over = lx1 >= 128               # x1 lives in the next column tile.
        # Aligned starts for the boundary column/row/corner reads. When the
        # overflow can't happen (right/bottom image edge) the clamp keeps the
        # read in-bounds and the selected weight is zero, so values are
        # never used.
        next_c = jnp.minimum(cbase + 128, wp - 128)

        def row_body(rt, acc):
            rbase = rt * 8
            ly = y0 - rbase
            ly1 = y1g - rbase             # in [0, 8] for valid pixels.
            vyx = vx & (ly >= 0) & (ly < 8)
            lyc = jnp.clip(ly, 0, 7)
            lyc1 = jnp.clip(ly1, 0, 7)
            y_over = ly1 >= 8             # y1 lives in the next row tile.
            next_r = jnp.minimum(rbase + 8, hp - 8)

            outs, ddxs, ddys = acc
            new_outs, new_ddxs, new_ddys = [], [], []
            for ch in range(c):
                v00, v01, v10, v11 = _tile_corners(
                    img_ref, ch, rbase, cbase, next_r, next_c,
                    lxc, lxc1, lyc, lyc1, ly, ly1, x_over, y_over)

                top = v00 * (1 - wx) + v01 * wx
                bot = v10 * (1 - wx) + v11 * wx
                px = top * (1 - wy) + bot * wy
                dx = (v01 - v00) * (1 - wy) + (v11 - v10) * wy
                dy = bot - top
                new_outs.append(jnp.where(vyx, px, outs[ch]))
                new_ddxs.append(jnp.where(vyx, dx, ddxs[ch]))
                new_ddys.append(jnp.where(vyx, dy, ddys[ch]))
            return (tuple(new_outs), tuple(new_ddxs), tuple(new_ddys))

        return jax.lax.fori_loop(rt0, rt1 + 1, row_body, acc)

    zero = jnp.zeros((8, 128), img_ref.dtype)
    init = (tuple(zero for _ in range(c)),) * 3
    outs, ddxs, ddys = jax.lax.fori_loop(ct0, ct1 + 1, col_body, init)
    for ch in range(c):
        out_ref[0, ch] = outs[ch]
        ddx_ref[0, ch] = ddxs[ch]
        ddy_ref[0, ch] = ddys[ch]


def _unpack_pair(v):
    """Split a packed f32 vreg (two bf16 payloads) into exact f32 values.

    A bf16 bit pattern B widens losslessly to the f32 whose bits are B << 16,
    so the low half unpacks via a shift and the high half via a mask — plain
    int32 VPU ops (Mosaic rejects native bf16 vregs on this toolchain).
    """
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return lo, hi


def _kernel_packed(img_ref, fx_ref, fy_ref, out_ref, ddx_ref, ddy_ref, *,
                   kinds: tuple, c: int, h: int, w: int):
    """bf16-source variant of `_kernel`: the gather/select work (the kernel's
    dominant cost) runs on ceil(c/2) PACKED f32 planes — each 'pair' plane
    carries two bf16 channels in its bit halves, a trailing 'single' plane
    carries one widened bf16 channel. Corners are unpacked to exact f32 after
    selection, so the blend/derivative math is unchanged. Outputs stay f32.
    """
    fx = fx_ref[0]
    fy = fy_ref[0]
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    wx = fx - x0f
    wy = fy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1g = jnp.minimum(x0 + 1, w - 1)
    y1g = jnp.minimum(y0 + 1, h - 1)

    rt0 = jnp.min(y0) // 8
    rt1 = jnp.max(y0) // 8
    ct0 = jnp.min(x0) // 128
    ct1 = jnp.max(x0) // 128

    hp = img_ref.shape[2]
    wp = img_ref.shape[3]

    def col_body(ct, acc):
        cbase = ct * 128
        lx = x0 - cbase
        lx1 = x1g - cbase
        vx = (lx >= 0) & (lx < 128)
        lxc = jnp.clip(lx, 0, 127)
        lxc1 = jnp.clip(lx1, 0, 127)
        x_over = lx1 >= 128
        next_c = jnp.minimum(cbase + 128, wp - 128)

        def row_body(rt, acc):
            rbase = rt * 8
            ly = y0 - rbase
            ly1 = y1g - rbase
            vyx = vx & (ly >= 0) & (ly < 8)
            lyc = jnp.clip(ly, 0, 7)
            lyc1 = jnp.clip(ly1, 0, 7)
            y_over = ly1 >= 8
            next_r = jnp.minimum(rbase + 8, hp - 8)

            outs, ddxs, ddys = acc
            new_outs, new_ddxs, new_ddys = [], [], []
            ch = 0
            for p, kind in enumerate(kinds):
                v00, v01, v10, v11 = _tile_corners(
                    img_ref, p, rbase, cbase, next_r, next_c,
                    lxc, lxc1, lyc, lyc1, ly, ly1, x_over, y_over)
                if kind == 'pair':
                    subch = zip(_unpack_pair(v00), _unpack_pair(v01),
                                _unpack_pair(v10), _unpack_pair(v11))
                else:  # 'single': the plane already holds widened f32 values.
                    subch = [(v00, v01, v10, v11)]
                for c00, c01, c10, c11 in subch:
                    top = c00 * (1 - wx) + c01 * wx
                    bot = c10 * (1 - wx) + c11 * wx
                    px = top * (1 - wy) + bot * wy
                    dx = (c01 - c00) * (1 - wy) + (c11 - c10) * wy
                    dy = bot - top
                    new_outs.append(jnp.where(vyx, px, outs[ch]))
                    new_ddxs.append(jnp.where(vyx, dx, ddxs[ch]))
                    new_ddys.append(jnp.where(vyx, dy, ddys[ch]))
                    ch += 1
            return (tuple(new_outs), tuple(new_ddxs), tuple(new_ddys))

        return jax.lax.fori_loop(rt0, rt1 + 1, row_body, acc)

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (tuple(zero for _ in range(c)),) * 3
    outs, ddxs, ddys = jax.lax.fori_loop(ct0, ct1 + 1, col_body, init)
    for ch in range(c):
        out_ref[0, ch] = outs[ch]
        ddx_ref[0, ch] = ddxs[ch]
        ddy_ref[0, ch] = ddys[ch]


def _pack_planes(img: jnp.ndarray):
    """(b, h, w, c) any-float NHWC -> ((b, P, hp, wp) f32 packed planes, kinds).

    Channels quantize to bf16 (finer than the 8-bit content of the video
    frames this path is built for); pairs ride one f32 plane's bit halves.
    """
    b, h, w, c = img.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    chw = jnp.transpose(img.astype(jnp.bfloat16), (0, 3, 1, 2))
    chw = jnp.pad(chw, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    bits = jax.lax.bitcast_convert_type(chw, jnp.uint16).astype(jnp.uint32)
    planes, kinds = [], []
    for i in range(0, c - 1, 2):
        planes.append(jax.lax.bitcast_convert_type(
            (bits[:, i + 1] << 16) | bits[:, i], jnp.float32))
        kinds.append('pair')
    if c % 2:
        planes.append(jax.lax.bitcast_convert_type(
            bits[:, c - 1] << 16, jnp.float32))
        kinds.append('single')
    return jnp.stack(planes, axis=1), tuple(kinds)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _warp_bilinear_packed_jit(img: jnp.ndarray, fx: jnp.ndarray,
                              fy: jnp.ndarray, interpret: bool):
    b, h, w, c = img.shape
    ho, wo = fx.shape[1:3]
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    hop = -(-ho // 8) * 8
    wop = -(-wo // 128) * 128

    packed, kinds = _pack_planes(img)
    n_planes = len(kinds)
    fxp = jnp.pad(fx.astype(jnp.float32), ((0, 0), (0, hop - ho), (0, wop - wo)))
    fyp = jnp.pad(fy.astype(jnp.float32), ((0, 0), (0, hop - ho), (0, wop - wo)))

    kern = functools.partial(_kernel_packed, kinds=kinds, c=c, h=h, w=w)
    out, ddx, ddy = pl.pallas_call(
        kern,
        grid=(b, hop // 8, wop // 128),
        in_specs=[
            pl.BlockSpec((1, n_planes, hp, wp), lambda bb, i, j: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bb, i, j: (bb, i, j)),
            pl.BlockSpec((1, 8, 128), lambda bb, i, j: (bb, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, c, hop, wop), jnp.float32)] * 3,
        interpret=interpret,
    )(packed, fxp, fyp)

    def unpack(t):
        return jnp.transpose(t, (0, 2, 3, 1))[:, :ho, :wo]
    return unpack(out), unpack(ddx), unpack(ddy)


def warp_bilinear_pallas(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                         interpret: bool | None = None):
    """Bilinear border sample + spatial derivatives.

    `interpret=None` auto-selects the Pallas interpreter off-TPU (CPU tests).

    :param img: (b, h, w, c) source images.
    :param fx/fy: (b, ho, wo) continuous pixel coords, ALREADY clamped to
        [0, w-1] / [0, h-1] (border semantics).
    :return: (out, ddx, ddy), each (b, ho, wo, c); ddx/ddy are the exact
        bilinear partials w.r.t. the (unclamped-range) pixel coords.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = img.shape
    if img.dtype == jnp.bfloat16:
        # bf16 sources: gather/select on packed planes (see `_kernel_packed`).
        # Outputs are f32; the quantization is the caller's opt-in.
        if not _fits_whole(h, w, -(-c // 2)):
            parts = [_warp_bilinear_packed_jit(img[..., i:i + 1], fx, fy,
                                               interpret)
                     for i in range(c)]
            return tuple(jnp.concatenate(t, axis=-1) for t in zip(*parts))
        return _warp_bilinear_packed_jit(img, fx, fy, interpret)
    if c > 1 and not _fits_whole(h, w, c):
        # Large sources (e.g. 720p AR-aug): one kernel launch per channel so
        # only a single plane has to sit in VMEM.
        parts = [_warp_bilinear_jit(img[..., i:i + 1], fx, fy, interpret)
                 for i in range(c)]
        return tuple(jnp.concatenate(t, axis=-1) for t in zip(*parts))
    return _warp_bilinear_jit(img, fx, fy, interpret)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _warp_bilinear_jit(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                       interpret: bool):
    b, h, w, c = img.shape
    ho, wo = fx.shape[1:3]
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    hop = -(-ho // 8) * 8
    wop = -(-wo // 128) * 128

    # Channel-major so VMEM tiles are clean (8, 128) vregs.
    chw = jnp.transpose(img, (0, 3, 1, 2))                # (b, c, h, w)
    chw = jnp.pad(chw, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    fxp = jnp.pad(fx, ((0, 0), (0, hop - ho), (0, wop - wo)))
    fyp = jnp.pad(fy, ((0, 0), (0, hop - ho), (0, wop - wo)))

    kern = functools.partial(_kernel, c=c, h=h, w=w)
    out, ddx, ddy = pl.pallas_call(
        kern,
        grid=(b, hop // 8, wop // 128),
        in_specs=[
            pl.BlockSpec((1, c, hp, wp), lambda bb, i, j: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bb, i, j: (bb, i, j)),
            pl.BlockSpec((1, 8, 128), lambda bb, i, j: (bb, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
            pl.BlockSpec((1, c, 8, 128), lambda bb, i, j: (bb, 0, i, j)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, c, hop, wop), img.dtype)] * 3,
        interpret=interpret,
    )(chw, fxp, fyp)

    def unpack(t):
        return jnp.transpose(t, (0, 2, 3, 1))[:, :ho, :wo]
    return unpack(out), unpack(ddx), unpack(ddy)
