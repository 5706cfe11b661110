"""Pallas TPU kernel: fused SSIM+L1 photometric error (fwd + analytic VJP).

WHY: the photometric error (0.85*SSIM + 0.15*L1, ref
`src/losses/photometric.py:54-88`) is evaluated over the (n_supp x n_scales x
batch)-flattened full-resolution stack every step. XLA computes it as 5
`reduce_window` pools plus ~30 big elementwise fusions over (2, 16, 384, 640,
3) tensors — ~13 ms/step of HBM round-trips on v5e. This kernel computes the
whole thing inside VMEM in ONE pallas_call per step (launch overhead on this
runtime kills many-small-kernel designs — see `ops/pallas_dwconv.py`), and
its backward is a second single launch with the analytic SSIM gradient.

STRUCTURE: grid (m, c); each step owns one (h, w) image plane and sweeps it
in row bands (static Python loop) so live temporaries stay band-sized —
full-plane temporaries blow the 16MB VMEM scoped stack (measured 38.7M).
Everything is VALUE-based (concat-built reflect pads, full-lane aligned ref
writes): Mosaic rejects sublane-misaligned ref stores, so the band halo rows
of the pool adjoint are carried across the static band loop as spill values
instead of written in place. Columns beyond the true width are masked to
zero and cropped by the caller.

MATH (per channel, c1=0.01^2, c2=0.03^2, P = 3x3 reflect-pad mean pool):
  mx=P(x)  my=P(y)  sx=P(x^2)-mx^2  sy=P(y^2)-my^2  sxy=P(xy)-mx*my
  N=(2*mx*my+c1)*(2*sxy+c2)   D=(mx^2+my^2+c1)*(sx+sy+c2)
  S=clip((1-N/D)/2, 0, 1)     err = mean_c(w_s*S + w_l*|x-y|)
Backward w.r.t. the pooled stats (u=N/D, q=mx^2+my^2+c1, r=sx+sy+c2,
a=2*mx*my+c1, t=2*sxy+c2):
  du/dmx  = (2*my*(t-a) - u*2*mx*(r-q))/D     du/dmy symmetric
  du/dEx2 = du/dEy2 = -u*q/D                  du/dExy = 2*a/D
  dS = -mask/2 * du,  mask = 1 inside, 0.5 at ties [jnp.clip VJP convention]
  dx = PT(G*du_mx) + PT(G*du_e2)*2x + PT(G*du_exy)*y + w_l/c*sign(x-y)*g
  dy = PT(G*du_my) + PT(G*du_e2)*2y + PT(G*du_exy)*x - w_l/c*sign(x-y)*g
  with G = g*w_s/c*(-1/2)*mask and PT the pool adjoint: a 3x3/9 box scatter
  with the reflect-pad border rows/cols folded back in. Multiplying the
  x/y factors BEFORE the row fold is valid because the padded position holds
  exactly the reflected pixel's value.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['photo_err_ssim', 'photo_pallas_supported']

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2
_BAND = 32


def photo_pallas_supported(shape, backend: str) -> bool:
    """(m, h, w, c) f32 stacks whose (h, w) plane fits VMEM comfortably."""
    if backend != 'tpu':
        return False
    m, h, w, c = shape
    if h < 3 or w < 5 or h % 8 != 0:
        return False  # Aligned band writes; reflect needs interior.
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    # 5 resident (hp, wp) planes (x, y, g, dx, dy at bwd) x2 pipeline buffers
    # + band-sized temporaries.
    return 12 * hp * wp * 4 <= 13 * 1024 * 1024


def _bands(h: int):
    return [(r0, min(_BAND, h - r0)) for r0 in range(0, h, _BAND)]


def _zeros(rows, cols, dtype):
    return jnp.zeros((rows, cols), dtype)


def _ccat(parts, axis):
    """Concat, dropping zero-sized pieces (Mosaic rejects 0-size vectors)."""
    parts = [t for t in parts if 0 not in t.shape]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _pad_band(ref, r0: int, rows: int, h: int, w: int, wp: int):
    """Reflect-padded (rows+2, wp+2) band of image rows [r0, r0+rows).

    Cols 0..w+1 hold the true reflect-padded band; cols beyond are zero.
    """
    top = ref[1:2, :] if r0 == 0 else ref[r0 - 1:r0, :]
    bot = ref[h - 2:h - 1, :] if r0 + rows == h else ref[r0 + rows:r0 + rows + 1, :]
    rp = jnp.concatenate([top, ref[r0:r0 + rows, :], bot], axis=0)  # (rows+2, wp)
    return _ccat(
        [rp[:, 1:2], rp[:, :w], rp[:, w - 2:w - 1],
         _zeros(rows + 2, wp + 1 - w, rp.dtype)], axis=1)  # (rows+2, wp+3)


def _pool(pad, rows: int, wp: int):
    """3x3/9 mean -> (rows, wp); cols >= true w are garbage (masked later).

    Separable: a 3x3 box is a 1x3 row sum followed by a 3x1 column sum —
    4 adds per output instead of 8 (the pools dominate the kernel's VPU time).
    """
    rowsum = pad[:, 0:wp] + pad[:, 1:wp + 1] + pad[:, 2:wp + 2]  # (rows+2, wp)
    return (rowsum[0:rows] + rowsum[1:rows + 1] + rowsum[2:rows + 2]) / 9.0


def _band_stats(xp, yp, rows: int, wp: int):
    mx = _pool(xp, rows, wp)
    my = _pool(yp, rows, wp)
    ex2 = _pool(xp * xp, rows, wp)
    ey2 = _pool(yp * yp, rows, wp)
    exy = _pool(xp * yp, rows, wp)
    a = 2.0 * mx * my + _C1
    t = 2.0 * (exy - mx * my) + _C2
    q = mx * mx + my * my + _C1
    r = (ex2 - mx * mx) + (ey2 - my * my) + _C2
    return a, t, q, r


def _fwd_kernel(x_ref, y_ref, out_ref, *, h: int, w: int, c: int,
                w_ssim: float):
    ch = pl.program_id(1)

    @pl.when(ch == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    wp = x_ref.shape[3]
    for r0, rows in _bands(h):
        xp = _pad_band(x_ref.at[0, 0], r0, rows, h, w, wp)
        yp = _pad_band(y_ref.at[0, 0], r0, rows, h, w, wp)
        a, t, q, r = _band_stats(xp, yp, rows, wp)
        raw = (1.0 - (a * t) / (q * r)) * 0.5
        s = jnp.clip(raw, 0.0, 1.0)
        x = xp[1:rows + 1, 1:wp + 1]
        y = yp[1:rows + 1, 1:wp + 1]
        out_ref[0, r0:r0 + rows, :] += (
            w_ssim * s + (1.0 - w_ssim) * jnp.abs(x - y)) / c


def _adjoint(v, rows: int, w: int, wp: int):
    """Pool adjoint of a masked (rows, wp) band: 3x3/9 box scatter with the
    reflect COLUMN folds applied. Returns (rows+2, wp): padded rows
    [r0-1, r0+rows] (row folds are the caller's spill-carry), valid cols
    0..w-1, zeros beyond."""
    dt = v.dtype
    v9 = v / 9.0
    vz = jnp.concatenate([_zeros(2, wp, dt), v9, _zeros(2, wp, dt)], axis=0)
    vzc = jnp.concatenate([_zeros(rows + 4, 2, dt), vz,
                           _zeros(rows + 4, 2, dt)], axis=1)  # (rows+4, wp+4)
    # Separable box scatter (adjoint of the separable pool): rows then cols.
    rsum = (vzc[0:rows + 2] + vzc[1:rows + 3] + vzc[2:rows + 4])  # (rows+2, wp+4)
    scr = rsum[:, 0:wp + 2] + rsum[:, 1:wp + 3] + rsum[:, 2:wp + 4]  # (rows+2, wp+2)
    # Column folds: padded col 0 -> col 2 (image col 1), padded col w+1 ->
    # col w-1 (image col w-2); then take image cols (padded 1..w).
    out = scr[:, 1:w + 1]
    corr = _ccat(
        [_zeros(rows + 2, 1, dt), scr[:, 0:1], _zeros(rows + 2, w - 4, dt),
         scr[:, w + 1:w + 2], _zeros(rows + 2, 1, dt)], axis=1)
    return _ccat([out + corr, _zeros(rows + 2, wp - w, dt)], axis=1)


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref, dy_ref, *, h: int, w: int,
                c: int, w_ssim: float):
    wp = x_ref.shape[3]
    dt = x_ref.dtype
    colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) < w).astype(dt)

    spill_x = spill_y = None
    prev = None
    for r0, rows in _bands(h):
        xp = _pad_band(x_ref.at[0, 0], r0, rows, h, w, wp)
        yp = _pad_band(y_ref.at[0, 0], r0, rows, h, w, wp)
        a, t, q, r = _band_stats(xp, yp, rows, wp)
        d = q * r
        u = (a * t) / d
        raw = (1.0 - u) * 0.5
        mask = (((raw > 0.0) & (raw < 1.0)).astype(dt)
                + 0.5 * ((raw == 0.0) | (raw == 1.0)).astype(dt))
        g = g_ref[0, r0:r0 + rows, :] * colmask
        gg = g * (w_ssim / c) * (-0.5) * mask

        # Recover the per-stat pool means from a, t, q, r? Cheaper to reuse
        # the padded bands directly for mx/my (needed by the du terms).
        mx = _pool(xp, rows, wp)
        my = _pool(yp, rows, wp)
        inv_d = 1.0 / d
        du_mx = (2.0 * my * (t - a) - u * (2.0 * mx * (r - q))) * inv_d
        du_my = (2.0 * mx * (t - a) - u * (2.0 * my * (r - q))) * inv_d
        du_e2 = -u * q * inv_d
        du_exy = 2.0 * a * inv_d

        pA = _adjoint(gg * du_mx, rows, w, wp)
        pD = _adjoint(gg * du_my, rows, w, wp)
        pB = _adjoint(gg * du_e2, rows, w, wp)
        pC = _adjoint(gg * du_exy, rows, w, wp)

        xv = xp[:, 1:wp + 1]           # (rows+2, wp), rows [r0-1, r0+rows]
        yv = yp[:, 1:wp + 1]
        bx = pA + pB * (2.0 * xv) + pC * yv
        by = pD + pB * (2.0 * yv) + pC * xv

        l1 = ((1.0 - w_ssim) / c) * jnp.sign(
            xv[1:rows + 1] - yv[1:rows + 1]) * g

        def band_block(b, spill, fold_top: bool, fold_bot: bool, extra):
            """Rows [r0, r0+rows) of the adjoint: b rows 1..rows, plus the
            previous band's bottom spill at row 0 and the image-border
            folds (pad row -1 -> row 1, pad row h -> row h-2)."""
            rows_mid = b[1:rows + 1]
            top_row = rows_mid[0:1] if spill is None else rows_mid[0:1] + spill
            if fold_top:
                rows_mid = jnp.concatenate(
                    [top_row, b[2:3] + b[0:1], rows_mid[2:]], axis=0)
            else:
                rows_mid = jnp.concatenate([top_row, rows_mid[1:]], axis=0)
            if fold_bot:
                rows_mid = jnp.concatenate(
                    [rows_mid[:rows - 2],
                     rows_mid[rows - 2:rows - 1] + b[rows + 1:rows + 2],
                     rows_mid[rows - 1:]], axis=0)
            return rows_mid + extra

        fold_top = (r0 == 0)
        fold_bot = (r0 + rows == h)
        blk_x = band_block(bx, spill_x, fold_top, fold_bot, l1)
        blk_y = band_block(by, spill_y, fold_top, fold_bot, -l1)
        if prev is not None:
            # Interior bands also contribute to the PREVIOUS band's last row
            # (their pad row r0-1), so each band's rows are written one
            # iteration late — this also keeps only one band block live
            # (collecting all bands blew the VMEM scoped stack).
            p_r0, p_rows, p_x, p_y = prev
            dx_ref[0, 0, p_r0:p_r0 + p_rows, :] = jnp.concatenate(
                [p_x[:-1], p_x[-1:] + bx[0:1]], axis=0)
            dy_ref[0, 0, p_r0:p_r0 + p_rows, :] = jnp.concatenate(
                [p_y[:-1], p_y[-1:] + by[0:1]], axis=0)
        prev = (r0, rows, blk_x, blk_y)
        spill_x = None if fold_bot else bx[rows + 1:rows + 2]
        spill_y = None if fold_bot else by[rows + 1:rows + 2]

    p_r0, p_rows, p_x, p_y = prev
    dx_ref[0, 0, p_r0:p_r0 + p_rows, :] = p_x
    dy_ref[0, 0, p_r0:p_r0 + p_rows, :] = p_y


def _planes(x):
    """(m, h, w, c) NHWC -> (m, c, hp, wp) channel-planar, aligned."""
    m, h, w, c = x.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    x = jnp.transpose(x, (0, 3, 1, 2))
    return jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, wp - w))), hp, wp


@functools.partial(jax.jit, static_argnames=('w_ssim', 'interpret'))
def _photo_fwd_jit(pred, target, w_ssim: float, interpret: bool):
    m, h, w, c = pred.shape
    xp, hp, wp = _planes(pred)
    yp, _, _ = _planes(target)
    kern = functools.partial(_fwd_kernel, h=h, w=w, c=c, w_ssim=w_ssim)
    out = pl.pallas_call(
        kern,
        grid=(m, c),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i, ch: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, hp, wp), pred.dtype),
        interpret=interpret,
    )(xp, yp)
    return out[:, :h, :w]


@functools.partial(jax.jit, static_argnames=('w_ssim', 'interpret'))
def _photo_bwd_jit(pred, target, g, w_ssim: float, interpret: bool):
    m, h, w, c = pred.shape
    xp, hp, wp = _planes(pred)
    yp, _, _ = _planes(target)
    gp = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)))
    kern = functools.partial(_bwd_kernel, h=h, w=w, c=c, w_ssim=w_ssim)
    dx, dy = pl.pallas_call(
        kern,
        grid=(m, c),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
            pl.BlockSpec((1, hp, wp), lambda i, ch: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
            pl.BlockSpec((1, 1, hp, wp), lambda i, ch: (i, ch, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, c, hp, wp), pred.dtype)] * 2,
        interpret=interpret,
    )(xp, yp, gp)

    def unplane(t):
        return jnp.transpose(t, (0, 2, 3, 1))[:, :h, :w]
    return unplane(dx), unplane(dy)


def _interp() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _photo_core(pred, target, w_ssim: float):
    return _photo_fwd_jit(pred, target, w_ssim, _interp())


def _photo_core_fwd(pred, target, w_ssim):
    return _photo_core(pred, target, w_ssim), (pred, target)


def _photo_core_bwd(w_ssim, res, g):
    pred, target = res
    return _photo_bwd_jit(pred, target, g, w_ssim, _interp())


_photo_core.defvjp(_photo_core_fwd, _photo_core_bwd)


def photo_err_ssim(pred: jnp.ndarray, target: jnp.ndarray,
                   w_ssim: float = 0.85) -> jnp.ndarray:
    """Fused per-pixel photometric error (w_ssim*SSIM + (1-w_ssim)*L1).

    :param pred: (m, h, w, c) warped support frames.
    :param target: (m, h, w, c) target images.
    :return: (m, h, w, 1) channel-mean photometric error — exactly
        `PhotoError(w_ssim)(pred, target)` (`losses/photometric.py`).

    Under an active `dispatch.spatial_photo_shardmap` context (the spatial-
    sharded train step), the call routes through a batch-resharding
    `shard_map` that keeps the kernel alive per mesh device — see
    `_photo_err_spatial`.
    """
    from .dispatch import spatial_photo_context
    ctx = spatial_photo_context()
    if ctx is not None:
        out = _photo_err_spatial(pred, target, float(w_ssim), ctx)
        if out is None:
            # Batch does not divide the mesh: the raw Pallas launch has no
            # GSPMD partitioning rule, so a direct caller under this context
            # must take the exact XLA formulation (which GSPMD partitions
            # with halos) instead. `PhotoError._fused_ok` pre-gates this for
            # the train step; this guard covers direct callers.
            from ..losses.photometric import PhotoError
            return PhotoError(float(w_ssim))._call4(pred, target)
        return out
    return _photo_core(pred, target, float(w_ssim))[..., None]


def _photo_err_spatial(pred, target, w_ssim: float, ctx):
    """Photo error under spatial (height) sharding, Pallas kernel alive.

    The error is independent per image plane, so the flattened batch axis
    repartitions over ALL mesh devices with full height per image (in_specs
    `P((da, sa))`; GSPMD inserts the all-to-all at the boundary). Memory-
    neutral — each device holds 1/N of the stack either way — and the
    backward needs no psum (no replicated operands). Same layout the
    batch-resharded warp emits (`ops/sample.py:_grid_sample_spatial`), so
    warp -> photo chains with no intermediate reshard. Returns None when the
    batch does not divide the mesh (caller falls back; `PhotoError._fused_ok`
    pre-gates this inside the train step).
    """
    from jax.sharding import PartitionSpec as P

    from .sample import _shard_map

    shard_map, strict_kw = _shard_map()
    mesh, da, sa = ctx
    n_s = int(mesh.shape[sa]) if sa in mesh.axis_names else 1
    n_d = int(mesh.shape[da]) if da in mesh.axis_names else 1
    if n_s <= 1:
        return _photo_core(pred, target, w_ssim)[..., None]
    if pred.shape[0] % (n_d * n_s):
        return None

    def local(p, t):
        return _photo_core(p, t, w_ssim)[..., None]

    return shard_map(local, mesh=mesh,
                     in_specs=(P((da, sa)), P((da, sa))),
                     out_specs=P((da, sa)), **strict_kw)(pred, target)
