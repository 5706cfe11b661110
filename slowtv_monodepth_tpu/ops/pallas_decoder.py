"""Pallas TPU kernel: fused Monodepth-decoder upsampling stage (fwd + VJP).

WHY: the last two decoder stages run 3x3 convs with 16-32 channels at up to
full resolution. XLA lowers those to VPU loop fusions (16 of 128 lanes used)
— ~18 ms/step of the KBR train step is decoder time, over half of it in the
scale-0/1 tails. This kernel computes one whole stage

    ha   = ELU(conv3x3_reflect(x, Wa) + ba)          # (h, w, cd)
    u    = upsample2x_nearest(ha)                    # (2h, 2w, cd)
    hb   = ELU(conv3x3_reflect(u, Wb) + bb)          # (2h, 2w, cd)  -> feat
    disp = sigmoid(conv3x3_reflect(hb, Wo) + bo)     # (2h, 2w, 1)

(`models/decoders/monodepth.py` loop body for the skip-less stages, ref
`src/networks/decoders/monodepth.py:71-89`) in ONE pallas_call each way,
with the convs as chunked-im2col matmuls on the MXU (K = 9*ci in one dot
beats per-tap VPU loops ~4x in cycles and 8x in lane utilization; 8-row
chunks keep the im2col temporaries ~1MB).

BANDING: grid (b, h//RB [+1 for bwd]). Each band owns output rows
[2*r0, 2*r0+2*RB) and recomputes its inputs with generous halos assembled
from the SAME x array passed at block indices (i-1, i, i+1). Reflect
behavior is applied per level exactly where the reference reflects: x rows
feeding the first/last REAL ha row, the u rows feeding hb, and the hb rows
feeding the outconv (row selects); all column pads are value-built. The
backward recomputes the band, walks the chain with chunk dots (dW),
per-tap col2im scatters with reflect folds (du/dx), and resolves the
+-2-row cross-band dx halo with delayed-by-one-band writes (out blocks are
indexed i-1 and the grid runs one extra step; prev band + spill persist in
VMEM scratch across the sequential grid). Per-band adjoints are partial on
halo rows and sum exactly because every backward op is linear in the
upstream cotangent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_upconv_stage', 'decoder_stage_supported']

_CH = 4           # im2col chunk rows.


def _pick_rb(x_shape, cd: int, itemsize: int = 2):
    """Band size whose temporaries fit the VMEM scoped stack, else None.

    The band chain computes in the input dtype (bf16 halves every temp; the
    mixed-precision KBR recipe is the target), so f32 only fits the smaller
    stage shapes. Live-temp factors calibrated against measured Mosaic
    scoped-stack sizes on the KBR stages (16.8M for stage1 f32 @ rb=8).
    """
    b, h, w, ci = x_shape
    if w < 8:
        return None
    wp = -(-w // 128) * 128
    wp2 = -(-2 * w // 128) * 128
    for rb in (16, 8):
        if h % rb != 0 or h < 2 * rb:
            continue
        est = ((2 * rb + 6) * wp2 * cd * 14 + (rb + 6) * wp * ci * 6) * itemsize
        # The pallas_calls raise the scoped-VMEM limit to 100MB; measured
        # stacks run ~2x this estimate, so 40MB keeps a margin to the real
        # ceiling. Larger bands amortize the 6-row halo recompute.
        if est <= 40 * 1024 * 1024:
            return rb
    return None


def decoder_stage_supported(x_shape, cd: int, backend: str,
                            itemsize: int = 2) -> bool:
    """x (b, h, w, ci) -> stage output (2h, 2w, cd)."""
    return backend == 'tpu' and _pick_rb(x_shape, cd, itemsize) is not None


# ---------------------------------------------------------------- helpers
def _ccat(parts, axis):
    parts = [t for t in parts if 0 not in t.shape]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _z(shape, dt):
    return jnp.zeros(shape, dt)


def _reflect_cols(band, w: int, wp: int):
    """(r, >=w, c) valid cols [0, w) -> (r, wp+3, c): [refl | img | refl | 0]."""
    r, _, c = band.shape
    return _ccat([band[:, 1:2], band[:, :w], band[:, w - 2:w - 1],
                  _z((r, wp + 1 - w, c), band.dtype)], axis=1)


def _conv3x3(pad, wmat, bias, rows: int, wp: int):
    """pad (>=rows+2, >=wp+2, ci) -> (rows, wp, co) in pad.dtype (f32 accum).

    `wmat` (9ci, co) in (dy, dx, ci) tap order; 8-row chunked im2col dots.
    """
    ci = pad.shape[-1]
    co = wmat.shape[-1]
    wm = wmat.astype(pad.dtype)
    outs = []
    for c0 in range(0, rows, _CH):
        n = min(_CH, rows - c0)
        # Reshape each tap to 2D BEFORE the lane concat: the shifted slices
        # carry mismatched sublane offsets and Mosaic only allows offset
        # mismatches on the concat dimension; the 2D reshape canonicalizes.
        im = _ccat([pad[c0 + dy:c0 + dy + n, dx:dx + wp].reshape(n * wp, ci)
                    for dy in range(3) for dx in range(3)], axis=1)
        o = jax.lax.dot_general(
            im, wm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(o.reshape(n, wp, co))
    out = _ccat(outs, axis=0) + bias.astype(jnp.float32).reshape(1, 1, co)
    return out.astype(pad.dtype)


def _dw_db(pad, dz, rows: int, wp: int):
    """Grad of `_conv3x3` weights/bias: dz f32 (rows, wp, co).

    :return: (dW (9ci, co) f32, db (co,) f32).
    """
    ci = pad.shape[-1]
    co = dz.shape[-1]
    dw = None
    for c0 in range(0, rows, _CH):
        n = min(_CH, rows - c0)
        im = _ccat([pad[c0 + dy:c0 + dy + n, dx:dx + wp].reshape(n * wp, ci)
                    for dy in range(3) for dx in range(3)], axis=1)
        d = jax.lax.dot_general(
            im,
            dz[c0:c0 + n].reshape(n * wp, co).astype(pad.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw = d if dw is None else dw + d
    return dw, jnp.sum(dz, axis=(0, 1))


def _dconv_input(dz, wmat, rows: int, w: int, wp: int, ci: int, dt):
    """Grad of `_conv3x3` w.r.t. its UNPADDED image band.

    dz f32 (rows, wp, co) over output rows [s, s+rows); returns f32
    (rows+2, wp, ci) over image rows [s-1, s+rows+1) with the reflect
    COLUMN folds applied (row folds are the caller's). Cols >= w zeroed.
    """
    co = wmat.shape[-1]
    acc = None
    for c0 in range(0, rows, _CH):
        n = min(_CH, rows - c0)
        dzc = dz[c0:c0 + n].reshape(n * wp, co).astype(dt)
        # One dot PER TAP (dz @ w_tap^T): slicing a fused (n*wp, 9ci) dot
        # output leaves non-canonical lane offsets that Mosaic's scatter
        # concats reject; per-tap dots produce canonical pieces directly.
        part = None
        for dy in range(3):
            for dx in range(3):
                w_tap = wmat[(dy * 3 + dx) * ci:(dy * 3 + dx + 1) * ci, :]
                piece = jax.lax.dot_general(
                    dzc, w_tap.astype(dt),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(n, wp, ci)
                p = _ccat([_z((c0 + dy, wp + 2, ci), piece.dtype),
                           _ccat([_z((n, dx, ci), piece.dtype), piece,
                                  _z((n, 2 - dx, ci), piece.dtype)], axis=1),
                           _z((rows + 2 - c0 - dy - n, wp + 2, ci),
                              piece.dtype)], axis=0)
                part = p if part is None else part + p
        acc = part if acc is None else acc + part
    # Column folds: padded col 0 -> image col 1; padded col w+1 -> col w-2.
    out = acc[:, 1:w + 1]
    corr = _ccat([_z((rows + 2, 1, ci), out.dtype), acc[:, 0:1],
                  _z((rows + 2, w - 4, ci), out.dtype), acc[:, w + 1:w + 2],
                  _z((rows + 2, 1, ci), out.dtype)], axis=1)
    full = _ccat([out + corr, _z((rows + 2, wp - w, ci), out.dtype)], axis=1)
    return full.astype(dt)


def _elu(z):
    # Comparisons run in f32: Mosaic rejects bf16 cmpf for some layouts.
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, zf, jnp.exp(jnp.minimum(zf, 0.0)) - 1.0
                     ).astype(z.dtype)


def _elu_grad(h):
    hf = h.astype(jnp.float32)
    return jnp.where(hf > 0, jnp.ones_like(hf), hf + 1.0).astype(h.dtype)


def _up2(x):
    # Mosaic supports the 5D interleave broadcast only for f32 layouts, so
    # bf16 round-trips through f32 (band-sized temp).
    dt = x.dtype
    r, w, c = x.shape
    v = x.astype(jnp.float32)
    v = jnp.broadcast_to(v[:, None, :, None, :], (r, 2, w, 2, c))
    return v.reshape(2 * r, 2 * w, c).astype(dt)


def _row_select(t, pos: int, alt_pos: int, cond):
    row = jnp.where(cond, t[alt_pos:alt_pos + 1], t[pos:pos + 1])
    return _ccat([t[:pos], row, t[pos + 1:]], axis=0)


def _row_add(t, pos: int, add):
    return _ccat([t[:pos], t[pos:pos + 1] + add, t[pos + 1:]], axis=0)


# ------------------------------------------------------------------ bands
def _band_fwd(xp_ref, xm_ref, xn_ref, wa, ba, wb, bb, first, last, *,
              rb: int, w: int, wp: int, w2: int, wp2: int, dt):
    """Recompute one band. Returns (xpad, ha_ext f32, upad, hb_ext f32).

    Row origins (r0 = band * RB): xpad x-rows [r0-3, r0+rb+3); ha_ext
    [r0-2, r0+rb+2); upad u-rows [2r0-3, 2r0+2rb+3) pre-padded cols;
    hb_ext [2r0-2, 2r0+2rb+2). Out-of-image halo rows carry garbage that
    is never consumed: the per-level reflect selects replace every row that
    feeds a real output.
    """
    xband = jnp.concatenate(
        [xp_ref[0, rb - 3:rb], xm_ref[0], xn_ref[0, 0:3]], axis=0)
    # Image-border row reflect for conv_a's first/last REAL output rows:
    # x[-1] := x[1] (local 4), x[h] := x[h-2] (local rb+1).
    xband = _row_select(xband, 2, 4, first)
    xband = _row_select(xband, rb + 3, rb + 1, last)
    xpad = _reflect_cols(xband, w, wp)                       # (rb+6, wp+3, ci)
    ha_ext = _elu(_conv3x3(xpad, wa, ba, rb + 4, wp))        # [r0-2, r0+rb+2)

    u_ext = _up2(ha_ext)[:, :wp2]                            # [2r0-4, ..+4)
    # u-level reflect: u[-1] := u[1] (local 3 := 5), u[2h] := u[2h-2].
    u_ext = _row_select(u_ext, 3, 5, first)
    u_ext = _row_select(u_ext, 2 * rb + 4, 2 * rb + 2, last)
    upad = _reflect_cols(u_ext[1:2 * rb + 7], w2, wp2)       # (2rb+6, wp2+3, cd)
    hb_ext = _elu(_conv3x3(upad, wb, bb, 2 * rb + 4, wp2))   # [2r0-2, ..+2)
    return xpad, ha_ext, upad, hb_ext


def _hb_window(hb_ext_dt, first, last, rb: int):
    """hb rows [2r0-1, 2r0+2rb+1) with image-border reflect selects."""
    top = jnp.where(first, hb_ext_dt[3:4], hb_ext_dt[1:2])
    bot = jnp.where(last, hb_ext_dt[2 * rb:2 * rb + 1],
                    hb_ext_dt[2 * rb + 2:2 * rb + 3])
    return jnp.concatenate([top, hb_ext_dt[2:2 * rb + 2], bot], axis=0)


# ------------------------------------------------------------------- fwd
def _fwd_kernel(xp_ref, xm_ref, xn_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                wo_ref, bo_ref, feat_ref, disp_ref, *, rb: int, w: int,
                w2: int, wp: int, wp2: int):
    i = pl.program_id(1)
    first = i == 0
    last = i == pl.num_programs(1) - 1
    dt = xm_ref.dtype

    _, _, _, hb_ext = _band_fwd(
        xp_ref, xm_ref, xn_ref, wa_ref[...], ba_ref[...], wb_ref[...],
        bb_ref[...], first, last, rb=rb, w=w, wp=wp, w2=w2, wp2=wp2, dt=dt)
    feat_ref[0] = hb_ext[2:2 * rb + 2]

    hpad = _reflect_cols(_hb_window(hb_ext, first, last, rb), w2, wp2)
    zo = _conv3x3(hpad, wo_ref[...], bo_ref[...], 2 * rb, wp2)
    disp_ref[0] = jax.nn.sigmoid(zo.astype(jnp.float32))[..., 0].astype(dt)


# ------------------------------------------------------------------- bwd
def _bwd_kernel(xp_ref, xm_ref, xn_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                wo_ref, bo_ref, gf_ref, gd_ref, disp_ref,
                dx_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref, dwo_ref,
                dbo_ref, prev_ref, spill_ref, *, rb: int, w: int, w2: int,
                wp: int, wp2: int, ci: int, cd: int):
    i = pl.program_id(1)
    bidx = pl.program_id(0)
    nb = pl.num_programs(1) - 1            # Last grid step only flushes.
    dt = xm_ref.dtype
    f32 = jnp.float32

    @pl.when((i == 0) & (bidx == 0))
    def _():
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dba_ref[...] = jnp.zeros_like(dba_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    @pl.when(i < nb)
    def _compute():
        first = i == 0
        last = i == nb - 1
        xpad, ha_ext, upad, hb_ext = _band_fwd(
            xp_ref, xm_ref, xn_ref, wa_ref[...], ba_ref[...], wb_ref[...],
            bb_ref[...], first, last, rb=rb, w=w, wp=wp, w2=w2, wp2=wp2,
            dt=dt)
        colmask2 = (jax.lax.broadcasted_iota(jnp.int32, (1, wp2, 1), 1) < w2
                    ).astype(jnp.float32)

        # --- outconv backward (band owns disp/feat rows [2r0, 2r0+2rb)).
        # The adjoint chain stays in the input dtype (matching XLA's own
        # bf16 backward under the mixed-precision recipe); dzo and the
        # dW/db accumulators are f32 (minor-dim inserts need 32-bit).
        disp = disp_ref[0].astype(f32)[..., None]
        dzo = gd_ref[0].astype(f32)[..., None] * colmask2 * disp * (1.0 - disp)
        hpad = _reflect_cols(_hb_window(hb_ext, first, last, rb), w2, wp2)
        dwo, dbo = _dw_db(hpad, dzo, 2 * rb, wp2)
        dwo_ref[...] += dwo
        dbo_ref[...] += dbo.reshape(1, 1)

        # dhb over window rows [2r0-1, 2r0+2rb+1).
        dwin = _dconv_input(dzo, wo_ref[...], 2 * rb, w2, wp2, cd, dt)
        # _dconv_input rows span [win0-1, win0+2rb+1) where win0 = first
        # window row = 2r0-1... its row k corresponds to WINDOW row k-1+1:
        # output rows of conv == window rows 1..2rb+... Actually: dz rows
        # are conv outputs [2r0, 2r0+2rb); the function returns grads for
        # image rows [2r0-1, 2r0+2rb+1) — exactly the window. 2rb+2 rows.
        # Window top/bot reflect-select adjoints:
        z1 = _z((1, wp2, cd), dt)
        top_in = jnp.where(first, z1, dwin[0:1])
        bot_in = jnp.where(last, z1, dwin[2 * rb + 1:2 * rb + 2])
        dhb = jnp.concatenate([top_in, dwin[1:2 * rb + 1], bot_in], axis=0)
        dhb = _row_add(dhb, 2, jnp.where(first, dwin[0:1], z1))
        dhb = _row_add(dhb, 2 * rb - 1, jnp.where(last, dwin[2 * rb + 1:], z1))
        gf = (gf_ref[0].astype(f32) * colmask2).astype(dt)
        dhb = _ccat([dhb[0:1], dhb[1:2 * rb + 1] + gf, dhb[2 * rb + 1:]],
                    axis=0)                     # rows [2r0-1, 2r0+2rb+1)

        # --- conv_b backward.
        dzb = dhb * _elu_grad(hb_ext[1:2 * rb + 3])
        # conv_b consumed upad rows (dzb row j used upad[j+1 : j+4]).
        dwb, dbb = _dw_db(upad[1:], dzb, 2 * rb + 2, wp2)
        dwb_ref[...] += dwb
        dbb_ref[...] += dbb.reshape(1, cd)
        du = _dconv_input(dzb, wb_ref[...], 2 * rb + 2, w2, wp2, cd, dt)
        # du rows [2r0-2, 2r0+2rb+2). u-level select adjoints:
        zc = _z((1, wp2, cd), dt)
        du = _row_add(du, 3, jnp.where(first, du[1:2], zc))
        du = _row_add(du, 2 * rb, jnp.where(last, du[2 * rb + 2:2 * rb + 3], zc))
        rid = jax.lax.broadcasted_iota(jnp.int32, (2 * rb + 4, 1, 1), 0)
        du = du * ((rid >= jnp.where(first, 2, 0))
                   & (rid < jnp.where(last, 2 * rb + 2, 2 * rb + 4))
                   ).astype(dt)

        # --- up2 adjoint -> dha rows [r0-1, r0+rb+1). The split reshapes
        # need f32 layouts on Mosaic (like `_up2`).
        duf = du.astype(f32)
        dha = duf.reshape(rb + 2, 2, wp2, cd).sum(axis=1)
        dha = dha.reshape(rb + 2, wp2 // 2, 2, cd).sum(axis=2).astype(dt)
        dha = _ccat([dha[:, :w], _z((rb + 2, wp - w, cd), dha.dtype)], axis=1)

        # --- conv_a backward.
        dza = dha * _elu_grad(ha_ext[1:rb + 3])
        dwa, dba = _dw_db(xpad[1:], dza, rb + 2, wp)
        dwa_ref[...] += dwa
        dba_ref[...] += dba.reshape(1, cd)
        dxp = _dconv_input(dza, wa_ref[...], rb + 2, w, wp, ci, dt)
        # dxp rows [r0-2, r0+rb+2). conv_a image-border row reflect folds:
        zx = _z((1, wp, ci), dt)
        dxp = _row_add(dxp, 3, jnp.where(first, dxp[1:2], zx))
        dxp = _row_add(dxp, rb, jnp.where(last, dxp[rb + 2:rb + 3], zx))
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rb + 4, 1, 1), 0)
        dxp = dxp * ((ridx >= jnp.where(first, 2, 0))
                     & (ridx < jnp.where(last, rb + 2, rb + 4))).astype(dt)

        central = dxp[2:rb + 2].astype(dt)

        @pl.when(i > 0)
        def _():
            # Fix the previous band's pending block with our top spill and
            # release it (the out block for this step IS block i-1).
            blk = prev_ref[...]
            dx_ref[0] = jnp.concatenate(
                [blk[:rb - 2], blk[rb - 2:rb] + dxp[0:2].astype(dt)], axis=0)
            prev_ref[...] = jnp.concatenate(
                [central[0:2] + spill_ref[...], central[2:]], axis=0)

        @pl.when(i == 0)
        def _():
            dx_ref[0] = jnp.zeros_like(dx_ref[0])   # Dummy; rewritten at i=1.
            prev_ref[...] = central

        spill_ref[...] = dxp[rb + 2:rb + 4].astype(dt)

    @pl.when(i == nb)
    def _flush():
        dx_ref[0] = prev_ref[...]


# ------------------------------------------------------------------ jits
def _wmat(wk):
    """(3, 3, ci, co) -> (9ci, co) matching the im2col tap order."""
    k1, k2, ci, co = wk.shape
    return wk.reshape(9 * ci, co)


def _pads(x):
    b, h, w, ci = x.shape
    wp = -(-w // 128) * 128
    wp2 = -(-2 * w // 128) * 128
    return jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0))), wp, wp2


@functools.partial(jax.jit, static_argnames=('interpret',))
def _stage_fwd_jit(x, wa, ba, wb, bb, wo, bo, interpret: bool):
    b, h, w, ci = x.shape
    cd = wa.shape[-1]
    xp, wp, wp2 = _pads(x)
    w2 = 2 * w
    rb = _pick_rb(x.shape, cd, jnp.dtype(x.dtype).itemsize)
    if rb is None:
        raise ValueError(f'Unsupported stage shape for the fused kernel: '
                         f'{x.shape} -> cd={cd} (use decoder_stage_supported)')
    nb = h // rb
    kern = functools.partial(_fwd_kernel, rb=rb, w=w, w2=w2, wp=wp, wp2=wp2)
    xspec = lambda f: pl.BlockSpec(                     # noqa: E731
        (1, rb, wp, ci), lambda bb_, i: (bb_, f(i), 0, 0))
    feat, disp = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            xspec(lambda i: jnp.maximum(i - 1, 0)),
            xspec(lambda i: i),
            xspec(lambda i: jnp.minimum(i + 1, nb - 1)),
            pl.BlockSpec((9 * ci, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, 1), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, 1), lambda bb_, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * rb, wp2, cd), lambda bb_, i: (bb_, i, 0, 0)),
            pl.BlockSpec((1, 2 * rb, wp2), lambda bb_, i: (bb_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * h, wp2, cd), x.dtype),
            jax.ShapeDtypeStruct((b, 2 * h, wp2), x.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, _wmat(wa), ba.reshape(1, cd), _wmat(wb), bb.reshape(1, cd),
      _wmat(wo), bo.reshape(1, 1))
    return feat[:, :, :w2], disp[:, :, :w2, None]


@functools.partial(jax.jit, static_argnames=('interpret',))
def _stage_bwd_jit(x, wa, ba, wb, bb, wo, bo, disp, g_feat, g_disp,
                   interpret: bool):
    b, h, w, ci = x.shape
    cd = wa.shape[-1]
    xp, wp, wp2 = _pads(x)
    w2 = 2 * w
    rb = _pick_rb(x.shape, cd, jnp.dtype(x.dtype).itemsize)
    if rb is None:
        raise ValueError(f'Unsupported stage shape for the fused kernel: '
                         f'{x.shape} -> cd={cd} (use decoder_stage_supported)')
    nb = h // rb
    gfp = jnp.pad(g_feat, ((0, 0), (0, 0), (0, wp2 - w2), (0, 0)))
    gdp = jnp.pad(g_disp[..., 0], ((0, 0), (0, 0), (0, wp2 - w2)))
    dpp = jnp.pad(disp[..., 0], ((0, 0), (0, 0), (0, wp2 - w2)))

    kern = functools.partial(_bwd_kernel, rb=rb, w=w, w2=w2, wp=wp, wp2=wp2,
                             ci=ci, cd=cd)
    xspec = lambda f: pl.BlockSpec(                     # noqa: E731
        (1, rb, wp, ci), lambda bb_, i: (bb_, f(i), 0, 0))
    clamp = lambda i: jnp.minimum(i, nb - 1)            # noqa: E731
    gspec = lambda last_dims: pl.BlockSpec(             # noqa: E731
        (1, 2 * rb) + last_dims, lambda bb_, i: (bb_, clamp(i)) + (0,) * len(last_dims))
    outs = pl.pallas_call(
        kern,
        grid=(b, nb + 1),
        in_specs=[
            xspec(lambda i: jnp.maximum(clamp(i) - 1, 0)),
            xspec(clamp),
            xspec(lambda i: jnp.minimum(clamp(i) + 1, nb - 1)),
            pl.BlockSpec((9 * ci, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, 1), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, 1), lambda bb_, i: (0, 0)),
            gspec((wp2, cd)),
            gspec((wp2,)),
            gspec((wp2,)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, wp, ci),
                         lambda bb_, i: (bb_, jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((9 * ci, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, cd), lambda bb_, i: (0, 0)),
            pl.BlockSpec((9 * cd, 1), lambda bb_, i: (0, 0)),
            pl.BlockSpec((1, 1), lambda bb_, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, ci), x.dtype),
            jax.ShapeDtypeStruct((9 * ci, cd), jnp.float32),
            jax.ShapeDtypeStruct((1, cd), jnp.float32),
            jax.ShapeDtypeStruct((9 * cd, cd), jnp.float32),
            jax.ShapeDtypeStruct((1, cd), jnp.float32),
            jax.ShapeDtypeStruct((9 * cd, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, wp, ci), x.dtype),
            pltpu.VMEM((2, wp, ci), x.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, _wmat(wa), ba.reshape(1, cd), _wmat(wb), bb.reshape(1, cd),
      _wmat(wo), bo.reshape(1, 1), gfp, gdp, dpp)
    dx, dwa, dba, dwb, dbb, dwo, dbo = outs
    return (dx[:, :, :w].astype(x.dtype),
            dwa.reshape(wa.shape).astype(wa.dtype),
            dba.reshape(ba.shape).astype(ba.dtype),
            dwb.reshape(wb.shape).astype(wb.dtype),
            dbb.reshape(bb.shape).astype(bb.dtype),
            dwo.reshape(wo.shape).astype(wo.dtype),
            dbo.reshape(bo.shape).astype(bo.dtype))


def _interp() -> bool:
    return jax.default_backend() != 'tpu'


@jax.custom_vjp
def _stage_core(x, wa, ba, wb, bb, wo, bo):
    return _stage_fwd_jit(x, wa, ba, wb, bb, wo, bo, _interp())


def _stage_core_fwd(x, wa, ba, wb, bb, wo, bo):
    feat, disp = _stage_core(x, wa, ba, wb, bb, wo, bo)
    return (feat, disp), (x, wa, ba, wb, bb, wo, bo, disp)


def _stage_core_bwd(res, g):
    x, wa, ba, wb, bb, wo, bo, disp = res
    g_feat, g_disp = g
    return _stage_bwd_jit(x, wa, ba, wb, bb, wo, bo, disp, g_feat, g_disp,
                          _interp())


_stage_core.defvjp(_stage_core_fwd, _stage_core_bwd)


def fused_upconv_stage(x, wa, ba, wb, bb, wo, bo):
    """One skip-less Monodepth decoder stage, fused.

    :param x: (b, h, w, ci) input features.
    :param wa: (3, 3, ci, cd) `upconv_X_0` kernel; ba (cd,) its bias.
    :param wb: (3, 3, cd, cd) `upconv_X_1` kernel; bb (cd,) its bias.
    :param wo: (3, 3, cd, 1) `outconv_X` kernel; bo (1,) its bias.
    :return: (feat (b, 2h, 2w, cd), disp (b, 2h, 2w, 1)).
    """
    return _stage_core(x, wa, ba, wb, bb, wo, bo)
