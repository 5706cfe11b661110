"""Pallas TPU kernel: fused ConvNeXt block (dwconv7x7 + LN + MLP), fwd + VJP.

STATUS — OPT-IN, NEGATIVE RESULT on the current v5e toolchain. The kernel is
exact (differential-tested fwd + full 10-tensor VJP) and compiles/runs on
chip, but with honest tunnel-latency-corrected timing XLA's in-context block
is already near its practical floor: bf16 fused fwd matches XLA (~0.8 ms,
stage-0 shape) while the fused backward loses ~2x (recompute + transpose tap
passes are VPU-bound and Mosaic gains nothing over XLA's fusions); the f32
full KBR step measures 26.3 (fused) vs 27.5 (XLA) imgs/s. The round-1 premise
("XLA dwconv ~10-27x off roofline") was a measurement artifact — the scan
microbench harness carried ~2.7 ms/rep of tunnel round-trip (see
`.claude/skills/verify/SKILL.md`). Kept as documented evidence, a numerics
reference, and a base for future toolchains; enable via
SLOWTV_ENABLE_PALLAS_CONVNEXT (f32, C>=512 stages).

One launch per block computes

    y = x + gamma * fc2(gelu(fc1(LN(dwconv7x7(x) + b_dw))))

with everything after the input read resident in VMEM: the 49 dwconv taps
accumulate in f32, LN stats are lane-masked f32, the two dense layers hit the
MXU with f32 accumulation, and only y returns to HBM. The backward is one
Pallas kernel that recomputes the chain per tile (flash-style), emits the
pre-dwconv cotangent `dLNin` plus all dense/LN/gamma grads (accumulated in
f32 across the sequential grid), and the dwconv dx/dw transposes reuse the
standalone kernels in `pallas_dwconv.py`.

LAYOUT & TILING
- NHWC; C must be a multiple of 128 lanes — callers (ConvNeXtEncoder) pad
  once per stage and slice at stage end; LN masks the pad lanes, zero-padded
  weights keep pad lanes exactly zero through the block, so chained blocks
  compose without re-padding.
- Grid (b, nh): each step produces a (Th, W, C) output tile. Row halos for
  the 7x7 dwconv come from passing x three times with clamped block indices
  (i-1, i, i+1); out-of-range halo rows are masked in-kernel (zero 'SAME'
  padding), so there are NO host-side pad copies around the launch.
- Th is the smallest divisor of H that is >= 6 (halo width); W is kept whole.

Reference: timm ConvNeXt block semantics (`src/networks/` encoders via timm;
our `models/encoders/convnext.py:ConvNeXtBlock`).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_convnext_block', 'convnext_block_supported']

_LANES = 128
_K = 7
_P = _K // 2  # 3


def _pick_th(h: int, w: int, c: int) -> int | None:
    """Largest divisor of `h` >= 6 (halo width) whose tile fits the VMEM
    budget: fewer grid steps amortize per-step fixed costs."""
    best = None
    for th in range(6, h + 1):
        if h % th:
            continue
        # Dominant live f32 buffers: padded halo tile + u + hidden h1/hg.
        fp32 = (th + 6) * (w + 6) * c + 2 * th * w * c + 2 * th * w * 4 * c
        if 4 * fp32 < 24 * 1024 * 1024:
            best = th
    return best


def convnext_block_supported(x_shape, c_real: int, backend: str) -> bool:
    """Static dispatch check for the fused block kernel."""
    if backend != 'tpu':
        return False
    b, h, w, c = x_shape
    if c % _LANES or c_real > c or h < 6:
        return False
    return _pick_th(h, w, c) is not None


def _erf_f32(x):
    """f32-accuracy erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7).

    Mosaic has no `erf` primitive; this uses only mul/add/div/exp/abs/sign.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(h, approximate: bool):
    if approximate:
        a = 0.7978845608028654  # sqrt(2/pi)
        inner = a * (h + 0.044715 * h * h * h)
        return 0.5 * h * (1.0 + jnp.tanh(inner))
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865475))


def _padded_halo_tile(xm_ref, xc_ref, xp_ref, nh, th: int, c: int):
    """(th + K - 1, w + K - 1, c) f32 window around the current tile.

    Built ONCE per grid step (three concats) from the clamped halo blocks
    (i-1, i, i+1); out-of-range halo rows and the W side pads are zeros
    ('SAME' conv semantics).
    """
    i = pl.program_id(1)
    top = xm_ref[0, -_P:].astype(jnp.float32) \
        * jnp.where(i == 0, 0.0, 1.0)                       # (P, w, c)
    bot = xp_ref[0, :_P].astype(jnp.float32) \
        * jnp.where(i == nh - 1, 0.0, 1.0)                  # (P, w, c)
    rows = jnp.concatenate([top, xc_ref[0].astype(jnp.float32), bot], axis=0)
    z = jnp.zeros((th + _K - 1, _P, c), jnp.float32)
    return jnp.concatenate([z, rows, z], axis=1)


def _dwconv_ln(xm_ref, xc_ref, xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
               *, th: int, w: int, c: int, c_real: int, nh: int, eps: float):
    """Shared fwd recompute: (u, xhat, rstd, xln) for the current tile (f32)."""
    wf = dwk_ref[:, :, :].astype(jnp.float32)  # (K, K, C)
    xpad = _padded_halo_tile(xm_ref, xc_ref, xp_ref, nh, th, c)
    u = None
    for dy in range(_K):
        for dx in range(_K):
            tap = xpad[dy:dy + th, dx:dx + w, :] * wf[dy, dx][None, None, :]
            u = tap if u is None else u + tap
    u = u + dwb_ref[0].astype(jnp.float32)[None, None, :]

    lane = lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    mask = (lane < c_real).astype(jnp.float32)
    um = u * mask
    mu = jnp.sum(um, axis=-1, keepdims=True) / c_real
    d = (u - mu) * mask
    var = jnp.sum(d * d, axis=-1, keepdims=True) / c_real
    rstd = lax.rsqrt(var + eps)
    xhat = d * rstd
    xln = xhat * lns_ref[0].astype(jnp.float32)[None, None, :] \
        + lnb_ref[0].astype(jnp.float32)[None, None, :] * mask
    return u, xhat, rstd, xln, mask


def _fwd_kernel(xm_ref, xc_ref, xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, g_ref, out_ref,
                *, th: int, w: int, c: int, c_real: int, nh: int,
                approximate: bool, eps: float):
    _, _, _, xln, _ = _dwconv_ln(
        xm_ref, xc_ref, xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
        th=th, w=w, c=c, c_real=c_real, nh=nh, eps=eps)

    cdt = w1_ref.dtype
    rows = th * w
    x2 = xln.reshape(rows, c).astype(cdt)
    h1 = jnp.dot(x2, w1_ref[:, :], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0].astype(jnp.float32)[None, :]
    hg = _gelu_f32(h1, approximate)
    o = jnp.dot(hg.astype(cdt), w2_ref[:, :], preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)[None, :]
    o = o.reshape(th, w, c) * g_ref[0].astype(jnp.float32)[None, None, :]
    out_ref[0] = (xc_ref[0].astype(jnp.float32) + o).astype(out_ref.dtype)


def _specs_x(th: int, w: int, c: int, nh: int):
    """The three clamped row-halo views of x."""
    return [
        pl.BlockSpec((1, th, w, c), lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
        pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, th, w, c),
                     lambda b, i, nh=nh: (b, jnp.minimum(i + 1, nh - 1), 0, 0)),
    ]


def _vec(a):
    """(c,) param -> (1, c) for a 2D VMEM block."""
    return a.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=('c_real', 'approximate', 'interpret'))
def _block_fwd_jit(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                   c_real: int, approximate: bool, interpret: bool):
    b, h, w, c = x.shape
    th = _pick_th(h, w, c)
    nh = h // th
    kern = functools.partial(
        _fwd_kernel, th=th, w=w, c=c, c_real=c_real, nh=nh,
        approximate=approximate, eps=1e-6)
    vecs = [_vec(v) for v in (dwb, lns, lnb, b1, b2, gamma)]
    dwb2, lns2, lnb2, b12, b22, g2 = vecs
    out = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=_specs_x(th, w, c, nh) + [
            pl.BlockSpec((_K, _K, c), lambda b_, i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda b_, i: (0, 0)),      # dwb
            pl.BlockSpec((1, c), lambda b_, i: (0, 0)),      # lns
            pl.BlockSpec((1, c), lambda b_, i: (0, 0)),      # lnb
            pl.BlockSpec((c, 4 * c), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, 4 * c), lambda b_, i: (0, 0)),
            pl.BlockSpec((4 * c, c), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b_, i: (0, 0)),      # b2
            pl.BlockSpec((1, c), lambda b_, i: (0, 0)),      # gamma
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, dwk, dwb2, lns2, lnb2, w1, b12, w2, b22, g2)
    return out


def _interpret_default() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _block_core(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                c_real: int, approximate: bool):
    return _block_fwd_jit(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                          c_real, approximate, _interpret_default())


def _block_core_fwd(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                    c_real, approximate):
    y = _block_core(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                    c_real, approximate)
    return y, (x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma)


def _bwd_kernel(xm_ref, xc_ref, xp_ref, dy_ref, dwk_ref, dwb_ref, lns_ref,
                lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dln_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref,
                dlnb_ref, dg_ref, ddwb_ref,
                *, th: int, w: int, c: int, c_real: int, nh: int,
                approximate: bool, eps: float):
    """Recompute the chain for this tile; emit dLNin + accumulate param grads."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dlns_ref[:, :] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:, :] = jnp.zeros_like(dlnb_ref)
        dg_ref[:, :] = jnp.zeros_like(dg_ref)
        ddwb_ref[:, :] = jnp.zeros_like(ddwb_ref)

    u, xhat, rstd, xln, mask = _dwconv_ln(
        xm_ref, xc_ref, xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
        th=th, w=w, c=c, c_real=c_real, nh=nh, eps=eps)
    del u

    cdt = w1_ref.dtype
    rows = th * w
    x2 = xln.reshape(rows, c).astype(cdt)
    h1 = jnp.dot(x2, w1_ref[:, :], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0].astype(jnp.float32)[None, :]

    if approximate:
        a = 0.7978845608028654
        k3 = 0.044715
        t = jnp.tanh(a * (h1 + k3 * h1 * h1 * h1))
        hg = 0.5 * h1 * (1.0 + t)
        dgelu = 0.5 * (1.0 + t) \
            + 0.5 * h1 * (1.0 - t * t) * a * (1.0 + 3.0 * k3 * h1 * h1)
    else:
        inv_s2 = 0.7071067811865475
        t = _erf_f32(h1 * inv_s2)
        hg = 0.5 * h1 * (1.0 + t)
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * h1 * h1)
        dgelu = 0.5 * (1.0 + t) + h1 * pdf

    # mlp_out (for dgamma) and the grad chain.
    o = jnp.dot(hg.astype(cdt), w2_ref[:, :], preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)[None, :]

    dy = dy_ref[0].astype(jnp.float32).reshape(rows, c)
    g = g_ref[0].astype(jnp.float32)[None, :]
    dg_ref[0, :] += jnp.sum(dy * o, axis=0)
    dh2 = dy * g                                     # (rows, c)
    db2_ref[0, :] += jnp.sum(dh2, axis=0)
    dw2_ref[:, :] += jnp.dot(hg.astype(cdt).T, dh2.astype(cdt),
                             preferred_element_type=jnp.float32
                             ).astype(dw2_ref.dtype)
    dhg = jnp.dot(dh2.astype(cdt), w2_ref[:, :].T,
                  preferred_element_type=jnp.float32)
    dh1 = dhg * dgelu                                # (rows, 4c)
    db1_ref[0, :] += jnp.sum(dh1, axis=0)
    dw1_ref[:, :] += jnp.dot(x2.T, dh1.astype(cdt),
                             preferred_element_type=jnp.float32
                             ).astype(dw1_ref.dtype)
    dxln = jnp.dot(dh1.astype(cdt), w1_ref[:, :].T,
                   preferred_element_type=jnp.float32)

    dxln = dxln.reshape(th, w, c) * mask
    xh2 = xhat  # (th, w, c), already masked
    dlns_ref[0, :] += jnp.sum(dxln * xh2, axis=(0, 1))
    dlnb_ref[0, :] += jnp.sum(dxln, axis=(0, 1))

    # LN backward (per pixel over c_real lanes).
    dxhat = dxln * lns_ref[0].astype(jnp.float32)[None, None, :]
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c_real
    m2 = jnp.sum(dxhat * xh2, axis=-1, keepdims=True) / c_real
    du = (dxhat - m1 - xh2 * m2) * rstd * mask
    ddwb_ref[0, :] += jnp.sum(du, axis=(0, 1))
    dln_ref[0] = du.astype(dln_ref.dtype)


@functools.partial(jax.jit, static_argnames=('c_real', 'approximate', 'interpret'))
def _block_bwd_jit(x, dy, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                   c_real: int, approximate: bool, interpret: bool):
    b, h, w, c = x.shape
    th = _pick_th(h, w, c)
    nh = h // th
    kern = functools.partial(
        _bwd_kernel, th=th, w=w, c=c, c_real=c_real, nh=nh,
        approximate=approximate, eps=1e-6)
    const = lambda b_, i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=_specs_x(th, w, c, nh) + [
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0)),
            pl.BlockSpec((_K, _K, c), lambda b_, i: (0, 0, 0)),
            pl.BlockSpec((1, c), const),      # dwb
            pl.BlockSpec((1, c), const),      # lns
            pl.BlockSpec((1, c), const),      # lnb
            pl.BlockSpec((c, 4 * c), const),
            pl.BlockSpec((1, 4 * c), const),
            pl.BlockSpec((4 * c, c), const),
            pl.BlockSpec((1, c), const),      # b2
            pl.BlockSpec((1, c), const),      # gamma
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0)),
            pl.BlockSpec((c, 4 * c), const),
            pl.BlockSpec((1, 4 * c), const),
            pl.BlockSpec((4 * c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),      # dLNin
            jax.ShapeDtypeStruct((c, 4 * c), jnp.float32),    # dW1
            jax.ShapeDtypeStruct((1, 4 * c), jnp.float32),    # db1
            jax.ShapeDtypeStruct((4 * c, c), jnp.float32),    # dW2
            jax.ShapeDtypeStruct((1, c), jnp.float32),        # db2
            jax.ShapeDtypeStruct((1, c), jnp.float32),        # dlns
            jax.ShapeDtypeStruct((1, c), jnp.float32),        # dlnb
            jax.ShapeDtypeStruct((1, c), jnp.float32),        # dgamma
            jax.ShapeDtypeStruct((1, c), jnp.float32),        # ddwb
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, dy, dwk, _vec(dwb), _vec(lns), _vec(lnb), w1, _vec(b1),
      w2, _vec(b2), _vec(gamma))
    return outs


def _block_core_bwd(c_real, approximate, res, dy):
    x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma = res
    interp = _interpret_default()
    dln, dw1, db1, dw2, db2, dlns, dlnb, dgamma, ddwb = _block_bwd_jit(
        x, dy, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
        c_real, approximate, interp)

    # dwconv transposes on the pre-dwconv cotangent (standalone kernels).
    from .pallas_dwconv import _dwconv_dw_jit, _dwconv_fwd_jit
    dx_dw = _dwconv_fwd_jit(dln, dwk[::-1, ::-1], interp)
    ddwk = _dwconv_dw_jit(x, dln, _K, interp)

    cast = lambda v, ref: v.astype(ref.dtype)  # noqa: E731
    return (cast(dy + dx_dw, x), cast(ddwk, dwk), cast(ddwb[0], dwb),
            cast(dlns[0], lns), cast(dlnb[0], lnb), cast(dw1, w1),
            cast(db1[0], b1), cast(dw2, w2), cast(db2[0], b2),
            cast(dgamma[0], gamma))


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


def fused_convnext_block(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                         c_real: int | None = None,
                         approximate: bool = False):
    """Fused ConvNeXt block: `x + gamma * fc2(gelu(fc1(LN(dwconv(x)))))`.

    :param x: (b, h, w, c) NHWC, c a multiple of 128 (pad lanes zero).
    :param dwk: (7, 7, c) depthwise kernel (pad lanes zero).
    :param c_real: Number of real channels (<= c) for the LN statistics.
    :param approximate: tanh GELU (the TPU training recipe) vs exact erf.
    """
    if c_real is None:
        c_real = x.shape[-1]
    return _block_core(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                       c_real, approximate)
