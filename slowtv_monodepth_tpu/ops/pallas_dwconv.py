"""Pallas TPU kernel: stride-1 'SAME' depthwise KxK convolution (fwd + VJP).

STATUS — OPT-IN, NEGATIVE RESULT on the current v5e toolchain. The round-1
premise ("XLA dwconv ~27x off the bandwidth bound") was a measurement
artifact: the scan microbench harness carried ~2.7 ms/rep of tunnel
round-trip at K=10 (see `.claude/skills/verify/SKILL.md`). With corrected
timing (K=50 + identity baseline), XLA's dwconv is near roofline and beats
this kernel at every training shape/dtype — e.g. (8,96,160,96) f32 fwd:
XLA 0.14 ms vs pallas 0.92 ms; bf16 fwd+dx+dw: XLA 0.49 ms vs 4.5 ms. Kept
(with its tests) as a numerics reference and do-not-retry documentation;
`models/encoders/convnext.py` keeps the XLA grouped conv by default.

DESIGN
- NHWC with C host-padded to 128 lanes; W carries the sublanes. Shifts in x
  are static sublane slices, shifts in y are row re-addressing — both cheap.
- Grid (cb, b, hb): one (Hb, W, 128) output block per step. The +K-1 row halo
  comes from passing the SAME host-padded input twice with block indices
  (hb, hb+1) — overlapping windows aren't expressible in one BlockSpec, and
  the input is padded to (nH+1)*Hb rows so hb+1 is always a valid block.
  Zero 'SAME' padding is baked into the host pad, so no edge masking at all.
- fwd: out[y, x, c] = sum_{dy, dx} xpad[y+dy, x+dx, c] * w[dy, dx, c];
  the 49 taps accumulate straight into the output block in VMEM.
- dx: same kernel on the cotangent with a spatially flipped kernel
  (stride-1 SAME depthwise conv is self-transpose up to the flip).
- dw[dy, dx, c] = sum_{b, y, x} xpad[y+dy, x+dx, c] * g[y, x, c]: the channel
  axis is the grid's OUTERMOST dim, so for a fixed channel block every (b, hb)
  step runs consecutively and the (K, K, 128) output block stays resident in
  VMEM while it accumulates.
- db = sum g: left to XLA (trivial reduce).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

__all__ = ['depthwise_conv', 'dwconv_pallas_supported']

_LANES = 128
_HB = 8  # Output rows per grid step (>= K-1 required for the 2-block halo).


def dwconv_pallas_supported(x_shape, k: int, backend: str) -> bool:
    """Static dispatch check: stride-1 odd-K 'SAME' depthwise conv on TPU."""
    if backend != 'tpu':
        return False
    if k % 2 != 1 or k - 1 > _HB or k > 9:
        return False
    b, h, w, c = x_shape
    # One (Hb, W + K - 1, 128) f32 block x2 specs x2 pipeline buffers plus the
    # output block must sit in VMEM comfortably.
    blk = _HB * (w + k - 1) * _LANES * 4
    return 5 * blk < 12 * 1024 * 1024


def _fwd_kernel(xm_ref, xn_ref, w_ref, out_ref, *, k: int, hb: int, w: int):
    """One (hb, w, 128) output block; xm/xn carry rows [hb*i, hb*(i+2))."""
    wfull = w_ref[:, :, :]  # (k, k, 128)
    for dy in range(k):
        if dy == 0:
            rows = xm_ref[0]                     # (hb, w + k - 1, 128)
        else:
            rows = jnp.concatenate([xm_ref[0, dy:], xn_ref[0, :dy]], axis=0)
        for dx in range(k):
            tap = rows[:, dx:dx + w, :] * wfull[dy, dx][None, None, :]
            if dy == 0 and dx == 0:
                out_ref[0] = tap
            else:
                out_ref[0] += tap


def _dw_kernel(xm_ref, xn_ref, g_ref, dw_ref, *, k: int, hb: int, w: int):
    """Accumulate (k, k, 128) weight grads across the (b, hb) steps."""
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    g = g_ref[0]  # (hb, w, 128)
    for dy in range(k):
        for dx in range(k):
            # Split the shifted-row window across the two halo blocks instead
            # of materializing a concatenated copy (VMEM scoped-stack budget).
            v = jnp.sum(xm_ref[0, dy:, dx:dx + w, :] * g[:hb - dy],
                        axis=(0, 1))  # (128,)
            if dy > 0:
                v = v + jnp.sum(xn_ref[0, :dy, dx:dx + w, :] * g[hb - dy:],
                                axis=(0, 1))
            dw_ref[dy, dx:dx + 1, :] += v[None, :]


def _pad_nhwc(x: jnp.ndarray, k: int, hb: int):
    """Zero 'SAME' pad + align: rows to (nh+1)*hb, channels to 128."""
    b, h, w, c = x.shape
    p = (k - 1) // 2
    nh = -(-h // hb)
    cp = -(-c // _LANES) * _LANES
    x = jnp.pad(x, ((0, 0), (p, (nh + 1) * hb - h - p), (p, p),
                    (0, cp - c)))
    return x, nh, cp


@functools.partial(jax.jit, static_argnames=('interpret',))
def _dwconv_fwd_jit(x: jnp.ndarray, w: jnp.ndarray, interpret: bool):
    b, h, wd, c = x.shape
    k = w.shape[0]
    hb = _HB
    xp, nh, cp = _pad_nhwc(x, k, hb)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c)))

    kern = functools.partial(_fwd_kernel, k=k, hb=hb, w=wd)
    out = pl.pallas_call(
        kern,
        grid=(cp // _LANES, b, nh),
        in_specs=[
            pl.BlockSpec((1, hb, wd + k - 1, _LANES),
                         lambda cb, bb, i: (bb, i, 0, cb)),
            pl.BlockSpec((1, hb, wd + k - 1, _LANES),
                         lambda cb, bb, i: (bb, i + 1, 0, cb)),
            pl.BlockSpec((k, k, _LANES), lambda cb, bb, i: (0, 0, cb)),
        ],
        out_specs=pl.BlockSpec((1, hb, wd, _LANES),
                               lambda cb, bb, i: (bb, i, 0, cb)),
        out_shape=jax.ShapeDtypeStruct((b, nh * hb, wd, cp), x.dtype),
        interpret=interpret,
    )(xp, xp, wp)
    return out[:, :h, :, :c]


@functools.partial(jax.jit, static_argnames=('k', 'interpret'))
def _dwconv_dw_jit(x: jnp.ndarray, g: jnp.ndarray, k: int, interpret: bool):
    b, h, wd, c = x.shape
    hb = _HB
    xp, nh, cp = _pad_nhwc(x, k, hb)
    gp = jnp.pad(g, ((0, 0), (0, nh * hb - h), (0, 0), (0, cp - c)))

    kern = functools.partial(_dw_kernel, k=k, hb=hb, w=wd)
    dw = pl.pallas_call(
        kern,
        grid=(cp // _LANES, b, nh),
        in_specs=[
            pl.BlockSpec((1, hb, wd + k - 1, _LANES),
                         lambda cb, bb, i: (bb, i, 0, cb)),
            pl.BlockSpec((1, hb, wd + k - 1, _LANES),
                         lambda cb, bb, i: (bb, i + 1, 0, cb)),
            pl.BlockSpec((1, hb, wd, _LANES),
                         lambda cb, bb, i: (bb, i, 0, cb)),
        ],
        out_specs=pl.BlockSpec((k, k, _LANES), lambda cb, bb, i: (0, 0, cb)),
        out_shape=jax.ShapeDtypeStruct((k, k, cp), x.dtype),
        interpret=interpret,
    )(xp, xp, gp)
    return dw[:, :, :c]


def _interpret_default() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _dwconv_core(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return _dwconv_fwd_jit(x, w, _interpret_default())


def _dwconv_core_fwd(x, w):
    return _dwconv_core(x, w), (x, w)


def _dwconv_core_bwd(res, g):
    x, w = res
    interp = _interpret_default()
    # dx: correlate the cotangent with the spatially flipped kernel.
    dx = _dwconv_fwd_jit(g, w[::-1, ::-1], interp)
    dw = _dwconv_dw_jit(x, g, w.shape[0], interp)
    return dx, dw


_dwconv_core.defvjp(_dwconv_core_fwd, _dwconv_core_bwd)


def depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 'SAME' depthwise conv, NHWC.

    :param x: (b, h, w, c) input.
    :param kernel: (k, k, 1, c) flax `nn.Conv(feature_group_count=c)` kernel
        (or (k, k, c)).
    :param bias: optional (c,) bias.
    :return: (b, h, w, c).

    Dispatches to the Pallas kernel on TPU f32 (see module docstring); the
    fallback is the identical-semantics XLA grouped conv.
    """
    if kernel.ndim == 4:
        kernel = kernel[:, :, 0, :]
    k = kernel.shape[0]
    c = x.shape[-1]

    import os
    use_pallas = (
        not os.environ.get('SLOWTV_DISABLE_PALLAS_DWCONV')
        and x.dtype == jnp.float32 and kernel.shape == (k, k, c)
        and kernel.shape[0] == kernel.shape[1]
        and dwconv_pallas_supported(
            x.shape, k,
            'tpu' if os.environ.get('SLOWTV_FORCE_PALLAS_DWCONV')
            else jax.default_backend())
    )
    if use_pallas:
        out = _dwconv_core(x, kernel)
    else:
        out = lax.conv_general_dilated(
            x, kernel[:, :, None, :],
            window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c)
    if bias is not None:
        out = out + bias
    return out
