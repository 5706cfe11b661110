"""NeWCRFs metric-depth baseline (Flax port of the vendored reference model).

Capability parity with the reference's vendored NeWCRFs
(`src/external_libs/newcrfs/newcrfs/networks/NewCRFDepth.py:11-148`): a Swin
backbone, a PSP (pyramid pooling) context head on the coarsest features, four
"neural window FC-CRF" stages — windowed cross-attention where the *query/key*
come from the backbone features and the *value* is the decoded state — joined
by pixel-shuffle upsampling, and a sigmoid disparity head scaled to metric
depth by `max_depth` (ref `:123-148`).

Used only as an external eval baseline (`src/core/predictors.py:212-249`);
weights come from the released NeWCRFs checkpoints via
`import_newcrfs.convert_newcrfs`.

TPU-first notes: window partitioning is reshape/transpose only; all attention
runs as batched (windows, tokens, ch) matmuls on the MXU; the shifted-window
masks and adaptive-pool bin edges are trace-time constants (static shapes).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import resize
from .encoders.swin import (SwinEncoder, _relative_position_index, _shift_mask,
                            _window_partition, _window_reverse)

__all__ = ['NewCRFDepth', 'NEWCRFS_VERSIONS']

# Backbone specs per version prefix (ref `NewCRFDepth.py:28-42`); the decoder
# dims are version-independent (ref `:69-76`).
NEWCRFS_VERSIONS = {
    'tiny': dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                 in_channels=(96, 192, 384, 768)),
    'base': dict(embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
                 in_channels=(128, 256, 512, 1024)),
    'large': dict(embed_dim=192, depths=(2, 2, 18, 2), heads=(6, 12, 24, 48),
                  in_channels=(192, 384, 768, 1536)),
}

_CRF_DIMS = (128, 256, 512, 1024)
_V_DIMS = (64, 128, 256, 512)
_PSP_CHANNELS = 512
_POOL_SCALES = (1, 2, 3, 6)
_CRF_WINDOW = 7
_CRF_HEADS = (4, 8, 16, 32)


def _adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch `adaptive_avg_pool2d` on NHWC: bin i spans [floor(i*n/out),
    ceil((i+1)*n/out)). Separable means are exact for uniform weights."""
    def pool_axis(t, axis):
        n = t.shape[axis]
        slabs = []
        for i in range(out):
            s = (i * n) // out
            e = -(((i + 1) * -n) // out)  # ceil((i+1)*n/out)
            slab = jax.lax.slice_in_dim(t, s, e, axis=axis)
            slabs.append(slab.mean(axis=axis, keepdims=True))
        return jnp.concatenate(slabs, axis=axis)
    return pool_axis(pool_axis(x, 1), 2)


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """torch `PixelShuffle` in NHWC: channel blocks ordered (c, dy, dx)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class _ConvNormAct(nn.Module):
    """mmcv `ConvModule` equivalent: conv(no bias) -> BN/GN -> ReLU.

    The reference PSP head uses BN everywhere except the 1x1-pooled branch,
    which uses GN (batch-size-1 safe; ref `uper_crf_head.py:35-45`).
    """
    ch: int
    kernel: int = 1
    norm: str = 'bn'  # 'bn' | 'gn'
    groups: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.ch, (self.kernel, self.kernel), padding=pad,
                    use_bias=False, name='conv')(x)
        if self.norm == 'bn':
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name='bn')(x)
        else:
            x = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                             epsilon=1e-5, name='gn')(x)
        return nn.relu(x)


class _PSP(nn.Module):
    """Pyramid pooling context head on the coarsest backbone features
    (ref `uper_crf_head.py:318-364`)."""
    channels: int = _PSP_CHANNELS
    pool_scales: Sequence[int] = _POOL_SCALES

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: the reference's PPM loop rebinds `norm_cfg` to GN at
        # pool_scale 1 — the FIRST scale — so ALL pooled branches use
        # GroupNorm(256); only the bottleneck keeps BN
        # (ref `uper_crf_head.py:33-45`, a subtle but load-bearing detail for
        # checkpoint compatibility).
        outs = [x]
        for k, scale in enumerate(self.pool_scales):
            p = _adaptive_avg_pool(x, scale)
            p = _ConvNormAct(self.channels, 1, 'gn', name=f'psp{k}')(p, train)
            outs.append(resize(p, x.shape[1:3]))
        x = jnp.concatenate(outs, axis=-1)
        return _ConvNormAct(self.channels, 3, 'bn', name='bottleneck')(x, train)


class _CRFAttention(nn.Module):
    """Windowed cross-attention: q/k from `x`, value given (`v`); relative
    position bias (ref `newcrf_layers.py:62-149`)."""
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, v, mask=None):
        bnw, n, c = x.shape
        head_dim = self.dim // self.heads
        qk = nn.Dense(self.dim * 2, name='qk')(x)
        qk = qk.reshape(bnw, n, 2, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k = qk[0] * (head_dim ** -0.5), qk[1]

        attn = q @ k.transpose(0, 1, 3, 2)
        table = self.param('rel_pos_table', nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads))
        idx = _relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, self.heads, n, n)
        attn = nn.softmax(attn, axis=-1)

        vv = v.reshape(bnw, n, self.heads, -1).transpose(0, 2, 1, 3)
        out = (attn @ vv).transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


class _CRFBlock(nn.Module):
    """One (S)W-CRF block: norm1(x) -> window cross-attn with v -> residual
    -> MLP (ref `newcrf_layers.py:152-257`). `v` is shared by both blocks of
    a stage."""
    dim: int
    heads: int
    window: int
    shift: int

    @nn.compact
    def __call__(self, x, v):
        b, h, w, c = x.shape
        win, shift = self.window, self.shift  # mmseg style: never clamped.

        y = nn.LayerNorm(epsilon=1e-5, name='norm1')(x)
        vv = v  # Value is NOT normed (ref `newcrf_layers.py:207-216`).
        ph = (win - h % win) % win
        pw = (win - w % win) % win
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            vv = jnp.pad(vv, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            vv = jnp.roll(vv, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(hp, wp, win, shift)) if shift else None
        wins = _CRFAttention(self.dim, self.heads, win, name='attn')(
            _window_partition(y, win), _window_partition(vv, win), mask)
        y = _window_reverse(wins, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, name='norm2')(x)
        y = nn.Dense(4 * self.dim, name='fc1')(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name='fc2')(y)
        return x + y


class NewCRF(nn.Module):
    """One CRF stage: project x/v to the working dim, then two CRF blocks
    (regular + shifted window) and an output LayerNorm
    (ref `newcrf_layers.py:366-433`)."""
    input_dim: int
    embed_dim: int
    v_dim: int
    heads: int
    window: int = _CRF_WINDOW
    depth: int = 2

    @nn.compact
    def __call__(self, x, v):
        if self.input_dim != self.embed_dim:
            x = nn.Conv(self.embed_dim, (3, 3), padding=1, name='proj_x')(x)
        if self.v_dim != self.embed_dim:
            v = nn.Conv(self.embed_dim, (3, 3), padding=1, name='proj_v')(v)
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window // 2
            x = _CRFBlock(self.embed_dim, self.heads, self.window, shift,
                          name=f'block{i}')(x, v)
        return nn.LayerNorm(epsilon=1e-5, name='norm_crf')(x)


class NewCRFDepth(nn.Module):
    """Full NeWCRFs depth net: Swin backbone -> PSP -> 4 CRF stages with
    pixel-shuffle upsampling -> sigmoid disparity head x `max_depth`
    (ref `NewCRFDepth.py:123-148`). Output is METRIC DEPTH, NHWC.

    :param version: (str) `{tiny,base,large}{window:02d}`, e.g. `large07`.
    :param max_depth: (float) Metric depth scale (10 indoor / 80 outdoor).
    """
    version: str = 'large07'
    max_depth: float = 80.0

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spec = NEWCRFS_VERSIONS[self.version[:-2]]
        window = int(self.version[-2:])

        feats = SwinEncoder(embed_dim=spec['embed_dim'], depths=spec['depths'],
                            heads=spec['heads'], window=window, out_norms=True,
                            style='mmseg', name='backbone')(imgs, train=train)

        ppm = _PSP(name='decoder')(feats[3], train=train)

        e = ppm
        for j in (3, 2, 1, 0):
            e = NewCRF(input_dim=spec['in_channels'][j], embed_dim=_CRF_DIMS[j],
                       v_dim=_PSP_CHANNELS if j == 3 else _CRF_DIMS[j + 1] // 4,
                       heads=_CRF_HEADS[j], name=f'crf{j}')(feats[j], e)
            if j > 0:
                e = _pixel_shuffle(e, 2)

        d = nn.Conv(1, (3, 3), padding=1, name='disp_head1')(e)
        d = nn.sigmoid(d)
        d = resize(d, (d.shape[1] * 4, d.shape[2] * 4))
        return d * self.max_depth
