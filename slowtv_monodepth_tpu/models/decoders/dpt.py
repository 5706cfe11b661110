"""DPT decoder: residual conv units + feature fusion over ViT pyramids.

Parity with the reference's MiDaS-adapted decoder
(`api/quickstart/networks/decoders/dpt.py:13-160`): 3x3 scratch convs to a
256-ch working width, top-down `FeatureFusionBlock`s (two residual units,
x2 bilinear align-corners upsample, 1x1 out conv), and per-scale output heads
(conv -> x2 upsample -> conv -> relu -> 1x1 conv -> activation).

Same constructor contract as every other decoder (`src/README.md` Networks).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from .utils import ACT

__all__ = ['DptDecoder']


def _resize(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Bilinear align_corners=True resize (matching F.interpolate here)."""
    b, h, w, c = x.shape
    nh, nw = shape
    if (h, w) == (nh, nw):
        return x
    # align_corners=True: endpoints map to endpoints.
    ys = jnp.linspace(0, h - 1, nh)
    xs = jnp.linspace(0, w - 1, nw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    bb = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + bb * (1 - wy) * wx
            + cc * wy * (1 - wx) + d * wy * wx)


class _ResidualBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.ch, (3, 3), padding=1, name='conv1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.ch, (3, 3), padding=1, name='conv2')(out)
        return out + x


class _FusionBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            # Odd pyramid dims can drift by 1px between stages; snap to the
            # skip's resolution (the reference's `size=` fusion path).
            if x.shape[1:3] != skip.shape[1:3]:
                x = _resize(x, skip.shape[1:3])
            x = x + _ResidualBlock(self.ch, name='res1')(skip)
        x = _ResidualBlock(self.ch, name='res2')(x)
        x = _resize(x, (x.shape[1] * 2, x.shape[2] * 2))
        return nn.Conv(self.ch, (1, 1), name='out_conv')(x)


class _Head(nn.Module):
    out_ch: int
    act: str
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = nn.Conv(ch // 2, (3, 3), padding=1, name='conv1')(x)
        x = _resize(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = nn.Conv(self.hidden, (3, 3), padding=1, name='conv2')(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), name='conv3')(x)
        return ACT[self.act](x)


@register('dpt')
class DptDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    enc_sc: Sequence[int]
    upsample_mode: str = 'nearest'
    use_skip: bool = True
    out_sc: Sequence[int] = (0, 1, 2, 3)
    out_ch: int = 1
    out_act: str = 'sigmoid'
    # DPT convs already use zero 'SAME' padding (no reflect anywhere in the
    # reference DPT); accepted for the shared decoder contract, unused.
    pad_mode: str = 'reflect'
    num_ch_dec: int = 256

    @nn.compact
    def __call__(self, feat: list, train: bool = False) -> dict:
        feat = [nn.Conv(self.num_ch_dec, (3, 3), padding=1, use_bias=False,
                        name=f'scratch{i}')(f) for i, f in enumerate(feat)]
        out = {}
        x = feat[-1]
        n = len(feat) - 1
        for i in range(n, -1, -1):
            skip = None if i == n else feat[i]
            x = _FusionBlock(self.num_ch_dec, name=f'refine{i}')(x, skip)
            if i in self.out_sc:
                out[i] = _Head(self.out_ch, self.out_act, name=f'out{i}')(x)
        return out
