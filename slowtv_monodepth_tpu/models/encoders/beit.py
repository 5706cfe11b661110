"""BEiT feature-pyramid encoder (DPT `beitl16_384` family).

Capability parity with the reference's MiDaS BEiT backbones
(`api/quickstart/networks/backbones/beit.py`): a ViT trunk with per-block
relative position bias (shared-shape tables incl. cls-token entries) and
LayerScale residual weighting, hooked at the standard DPT block indices with
readout + reassemble stages (reused from `vit.py`).

Position handling is fully relative, so any multiple-of-16 input works
without pos-embed interpolation (the property MiDaS exploits for 512px
BEiT); the bias table is sized for the configured `grid` and bilinearly
resized at trace time for other grids.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import _Mlp, _Readout, _Reassemble

__all__ = ['BeitEncoder', 'BEIT_SPECS']

BEIT_SPECS = {
    'beitb16_384': dict(dim=768, depth=12, heads=12, hooks=(2, 5, 8, 11),
                        channels=(96, 192, 384, 768), reductions=(4, 8, 16, 32),
                        grid=24),
    'beitl16_384': dict(dim=1024, depth=24, heads=16, hooks=(5, 11, 17, 23),
                        channels=(256, 512, 1024, 1024), reductions=(4, 8, 16, 32),
                        grid=24),
    'beitl16_512': dict(dim=1024, depth=24, heads=16, hooks=(5, 11, 17, 23),
                        channels=(256, 512, 1024, 1024), reductions=(4, 8, 16, 32),
                        grid=32),
}


def _rel_index(gh: int, gw: int) -> np.ndarray:
    """(gh*gw, gh*gw) index into a (2gh-1)*(2gw-1) table (patch tokens only)."""
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw), indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[..., 0] += gh - 1
    rel[..., 1] += gw - 1
    return (rel[..., 0] * (2 * gw - 1) + rel[..., 1]).astype(np.int32)


class _BeitAttention(nn.Module):
    dim: int
    heads: int
    grid: int  # Table grid size (bias resized for other grids).

    @nn.compact
    def __call__(self, x, gh: int, gw: int):
        b, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=False, name='qkv')(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim ** -0.5)

        # Patch-token relative bias (+3 cls entries: cls-to-all/all-to-cls/cls-cls).
        g = self.grid
        table = self.param('rel_pos_table', nn.initializers.zeros,
                           ((2 * g - 1) ** 2 + 3, self.heads))
        patch_table = table[:(2 * g - 1) ** 2].reshape(2 * g - 1, 2 * g - 1, self.heads)
        if (gh, gw) != (g, g):
            patch_table = jax.image.resize(
                patch_table, (2 * gh - 1, 2 * gw - 1, self.heads), 'bilinear')
        idx = _rel_index(gh, gw)
        bias_pp = patch_table.reshape(-1, self.heads)[idx.reshape(-1)]
        bias_pp = bias_pp.reshape(gh * gw, gh * gw, self.heads).transpose(2, 0, 1)

        m = gh * gw + 1
        bias = jnp.zeros((self.heads, m, m), x.dtype)
        bias = bias.at[:, 1:, 1:].set(bias_pp)
        bias = bias.at[:, 0, :].set(table[-3][:, None])
        bias = bias.at[:, 1:, 0].set(table[-2][:, None])
        bias = bias.at[:, 0, 0].set(table[-1])
        attn = attn + bias[None]

        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


class _BeitBlock(nn.Module):
    dim: int
    heads: int
    grid: int

    @nn.compact
    def __call__(self, x, gh: int, gw: int):
        g1 = self.param('gamma1', nn.initializers.constant(1e-5), (self.dim,))
        g2 = self.param('gamma2', nn.initializers.constant(1e-5), (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        x = x + g1 * _BeitAttention(self.dim, self.heads, self.grid, name='attn')(y, gh, gw)
        y = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        return x + g2 * _Mlp(self.dim, 4 * self.dim, name='mlp')(y)


class BeitEncoder(nn.Module):
    dim: int = 768
    depth: int = 12
    heads: int = 12
    hooks: Sequence[int] = (2, 5, 8, 11)
    channels: Sequence[int] = (96, 192, 384, 768)
    readout: str = 'project'
    patch: int = 16
    in_chans: int = 3
    grid: int = 24

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(f'Input must be a multiple of {self.patch}. ({h}x{w})')
        gh, gw = h // self.patch, w // self.patch

        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name='patch_embed')(x)
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param('cls_token', nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)

        feats = []
        hook_set = set(self.hooks)
        for i in range(self.depth):
            x = _BeitBlock(self.dim, self.heads, self.grid, name=f'block{i}')(x, gh, gw)
            if i in hook_set:
                feats.append(x)

        out = []
        for s, (f, ch) in enumerate(zip(feats, self.channels)):
            f = _Readout(self.dim, self.readout, name=f'readout{s}')(f)
            out.append(_Reassemble(ch, s, name=f'reassemble{s}')(f, gh, gw))
        return out
