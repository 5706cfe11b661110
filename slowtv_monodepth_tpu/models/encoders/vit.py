"""ViT feature-pyramid encoders for DPT-style depth nets.

Capability parity with the reference's MiDaS-adapted DPT backbones
(`api/quickstart/networks/backbones/vit.py:21-178` + `utils.py:22-58`):
a ViT trunk with block-index hooks, cls-token readout (ignore/add/project),
and per-hook "reassemble" stages mapping tokens back to spatial maps at
strides [4, 8, 16, 32].

TPU-first: tokens stay (b, n, c) through the trunk (MXU-shaped matmuls);
position embeddings are stored for 384x384 and bilinearly resized at trace
time for any multiple-of-16 input, so one compiled program per input shape.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['ViTEncoder', 'VIT_SPECS']

VIT_SPECS = {
    # name: trunk dims + DPT hook/reassemble configuration.
    'vitb16_384': dict(dim=768, depth=12, heads=12, hooks=(2, 5, 8, 11),
                       channels=(96, 192, 384, 768), reductions=(4, 8, 16, 32)),
    'vitl16_384': dict(dim=1024, depth=24, heads=16, hooks=(5, 11, 17, 23),
                       channels=(256, 512, 1024, 1024), reductions=(4, 8, 16, 32)),
}


class _Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name='fc1')(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, name='fc2')(x)


class _Block(nn.Module):
    """Pre-LN transformer block (timm ViT layout)."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name='attn')(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        x = x + _Mlp(self.dim, int(self.dim * self.mlp_ratio), name='mlp')(y)
        return x


class _Readout(nn.Module):
    """cls-token readout (ref `utils.py:22-58`)."""
    dim: int
    mode: str  # {ignore, add, project}

    @nn.compact
    def __call__(self, tokens):
        cls, patches = tokens[:, :1], tokens[:, 1:]
        if self.mode == 'ignore':
            return patches
        if self.mode == 'add':
            return patches + cls
        if self.mode == 'project':
            readout = jnp.broadcast_to(cls, patches.shape)
            x = jnp.concatenate([patches, readout], axis=-1)
            return nn.gelu(nn.Dense(self.dim, name='project')(x))
        raise ValueError(f'Invalid readout "{self.mode}".')


class _Reassemble(nn.Module):
    """Tokens -> spatial map at the target stride (ref `vit.py:96-124`)."""
    out_ch: int
    stage: int  # 0..3 -> strides 4, 8, 16, 32 (tokens are stride 16).

    @nn.compact
    def __call__(self, x, gh: int, gw: int):
        b, n, c = x.shape
        x = x.reshape(b, gh, gw, c)
        x = nn.Conv(self.out_ch, (1, 1), name='proj')(x)
        if self.stage == 0:   # 16 -> 4: x4 transpose conv.
            x = nn.ConvTranspose(self.out_ch, (4, 4), strides=(4, 4), name='up')(x)
        elif self.stage == 1:  # 16 -> 8: x2 transpose conv.
            x = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2), name='up')(x)
        elif self.stage == 3:  # 16 -> 32: stride-2 conv.
            x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=1, name='down')(x)
        return x


class ViTEncoder(nn.Module):
    """:param dim/depth/heads: Trunk size.
    :param hooks: Block indices producing the 4 pyramid features.
    :param channels: Reassembled channels per hook.
    :param readout: cls-token handling {ignore, add, project}.
    :param patch: Patch size (inputs must be multiples of it).
    """
    dim: int = 768
    depth: int = 12
    heads: int = 12
    hooks: Sequence[int] = (2, 5, 8, 11)
    channels: Sequence[int] = (96, 192, 384, 768)
    readout: str = 'project'
    patch: int = 16
    in_chans: int = 3
    pos_grid: int = 24  # Stored pos-embed grid (384 / 16).

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(f'Input must be a multiple of {self.patch}. ({h}x{w})')
        gh, gw = h // self.patch, w // self.patch

        # Patch embedding.
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name='patch_embed')(x)
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param('cls_token', nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)

        # Interpolated position embeddings (ref `vit.py:138-150`).
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, self.pos_grid * self.pos_grid + 1, self.dim))
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        pos_grid = pos_grid.reshape(1, self.pos_grid, self.pos_grid, self.dim)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, self.dim), 'bilinear')
        x = x + jnp.concatenate([pos_tok, pos_grid.reshape(1, gh * gw, self.dim)], axis=1)

        feats = []
        hook_set = set(self.hooks)
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, name=f'block{i}')(x)
            if i in hook_set:
                feats.append(x)

        out = []
        for s, (f, ch) in enumerate(zip(feats, self.channels)):
            f = _Readout(self.dim, self.readout, name=f'readout{s}')(f)
            out.append(_Reassemble(ch, s, name=f'reassemble{s}')(f, gh, gw))
        return out
