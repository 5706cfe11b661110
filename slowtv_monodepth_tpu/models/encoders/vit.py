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
    # Hybrid R50+ViT-B (MiDaS `vitb_rn50_384`, ref `api/quickstart/networks/
    # backbones/dpt.py:43`): ResNetV2 stages supply the stride-4/8 pyramid
    # levels; transformer hooks 8/11 supply stride 16/32.
    'vitb_rn50_384': dict(dim=768, depth=12, heads=12, hooks=(8, 11),
                          channels=(256, 512, 768, 768),
                          reductions=(4, 8, 16, 32), hybrid=True),
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


class _StdConv(nn.Module):
    """Weight-standardized conv (timm `StdConv2dSame`): per-output-channel
    (w - mean) / sqrt(var + 1e-6), TF-SAME padding, no bias (GN follows)."""
    features: int
    kernel: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        mu = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        w = (w - mu) * jax.lax.rsqrt(var + 1e-6)
        return jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class _V2Bottleneck(nn.Module):
    """ResNetV2 (non-preact) bottleneck: StdConv + GroupNorm(32) + ReLU."""
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)  # noqa: E731
        identity = x
        y = nn.relu(gn('norm1')(_StdConv(self.planes, 1, name='conv1')(x)))
        y = nn.relu(gn('norm2')(_StdConv(self.planes, 3, self.stride,
                                         name='conv2')(y)))
        y = gn('norm3')(_StdConv(self.planes * 4, 1, name='conv3')(y))
        if self.downsample:
            identity = gn('downsample_norm')(
                _StdConv(self.planes * 4, 1, self.stride,
                         name='downsample_conv')(x))
        return nn.relu(y + identity)


class _ResNetV2Stem(nn.Module):
    """ResNetV2 stages (3, 4, 9) of the hybrid ViT: returns the stride-4 and
    stride-8 pyramid features plus the stride-16 trunk output."""
    layers: tuple = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        x = _StdConv(64, 7, 2, name='stem_conv')(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, name='stem_norm')(x))
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), 'constant',
                    constant_values=-jnp.inf)  # TF-SAME maxpool for even dims.
        x = nn.max_pool(x, (3, 3), (2, 2), padding='VALID')

        feats = []
        planes = 64
        for s, depth in enumerate(self.layers):
            for i in range(depth):
                stride = 2 if (s > 0 and i == 0) else 1
                x = _V2Bottleneck(planes, stride, downsample=(i == 0),
                                  name=f'stage{s}_block{i}')(x)
            feats.append(x)
            planes *= 2
        return feats  # [256@4, 512@8, 1024@16]


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
    hybrid: bool = False  # R50+ViT: ResNetV2 stem supplies strides 4/8.

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(f'Input must be a multiple of {self.patch}. ({h}x{w})')
        gh, gw = h // self.patch, w // self.patch

        # Patch embedding: direct conv, or ResNetV2 trunk + 1x1 (hybrid).
        rn_feats = None
        if self.hybrid:
            rn_feats = _ResNetV2Stem(name='backbone')(x)
            x = nn.Conv(self.dim, (1, 1), name='patch_embed')(rn_feats[-1])
        else:
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

        if self.hybrid:
            # Strides 4/8 come straight from the ResNetV2 stages; hooks give
            # strides 16/32 (MiDaS `_make_vit_b_rn50_backbone`).
            out = list(rn_feats[:2])
            for s, f in enumerate(feats, start=2):
                f = _Readout(self.dim, self.readout, name=f'readout{s}')(f)
                out.append(_Reassemble(self.channels[s], s,
                                       name=f'reassemble{s}')(f, gh, gw))
            return out

        out = []
        for s, (f, ch) in enumerate(zip(feats, self.channels)):
            f = _Readout(self.dim, self.readout, name=f'readout{s}')(f)
            out.append(_Reassemble(ch, s, name=f'reassemble{s}')(f, gh, gw))
        return out
