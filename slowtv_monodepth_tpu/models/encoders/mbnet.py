"""MBConv-family encoders: EfficientNet + MobileNetV3 (timm equivalents).

The reference's backbone ablations train DepthNet on timm
`efficientnet_b{0,4}` and `mobilenetv3_{large_100,small_050}` encoders with
`features_only=True` (`cfg/abl_bb/*.yaml`, `src/networks/depth.py:95-98`).
These are native Flax implementations of the same architectures; parameter
names mirror the timm state-dict layout (conv_stem/bn1, blocks.{s}.{i}.
conv_pw/conv_dw/conv_pwl, se.conv_reduce/conv_expand) so pretrained weights
graft via `import_torch.convert_mbnet`.

Width scaling uses timm's `make_divisible` rounding; depth scaling uses
ceil(repeats * depth_mult) (the EfficientNet compound-scaling rules).

TPU notes: depthwise convs run on the VPU and the 1x1 expand/project convs
are MXU matmuls; everything is NHWC with BN folded by XLA at inference.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['MBNetEncoder', 'MBNET_SPECS']


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_ACT = {'silu': nn.silu, 're': nn.relu, 'hs': jax.nn.hard_swish}


def _effnet_stages(width: float, depth: float):
    """EfficientNet-B0 table scaled by (width, depth) multipliers."""
    base = [  # (type, repeats, k, stride, exp_ratio, out, se_ratio)
        ('ds', 1, 3, 1, 1, 16, 0.25),
        ('ir', 2, 3, 2, 6, 24, 0.25),
        ('ir', 2, 5, 2, 6, 40, 0.25),
        ('ir', 3, 3, 2, 6, 80, 0.25),
        ('ir', 3, 5, 1, 6, 112, 0.25),
        ('ir', 4, 5, 2, 6, 192, 0.25),
        ('ir', 1, 3, 1, 6, 320, 0.25),
    ]
    stages = []
    for t, r, k, s, e, c, se in base:
        stages.append([dict(type=t, k=k, stride=s if i == 0 else 1,
                            exp_ratio=e, out=_make_divisible(c * width),
                            se=se, act='silu', gate='sigmoid')
                       for i in range(math.ceil(r * depth))])
    return stages


def _mnv3_stages(table, width: float):
    """MobileNetV3 table (absolute exp channels) scaled by `width`."""
    stages = []
    for stage in table:
        blocks = []
        for t, k, s, e, c, se, act in stage:
            blocks.append(dict(
                type=t, k=k, stride=s,
                exp_ch=_make_divisible(e * width) if e else None,
                out=_make_divisible(c * width),
                se=se, act=act, gate='hard_sigmoid'))
        stages.append(blocks)
    return stages


# (type, k, stride, exp_ch, out, se_ratio, act) — MobileNetV3 paper tables.
_MNV3_LARGE = [
    [('ds', 3, 1, None, 16, None, 're')],
    [('ir', 3, 2, 64, 24, None, 're'), ('ir', 3, 1, 72, 24, None, 're')],
    [('ir', 5, 2, 72, 40, 0.25, 're'), ('ir', 5, 1, 120, 40, 0.25, 're'),
     ('ir', 5, 1, 120, 40, 0.25, 're')],
    [('ir', 3, 2, 240, 80, None, 'hs'), ('ir', 3, 1, 200, 80, None, 'hs'),
     ('ir', 3, 1, 184, 80, None, 'hs'), ('ir', 3, 1, 184, 80, None, 'hs')],
    [('ir', 3, 1, 480, 112, 0.25, 'hs'), ('ir', 3, 1, 672, 112, 0.25, 'hs')],
    [('ir', 5, 2, 672, 160, 0.25, 'hs'), ('ir', 5, 1, 960, 160, 0.25, 'hs'),
     ('ir', 5, 1, 960, 160, 0.25, 'hs')],
    [('cn', 1, 1, None, 960, None, 'hs')],
]
_MNV3_SMALL = [
    [('ds', 3, 2, None, 16, 0.25, 're')],
    [('ir', 3, 2, 72, 24, None, 're'), ('ir', 3, 1, 88, 24, None, 're')],
    [('ir', 5, 2, 96, 40, 0.25, 'hs'), ('ir', 5, 1, 240, 40, 0.25, 'hs'),
     ('ir', 5, 1, 240, 40, 0.25, 'hs')],
    [('ir', 5, 1, 120, 48, 0.25, 'hs'), ('ir', 5, 1, 144, 48, 0.25, 'hs')],
    [('ir', 5, 2, 288, 96, 0.25, 'hs'), ('ir', 5, 1, 576, 96, 0.25, 'hs'),
     ('ir', 5, 1, 576, 96, 0.25, 'hs')],
    [('cn', 1, 1, None, 576, None, 'hs')],
]


def _feature_channels(stem: int, stages) -> tuple:
    """Last stage output at each cumulative reduction (timm features_only)."""
    chans, reds = [stem], [2]
    red = 2
    for blocks in stages:
        red *= blocks[0]['stride'] if blocks[0]['stride'] > 1 else 1
        if red == reds[-1]:
            chans[-1] = blocks[-1]['out']
        else:
            chans.append(blocks[-1]['out'])
            reds.append(red)
    return tuple(chans), tuple(reds)


def _spec(stem: int, stages, act: str):
    channels, reductions = _feature_channels(stem, stages)
    return dict(stem=stem, stages=stages, stem_act=act,
                channels=channels, reductions=reductions)


MBNET_SPECS = {
    'efficientnet_b0': _spec(32, _effnet_stages(1.0, 1.0), 'silu'),
    'efficientnet_b4': _spec(_make_divisible(32 * 1.4),
                             _effnet_stages(1.4, 1.8), 'silu'),
    'mobilenetv3_large_100': _spec(16, _mnv3_stages(_MNV3_LARGE, 1.0), 'hs'),
    'mobilenetv3_small_050': _spec(_make_divisible(16 * 0.5),
                                   _mnv3_stages(_MNV3_SMALL, 0.5), 'hs'),
}


class _SqueezeExcite(nn.Module):
    rd_ch: int
    act: str
    gate: str

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_ch, (1, 1), name='conv_reduce')(s)
        s = _ACT[self.act](s)
        s = nn.Conv(x.shape[-1], (1, 1), name='conv_expand')(s)
        gate = jax.nn.hard_sigmoid if self.gate == 'hard_sigmoid' else nn.sigmoid
        return x * gate(s)


class _Block(nn.Module):
    """One MBConv block: ds (depthwise-separable), ir (inverted residual)
    or cn (conv-bn-act head)."""
    cfg: Any  # Block dict from the spec tables.

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        act = _ACT[c['act']]
        in_ch = x.shape[-1]
        k, s = c['k'], c['stride']

        if c['type'] == 'cn':
            x = nn.Conv(c['out'], (k, k), (s, s), padding=k // 2,
                        use_bias=False, name='conv')(x)
            return act(norm('bn1')(x))

        shortcut = x
        if c['type'] == 'ir':
            mid = c.get('exp_ch') or in_ch * c['exp_ratio']
            y = nn.Conv(mid, (1, 1), use_bias=False, name='conv_pw')(x)
            y = act(norm('bn1')(y))
            y = nn.Conv(mid, (k, k), (s, s), padding=k // 2,
                        feature_group_count=mid, use_bias=False,
                        name='conv_dw')(y)
            y = act(norm('bn2')(y))
            if c['se']:
                rd = (max(1, int(in_ch * c['se'])) if c['gate'] == 'sigmoid'
                      else _make_divisible(mid * c['se']))
                y = _SqueezeExcite(rd, c['act'], c['gate'], name='se')(y)
            y = nn.Conv(c['out'], (1, 1), use_bias=False, name='conv_pwl')(y)
            y = norm('bn3')(y)
        else:  # 'ds': depthwise + pointwise, no expansion.
            mid = in_ch
            y = nn.Conv(mid, (k, k), (s, s), padding=k // 2,
                        feature_group_count=mid, use_bias=False,
                        name='conv_dw')(x)
            y = act(norm('bn1')(y))
            if c['se']:
                rd = (max(1, int(in_ch * c['se'])) if c['gate'] == 'sigmoid'
                      else _make_divisible(mid * c['se']))
                y = _SqueezeExcite(rd, c['act'], c['gate'], name='se')(y)
            y = nn.Conv(c['out'], (1, 1), use_bias=False, name='conv_pw')(y)
            y = norm('bn2')(y)

        if s == 1 and c['out'] == in_ch:
            y = y + shortcut
        return y


class MBNetEncoder(nn.Module):
    """EfficientNet/MobileNetV3 backbone returning 5 feature maps (timm
    `features_only` hook points: last block output at each reduction)."""
    stem: int = 32
    stages: Sequence = ()
    stem_act: str = 'silu'
    in_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        x = nn.Conv(self.stem, (3, 3), (2, 2), padding=1, use_bias=False,
                    name='conv_stem')(x)
        x = _ACT[self.stem_act](norm('bn1')(x))

        feats, reds = [x], [2]
        red = 2
        for si, blocks in enumerate(self.stages):
            for bi, cfg in enumerate(blocks):
                x = _Block(cfg, name=f'blocks_{si}_{bi}')(x, train=train)
            red *= blocks[0]['stride'] if blocks[0]['stride'] > 1 else 1
            if red == reds[-1]:
                feats[-1] = x
            else:
                feats.append(x)
                reds.append(red)
        return feats
