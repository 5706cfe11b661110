"""HRNet encoders (timm `hrnet_w{18,64}` equivalents, features_only).

The reference's backbone ablations include `hrnet_w18`/`hrnet_w64`
(`cfg/abl_bb/hrnet_w{18,64}.yaml`) via timm `features_only=True`, whose HRNet
feature taps are the *incre* bottleneck heads: channels (64, 128, 256, 512,
1024) at strides (2, 4, 8, 16, 32) for every width (the incre modules project
the branch widths onto the fixed classification-head channels).

Architecture (official HRNet classification layout): stride-4 stem, one
Bottleneck stage, then 2/3/4-branch multi-resolution stages where every
module runs 4 BasicBlocks per branch and ends with a full cross-resolution
fuse (1x1 conv + nearest-upsample for coarse->fine, chains of stride-2 3x3
convs for fine->coarse).

TPU notes: branches are independent convolution chains — XLA schedules them
concurrently; fusion upsampling is nearest (pure reshape/broadcast).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet import BasicBlock, Bottleneck

__all__ = ['HRNetEncoder', 'HRNET_SPECS']

HRNET_SPECS = {
    'hrnet_w18': dict(width=18, channels=(64, 128, 256, 512, 1024),
                      reductions=(2, 4, 8, 16, 32)),
    'hrnet_w64': dict(width=64, channels=(64, 128, 256, 512, 1024),
                      reductions=(2, 4, 8, 16, 32)),
}

# Modules per stage (official W-series config): stage2 x1, stage3 x4, stage4 x3.
_STAGE_MODULES = (1, 4, 3)
_BLOCKS_PER_BRANCH = 4
_HEAD_CH = (32, 64, 128, 256)  # Incre head widths (x4 bottleneck expansion).


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class _HRModule(nn.Module):
    """One multi-resolution module: 4 BasicBlocks per branch + full fuse."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, xs: list, train: bool = False) -> list:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for k in range(_BLOCKS_PER_BRANCH):
                x = BasicBlock(self.channels[i],
                               name=f'branch{i}_{k}')(x, train=train)
            ys.append(x)

        outs = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:  # Coarse -> fine: 1x1 conv + BN, then upsample.
                    z = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                name=f'fuse{i}_{j}_conv')(ys[j])
                    z = norm(f'fuse{i}_{j}_bn')(z)
                    z = _upsample_nearest(z, 2 ** (j - i))
                else:      # Fine -> coarse: chain of stride-2 3x3 convs.
                    z = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        z = nn.Conv(ch, (3, 3), (2, 2), padding=1,
                                    use_bias=False,
                                    name=f'fuse{i}_{j}_{k}_conv')(z)
                        z = norm(f'fuse{i}_{j}_{k}_bn')(z)
                        if not last:
                            z = nn.relu(z)
                acc = acc + z
            outs.append(nn.relu(acc))
        return outs


class HRNetEncoder(nn.Module):
    """:param width: Branch base width W (branches are W, 2W, 4W, 8W)."""
    width: int = 18
    in_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        feats = []

        # Stem: two stride-2 3x3 convs (timm 'conv1/bn1', 'conv2/bn2').
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, name='conv1')(x)
        x = nn.relu(norm('bn1')(x))
        feats.append(x)  # stride 2
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, name='conv2')(x)
        x = nn.relu(norm('bn2')(x))

        # Stage 1: 4 Bottlenecks at 64 (256 out).
        for i in range(4):
            x = Bottleneck(64, 1, downsample=(i == 0),
                           name=f'layer1_{i}')(x, train=train)

        widths = [self.width * 2 ** i for i in range(4)]
        # Transition 1: 256 -> [w, 2w(stride 2)].
        b0 = nn.Conv(widths[0], (3, 3), padding=1, use_bias=False,
                     name='transition1_0_conv')(x)
        b0 = nn.relu(norm('transition1_0_bn')(b0))
        b1 = nn.Conv(widths[1], (3, 3), (2, 2), padding=1, use_bias=False,
                     name='transition1_1_conv')(x)
        b1 = nn.relu(norm('transition1_1_bn')(b1))
        xs = [b0, b1]

        # Stages 2-4 with a new stride-2 branch before stages 3 and 4.
        for stage, n_modules in enumerate(_STAGE_MODULES, start=2):
            if stage > 2:
                t = stage - 1
                z = nn.Conv(widths[stage - 1], (3, 3), (2, 2), padding=1,
                            use_bias=False, name=f'transition{t}_{stage - 1}_conv')(xs[-1])
                xs = xs + [nn.relu(norm(f'transition{t}_{stage - 1}_bn')(z))]
            for m in range(n_modules):
                xs = _HRModule(widths[:stage],
                               name=f'stage{stage}_{m}')(xs, train=train)

        # Incre heads: per-branch Bottleneck onto the fixed head widths.
        for i, x in enumerate(xs):
            feats.append(Bottleneck(_HEAD_CH[i], 1, downsample=True,
                                    name=f'incre{i}')(x, train=train))
        return feats
