"""ResNet feature encoders (Flax, NHWC) with timm `features_only` semantics.

Matches timm's `resnet{18,34,50}` feature extraction: stage outputs at strides
[2, 4, 8, 16, 32] — (act1, layer1..layer4) — so the reference decoders' skip
wiring (`src/networks/decoders/monodepth.py:58-62`) transfers unchanged.
Parameter names mirror the timm/torchvision state-dict layout so
`import_torch.convert_resnet` is a mechanical key mapping.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ['ResNetEncoder', 'RESNET_SPECS']


RESNET_SPECS = {
    'resnet18': dict(block='basic', layers=(2, 2, 2, 2),
                     channels=(64, 64, 128, 256, 512), reductions=(2, 4, 8, 16, 32)),
    'resnet34': dict(block='basic', layers=(3, 4, 6, 3),
                     channels=(64, 64, 128, 256, 512), reductions=(2, 4, 8, 16, 32)),
    'resnet50': dict(block='bottleneck', layers=(3, 4, 6, 3),
                     channels=(64, 256, 512, 1024, 2048), reductions=(2, 4, 8, 16, 32)),
    'resnet101': dict(block='bottleneck', layers=(3, 4, 23, 3),
                      channels=(64, 256, 512, 1024, 2048), reductions=(2, 4, 8, 16, 32)),
    # ResNeXt: grouped bottleneck convs (abl_pretrained backbones; the
    # ssl/swsl variants are the same architecture with different pretrained
    # weights, ref `cfg/abl_pretrained/resnext101_pt_{ssl,swsl}.yaml`).
    'resnext101_32x8d': dict(block='bottleneck', layers=(3, 4, 23, 3),
                             groups=32, width_per_group=8,
                             channels=(64, 256, 512, 1024, 2048),
                             reductions=(2, 4, 8, 16, 32)),
}
RESNET_SPECS['ssl_resnext101_32x8d'] = RESNET_SPECS['resnext101_32x8d']
RESNET_SPECS['swsl_resnext101_32x8d'] = RESNET_SPECS['resnext101_32x8d']


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        identity = x
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride), padding=1,
                      use_bias=False, name='conv1')(x)
        out = norm('bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name='conv2')(out)
        out = norm('bn2')(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                               use_bias=False, name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    groups: int = 1           # >1 with `base_width`: ResNeXt grouped conv.
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                         momentum=0.9, epsilon=1e-5, name=name)
        width = int(self.planes * self.base_width / 64) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, name='conv1')(x)
        out = nn.relu(norm('bn1')(out))
        out = nn.Conv(width, (3, 3), (self.stride, self.stride), padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      name='conv2')(out)
        out = nn.relu(norm('bn2')(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name='conv3')(out)
        out = norm('bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """ResNet backbone returning 5 feature maps at strides [2, 4, 8, 16, 32].

    :param block: {'basic', 'bottleneck'}.
    :param layers: Blocks per stage, e.g. (2, 2, 2, 2) for resnet18.
    :param in_chans: Input channels (6 for the pose net's image pair).
    """
    block: str = 'basic'
    layers: Sequence[int] = (2, 2, 2, 2)
    in_chans: int = 3
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        feats = []
        # Stem: 7x7/2 conv + BN + ReLU (timm 'conv1'/'bn1'/'act1').
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name='bn1')(x)
        x = nn.relu(x)
        feats.append(x)  # stride 2

        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        expansion = 1 if self.block == 'basic' else 4
        planes = 64
        in_ch = 64
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                need_ds = (i == 0) and (s != 1 or in_ch != planes * expansion)
                if self.block == 'basic':
                    blk = BasicBlock(planes, s, need_ds, name=f'layer{stage + 1}_{i}')
                else:
                    blk = Bottleneck(planes, s, need_ds, groups=self.groups,
                                     base_width=self.width_per_group,
                                     name=f'layer{stage + 1}_{i}')
                x = blk(x, train=train)
                in_ch = planes * expansion
            feats.append(x)
            planes *= 2
        return feats
