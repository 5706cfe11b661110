"""Import pretrained timm/torch state dicts into Flax encoder params.

The reference relies on `pretrained=True` timm encoders
(`src/networks/depth.py:97`); ablations show ImageNet pretraining matters
(`cfg/abl_pretrained/`). This module converts a *saved* timm state dict
(a `.pth`/`.npz` of name->ndarray) into the parameter pytree of
`ResNetEncoder`/`ConvNeXtEncoder`, so checkpoints exported from timm can be
used without torch at train time.

Conventions:
- conv weights: torch OIHW -> flax HWIO.
- depthwise conv: torch (C, 1, kh, kw) -> flax (kh, kw, 1, C).
- linear: torch (out, in) -> flax (in, out).
- BatchNorm: weight/bias -> scale/bias params; running stats -> batch_stats.

For `in_chans != 3` (pose nets), the stem conv weights are tiled and rescaled
the way timm adapts input convs (repeat channel-wise, scale by 3/in_chans).
"""
from __future__ import annotations

import numpy as np

__all__ = ['convert_resnet', 'convert_convnext', 'convert_mbnet',
           'convert_hrnet', 'adapt_input_conv', 'load_state_dict_file']


def load_state_dict_file(path) -> dict[str, np.ndarray]:
    """Load a state dict from .npz (preferred) or torch .pth/.pt file."""
    path = str(path)
    if path.endswith('.npz'):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    import torch  # Optional host-side dependency for .pth files.
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: v.numpy() for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dwconv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (C,1,kh,kw) -> (kh,kw,1,C)


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def adapt_input_conv(w_hwio: np.ndarray, in_chans: int) -> np.ndarray:
    """Adapt a 3-channel stem conv kernel (HWIO) to `in_chans` inputs (timm-style)."""
    kh, kw, c_in, c_out = w_hwio.shape
    if c_in == in_chans:
        return w_hwio
    reps = int(np.ceil(in_chans / c_in))
    w = np.tile(w_hwio, (1, 1, reps, 1))[:, :, :in_chans]
    return w * (c_in / in_chans)


def _bn(sd, prefix):
    params = {'scale': sd[f'{prefix}.weight'], 'bias': sd[f'{prefix}.bias']}
    stats = {'mean': sd[f'{prefix}.running_mean'], 'var': sd[f'{prefix}.running_var']}
    return params, stats


def convert_resnet(sd: dict[str, np.ndarray], layers, block: str = 'basic',
                   in_chans: int = 3):
    """timm/torchvision ResNet state dict -> (params, batch_stats) pytrees."""
    params: dict = {}
    stats: dict = {}

    params['conv1'] = {'kernel': adapt_input_conv(_conv(sd['conv1.weight']), in_chans)}
    params['bn1'], stats['bn1'] = _bn(sd, 'bn1')

    n_convs = 2 if block == 'basic' else 3
    for stage, n_blocks in enumerate(layers):
        for i in range(n_blocks):
            src = f'layer{stage + 1}.{i}'
            dst = f'layer{stage + 1}_{i}'
            p: dict = {}
            s: dict = {}
            for c in range(1, n_convs + 1):
                p[f'conv{c}'] = {'kernel': _conv(sd[f'{src}.conv{c}.weight'])}
                p[f'bn{c}'], s[f'bn{c}'] = _bn(sd, f'{src}.bn{c}')
            if f'{src}.downsample.0.weight' in sd:
                p['downsample_conv'] = {'kernel': _conv(sd[f'{src}.downsample.0.weight'])}
                p['downsample_bn'], s['downsample_bn'] = _bn(sd, f'{src}.downsample.1')
            params[dst] = p
            stats[dst] = s
    return params, stats


def convert_convnext(sd: dict[str, np.ndarray], depths, in_chans: int = 3):
    """timm ConvNeXt state dict -> params pytree (no batch stats)."""
    params: dict = {}
    params['stem_conv'] = {
        'kernel': adapt_input_conv(_conv(sd['stem.0.weight']), in_chans),
        'bias': sd['stem.0.bias'],
    }
    params['stem_norm'] = {'scale': sd['stem.1.weight'], 'bias': sd['stem.1.bias']}

    for stage, n_blocks in enumerate(depths):
        if stage > 0:
            params[f'stage{stage}_ds_norm'] = {
                'scale': sd[f'stages.{stage}.downsample.0.weight'],
                'bias': sd[f'stages.{stage}.downsample.0.bias'],
            }
            params[f'stage{stage}_ds_conv'] = {
                'kernel': _conv(sd[f'stages.{stage}.downsample.1.weight']),
                'bias': sd[f'stages.{stage}.downsample.1.bias'],
            }
        for i in range(n_blocks):
            src = f'stages.{stage}.blocks.{i}'
            params[f'stage{stage}_block{i}'] = {
                'conv_dw': {'kernel': _dwconv(sd[f'{src}.conv_dw.weight']),
                            'bias': sd[f'{src}.conv_dw.bias']},
                'norm': {'scale': sd[f'{src}.norm.weight'], 'bias': sd[f'{src}.norm.bias']},
                'mlp_fc1': {'kernel': _dense(sd[f'{src}.mlp.fc1.weight']),
                            'bias': sd[f'{src}.mlp.fc1.bias']},
                'mlp_fc2': {'kernel': _dense(sd[f'{src}.mlp.fc2.weight']),
                            'bias': sd[f'{src}.mlp.fc2.bias']},
                'gamma': sd[f'{src}.gamma'],
            }
    return params


def convert_mbnet(sd: dict[str, np.ndarray], stages, in_chans: int = 3):
    """timm EfficientNet/MobileNetV3 state dict -> (params, batch_stats).

    `stages` is the MBNET_SPECS block table (drives the per-block layout:
    ds = conv_dw/bn1[/se]/conv_pw/bn2, ir = conv_pw/bn1/conv_dw/bn2[/se]/
    conv_pwl/bn3, cn = conv/bn1).
    """
    params: dict = {'conv_stem': {
        'kernel': adapt_input_conv(_conv(sd['conv_stem.weight']), in_chans)}}
    stats: dict = {}
    params['bn1'], stats['bn1'] = _bn(sd, 'bn1')

    def se(src):
        return {'conv_reduce': {'kernel': _conv(sd[f'{src}.conv_reduce.weight']),
                                'bias': sd[f'{src}.conv_reduce.bias']},
                'conv_expand': {'kernel': _conv(sd[f'{src}.conv_expand.weight']),
                                'bias': sd[f'{src}.conv_expand.bias']}}

    for si, blocks in enumerate(stages):
        for bi, cfg in enumerate(blocks):
            src = f'blocks.{si}.{bi}'
            dst = f'blocks_{si}_{bi}'
            p: dict = {}
            s: dict = {}
            if cfg['type'] == 'cn':
                p['conv'] = {'kernel': _conv(sd[f'{src}.conv.weight'])}
                p['bn1'], s['bn1'] = _bn(sd, f'{src}.bn1')
            elif cfg['type'] == 'ir':
                p['conv_pw'] = {'kernel': _conv(sd[f'{src}.conv_pw.weight'])}
                p['bn1'], s['bn1'] = _bn(sd, f'{src}.bn1')
                p['conv_dw'] = {'kernel': _dwconv(sd[f'{src}.conv_dw.weight'])}
                p['bn2'], s['bn2'] = _bn(sd, f'{src}.bn2')
                if cfg['se']:
                    p['se'] = se(f'{src}.se')
                p['conv_pwl'] = {'kernel': _conv(sd[f'{src}.conv_pwl.weight'])}
                p['bn3'], s['bn3'] = _bn(sd, f'{src}.bn3')
            else:  # ds
                p['conv_dw'] = {'kernel': _dwconv(sd[f'{src}.conv_dw.weight'])}
                p['bn1'], s['bn1'] = _bn(sd, f'{src}.bn1')
                if cfg['se']:
                    p['se'] = se(f'{src}.se')
                p['conv_pw'] = {'kernel': _conv(sd[f'{src}.conv_pw.weight'])}
                p['bn2'], s['bn2'] = _bn(sd, f'{src}.bn2')
            params[dst] = p
            stats[dst] = s
    return params, stats


def _res_block(sd, src, n_convs):
    p: dict = {}
    s: dict = {}
    for c in range(1, n_convs + 1):
        p[f'conv{c}'] = {'kernel': _conv(sd[f'{src}.conv{c}.weight'])}
        p[f'bn{c}'], s[f'bn{c}'] = _bn(sd, f'{src}.bn{c}')
    if f'{src}.downsample.0.weight' in sd:
        p['downsample_conv'] = {'kernel': _conv(sd[f'{src}.downsample.0.weight'])}
        p['downsample_bn'], s['downsample_bn'] = _bn(sd, f'{src}.downsample.1')
    return p, s


def convert_hrnet(sd: dict[str, np.ndarray], in_chans: int = 3):
    """timm HRNet state dict -> (params, batch_stats) for `HRNetEncoder`."""
    params: dict = {}
    stats: dict = {}

    params['conv1'] = {'kernel': adapt_input_conv(_conv(sd['conv1.weight']), in_chans)}
    params['bn1'], stats['bn1'] = _bn(sd, 'bn1')
    params['conv2'] = {'kernel': _conv(sd['conv2.weight'])}
    params['bn2'], stats['bn2'] = _bn(sd, 'bn2')

    for i in range(4):
        params[f'layer1_{i}'], stats[f'layer1_{i}'] = _res_block(
            sd, f'layer1.{i}', 3)

    def conv_bn(dst, src_conv, src_bn):
        params[f'{dst}_conv'] = {'kernel': _conv(sd[f'{src_conv}.weight'])}
        params[f'{dst}_bn'], stats[f'{dst}_bn'] = _bn(sd, src_bn)

    conv_bn('transition1_0', 'transition1.0.0', 'transition1.0.1')
    conv_bn('transition1_1', 'transition1.1.0.0', 'transition1.1.0.1')
    conv_bn('transition2_2', 'transition2.2.0.0', 'transition2.2.0.1')
    conv_bn('transition3_3', 'transition3.3.0.0', 'transition3.3.0.1')

    for stage, n_modules in ((2, 1), (3, 4), (4, 3)):
        for m in range(n_modules):
            src = f'stage{stage}.{m}'
            dst = f'stage{stage}_{m}'
            p: dict = {}
            s: dict = {}
            for i in range(stage):
                for k in range(4):
                    p[f'branch{i}_{k}'], s[f'branch{i}_{k}'] = _res_block(
                        sd, f'{src}.branches.{i}.{k}', 2)
                for j in range(stage):
                    if j == i:
                        continue
                    if j > i:
                        p[f'fuse{i}_{j}_conv'] = {'kernel': _conv(
                            sd[f'{src}.fuse_layers.{i}.{j}.0.weight'])}
                        p[f'fuse{i}_{j}_bn'], s[f'fuse{i}_{j}_bn'] = _bn(
                            sd, f'{src}.fuse_layers.{i}.{j}.1')
                    else:
                        for k in range(i - j):
                            p[f'fuse{i}_{j}_{k}_conv'] = {'kernel': _conv(
                                sd[f'{src}.fuse_layers.{i}.{j}.{k}.0.weight'])}
                            (p[f'fuse{i}_{j}_{k}_bn'],
                             s[f'fuse{i}_{j}_{k}_bn']) = _bn(
                                sd, f'{src}.fuse_layers.{i}.{j}.{k}.1')
            params[dst] = p
            stats[dst] = s

    for i in range(4):
        params[f'incre{i}'], stats[f'incre{i}'] = _res_block(
            sd, f'incre_modules.{i}.0', 3)
    return params, stats
