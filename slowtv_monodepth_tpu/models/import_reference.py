"""Import reference (PyTorch-Lightning) checkpoints into this framework.

The reference embeds its full cfg in every checkpoint via
`save_hyperparameters()` (`src/core/trainer.py:34`) and stores network
weights under `nets.{depth,pose,autoencoder}.*` (`MonoDepthModule` attribute
layout). This module converts such a checkpoint — e.g. the released KBR
models — into our parameter trees, so they can be evaluated/fine-tuned here
(quickstart, export_preds, eval_depth) and validated against the published
`results/` numbers.

Supported: timm ResNet/ResNeXt/ConvNeXt/EfficientNet/MobileNetV3/HRNet
encoders (the families with converters in `import_torch`) and the
`monodepth` decoder (the one used by every released model). Key layouts:

- depth decoder: `nets.depth.decoders.<k>.decoder.{idx}...` where idx walks
  upconv_4_0, upconv_4_1, ..., upconv_0_1 then outconv per out_sc
  (`src/networks/decoders/monodepth.py:52-71`); conv blocks nest `.conv.`,
  output convs are bare Conv2d.
- pose: `squeeze.0`, `decoders.{pose,focal,offset}.{0,1}.0` (conv+relu
  blocks) and `.2` (1x1 out conv) (`src/networks/pose.py:46-106`).
"""
from __future__ import annotations

import numpy as np

from ..utils import get_logger
from .encoders import (CONVNEXT_SPECS, HRNET_SPECS, MBNET_SPECS, RESNET_SPECS)
from .encoders.import_torch import (convert_convnext, convert_hrnet,
                                    convert_mbnet, convert_resnet)

__all__ = ['convert_reference_ckpt', 'load_reference_ckpt']

LOGGER = get_logger('import_reference')


def load_reference_ckpt(path) -> tuple[dict, dict]:
    """Load a reference Lightning ckpt -> (flat state dict, cfg)."""
    import torch
    ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt['state_dict'].items()}
    cfg = dict(ckpt.get('hyper_parameters', {}).get('cfg', {}))
    return sd, cfg


def _sub(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convert_encoder(sd_enc: dict, enc_name: str, in_chans: int = 3):
    """Dispatch to the per-family timm converter. Returns (params, stats)."""
    if enc_name in RESNET_SPECS:
        spec = RESNET_SPECS[enc_name]
        return convert_resnet(sd_enc, spec['layers'], block=spec['block'],
                              in_chans=in_chans)
    if enc_name in CONVNEXT_SPECS:
        return convert_convnext(sd_enc, CONVNEXT_SPECS[enc_name]['depths'],
                                in_chans=in_chans), None
    if enc_name in MBNET_SPECS:
        return convert_mbnet(sd_enc, MBNET_SPECS[enc_name]['stages'],
                             in_chans=in_chans)
    if enc_name in HRNET_SPECS:
        return convert_hrnet(sd_enc, in_chans=in_chans)
    raise NotImplementedError(
        f'No weight converter for encoder "{enc_name}" — convert manually or '
        'retrain. (Supported: resnet/resnext/convnext/efficientnet/'
        'mobilenetv3/hrnet.)')


def convert_monodepth_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3)) -> dict:
    """`decoder.{idx}` ModuleList -> our named `upconv_*/outconv_*` tree."""
    names = []
    for i in range(4, -1, -1):
        names += [f'upconv_{i}_0', f'upconv_{i}_1']
    params: dict = {}
    for idx, name in enumerate(names):
        params[name] = {'conv': {'conv': {
            'kernel': _conv(sd_dec[f'decoder.{idx}.conv.weight']),
            'bias': sd_dec[f'decoder.{idx}.conv.bias']}}}
    for j, sc in enumerate(out_sc):
        idx = len(names) + j
        params[f'outconv_{sc}'] = {'conv': {
            'kernel': _conv(sd_dec[f'decoder.{idx}.weight']),
            'bias': sd_dec[f'decoder.{idx}.bias']}}
    return params


def _convert_head(sd: dict, prefix: str) -> dict:
    """Reference pose/focal/offset head -> our `_Head` tree."""
    return {
        'block0': {'conv': {'kernel': _conv(sd[f'{prefix}.0.0.weight']),
                            'bias': sd[f'{prefix}.0.0.bias']}},
        'block1': {'conv': {'kernel': _conv(sd[f'{prefix}.1.0.weight']),
                            'bias': sd[f'{prefix}.1.0.bias']}},
        'out': {'kernel': _conv(sd[f'{prefix}.2.weight']),
                'bias': sd[f'{prefix}.2.bias']},
    }


def _convert_depth(sd: dict, net_cfg: dict) -> tuple[dict, dict]:
    enc_name = net_cfg.get('enc_name', 'convnext_base')
    dec_name = net_cfg.get('dec_name', 'monodepth')
    if dec_name != 'monodepth':
        raise NotImplementedError(
            f'Only the "monodepth" decoder has a checkpoint converter '
            f'(got "{dec_name}").')
    out_sc = tuple(net_cfg.get('out_scales', (0, 1, 2, 3)))

    enc_params, enc_stats = _convert_encoder(_sub(sd, 'encoder.'), enc_name)
    params = {'encoder': enc_params,
              'decoders_disp': convert_monodepth_decoder(
                  _sub(sd, 'decoders.disp.'), out_sc)}
    if net_cfg.get('mask_name'):
        params['decoders_mask'] = convert_monodepth_decoder(
            _sub(sd, 'decoders.mask.'), out_sc)
    aux = {'batch_stats': {'encoder': enc_stats}} if enc_stats else {}
    return params, aux


def _convert_pose(sd: dict, net_cfg: dict) -> tuple[dict, dict]:
    enc_name = net_cfg.get('enc_name', 'resnet18')
    enc_params, enc_stats = _convert_encoder(_sub(sd, 'encoder.'), enc_name,
                                             in_chans=6)
    params = {
        'encoder': enc_params,
        'squeeze': {'conv': {'kernel': _conv(sd['squeeze.0.weight']),
                             'bias': sd['squeeze.0.bias']}},
        'decoders_pose': _convert_head(sd, 'decoders.pose'),
    }
    if net_cfg.get('learn_K'):
        params['decoders_focal'] = _convert_head(sd, 'decoders.focal')
        params['decoders_offset'] = _convert_head(sd, 'decoders.offset')
    aux = {'batch_stats': {'encoder': enc_stats}} if enc_stats else {}
    return params, aux


def _convert_autoencoder(sd: dict, net_cfg: dict) -> tuple[dict, dict]:
    enc_name = net_cfg.get('enc_name', 'resnet18')
    out_sc = tuple(net_cfg.get('out_scales', (0, 1, 2, 3)))
    enc_params, enc_stats = _convert_encoder(_sub(sd, 'encoder.'), enc_name)
    # Reference AutoencoderNet has a SINGLE `self.decoder` attribute
    # (ref `src/networks/autoencoder.py:45-49`), unlike DepthNet's
    # `self.decoders` ModuleDict.
    params = {'encoder': enc_params,
              'decoders_autoencoder': convert_monodepth_decoder(
                  _sub(sd, 'decoder.'), out_sc)}
    aux = {'batch_stats': {'encoder': enc_stats}} if enc_stats else {}
    return params, aux


def convert_reference_ckpt(sd: dict, cfg: dict) -> tuple[dict, dict]:
    """Full reference state dict -> (params, aux) trees keyed by net name."""
    import jax
    import jax.numpy as jnp

    converters = {'depth': _convert_depth, 'pose': _convert_pose,
                  'autoencoder': _convert_autoencoder}
    params: dict = {}
    aux: dict = {}
    for name, fn in converters.items():
        net_sd = _sub(sd, f'nets.{name}.')
        if not net_sd:
            continue
        net_cfg = (cfg.get('net') or {}).get(name) or {}
        LOGGER.info(f'Converting reference net "{name}" '
                    f'({net_cfg.get("enc_name", "?")})...')
        p, a = fn(net_sd, net_cfg)
        params[name] = p
        if a:
            aux[name] = a
    if not params:
        raise ValueError('No "nets.*" weights found — not a reference ckpt?')
    return (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, aux))
