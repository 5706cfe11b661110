"""Import reference (PyTorch-Lightning) checkpoints into this framework.

The reference embeds its full cfg in every checkpoint via
`save_hyperparameters()` (`src/core/trainer.py:34`) and stores network
weights under `nets.{depth,pose,autoencoder}.*` (`MonoDepthModule` attribute
layout). This module converts such a checkpoint — e.g. the released KBR
models — into our parameter trees, so they can be evaluated/fine-tuned here
(quickstart, export_preds, eval_depth) and validated against the published
`results/` numbers.

Supported: timm ResNet/ResNeXt/ConvNeXt/EfficientNet/MobileNetV3/HRNet
encoders (the families with converters in `import_torch`) and ALL six
decoders (monodepth/hrdepth/ddvnet/diffnet/cadepth/superdepth — every
registered decoder has a converter, differential-tested vs the reference
torch implementations). Key layouts:

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


def _convblock(sd: dict, key: str) -> dict:
    """Reference `conv_block` (conv3x3+ELU) -> our ConvBlock tree."""
    return {'conv': {'conv': {'kernel': _conv(sd[f'{key}.conv.weight']),
                              'bias': sd[f'{key}.conv.bias']}}}


def _bareconv(sd: dict, key: str) -> dict:
    """Reference bare Conv2d -> our conv3x3/conv1x1 module tree."""
    p = {'kernel': _conv(sd[f'{key}.weight'])}
    if f'{key}.bias' in sd:
        p['bias'] = sd[f'{key}.bias']
    return {'conv': p}


def convert_hrdepth_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3), **_) -> tuple[dict, dict]:
    """HRDepth: name-stable `convs.<name>` ModuleDict keys
    (ref `src/networks/decoders/hrdepth.py:94-149`)."""
    sd = _sub(sd_dec, 'convs.')
    all_idx = ('01', '11', '21', '31', '02', '12', '22', '03', '13', '04')
    params: dict = {}
    # The reference registers a conv_0 for EVERY grid cell (`:95-107`) but the
    # forward only uses the (row+1, col-1) cells + the final 04 pair — the
    # row-0 cells 00..03 are dead params our compact module never creates.
    for idx in all_idx:
        row, col = int(idx[0]), int(idx[1])
        params[f'{row + 1}{col - 1}_conv_0'] = _convblock(sd, f'{row + 1}{col - 1}_conv_0')
    params['04_conv_0'] = _convblock(sd, '04_conv_0')
    params['04_conv_1'] = _convblock(sd, '04_conv_1')
    for idx in ('31', '22', '13', '04'):  # FSE attention cells
        params[f'{idx}_att'] = {
            'se_fc1': {'kernel': sd[f'{idx}_att.se.0.weight'].T},
            'se_fc2': {'kernel': sd[f'{idx}_att.se.2.weight'].T},
            'conv': _bareconv(sd, f'{idx}_att.conv.0'),
        }
    for idx in ('01', '11', '21', '02', '12', '03'):  # plain cells
        row, col = int(idx[0]), int(idx[1])
        if col != 1:
            params[f'{idx}_down'] = _bareconv(sd, f'{idx}_down')
        params[f'{row + 1}{col - 1}_conv_1'] = _convblock(sd, f'{row + 1}{col - 1}_conv_1')
    for i in out_sc:
        params[f'outconv_{i}'] = _bareconv(sd, f'outconv_{i}.0')
    return params, {}


def convert_ddvnet_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3), **_) -> tuple[dict, dict]:
    """DDVNet: plain-OrderedDict convs -> only `decoder.{idx}` keys exist
    (ref `src/networks/decoders/ddvnet.py:95-113`); the `bins` buffer is a
    constant we recompute."""
    names = ['att'] + [f'upconv_{i}_{j}' for i in range(4, -1, -1) for j in (0, 1)]
    names += [f'outconv_{i}' for i in out_sc]
    params: dict = {}
    for k, name in enumerate(names):
        pre = f'decoder.{k}'
        if name == 'att':
            params['att'] = {
                f'{t}_conv': {'kernel': _conv(sd_dec[f'{pre}.{t}_conv.0.weight']),
                              'bias': sd_dec[f'{pre}.{t}_conv.0.bias']}
                for t in ('query', 'key', 'value')}
        elif name.startswith('upconv'):
            params[name] = _convblock(sd_dec, pre)
        else:
            params[name] = _bareconv(sd_dec, pre)
    return params, {}


def convert_diffnet_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3),
                            enc_sc=(2, 4, 8, 16, 32), use_skip=True) -> tuple[dict, dict]:
    """DiffNet: name-stable `convs.<name>`; stages with an encoder skip are
    AttentionBlocks, the rest plain upsample blocks
    (ref `src/networks/decoders/diffnet.py:112-129`)."""
    sd = _sub(sd_dec, 'convs.')
    params: dict = {}
    for i in range(4, -1, -1):
        if use_skip and 2 ** i in enc_sc:
            params[f'upconv_{i}'] = {
                'ca': {'fc1': {'kernel': sd[f'upconv_{i}.layers.0.fc.0.weight'].T},
                       'fc2': {'kernel': sd[f'upconv_{i}.layers.0.fc.2.weight'].T}},
                'conv': _bareconv(sd, f'upconv_{i}.layers.1'),
            }
        else:
            params[f'upconv_{i}'] = {'conv0': _convblock(sd, f'upconv_{i}.0'),
                                     'conv1': _convblock(sd, f'upconv_{i}.2')}
    # The reference creates outconvs for range(4) regardless of out_sc; only
    # the configured ones carry into our module.
    for i in out_sc:
        params[f'outconv_{i}'] = _bareconv(sd, f'outconv_{i}')
    return params, {}


def convert_cadepth_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3), **_) -> tuple[dict, dict]:
    """CADepth: `decoder.{idx}` enumeration of (upconv_0, upconv_1,
    detail_emphasis) per stage then outconvs; DetailEmphasis carries
    BatchNorm running stats (ref `src/networks/decoders/cadepth.py:85-105`)."""
    params: dict = {}
    stats: dict = {}
    k = 0
    for i in range(4, -1, -1):
        params[f'upconv_{i}_0'] = _convblock(sd_dec, f'decoder.{k}'); k += 1
        params[f'upconv_{i}_1'] = _convblock(sd_dec, f'decoder.{k}'); k += 1
        pre = f'decoder.{k}'; k += 1
        params[f'detail_emphasis_{i}'] = {
            'conv': _bareconv(sd_dec, f'{pre}.conv.0'),
            'bn': {'scale': sd_dec[f'{pre}.conv.1.weight'],
                   'bias': sd_dec[f'{pre}.conv.1.bias']},
            'att_conv1': {'kernel': _conv(sd_dec[f'{pre}.att.1.weight']),
                          'bias': sd_dec[f'{pre}.att.1.bias']},
            'att_conv2': {'kernel': _conv(sd_dec[f'{pre}.att.3.weight']),
                          'bias': sd_dec[f'{pre}.att.3.bias']},
        }
        stats[f'detail_emphasis_{i}'] = {
            'bn': {'mean': sd_dec[f'{pre}.conv.1.running_mean'],
                   'var': sd_dec[f'{pre}.conv.1.running_var']}}
    for i in out_sc:
        params[f'outconv_{i}'] = _bareconv(sd_dec, f'decoder.{k}'); k += 1
    return params, stats


def convert_superdepth_decoder(sd_dec: dict, out_sc=(0, 1, 2, 3), **_) -> tuple[dict, dict]:
    """SuperDepth: `decoder.{idx}` of (Sequential(conv_block, SubPixelConv),
    conv_block) per stage; outconv 0 is a bare conv, outconv i>0 a
    (conv_block, SubPixelConv(2**i)) pair
    (ref `src/networks/decoders/superdepth.py:66-98`)."""
    params: dict = {}
    k = 0
    for i in range(4, -1, -1):
        pre = f'decoder.{k}'; k += 1
        params[f'upconv_{i}_0_conv'] = _convblock(sd_dec, f'{pre}.0')
        params[f'upconv_{i}_0_up'] = _bareconv(sd_dec, f'{pre}.1.conv')
        params[f'upconv_{i}_1'] = _convblock(sd_dec, f'decoder.{k}'); k += 1
    for i in out_sc:
        pre = f'decoder.{k}'; k += 1
        if i == 0:
            params['outconv_0'] = _bareconv(sd_dec, f'{pre}.0')
        else:
            params[f'outconv_{i}_conv'] = _convblock(sd_dec, f'{pre}.0')
            params[f'outconv_{i}_up'] = _bareconv(sd_dec, f'{pre}.1.conv')
    return params, {}


def convert_monodepth_decoder_v(sd_dec: dict, out_sc=(0, 1, 2, 3), **_) -> tuple[dict, dict]:
    return convert_monodepth_decoder(sd_dec, out_sc), {}


DEC_CONVERTERS = {
    'monodepth': convert_monodepth_decoder_v,
    'hrdepth': convert_hrdepth_decoder,
    'ddvnet': convert_ddvnet_decoder,
    'diffnet': convert_diffnet_decoder,
    'cadepth': convert_cadepth_decoder,
    'superdepth': convert_superdepth_decoder,
}


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
    if dec_name not in DEC_CONVERTERS:
        raise NotImplementedError(
            f'No checkpoint converter for decoder "{dec_name}" '
            f'(have: {sorted(DEC_CONVERTERS)}).')
    out_sc = tuple(net_cfg.get('out_scales', (0, 1, 2, 3)))
    from .encoders import ENCODER_SPECS
    enc_sc = tuple(ENCODER_SPECS[enc_name]['reductions'])
    convert_dec = DEC_CONVERTERS[dec_name]

    enc_params, enc_stats = _convert_encoder(_sub(sd, 'encoder.'), enc_name)
    dec_params, dec_stats = convert_dec(_sub(sd, 'decoders.disp.'), out_sc,
                                        enc_sc=enc_sc,
                                        use_skip=net_cfg.get('use_skip', True))
    params = {'encoder': enc_params, 'decoders_disp': dec_params}
    stats = {}
    if enc_stats:
        stats['encoder'] = enc_stats
    if dec_stats:
        stats['decoders_disp'] = dec_stats
    if net_cfg.get('mask_name'):
        mask_params, mask_stats = convert_dec(_sub(sd, 'decoders.mask.'), out_sc,
                                              enc_sc=enc_sc,
                                              use_skip=net_cfg.get('use_skip', True))
        params['decoders_mask'] = mask_params
        if mask_stats:
            stats['decoders_mask'] = mask_stats
    aux = {'batch_stats': stats} if stats else {}
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
