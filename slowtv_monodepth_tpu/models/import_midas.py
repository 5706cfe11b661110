"""Convert released MiDaS DPT checkpoints into `MidasDPT` variables.

Maps the intel-isl `DPT_Large` state dict (`dpt_large-midas-2f21e586.pt`,
the torch-hub weights the reference loads in
`src/external_libs/midas/tools.py:30`) onto our `MidasDPT` parameter tree:

- `pretrained.model.*`        -> ViT-L/16 trunk (packed qkv split into the
                                 flax MultiHeadDotProductAttention q/k/v/out).
- `pretrained.act_postprocess{k}` -> readout project + reassemble stages.
- `scratch.layer{k}_rn`       -> decoder scratch convs.
- `scratch.refinenet{k}`      -> decoder fusion blocks (refine{k-1}).
- `scratch.output_conv`       -> the full-resolution ReLU head (`out0`).

Conventions: conv OIHW -> HWIO; linear (out,in) -> (in,out); ConvTranspose2d
(in,out,kh,kw) -> spatially flipped (kh,kw,in,out) (flax `ConvTranspose`
doesn't flip the kernel; pinned by `tests/test_external_models.py`).
"""
from __future__ import annotations

import numpy as np

from .encoders.vit import VIT_SPECS

__all__ = ['convert_midas_dpt', 'convert_midas_encoder', 'load_midas_state_dict']


def load_midas_state_dict(path) -> dict[str, np.ndarray]:
    path = str(path)
    if path.endswith('.npz'):
        with np.load(path) as f:
            sd = {k: f[k] for k in f.files}
    else:
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=True)
        if 'state_dict' in sd:
            sd = sd['state_dict']
        sd = {k: v.numpy() for k, v in sd.items()}
    return {k.removeprefix('module.'): v for k, v in sd.items()}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convt(w):
    """ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out), kernel flipped."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def _dense(w):
    return np.transpose(w, (1, 0))


def _ln(sd, pre):
    return {'scale': sd[f'{pre}.weight'], 'bias': sd[f'{pre}.bias']}


def _mha(sd, pre, dim: int, heads: int):
    """timm packed-qkv attention -> flax MultiHeadDotProductAttention."""
    hd = dim // heads
    qkv_w = sd[f'{pre}.qkv.weight']          # (3*dim, dim)
    qkv_b = sd[f'{pre}.qkv.bias']
    out = {}
    for i, name in enumerate(('query', 'key', 'value')):
        w = qkv_w[i * dim:(i + 1) * dim]     # (dim, dim): (out, in)
        out[name] = {'kernel': _dense(w).reshape(dim, heads, hd),
                     'bias': qkv_b[i * dim:(i + 1) * dim].reshape(heads, hd)}
    out['out'] = {'kernel': _dense(sd[f'{pre}.proj.weight']).reshape(heads, hd, dim),
                  'bias': sd[f'{pre}.proj.bias']}
    return out


def convert_midas_encoder(sd: dict[str, np.ndarray],
                          backbone: str = 'vitl16_384') -> dict:
    """MiDaS trunk + readout/reassemble -> `ViTEncoder` params (used both by
    the full `convert_midas_dpt` and by DPT-DepthNet pretrained grafting)."""
    spec = VIT_SPECS[backbone]
    dim, heads = spec['dim'], spec['heads']

    enc: dict = {
        'cls_token': sd['pretrained.model.cls_token'],
        'pos_embed': sd['pretrained.model.pos_embed'],
        'patch_embed': {'kernel': _conv(sd['pretrained.model.patch_embed.proj.weight']),
                        'bias': sd['pretrained.model.patch_embed.proj.bias']},
    }
    for i in range(spec['depth']):
        pre = f'pretrained.model.blocks.{i}'
        enc[f'block{i}'] = {
            'norm1': _ln(sd, f'{pre}.norm1'),
            'attn': _mha(sd, f'{pre}.attn', dim, heads),
            'norm2': _ln(sd, f'{pre}.norm2'),
            'mlp': {'fc1': {'kernel': _dense(sd[f'{pre}.mlp.fc1.weight']),
                            'bias': sd[f'{pre}.mlp.fc1.bias']},
                    'fc2': {'kernel': _dense(sd[f'{pre}.mlp.fc2.weight']),
                            'bias': sd[f'{pre}.mlp.fc2.bias']}},
        }
    for s in range(4):
        k = s + 1
        enc[f'readout{s}'] = {'project': {
            'kernel': _dense(sd[f'pretrained.act_postprocess{k}.0.project.0.weight']),
            'bias': sd[f'pretrained.act_postprocess{k}.0.project.0.bias']}}
        stage = {'proj': {'kernel': _conv(sd[f'pretrained.act_postprocess{k}.3.weight']),
                          'bias': sd[f'pretrained.act_postprocess{k}.3.bias']}}
        if s in (0, 1):
            stage['up'] = {'kernel': _convt(sd[f'pretrained.act_postprocess{k}.4.weight']),
                           'bias': sd[f'pretrained.act_postprocess{k}.4.bias']}
        elif s == 3:
            stage['down'] = {'kernel': _conv(sd[f'pretrained.act_postprocess{k}.4.weight']),
                             'bias': sd[f'pretrained.act_postprocess{k}.4.bias']}
        enc[f'reassemble{s}'] = stage
    return enc


def convert_midas_dpt(sd: dict[str, np.ndarray], backbone: str = 'vitl16_384') -> dict:
    """MiDaS DPT state dict -> `{'params': ...}` for `MidasDPT`."""
    enc = convert_midas_encoder(sd, backbone)

    def res_unit(pre):
        return {'conv1': {'kernel': _conv(sd[f'{pre}.conv1.weight']),
                          'bias': sd[f'{pre}.conv1.bias']},
                'conv2': {'kernel': _conv(sd[f'{pre}.conv2.weight']),
                          'bias': sd[f'{pre}.conv2.bias']}}

    dec: dict = {}
    for s in range(4):
        dec[f'scratch{s}'] = {'kernel': _conv(sd[f'scratch.layer{s + 1}_rn.weight'])}
        pre = f'scratch.refinenet{s + 1}'
        blk = {'res2': res_unit(f'{pre}.resConfUnit2'),
               'out_conv': {'kernel': _conv(sd[f'{pre}.out_conv.weight']),
                            'bias': sd[f'{pre}.out_conv.bias']}}
        if s < 3:  # The coarsest fusion has no skip; resConfUnit1 is unused.
            blk['res1'] = res_unit(f'{pre}.resConfUnit1')
        dec[f'refine{s}'] = blk
    dec['out0'] = {
        'conv1': {'kernel': _conv(sd['scratch.output_conv.0.weight']),
                  'bias': sd['scratch.output_conv.0.bias']},
        'conv2': {'kernel': _conv(sd['scratch.output_conv.2.weight']),
                  'bias': sd['scratch.output_conv.2.bias']},
        'conv3': {'kernel': _conv(sd['scratch.output_conv.4.weight']),
                  'bias': sd['scratch.output_conv.4.bias']},
    }

    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, {'params': {'encoder': enc, 'decoder': dec}})
