"""Convert released NeWCRFs torch checkpoints into `NewCRFDepth` variables.

The reference loads the published `model_nyu.ckpt` / `model_kittieigen.ckpt`
files directly into its vendored torch model
(`src/external_libs/newcrfs/tools.py:14-44`, state dict under the `model` key
with `nn.DataParallel`'s `module.` prefix). This module maps that state dict
onto the Flax `NewCRFDepth` parameter tree.

Layout notes:
- conv OIHW -> HWIO, linear (out,in) -> (in,out), LayerNorm/BN weight/bias ->
  scale/bias (+ running stats into `batch_stats`).
- Swin patch-merging concatenates 2x2 neighbors as [x0, x1, x2, x3] =
  [(0,0), (1,0), (0,1), (1,1)] (row-major parity pairs); our encoder's
  reshape produces [(0,0), (0,1), (1,0), (1,1)], so the merge norm/reduce
  inputs are block-permuted by [0, 2, 1, 3].
"""
from __future__ import annotations

import numpy as np

from .newcrfs import NEWCRFS_VERSIONS, _POOL_SCALES

__all__ = ['convert_newcrfs', 'load_newcrfs_state_dict']


def load_newcrfs_state_dict(path) -> dict[str, np.ndarray]:
    """Load a NeWCRFs checkpoint (.npz export or released torch .ckpt)."""
    path = str(path)
    if path.endswith('.npz'):
        with np.load(path) as f:
            sd = {k: f[k] for k in f.files}
    else:
        import torch  # Host-side only, for the released .ckpt files.
        sd = torch.load(path, map_location='cpu', weights_only=True)
        if 'model' in sd:
            sd = sd['model']
        if 'state_dict' in sd:
            sd = sd['state_dict']
        sd = {k: v.numpy() for k, v in sd.items()}
    return {k.removeprefix('module.'): v for k, v in sd.items()}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    return np.transpose(w, (1, 0))


def _ln(sd, pre):
    return {'scale': sd[f'{pre}.weight'], 'bias': sd[f'{pre}.bias']}


def _merge_perm(c: int) -> np.ndarray:
    """Reorder 4C patch-merge inputs from torch's [x0,x1,x2,x3] to ours."""
    idx = np.arange(4 * c).reshape(4, c)
    return np.concatenate([idx[0], idx[2], idx[1], idx[3]])


def _attn(sd, pre, qk_name: str):
    """Window attention params: packed qk/qkv + proj + rel-pos table."""
    return {
        qk_name: {'kernel': _dense(sd[f'{pre}.{qk_name}.weight']),
                  'bias': sd[f'{pre}.{qk_name}.bias']},
        'proj': {'kernel': _dense(sd[f'{pre}.proj.weight']),
                 'bias': sd[f'{pre}.proj.bias']},
        'rel_pos_table': sd[f'{pre}.relative_position_bias_table'],
    }


def _block(sd, pre, qk_name: str):
    return {
        'norm1': _ln(sd, f'{pre}.norm1'),
        'attn': _attn(sd, f'{pre}.attn', qk_name),
        'norm2': _ln(sd, f'{pre}.norm2'),
        'fc1': {'kernel': _dense(sd[f'{pre}.mlp.fc1.weight']),
                'bias': sd[f'{pre}.mlp.fc1.bias']},
        'fc2': {'kernel': _dense(sd[f'{pre}.mlp.fc2.weight']),
                'bias': sd[f'{pre}.mlp.fc2.bias']},
    }


def _conv_norm(sd, pre, norm: str):
    """mmcv ConvModule -> {conv, bn|gn} params (+ stats for bn)."""
    p = {'conv': {'kernel': _conv(sd[f'{pre}.conv.weight'])},
         norm: {'scale': sd[f'{pre}.{norm}.weight'],
                'bias': sd[f'{pre}.{norm}.bias']}}
    s = {}
    if norm == 'bn':
        s['bn'] = {'mean': sd[f'{pre}.bn.running_mean'],
                   'var': sd[f'{pre}.bn.running_var']}
    return p, s


def convert_newcrfs(sd: dict[str, np.ndarray], version: str = 'large07') -> dict:
    """NeWCRFs state dict -> `{'params': ..., 'batch_stats': ...}`."""
    spec = NEWCRFS_VERSIONS[version[:-2]]
    params: dict = {}
    stats: dict = {}

    # --- Swin backbone ---
    bb: dict = {
        'patch_embed': {'kernel': _conv(sd['backbone.patch_embed.proj.weight']),
                        'bias': sd['backbone.patch_embed.proj.bias']},
        'patch_norm': _ln(sd, 'backbone.patch_embed.norm'),
    }
    for s, depth in enumerate(spec['depths']):
        for i in range(depth):
            bb[f'stage{s}_block{i}'] = _block(
                sd, f'backbone.layers.{s}.blocks.{i}', 'qkv')
        if s < len(spec['depths']) - 1:
            c = spec['embed_dim'] * 2 ** s
            perm = _merge_perm(c)
            norm = _ln(sd, f'backbone.layers.{s}.downsample.norm')
            bb[f'merge{s + 1}_norm'] = {'scale': norm['scale'][perm],
                                        'bias': norm['bias'][perm]}
            red = _dense(sd[f'backbone.layers.{s}.downsample.reduction.weight'])
            bb[f'merge{s + 1}_reduce'] = {'kernel': red[perm]}
        bb[f'out_norm{s}'] = _ln(sd, f'backbone.norm{s}')
    params['backbone'] = bb

    # --- PSP decoder ---
    dec: dict = {}
    dec_stats: dict = {}
    # All PPM branches are GN (the reference's norm_cfg rebinding; see
    # `newcrfs._PSP`); only the bottleneck is BN.
    for k, _scale in enumerate(_POOL_SCALES):
        dec[f'psp{k}'], _ = _conv_norm(sd, f'decoder.psp_modules.{k}.1', 'gn')
    dec['bottleneck'], dec_stats['bottleneck'] = _conv_norm(
        sd, 'decoder.bottleneck', 'bn')
    params['decoder'] = dec
    stats['decoder'] = dec_stats

    # --- CRF stages ---
    crf_dims = (128, 256, 512, 1024)
    for j in range(4):
        crf: dict = {}
        if spec['in_channels'][j] != crf_dims[j]:
            crf['proj_x'] = {'kernel': _conv(sd[f'crf{j}.proj_x.weight']),
                             'bias': sd[f'crf{j}.proj_x.bias']}
        crf['proj_v'] = {'kernel': _conv(sd[f'crf{j}.proj_v.weight']),
                         'bias': sd[f'crf{j}.proj_v.bias']}
        for i in range(2):
            crf[f'block{i}'] = _block(
                sd, f'crf{j}.crf_layer.blocks.{i}', 'qk')
        crf['norm_crf'] = _ln(sd, f'crf{j}.norm_crf')
        params[f'crf{j}'] = crf

    params['disp_head1'] = {'kernel': _conv(sd['disp_head1.conv1.weight']),
                            'bias': sd['disp_head1.conv1.bias']}

    import jax.numpy as jnp
    import jax
    tree = {'params': params, 'batch_stats': stats}
    return jax.tree.map(jnp.asarray, tree)
