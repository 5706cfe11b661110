"""Pretrained encoder weight loading at init time.

The reference gets ImageNet pretraining from `timm.create_model(
pretrained=True)` (`src/networks/depth.py:97`); ablations show it matters
(`cfg/abl_pretrained/`). This environment has no torch-hub egress, so weights
flow through files instead:

1. On any machine with timm: `python api/data/export_timm.py convnext_base`
   saves `<model_root>/timm/<name>.npz` (a plain name->array dump).
2. At init, `load_pretrained_encoder` converts that dump with
   `import_torch.convert_*` and grafts it into the encoder subtree of a
   freshly initialized param pytree (batch_stats included for ResNets).

Missing weight files log a warning and return the random init — training
still runs, just unpretrained.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...paths import MODEL_ROOTS
from ...utils import get_logger
from .convnext import CONVNEXT_SPECS
from .hrnet import HRNET_SPECS
from .import_torch import (convert_convnext, convert_hrnet, convert_mbnet,
                           convert_resnet, load_state_dict_file)
from .mbnet import MBNET_SPECS
from .resnet import RESNET_SPECS

__all__ = ['load_pretrained_encoder', 'find_weights_file']

LOGGER = get_logger('pretrained')


# DPT encoders initialize from the released MiDaS checkpoints (matching the
# reference, whose quickstart DPT models are MiDaS-finetuned).
_DPT_MIDAS_STEMS = {
    'dpt_vitl16_384': 'midas/dpt_large-midas-2f21e586',
}


def find_weights_file(enc_name: str) -> Optional[str]:
    stems = [f'timm/{enc_name}']
    if enc_name in _DPT_MIDAS_STEMS:
        stems.append(_DPT_MIDAS_STEMS[enc_name])
    for root in MODEL_ROOTS:
        for stem in stems:
            for suffix in ('.npz', '.pth', '.pt'):
                f = root / f'{stem}{suffix}'
                if f.is_file():
                    return str(f)
    return None


def _as_jnp(tree):
    import jax
    return jax.tree_util.tree_map(lambda v: jnp.asarray(v), tree)


def load_pretrained_encoder(variables: dict, enc_name: str,
                            in_chans: int = 3) -> dict:
    """Graft pretrained encoder weights into `variables` (params/batch_stats).

    :param variables: Net variables dict with params['encoder'] to replace.
    :return: Updated variables (unchanged when no weight file is found).
    """
    file = find_weights_file(enc_name)
    if file is None:
        LOGGER.warning(
            f'No pretrained weights for "{enc_name}" under <model_root>/timm/; '
            'using random init. Export with api/data/export_timm.py.')
        return variables

    LOGGER.info(f'Loading pretrained encoder weights from {file}...')
    sd = load_state_dict_file(file)

    def graft(params, stats=None):
        nonlocal variables
        variables = dict(variables)
        variables['params'] = dict(variables['params'])
        variables['params']['encoder'] = _as_jnp(params)
        if stats is not None:
            bs = dict(variables.get('batch_stats', {}))
            bs['encoder'] = _as_jnp(stats)
            variables['batch_stats'] = bs

    if enc_name in RESNET_SPECS:
        spec = RESNET_SPECS[enc_name]
        block = 'basic' if spec['block'] == 'basic' else 'bottleneck'
        params, stats = convert_resnet(sd, spec['layers'], block=block,
                                       in_chans=in_chans)
        graft(params, stats)
    elif enc_name in MBNET_SPECS:
        params, stats = convert_mbnet(sd, MBNET_SPECS[enc_name]['stages'],
                                      in_chans=in_chans)
        graft(params, stats)
    elif enc_name in HRNET_SPECS:
        params, stats = convert_hrnet(sd, in_chans=in_chans)
        graft(params, stats)
    elif enc_name in CONVNEXT_SPECS:
        spec = CONVNEXT_SPECS[enc_name]
        params = convert_convnext(sd, spec['depths'], in_chans=in_chans)
        graft(params)
    elif enc_name in _DPT_MIDAS_STEMS:
        # DPT depth nets initialize from the MiDaS checkpoint (the
        # reference's quickstart DPT models are MiDaS-finetuned); reuse the
        # MiDaS converter's trunk mapping on a `midas/*.npz|pt` dump.
        from ..import_midas import convert_midas_encoder
        name = enc_name.removeprefix('dpt_')
        try:
            params = convert_midas_encoder(sd, backbone=name)
        except KeyError as e:
            LOGGER.warning(f'MiDaS-layout weights expected for "{enc_name}" '
                           f'(missing {e}); using random init.')
            return variables
        graft(params)
    else:
        LOGGER.warning(f'No converter for encoder "{enc_name}"; using random init.')
    return variables

