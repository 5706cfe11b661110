"""MiDaS DPT baseline model (intel-isl DPT_Large equivalent).

The reference loads MiDaS baselines from torch-hub
(`src/external_libs/midas/tools.py:8-40`) for the supervised-reference rows
of the benchmark tables. This module composes the same architecture from our
native pieces — `ViTEncoder('vitl16_384', readout='project')` + `DptDecoder`
with a single full-resolution ReLU head — so the released `DPT_Large`
checkpoint can be grafted via `import_midas.convert_midas_dpt`.

Output is scaleless inverse depth (disparity), (b, h, w, 1), non-negative.

MiDaS preprocessing differs from the rest of the framework: images are
normalized with mean=std=0.5 (NOT ImageNet) and resized so the smaller change
lands on a multiple of 32 near 384 (`midas/transforms.py` dpt_transform);
`MidasPredictor.preprocess` handles both.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .decoders.dpt import DptDecoder
from .encoders.vit import VIT_SPECS, ViTEncoder

__all__ = ['MidasDPT']


class MidasDPT(nn.Module):
    """DPT_Large: ViT-L/16 trunk with project-readout hooks + DPT fusion."""
    backbone: str = 'vitl16_384'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spec = VIT_SPECS[self.backbone]
        feats = ViTEncoder(dim=spec['dim'], depth=spec['depth'],
                           heads=spec['heads'], hooks=spec['hooks'],
                           channels=spec['channels'], readout='project',
                           name='encoder')(x, train=train)
        out = DptDecoder(num_ch_enc=spec['channels'],
                         enc_sc=spec['reductions'], out_sc=(0,), out_ch=1,
                         out_act='relu', name='decoder')(feats, train=train)
        return out[0]
