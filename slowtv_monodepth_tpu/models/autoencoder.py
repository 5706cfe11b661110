"""Image autoencoder network (ref `src/networks/autoencoder.py:13-65`).

Encoder + skip-less decoder with 3-channel sigmoid RGB output; its features
feed the FeatDepth losses.
"""
from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from . import decoders  # noqa: F401
from .. import DEC_REG, register
from ..ops.dispatch import constrain_spatial
from ..utils import sort_dict
from .encoders import create_encoder

__all__ = ['AutoencoderNet']


@register('autoencoder')
class AutoencoderNet(nn.Module):
    enc_name: str = 'resnet18'
    pretrained: bool = True
    dec_name: str = 'monodepth'
    out_scales: Union[int, Sequence[int]] = (0, 1, 2, 3)
    gelu: str = 'exact'
    dec_pad_mode: str = 'reflect'

    @property
    def out_sc(self) -> Sequence[int]:
        return [self.out_scales] if isinstance(self.out_scales, int) else list(self.out_scales)

    def setup(self):
        if self.dec_name not in DEC_REG:
            raise KeyError(f'Invalid decoder. ({self.dec_name} vs. {list(DEC_REG)})')
        self.encoder, self.num_ch_enc, self.enc_sc = create_encoder(
            self.enc_name, gelu=self.gelu)
        self.decoder = DEC_REG[self.dec_name](
            num_ch_enc=self.num_ch_enc, enc_sc=self.enc_sc,
            upsample_mode='nearest', use_skip=False,
            out_sc=self.out_sc, out_ch=3, out_act='sigmoid',
            pad_mode=self.dec_pad_mode, name='decoders_autoencoder')

    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """:return: {autoenc_feats: [(b, ., ., c)], autoenc_imgs: {s: (b, ., ., 3)}}."""
        feat = self.encoder(x, train=train)
        # Spatial-mesh layout pin, same rationale as DepthNet/PoseNet
        # (no-op outside `spatial_sharding_hint`).
        feat = [constrain_spatial(f) for f in feat]
        return {
            'autoenc_feats': feat,
            'autoenc_imgs': sort_dict(self.decoder(feat, train=train)),
        }
