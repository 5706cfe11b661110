"""Monocular depth estimation network (ref `src/networks/depth.py:17-156`).

Encoder (native Flax timm-equivalent) + registered decoder(s) producing
multi-scale sigmoid disparity; optional virtual-stereo 3-channel split
(ref `:123-126`), explainability/uncertainty mask decoder (`:108-114`), and
flip-and-blend stereo blending (`:148-156`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from . import decoders  # noqa: F401  (populate DEC_REG)
from .. import DEC_REG, register
from ..ops import blend_stereo
from ..ops.dispatch import constrain_spatial
from ..utils import sort_dict
from .encoders import create_encoder

__all__ = ['DepthNet']

MASKS = {None: None, 'explainability': 'sigmoid', 'uncertainty': 'relu'}
VALID_MASKS = set(MASKS)


@register('depth')
class DepthNet(nn.Module):
    """:param enc_name: Encoder key (see `models.encoders.ENCODER_SPECS`).
    :param pretrained: Kept for cfg parity; weight import happens offline via
        `encoders.import_torch` (no torch hub in the TPU environment).
    :param dec_name: Registered decoder type.
    :param out_scales: Multi-scale outputs as 2**s.
    :param mask_name: Optional photometric-weighting mask
        {None, 'explainability', 'uncertainty'}.
    :param num_ch_mask: Number of support frames to predict masks for.
    :param use_virtual_stereo: If True, also predict stereo-pair disparity.
    :param use_stereo_blend: If True, blend predictions with a flipped pass.
    :param gelu: {'exact', 'tanh'} GELU flavor for GELU-based encoders
        (TPU-fast training option; see `encoders.create_encoder`).
    """
    enc_name: str = 'resnet18'
    pretrained: bool = True
    dec_name: str = 'monodepth'
    out_scales: Union[int, Sequence[int]] = (0, 1, 2, 3)
    mask_name: Optional[str] = None
    num_ch_mask: Optional[int] = None
    use_virtual_stereo: bool = False
    use_stereo_blend: bool = False
    gelu: str = 'exact'
    dec_pad_mode: str = 'reflect'
    # TPU recipe: phase-decomposed upsample->conv decoder stages (exact
    # transform, same checkpoints; `ops/phase_up.py`). Monodepth decoder only.
    dec_phase_up: bool = False
    # Per-block encoder remat policy ('', 'dots', 'full') — math-identical
    # jax.checkpoint, trades HBM activation traffic for recompute FLOPs
    # (ConvNeXt encoders only; `encoders/convnext.py`).
    enc_remat: str = ''

    @property
    def out_sc(self) -> Sequence[int]:
        return [self.out_scales] if isinstance(self.out_scales, int) else list(self.out_scales)

    def setup(self):
        if self.dec_name not in DEC_REG:
            raise KeyError(f'Invalid decoder. ({self.dec_name} vs. {list(DEC_REG)})')
        if self.mask_name not in VALID_MASKS:
            raise KeyError(f'Invalid mask. ({self.mask_name} vs. {VALID_MASKS})')
        if self.dec_name == 'ddvnet' and self.mask_name is not None:
            raise KeyError('DDVNet is not compatible with mask prediction.')
        if self.mask_name and (self.num_ch_mask or 0) <= 0:
            raise ValueError(f'Invalid number of mask channels. ({self.num_ch_mask} vs. >=1)')

        self.encoder, self.num_ch_enc, self.enc_sc = create_encoder(
            self.enc_name, gelu=self.gelu, remat=self.enc_remat)
        cls = DEC_REG[self.dec_name]
        extra = {'phase_up': True} if (
            self.dec_phase_up and self.dec_name == 'monodepth') else {}
        self.decoder_disp = cls(
            num_ch_enc=self.num_ch_enc, enc_sc=self.enc_sc,
            upsample_mode='nearest', use_skip=True,
            out_sc=self.out_sc, out_ch=1 + (2 * self.use_virtual_stereo),
            out_act='sigmoid', pad_mode=self.dec_pad_mode,
            name='decoders_disp', **extra)
        if self.mask_name:
            self.decoder_mask = cls(
                num_ch_enc=self.num_ch_enc, enc_sc=self.enc_sc,
                upsample_mode='nearest', use_skip=True,
                out_sc=self.out_sc, out_ch=self.num_ch_mask,
                out_act=MASKS[self.mask_name], pad_mode=self.dec_pad_mode,
                name='decoders_mask', **extra)

    def _forward(self, x: jnp.ndarray, train: bool) -> dict:
        out = {}
        feat = self.encoder(x, train=train)
        # Under a spatial (height-sharded) mesh, pin each pyramid level's
        # layout (no-op otherwise): GSPMD left alone height-shards even the
        # stride-32 map whose height is below the axis size, and the
        # transpose pass then pays an involuntary full rematerialization
        # (`ops/dispatch.spatial_sharding_hint` docstring).
        feat = [constrain_spatial(f) for f in feat]
        out['depth_feats'] = feat
        out['disp'] = sort_dict(self.decoder_disp(feat, train=train))
        if self.mask_name:
            out['mask'] = sort_dict(self.decoder_mask(feat, train=train))

        if self.use_virtual_stereo:  # Split [mono | left, right] channels.
            out['disp_stereo'] = {k: v[..., 1:] for k, v in out['disp'].items()}
            out['disp'] = {k: v[..., :1] for k, v in out['disp'].items()}
        return out

    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """:param x: (b, h, w, 3) input images.
        :return: {depth_feats: [(b, h/2**s, w/2**s, c)],
                  disp: {s: (b, h/2**s, w/2**s, 1)},
                  (opt) disp_stereo / mask / mask_stereo}.
        """
        out = self._forward(x, train)
        if not self.use_stereo_blend:
            return out

        out_flip = self._forward(x[:, :, ::-1], train)
        for k, v in out_flip.items():
            if not k.startswith('disp'):
                continue
            out[k] = {kk: blend_stereo(out[k][kk], vv[:, :, ::-1]) for kk, vv in v.items()}
        return out
