"""Monodepth(2) decoder (ref `src/networks/decoders/monodepth.py:15-89`).

Five stages of [conv3x3+ELU, x2 upsample, optional encoder skip concat,
conv3x3+ELU], with per-scale 3x3 output convs + activation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv3x3, upsample2x

__all__ = ['MonodepthDecoder']


@register('monodepth')
class MonodepthDecoder(nn.Module):
    """:param num_ch_enc: Channels per encoder stage.
    :param enc_sc: Downsampling factor per encoder stage.
    :param upsample_mode: {'nearest', 'bilinear'}.
    :param use_skip: If True, concat the matching encoder stage at each scale.
    :param out_sc: Output scales as 2**s.
    :param out_ch: Output channels per scale.
    :param out_act: Activation {'sigmoid', 'relu', 'none'}.
    """
    num_ch_enc: Sequence[int]
    enc_sc: Sequence[int]
    upsample_mode: str = 'nearest'
    use_skip: bool = True
    out_sc: Sequence[int] = (0, 1, 2, 3)
    out_ch: int = 1
    out_act: Optional[str] = 'sigmoid'

    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, feat: list[jnp.ndarray], train: bool = False) -> dict[int, jnp.ndarray]:
        del train  # No batch statistics; uniform decoder interface.
        if self.out_act not in ACT:
            raise KeyError(f'Invalid activation key. ({self.out_act} vs. {tuple(ACT)})')
        act = ACT[self.out_act]

        out = {}
        x = feat[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], name=f'upconv_{i}_0')(x)
            x = [upsample2x(x, self.upsample_mode)]

            sf = 2 ** i  # Skip resolution = current scale upsampled x2.
            if self.use_skip and sf in self.enc_sc:
                x += [feat[list(self.enc_sc).index(sf)]]

            x = jnp.concatenate(x, axis=-1)
            x = ConvBlock(self.num_ch_dec[i], name=f'upconv_{i}_1')(x)

            if i in self.out_sc:
                out[i] = act(conv3x3(self.out_ch, name=f'outconv_{i}')(x))
        return out
