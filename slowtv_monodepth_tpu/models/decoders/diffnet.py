"""DiffNet decoder: channel-attention skip connections
(ref `src/networks/decoders/diffnet.py:21-146`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv3x3, upsample2x

__all__ = ['DiffNetDecoder']


class ChannelAttention(nn.Module):
    """Squeeze & Excitation channel attention (ref `diffnet.py:21-47`)."""
    ratio: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        att = x.mean(axis=(1, 2))  # (b, c)
        att = nn.Dense(c // self.ratio, use_bias=False, name='fc1')(att)
        att = nn.relu(att)
        att = nn.Dense(c, use_bias=False, name='fc2')(att)
        att = nn.sigmoid(att)
        return x * att[:, None, None, :]


class AttentionBlock(nn.Module):
    """Upsample + skip concat + channel attention + conv (ref `diffnet.py:50-74`)."""
    out_ch: int
    upsample_mode: str = 'nearest'
    pad_mode: str = 'reflect'

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_skip: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([upsample2x(x, self.upsample_mode), x_skip], axis=-1)
        x = ChannelAttention(name='ca')(x)
        return nn.relu(conv3x3(self.out_ch, pad_mode=self.pad_mode, name='conv')(x))


class UpsampleBlock(nn.Module):
    """conv + x2 upsample + conv, for skip-less stages (ref `diffnet.py:12-18`)."""
    out_ch: int
    upsample_mode: str = 'nearest'
    pad_mode: str = 'reflect'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBlock(self.out_ch, pad_mode=self.pad_mode, name='conv0')(x)
        x = upsample2x(x, self.upsample_mode)
        return ConvBlock(self.out_ch, pad_mode=self.pad_mode, name='conv1')(x)


@register('diffnet')
class DiffNetDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    enc_sc: Sequence[int]
    upsample_mode: str = 'nearest'
    use_skip: bool = True
    out_sc: Sequence[int] = (0, 1, 2, 3)
    out_ch: int = 1
    out_act: Optional[str] = 'sigmoid'
    pad_mode: str = 'reflect'

    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, feat: list[jnp.ndarray], train: bool = False) -> dict[int, jnp.ndarray]:
        del train
        if self.out_act not in ACT:
            raise KeyError(f'Invalid activation key. ({self.out_act} vs. {tuple(ACT)})')
        act = ACT[self.out_act]

        out = {}
        x = feat[-1]
        for i in range(4, -1, -1):
            sf = 2 ** i
            if self.use_skip and sf in self.enc_sc:
                skip = feat[list(self.enc_sc).index(sf)]
                x = AttentionBlock(self.num_ch_dec[i], self.upsample_mode,
                                   pad_mode=self.pad_mode,
                                   name=f'upconv_{i}')(x, skip)
            else:
                x = UpsampleBlock(self.num_ch_dec[i], self.upsample_mode,
                                  pad_mode=self.pad_mode,
                                  name=f'upconv_{i}')(x)
            if i in self.out_sc:
                out[i] = act(conv3x3(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(x))
        return out
