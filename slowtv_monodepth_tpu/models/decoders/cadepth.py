"""CADepth decoder: structure-perception self-attention + detail-emphasis
channel attention (ref `src/networks/decoders/cadepth.py:14-126`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv3x3, upsample2x

__all__ = ['CaDepthDecoder']


class StructurePerception(nn.Module):
    """Channel-wise self-attention on the bottleneck (ref `cadepth.py:14-27`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        v = jnp.swapaxes(x.reshape(b, h * w, c), 1, 2)  # (b, c, h*w)
        att = jnp.einsum('bcn,bdn->bcd', v, v)  # (b, c, c)
        att = att.max(axis=-1, keepdims=True) - att  # Normalize.
        out = jnp.einsum('bcd,bdn->bcn', nn.softmax(att, axis=-1), v)
        return x + jnp.swapaxes(out, 1, 2).reshape(b, h, w, c)


class DetailEmphasis(nn.Module):
    """conv+BN+ReLU then SE-style gating (ref `cadepth.py:30-46`)."""
    pad_mode: str = 'reflect'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        x = conv3x3(c, pad_mode=self.pad_mode, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name='bn')(x)
        x = nn.relu(x)
        att = x.mean(axis=(1, 2), keepdims=True)  # (b, 1, 1, c)
        att = nn.relu(nn.Conv(c, (1, 1), name='att_conv1')(att))
        att = nn.sigmoid(nn.Conv(c, (1, 1), name='att_conv2')(att))
        return x + x * att


@register('cadepth')
class CaDepthDecoder(nn.Module):
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
        if self.out_act not in ACT:
            raise KeyError(f'Invalid activation key. ({self.out_act} vs. {tuple(ACT)})')
        act = ACT[self.out_act]

        out = {}
        x = StructurePerception(name='sp')(feat[-1])
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_0')(x)
            x = [upsample2x(x, self.upsample_mode)]

            sf = 2 ** i
            if self.use_skip and sf in self.enc_sc:
                x += [feat[list(self.enc_sc).index(sf)]]

            x = jnp.concatenate(x, axis=-1)
            x = DetailEmphasis(pad_mode=self.pad_mode, name=f'detail_emphasis_{i}')(x, train=train)
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_1')(x)

            if i in self.out_sc:
                out[i] = act(conv3x3(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(x))
        return out
