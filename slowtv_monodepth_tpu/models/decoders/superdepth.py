"""SuperDepth decoder: sub-pixel (PixelShuffle) upsampling
(ref `src/networks/decoders/superdepth.py:13-118`).

Outputs at scale i > 0 are super-resolved back to full resolution via a
2**i PixelShuffle (ref `:92-97`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv3x3

__all__ = ['SuperdepthDecoder']


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC PixelShuffle: (b, h, w, c*r²) -> (b, h*r, w*r, c).

    Channel layout matches torch: input channel c*r*r + di*r + dj feeds output
    pixel offset (di, dj) of channel c.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, di, w, dj, c)
    return x.reshape(b, h * r, w * r, c)


class SubPixelConv(nn.Module):
    """Grouped 3x3 conv producing r² channels per input channel + shuffle
    (ref `superdepth.py:13-26`; the ICNR-style weight init is approximated by
    the default initializer + zero bias).

    Always zero-'SAME' padded: the reference uses a plain `nn.Conv2d(...,
    padding=1)` here (default zeros), NOT the reflect-padded `conv3x3` —
    pinned by the converter differential in `tests/test_decoder_import.py`.
    """
    up_factor: int
    pad_mode: str = 'reflect'  # Unused; kept for the shared ctor signature.

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch_in = x.shape[-1]
        out = nn.Conv(ch_in * self.up_factor ** 2, (3, 3), padding='SAME',
                      feature_group_count=ch_in,
                      bias_init=nn.initializers.zeros,
                      name='conv')(x)
        return pixel_shuffle(out, self.up_factor)


@register('superdepth')
class SuperdepthDecoder(nn.Module):
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
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_0_conv')(x)
            x = nn.relu(SubPixelConv(2, pad_mode=self.pad_mode, name=f'upconv_{i}_0_up')(x))
            x = [x]

            sf = 2 ** i
            if self.use_skip and sf in self.enc_sc:
                x += [feat[list(self.enc_sc).index(sf)]]

            x = jnp.concatenate(x, axis=-1)
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_1')(x)

            if i in self.out_sc:
                if i == 0:
                    out[i] = act(conv3x3(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(x))
                else:
                    y = ConvBlock(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}_conv')(x)
                    out[i] = act(SubPixelConv(2 ** i, pad_mode=self.pad_mode, name=f'outconv_{i}_up')(y))
        return out
