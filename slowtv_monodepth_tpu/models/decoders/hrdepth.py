"""HR-Depth decoder (ref `src/networks/decoders/hrdepth.py:14-191`).

Dense nested skip grid with feature Squeeze-Excitation attention on the
highest-resolution column; 4-scale encoders get a duplicated, upsampled first
stage (ref `:77-81,162-163`).
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv1x1, conv3x3, upsample2x

__all__ = ['HRDepthDecoder']


class FSEBlock(nn.Module):
    """Feature SqueezeExcitation block (ref `hrdepth.py:14-43`)."""
    out_ch: int
    upsample_mode: str = 'nearest'
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, xs_skip: list[jnp.ndarray]) -> jnp.ndarray:
        x = upsample2x(x, self.upsample_mode)
        x = jnp.concatenate([x, *xs_skip], axis=-1)
        in_ch = x.shape[-1]

        y = x.mean(axis=(1, 2))  # (b, c) global average pool
        y = nn.Dense(in_ch // self.reduction, use_bias=False, name='se_fc1')(y)
        y = nn.relu(y)
        y = nn.Dense(in_ch, use_bias=False, name='se_fc2')(y)
        y = nn.sigmoid(y)[:, None, None, :]

        return nn.relu(conv1x1(self.out_ch, name='conv')(x * y))


@register('hrdepth')
class HRDepthDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    enc_sc: Sequence[int]
    upsample_mode: str = 'nearest'
    use_skip: bool = True
    out_sc: Sequence[int] = (0, 1, 2, 3)
    out_ch: int = 1
    out_act: Optional[str] = 'sigmoid'
    pad_mode: str = 'reflect'

    ALL_IDX = ('01', '11', '21', '31', '02', '12', '22', '03', '13', '04')
    ATT_IDX = ('31', '22', '13', '04')
    NON_ATT_IDX = ('01', '11', '21', '02', '12', '03')

    def _resolve_channels(self):
        num_ch_enc = list(self.num_ch_enc)
        if len(self.enc_sc) == 4:
            warnings.warn('HRDepth requires 5 scales; duplicating+upsampling the first.')
            num_ch_enc = [num_ch_enc[0]] + num_ch_enc
        num_ch_dec = [ch // 2 for ch in num_ch_enc[1:]]
        num_ch_dec = [num_ch_dec[0] // 2] + num_ch_dec
        return num_ch_enc, num_ch_dec

    @nn.compact
    def __call__(self, feat: list[jnp.ndarray], train: bool = False) -> dict[int, jnp.ndarray]:
        del train
        if not self.use_skip:
            raise ValueError('HRDepth decoder must use skip connections.')
        if self.out_act not in ACT:
            raise KeyError(f'Invalid activation key. ({self.out_act} vs. {tuple(ACT)})')
        act = ACT[self.out_act]
        num_ch_enc, num_ch_dec = self._resolve_channels()

        if len(feat) == 4:
            feat = [upsample2x(feat[0], self.upsample_mode)] + list(feat)

        fmap = {f'{i}0': f for i, f in enumerate(feat)}

        def conv0(idx_row, idx_col, x):
            """upconv 0 of cell (row, col): halves channels (ref `:98-107`)."""
            ch_in = num_ch_enc[idx_row]
            if idx_row == 0 and idx_col != 0:
                ch_in //= 2
            if idx_row == 0 and idx_col == 4:
                ch_in = num_ch_enc[1] // 2
            return ConvBlock(ch_in // 2, pad_mode=self.pad_mode, name=f'{idx_row}{idx_col}_conv_0')(x)

        for idx in self.ALL_IDX:
            row, col = int(idx[0]), int(idx[1])
            xs_skip = [fmap[f'{row}{i}'] for i in range(col)]
            src = fmap[f'{row + 1}{col - 1}']

            if idx in self.ATT_IDX:
                x = conv0(row + 1, col - 1, src)
                fmap[idx] = FSEBlock(num_ch_enc[row + 1] // 2,
                                     upsample_mode=self.upsample_mode,
                                     name=f'{idx}_att')(x, xs_skip)
            else:
                x = upsample2x(conv0(row + 1, col - 1, src), self.upsample_mode)
                x = jnp.concatenate([x, *xs_skip], axis=-1)
                if col != 1:
                    x = conv1x1(2 * num_ch_dec[row + 1], use_bias=False,
                                name=f'{idx}_down')(x)
                fmap[idx] = ConvBlock(num_ch_dec[row + 1], pad_mode=self.pad_mode,
                                      name=f'{row + 1}{col - 1}_conv_1')(x)

        x = conv0(0, 4, fmap['04'])
        x = ConvBlock(num_ch_dec[0], pad_mode=self.pad_mode, name='04_conv_1')(upsample2x(x, self.upsample_mode))

        out_feat = [x, fmap['04'], fmap['13'], fmap['22']]
        return {i: act(conv3x3(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(f))
                for i, f in enumerate(out_feat) if i in self.out_sc}
