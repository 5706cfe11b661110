"""Shared decoder building blocks (ref `src/networks/decoders/utils.py`).

All decoders share one constructor contract (`src/README.md` Networks):
`(num_ch_enc, enc_sc, upsample_mode, use_skip, out_sc, out_ch, out_act)` and
return `dict[int scale -> (b, h/2**s, w/2**s, out_ch)]`.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize, upsample2x_nearest

__all__ = ['ACT', 'conv1x1', 'conv3x3', 'ConvBlock', 'upsample2x']

ACT = {
    'sigmoid': nn.sigmoid,
    'relu': nn.relu,
    'none': lambda x: x,
    None: lambda x: x,
}


def reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')


def _resolve_pad(pad_mode: str) -> str:
    """'reflect' (reference parity) or 'zeros' (TPU recipe).

    `SLOWTV_DECODER_ZERO_PAD=1` forces 'zeros' for quick perf A/Bs.
    """
    import os
    if os.environ.get('SLOWTV_DECODER_ZERO_PAD'):
        return 'zeros'
    if pad_mode not in ('reflect', 'zeros'):
        raise KeyError(f"Invalid pad_mode '{pad_mode}' (reflect|zeros)")
    return pad_mode


class conv3x3(nn.Module):
    """3x3 conv with reflect padding (ref `decoders/utils.py:44-46`).

    `pad_mode='zeros'` swaps reflect for the conv's own zero 'SAME' padding
    (identical away from the 1px border): XLA folds it into the conv,
    removing the pad copy (fwd) and its slice+add transpose (bwd) at every
    decoder conv. Measured on the KBR step: 41.2 -> 46.9 imgs/s/chip (+14%),
    which is why `cfg/kbr/tpu.yaml` trains with zeros; parity eval keeps
    reflect.
    """
    out_ch: int
    use_bias: bool = True
    pad_mode: str = 'reflect'

    @nn.compact
    def __call__(self, x):
        if _resolve_pad(self.pad_mode) == 'zeros':
            return nn.Conv(self.out_ch, (3, 3), padding='SAME',
                           use_bias=self.use_bias, name='conv')(x)
        return nn.Conv(self.out_ch, (3, 3), padding='VALID', use_bias=self.use_bias,
                       name='conv')(reflect_pad(x))


class conv1x1(nn.Module):
    out_ch: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (1, 1), use_bias=self.use_bias, name='conv')(x)


class ConvBlock(nn.Module):
    """conv3x3(reflect|zeros) + ELU (ref `decoders/utils.py:49-54`)."""
    out_ch: int
    pad_mode: str = 'reflect'

    @nn.compact
    def __call__(self, x):
        return nn.elu(conv3x3(self.out_ch, pad_mode=self.pad_mode, name='conv')(x))


def upsample2x(x: jnp.ndarray, mode: str = 'nearest') -> jnp.ndarray:
    if mode == 'nearest':
        return upsample2x_nearest(x)
    return resize(x, (2 * x.shape[1], 2 * x.shape[2]), method=mode)
