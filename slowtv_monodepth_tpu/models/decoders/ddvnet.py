"""DDVNet decoder: discrete disparity volume + self-attention
(ref `src/networks/decoders/ddvnet.py:14-152`).

Outputs the softmax-expectation over 128 linear disparity bins; the bottleneck
self-attention is a plain (hw, c) x (c, hw) matmul pair that maps directly
onto the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from .utils import ACT, ConvBlock, conv3x3, upsample2x

__all__ = ['DDVNetDecoder']


def get_discrete_bins(n: int, mode: str = 'linear') -> jnp.ndarray:
    """Discrete sigmoid-disparity bin centers (ref `ddvnet.py:14-34`)."""
    bins = jnp.arange(n, dtype=jnp.float32) / n
    if mode == 'linear':
        pass
    elif mode == 'exp':
        bins = jnp.exp(jnp.log(200.0) * (bins - 1))
    else:
        raise ValueError(f"Invalid discretization mode. '{mode}'")
    return bins


class SelfAttentionBlock(nn.Module):
    """Dense self-attention over flattened spatial positions (ref `ddvnet.py:37-54`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        q = nn.relu(nn.Conv(c, (1, 1), name='query_conv')(x)).reshape(b, h * w, c)
        k = nn.relu(nn.Conv(c, (1, 1), name='key_conv')(x)).reshape(b, h * w, c)
        v = nn.relu(nn.Conv(c, (1, 1), name='value_conv')(x)).reshape(b, h * w, c)

        # Reference layout: att[i, j] = q_row_i . k_col_j over channels.
        att = jnp.einsum('bic,bjc->bij', q, k)
        out = jnp.einsum('bij,bjc->bic', nn.softmax(att, axis=-1), v)
        return out.reshape(b, h, w, c)


@register('ddvnet')
class DDVNetDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    enc_sc: Sequence[int]
    upsample_mode: str = 'nearest'
    use_skip: bool = True
    out_sc: Sequence[int] = (0, 1, 2, 3)
    out_ch: int = 1
    out_act: Optional[str] = 'sigmoid'
    pad_mode: str = 'reflect'

    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    num_bins: int = 128

    def expected_disparity(self, logits: jnp.ndarray) -> jnp.ndarray:
        """(b, h, w, n_bins) logits -> (b, h, w, 1) expected disparity."""
        probs = nn.softmax(logits, axis=-1)
        bins = get_discrete_bins(self.num_bins)
        return (probs * bins).sum(axis=-1, keepdims=True)

    @nn.compact
    def __call__(self, feat: list[jnp.ndarray], train: bool = False) -> dict[int, jnp.ndarray]:
        del train
        if self.out_act not in ACT:
            raise KeyError(f'Invalid activation key. ({self.out_act} vs. {tuple(ACT)})')

        out = {}
        x = SelfAttentionBlock(name='att')(feat[-1])
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_0')(x)
            x = [upsample2x(x, self.upsample_mode)]

            sf = 2 ** i
            if self.use_skip and sf in self.enc_sc:
                x += [feat[list(self.enc_sc).index(sf)]]

            x = jnp.concatenate(x, axis=-1)
            x = ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_1')(x)

            if i in self.out_sc:
                logits = conv3x3(self.num_bins * self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(x)
                chunks = jnp.split(logits, self.out_ch, axis=-1)
                out[i] = jnp.concatenate([self.expected_disparity(l) for l in chunks], axis=-1)
        return out
