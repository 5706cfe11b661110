"""Monodepth(2) decoder (ref `src/networks/decoders/monodepth.py:15-89`).

Five stages of [conv3x3+ELU, x2 upsample, optional encoder skip concat,
conv3x3+ELU], with per-scale 3x3 output convs + activation.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.dispatch import constrain_spatial
from ...ops.pallas_decoder import decoder_stage_supported, fused_upconv_stage
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
    pad_mode: str = 'reflect'
    # TPU recipe option (`net.depth.dec_phase_up`): compute each stage's
    # upsample->conv as a phase-decomposed low-res conv (`ops/phase_up.py`,
    # exact; 2.25x fewer MACs, no materialized up2 activation, 4x MXU
    # output-lane utilization). Same param tree — checkpoints interchange.
    phase_up: bool = False

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
            sf = 2 ** i  # Skip resolution = current scale upsampled x2.
            has_skip = self.use_skip and sf in self.enc_sc

            if self._use_fused_stage(x, i, has_skip):
                # Skip-less sigmoid stage on TPU: one fused Pallas launch
                # (conv+up2+conv+outconv on the MXU, `ops/pallas_decoder`).
                # Params are created by the unfused path during init, so the
                # tree is identical and checkpoints interchange.
                p = self.get_variable('params', f'upconv_{i}_0')['conv']['conv']
                p1 = self.get_variable('params', f'upconv_{i}_1')['conv']['conv']
                po = self.get_variable('params', f'outconv_{i}')['conv']
                x, out[i] = fused_upconv_stage(
                    x, p['kernel'], p['bias'], p1['kernel'], p1['bias'],
                    po['kernel'], po['bias'])
                continue

            # Under a spatial (height-sharded) mesh, pin each stage's layout
            # (no-op otherwise) — see `ops/dispatch.spatial_sharding_hint`.
            x = constrain_spatial(
                ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_0')(x))
            skip = feat[list(self.enc_sc).index(sf)] if has_skip else None
            if self._use_phase_up():
                # up2 + conv as one phase-decomposed low-res conv (exact;
                # `ops/phase_up.py`). Params come from the unfused path's
                # init, so the tree is identical and checkpoints interchange.
                from ...ops.phase_up import phase_upconv3x3
                from .utils import _resolve_pad
                p = self.get_variable('params', f'upconv_{i}_1')['conv']['conv']
                x = nn.elu(phase_upconv3x3(
                    x, skip, p['kernel'].astype(x.dtype),
                    p['bias'].astype(x.dtype), _resolve_pad(self.pad_mode)))
            else:
                x = [upsample2x(x, self.upsample_mode)]
                if has_skip:
                    x += [skip]
                x = jnp.concatenate(x, axis=-1)
                x = constrain_spatial(
                    ConvBlock(self.num_ch_dec[i], pad_mode=self.pad_mode, name=f'upconv_{i}_1')(x))

            if i in self.out_sc:
                out[i] = act(conv3x3(self.out_ch, pad_mode=self.pad_mode, name=f'outconv_{i}')(x))
        return out

    def _use_phase_up(self) -> bool:
        """Init always takes the unfused path so the param tree is canonical."""
        return (self.phase_up and not self.is_initializing()
                and self.upsample_mode == 'nearest')

    def _use_fused_stage(self, x: jnp.ndarray, i: int, has_skip: bool) -> bool:
        """Fused-kernel dispatch for one decoder stage (TPU apply only).

        Opt-in (SLOWTV_ENABLE_PALLAS_DEC): the fused stage measured only +1%
        on the KBR step (41.8 vs 41.5 imgs/s; the backward's per-tap col2im
        dots and the 6-row halo recompute eat the MXU win), so the default
        stays XLA until the backward is tightened. See `ops/pallas_decoder`.
        """
        if self.is_initializing() or not os.environ.get('SLOWTV_ENABLE_PALLAS_DEC'):
            return False
        from .utils import _resolve_pad
        if _resolve_pad(self.pad_mode) != 'reflect':
            return False  # The fused stage bakes reflect-pad convs.
        if has_skip or i not in self.out_sc or self.out_ch != 1:
            return False
        if self.upsample_mode != 'nearest' or self.out_act != 'sigmoid':
            return False
        backend = ('tpu' if os.environ.get('SLOWTV_FORCE_PALLAS_DEC')
                   else jax.default_backend())
        return decoder_stage_supported(x.shape, self.num_ch_dec[i], backend,
                                       itemsize=jnp.dtype(x.dtype).itemsize)
