"""Minimal 5-stage feature encoder for sharding dry runs and tests.

The driver's `dryrun_multichip` validates *mesh semantics* — shardings,
collectives, the optax chain — not encoder realism. A resnet18-based dry-run
step took >9 min to cold-compile on a 1-core host (round-2 post-mortem);
this encoder is one strided conv per stage (~6 HLO convs total), so the full
KBR-style step graph compiles in seconds while exercising the identical
DP/psum paths. It satisfies the same contract as every other encoder
(feature maps at strides [2, 4, 8, 16, 32] + channels/reductions metadata),
so the decoders' skip wiring (ref `src/networks/decoders/monodepth.py:58-62`)
works unchanged. Not a reference component — test/dry-run infrastructure.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ['ToyEncoder', 'TOY_SPECS']


TOY_SPECS = {
    'toy': dict(channels=(8, 12, 16, 24, 32), reductions=(2, 4, 8, 16, 32)),
}


class ToyEncoder(nn.Module):
    """One 3x3/2 conv + ReLU per stage; returns 5 maps at strides 2..32."""
    channels: Sequence[int] = TOY_SPECS['toy']['channels']
    in_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        feats = []
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), (2, 2), padding=1, name=f'conv{i}')(x)
            x = nn.relu(x)
            feats.append(x)
        return feats
