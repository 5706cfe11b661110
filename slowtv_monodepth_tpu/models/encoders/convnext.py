"""ConvNeXt feature encoders (Flax, NHWC) with timm `features_only` semantics.

The KBR flagship uses `convnext_base` (depth) + `convnext_tiny` (pose)
(`cfg/kbr/default.yaml` net block). Stage outputs at strides [4, 8, 16, 32].
Block structure follows timm's ConvNeXt (dwconv 7x7 -> LN -> pwconv x4 ->
GELU -> pwconv -> layer-scale gamma -> residual); NHWC means the LN/MLP run
natively on the channel-last axis, which is exactly the layout the MXU wants
for the two pointwise matmuls.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pallas_dwconv import depthwise_conv

__all__ = ['ConvNeXtEncoder', 'CONVNEXT_SPECS']


class _DepthwiseConv(nn.Module):
    """7x7 depthwise conv with `nn.Conv(feature_group_count=dim)` param
    layout (kernel (k, k, 1, dim), bias (dim,)) so checkpoints interchange.

    Set SLOWTV_ENABLE_PALLAS_DWCONV=1 to dispatch to the Pallas kernel
    (`ops/pallas_dwconv`). Measured on v5e: the kernel bodies are roofline-
    fine, but one pallas_call per dwconv means ~108 launches per KBR step and
    the per-launch overhead makes the FULL STEP slower (131.5 -> 140.4 ms)
    than XLA's in-context fused dwconvs — so the default stays XLA. Only
    once-per-step mega-kernels (the warp, `ops/pallas_warp.py`) amortize
    launch overhead on this runtime.
    """
    dim: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os
        # Master params always f32 (matches flax nn.Conv's param_dtype even
        # when the block runs in bf16); cast to the activation dtype per call.
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, 1, self.dim), jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.dim,), jnp.float32)
        k = k.astype(x.dtype)
        b = b.astype(x.dtype)
        if os.environ.get('SLOWTV_ENABLE_PALLAS_DWCONV'):
            return depthwise_conv(x, k, b)
        import jax.lax as lax
        return lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=self.dim) + b


CONVNEXT_SPECS = {
    'convnext_atto': dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320),
                          channels=(40, 80, 160, 320), reductions=(4, 8, 16, 32)),
    'convnext_femto': dict(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384),
                           channels=(48, 96, 192, 384), reductions=(4, 8, 16, 32)),
    'convnext_pico': dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512),
                          channels=(64, 128, 256, 512), reductions=(4, 8, 16, 32)),
    'convnext_nano': dict(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640),
                          channels=(80, 160, 320, 640), reductions=(4, 8, 16, 32)),
    'convnext_tiny': dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                          channels=(96, 192, 384, 768), reductions=(4, 8, 16, 32)),
    'convnext_small': dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768),
                           channels=(96, 192, 384, 768), reductions=(4, 8, 16, 32)),
    'convnext_base': dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                          channels=(128, 256, 512, 1024), reductions=(4, 8, 16, 32)),
    'convnext_large': dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536),
                           channels=(192, 384, 768, 1536), reductions=(4, 8, 16, 32)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    ls_init: float = 1e-6
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._use_fused(x):
            # Whole block in ONE Pallas launch (`ops/pallas_convnext`).
            # Params are created by the unfused path during init, so the
            # tree is identical and checkpoints interchange.
            # OPT-IN (SLOWTV_ENABLE_PALLAS_CONVNEXT) - NEGATIVE RESULT: with
            # honest timing (tunnel-latency-corrected; see verify SKILL.md),
            # XLA's in-context ConvNeXt block is already near its practical
            # floor. Measured full KBR step: bf16 fused loses ~2x on the
            # backward; f32 fused 26.3 vs 27.5 imgs/s. Isolated-graph wins
            # (f32 dwconv-bwd 12.8 ms -> 0.57 ms at (8,24,40,512)) do not
            # survive XLA's whole-graph fusion. Kept as documented evidence
            # + a base for future Mosaic toolchains.
            p = self.variables['params']
            dw, norm = p['conv_dw'], p['norm']
            fc1, fc2 = p['mlp_fc1'], p['mlp_fc2']
            from ...ops.pallas_convnext import fused_convnext_block
            return fused_convnext_block(
                x, dw['kernel'][:, :, 0, :], dw['bias'],
                norm['scale'], norm['bias'], fc1['kernel'], fc1['bias'],
                fc2['kernel'], fc2['bias'], p['gamma'],
                approximate=self.gelu_approx)

        shortcut = x
        # Depthwise 7x7 (Pallas kernel on TPU; same param tree as nn.Conv).
        x = _DepthwiseConv(self.dim, name='conv_dw')(x)
        x = nn.LayerNorm(epsilon=1e-6, name='norm')(x)
        x = nn.Dense(4 * self.dim, name='mlp_fc1')(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(self.dim, name='mlp_fc2')(x)
        gamma = self.param('gamma', nn.initializers.constant(self.ls_init), (self.dim,))
        return shortcut + gamma * x

    def _use_fused(self, x: jnp.ndarray) -> bool:
        import os
        force = os.environ.get('SLOWTV_FORCE_PALLAS_CONVNEXT')
        if self.is_initializing() or not (
                force or os.environ.get('SLOWTV_ENABLE_PALLAS_CONVNEXT')):
            return False
        if x.dtype != jnp.float32 or (self.dim < 512 and not force):
            return False
        from ...ops.pallas_convnext import convnext_block_supported
        backend = 'tpu' if force else jax.default_backend()
        return convnext_block_supported(x.shape, self.dim, backend)


class ConvNeXtEncoder(nn.Module):
    """ConvNeXt backbone returning 4 feature maps at strides [4, 8, 16, 32].

    `gelu_approx=True` swaps the exact-erf GELU for the tanh approximation
    (max |delta| ~3e-3 on activations). On the v5e the erf+exp transcendental
    chain costs ~1.5 ms per stage-0-volume block fwd+bwd (measured), so the
    tanh form saves ~15% of the whole KBR train step; training quality is
    unaffected (the two forms are interchangeable in practice), but weight
    *import parity* tests use the exact default.

    `remat` applies `jax.checkpoint` per block — math-identical, trades HBM
    activation traffic for recompute FLOPs:

    - ``'dots'``: save matmul/conv outputs, rematerialize the elementwise
      chains (LN stats, GELU) — the standard "cheap to recompute, expensive
      to store" policy.
    - ``'full'``: save only block inputs; recompute everything in the bwd.
    """
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    in_chans: int = 3
    gelu_approx: bool = False
    remat: str = ''

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        del train  # No batch statistics; kept for the encoder interface.
        block_cls = ConvNeXtBlock
        if self.remat == 'dots':
            block_cls = nn.remat(
                ConvNeXtBlock, policy=jax.checkpoint_policies.checkpoint_dots)
        elif self.remat == 'full':
            block_cls = nn.remat(ConvNeXtBlock)
        elif self.remat:
            raise KeyError(f"Invalid remat policy '{self.remat}' "
                           "(expected '', 'dots' or 'full').")
        feats = []
        # Stem: 4x4/4 conv + LN.
        x = nn.Conv(self.dims[0], (4, 4), (4, 4), name='stem_conv')(x)
        x = nn.LayerNorm(epsilon=1e-6, name='stem_norm')(x)

        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f'stage{stage}_ds_norm')(x)
                x = nn.Conv(self.dims[stage], (2, 2), (2, 2), name=f'stage{stage}_ds_conv')(x)
            for i in range(self.depths[stage]):
                x = block_cls(self.dims[stage], gelu_approx=self.gelu_approx,
                              name=f'stage{stage}_block{i}')(x)
            feats.append(x)
        return feats
