"""slowtv_monodepth_tpu: TPU-native self-supervised monocular depth estimation.

A from-scratch JAX/Flax/XLA/Pallas framework with the capabilities of
`jspenmar/slowtv_monodepth` (Kick Back & Relax, ICCV 2023 + the MDE benchmark,
TMLR 2022), re-designed TPU-first:

- Pure-functional train/eval steps jitted over a `jax.sharding.Mesh`.
- NHWC image layout throughout (TPU conv-native).
- Gather-based bilinear warping (``ops.sample``) matching the reference's
  ``F.grid_sample(mode='bilinear', padding_mode='border', align_corners=False)``
  semantics exactly, with an optional fused Pallas kernel for the hot path.
- Data-parallel batches sharded over ICI, gradients reduced by XLA collectives.

Reference layer map: see /root/repo/SURVEY.md. Citations `path:line` in
docstrings point into the PyTorch reference for behavioural parity checks.
"""
import logging

from .registry import (
    DATA_REG, DEC_REG, LOSS_REG, NET_REG, PRED_REG, SCHED_REG, register,
    trigger_datasets, trigger_decoders, trigger_losses, trigger_networks, trigger_preds,
    trigger_scheds,
)

__version__ = '0.1.0'

LOGGER = logging.getLogger('slowtv_tpu')
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter('[%(asctime)s %(name)s %(levelname)s] %(message)s'))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO)

__all__ = [
    'LOGGER', 'register',
    'NET_REG', 'LOSS_REG', 'DATA_REG', 'PRED_REG', 'DEC_REG', 'SCHED_REG',
    'trigger_networks', 'trigger_losses', 'trigger_datasets', 'trigger_decoders', 'trigger_preds',
    'trigger_scheds',
]
