"""View-synthesis reconstruction loss (min-reprojection + automasking).

Parity with `src/losses/reconstruction.py:13-126`:
- Min (or mean) reduction over support frames (`:43-44`).
- Static-pixel automask vs the identity reprojection, with an eps-scaled
  Gaussian tie-break on the static error (`:59-77`); the tie-break noise is
  threaded through an explicit JAX PRNG key (functional RNG).
- Optional explainability (multiply) / uncertainty (err·e^{-m}+m) masks
  (`:46-57`).

Shapes are NHWC; multiple support predictions are stacked on a leading axis
(n, b, h, w, c) and masks carry one channel per support frame (b, h, w, n).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import register
from ..ops import eps
from .photometric import DenseL1Error, DenseL2Error, PhotoError

__all__ = ['ReconstructionLoss']


@register(('img_recon', 'feat_recon', 'autoenc_recon'))
class ReconstructionLoss:
    """Reconstruction loss for synthesized views.

    :param loss_name: Photometric error type {ssim, l1, l2}.
    :param use_min: If True, reduce over views with min instead of mean.
    :param use_automask: If True, mask static pixels via identity reprojection.
    :param mask_name: Weighting mask {explainability, uncertainty, None}.
    """

    def __init__(self, loss_name: str = 'ssim', use_min: bool = False,
                 use_automask: bool = False, mask_name: Optional[str] = None):
        if mask_name not in {'explainability', 'uncertainty', None}:
            raise ValueError(f'Invalid mask type: {mask_name}')
        self.loss_name = loss_name
        self.use_min = use_min
        self.use_automask = use_automask
        self.mask_name = mask_name
        self._photo = {
            'ssim': PhotoError(weight_ssim=0.85),
            'l1': DenseL1Error(),
            'l2': DenseL2Error(),
        }[loss_name]

    def _reduce(self, err: jnp.ndarray) -> jnp.ndarray:
        """(b, h, w, n) -> (b, h, w, 1) over views."""
        fn = jnp.min if self.use_min else jnp.mean
        return fn(err, axis=-1, keepdims=True)

    def apply_mask(self, err: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Weight the per-view error (b, h, w, n) by the predicted mask."""
        if self.mask_name and mask is None:
            raise ValueError("Must provide a 'mask' when masking...")
        if self.mask_name == 'explainability':
            err = err * mask
        elif self.mask_name == 'uncertainty':
            err = err * jnp.exp(-mask) + mask
        return err

    def compute_photo(self, pred: jnp.ndarray, target: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Photometric error between predictions and a single target.

        :param pred: (n, b, h, w, c) or (b, h, w, c) warped support frames.
        :param target: (b, h, w, c) target image.
        :param mask: (b, h, w, n) optional weighting mask.
        :return: (b, h, w, 1) reduced photometric error.
        """
        if pred.ndim == 4:
            err = self._photo(pred, target)  # (b, h, w, 1)
        else:
            # The photometric errors accept the (n, b, ...) stack natively
            # (PhotoError fuses it into one Pallas launch on TPU; L1/L2
            # broadcast), so no vmap indirection here.
            err = self._photo(pred, target)  # (n, b, h, w, 1)
            err = jnp.moveaxis(err[..., 0], 0, -1)  # (b, h, w, n)
        err = self.apply_mask(err, mask)
        return self._reduce(err)

    def apply_automask(self, err: jnp.ndarray, source: jnp.ndarray, target: jnp.ndarray,
                       mask: Optional[jnp.ndarray], rng: jax.Array):
        """Monodepth2 static-pixel automask (ref `reconstruction.py:59-77`).

        The static (identity-reprojection) error depends only on the raw
        support/target images, not on depth — so when the batch is a
        scale-tiled stack (handlers concatenate `n_sc` scale copies onto the
        batch axis) it is computed once on the base batch and tiled, which is
        bitwise-identical and skips (n_sc-1)/n_sc of the full-res SSIM work.
        The tie-break noise is still drawn at the full tiled shape, so the
        per-scale tie-break independence matches the reference exactly.
        Convention: handlers pass the scale-tiled source whenever a predicted
        mask is present (then `m == b` and the tiling below is a no-op); an
        untiled source is only ever passed with `mask=None`, so `mask[:b]`
        never truncates a per-scale mask stack. Enforced by the assert.
        """
        m = err.shape[0]
        b = source.shape[1]
        assert m % b == 0, (m, b)
        assert mask is None or m == b, (m, b)
        err_static = self.compute_photo(source, target[:b],
                                        mask=None if mask is None else mask[:b])
        err_static = jnp.concatenate([err_static] * (m // b), axis=0)
        err_static = err_static + eps(err_static) * jax.random.normal(
            rng, err_static.shape, err_static.dtype)
        automask = err < err_static  # Warped reprojection wins -> moving pixel.
        return jnp.minimum(err, err_static), automask

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 source: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        """Compute the reconstruction loss.

        :param pred: (n, b, h, w, c) warped support frames (or (b, h, w, c)).
        :param target: (b, h, w, c) target image.
        :param source: (n, b, h, w, c) original (unwarped) support frames.
        :param mask: (b, h, w, n) optional weighting mask.
        :param rng: PRNG key for automask tie-breaking (required w/ automask).
        :return: (loss scalar, dict with optional 'automask' (b, h, w, 1)).
        """
        ld = {}
        err = self.compute_photo(pred, target, mask)
        if self.use_automask:
            if source is None:
                raise ValueError("Must provide the original 'source' images when automasking...")
            if rng is None:
                raise ValueError('Automasking requires an explicit PRNG key.')
            err, automask = self.apply_automask(err, source, target, mask, rng)
            ld['automask'] = automask
        return err.mean(), ld
