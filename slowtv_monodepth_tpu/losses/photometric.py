"""Dense photometric errors (NHWC, pure functions).

Behavioural parity with `src/losses/photometric.py`: SSIM with a 3x3
average-pool over reflect-padded inputs and eps (0.01², 0.03²)
(`photometric.py:23-51`), and the Monodepth photometric error
0.85·SSIM + 0.15·L1 (`photometric.py:54-88`).

TPU notes: the pooling lowers to `lax.reduce_window`, which XLA fuses with the
surrounding elementwise math into one VPU kernel; everything stays NHWC.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..ops import eps

__all__ = ['DenseL1Error', 'DenseL2Error', 'SSIMError', 'PhotoError', 'avg_pool3x3_reflect']


def avg_pool3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pooling with reflect padding (NHWC)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    out = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), 'VALID')
    return out / 9.0


class DenseL1Error:
    """Dense L1 averaged over channels -> (b, h, w, 1). Ref `photometric.py:11-14`."""

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(pred - target).mean(axis=-1, keepdims=True)


class DenseL2Error:
    """Dense L2 distance over channels -> (b, h, w, 1). Ref `photometric.py:17-20`."""

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        sq = ((pred - target) ** 2).sum(axis=-1, keepdims=True)
        return jnp.sqrt(jnp.clip(sq, min=eps(pred)))


class SSIMError:
    """Structural similarity error per channel -> (b, h, w, c). Ref `photometric.py:23-51`."""

    eps1: float = 0.01 ** 2
    eps2: float = 0.03 ** 2

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        mu_x = avg_pool3x3_reflect(pred)
        mu_y = avg_pool3x3_reflect(target)

        sig_x = avg_pool3x3_reflect(pred ** 2) - mu_x ** 2
        sig_y = avg_pool3x3_reflect(target ** 2) - mu_y ** 2
        sig_xy = avg_pool3x3_reflect(pred * target) - mu_x * mu_y

        num = (2 * mu_x * mu_y + self.eps1) * (2 * sig_xy + self.eps2)
        den = (mu_x ** 2 + mu_y ** 2 + self.eps1) * (sig_x + sig_y + self.eps2)
        return jnp.clip((1 - num / den) / 2, 0.0, 1.0)


class PhotoError:
    """Weighted SSIM + L1 photometric error -> (b, h, w, 1). Ref `photometric.py:54-88`.

    Accepts (b, h, w, c) or (n, b, h, w, c) predictions against a shared
    (b, h, w, c) target. On TPU f32 the whole pipeline (5 pools + SSIM
    formula + L1 + channel mean) runs as ONE fused Pallas launch with an
    analytic VJP (`ops/pallas_photo.py`) instead of XLA's ~35 full-res
    HBM round-trips.
    """

    def __init__(self, weight_ssim: float = 0.85):
        if not (0 <= weight_ssim <= 1):
            raise ValueError(f'Invalid SSIM weight. ({weight_ssim} vs. [0, 1])')
        self.weight_ssim = weight_ssim
        self.weight_l1 = 1 - weight_ssim
        self.ssim = SSIMError() if self.weight_ssim > 0 else None
        self.l1 = DenseL1Error() if self.weight_l1 > 0 else None

    def _fused_ok(self, pred: jnp.ndarray) -> bool:
        import os

        import jax

        from ..ops.dispatch import pallas_disabled, spatial_photo_context
        from ..ops.pallas_photo import photo_pallas_supported
        if pallas_disabled('photo'):
            return False
        if self.ssim is None or pred.dtype != jnp.float32:
            return False
        shape = pred.shape if pred.ndim == 4 else (
            (pred.shape[0] * pred.shape[1],) + pred.shape[2:])
        ctx = spatial_photo_context()
        if ctx is not None:
            # Spatial-sharded step: the kernel only stays alive through the
            # batch-resharding shard_map (`ops/pallas_photo.py:
            # _photo_err_spatial`); if the flattened batch does not divide
            # the mesh, use the XLA path (which GSPMD partitions with halos).
            mesh, da, sa = ctx
            n = 1
            for ax in (da, sa):
                n *= int(mesh.shape[ax]) if ax in mesh.axis_names else 1
            if shape[0] % n:
                return False
        backend = ('tpu' if os.environ.get('SLOWTV_FORCE_PALLAS_PHOTO')
                   else jax.default_backend())
        return photo_pallas_supported(shape, backend)

    def _call4(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = jnp.zeros(pred.shape[:-1] + (1,), pred.dtype)
        if self.ssim:
            loss = loss + self.weight_ssim * self.ssim(pred, target).mean(axis=-1, keepdims=True)
        if self.l1:
            loss = loss + self.weight_l1 * self.l1(pred, target)
        return loss

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self._fused_ok(pred):
            from ..ops.pallas_photo import photo_err_ssim
            if pred.ndim == 5:
                n = pred.shape[0]
                flat = pred.reshape((-1,) + pred.shape[2:])
                tgt = jnp.broadcast_to(target, (n,) + target.shape).reshape(flat.shape)
                return photo_err_ssim(flat, tgt, self.weight_ssim).reshape(
                    pred.shape[:-1] + (1,))
            return photo_err_ssim(pred, target, self.weight_ssim)
        if pred.ndim == 5:
            import jax
            return jax.vmap(self._call4, in_axes=(0, None))(pred, target)
        return self._call4(pred, target)
