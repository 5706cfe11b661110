"""Fused SSIM+L1 photometric kernel: parity vs the pure-JAX PhotoError.

Interpreter-mode on CPU; the TPU path compiles the same Mosaic program and is
exercised by the KBR train-step perf drives. Reference semantics:
`losses/photometric.py` (itself differential-tested vs the torch reference).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowtv_monodepth_tpu.losses.photometric import PhotoError
from slowtv_monodepth_tpu.ops.pallas_photo import (photo_err_ssim,
                                                   photo_pallas_supported)

SHAPES = [
    (3, 16, 24, 3),    # Small multi-channel
    (2, 8, 13, 3),     # Single band, odd width
    (1, 104, 40, 1),   # Multi-band with truncated last band
    (1, 144, 130, 2),  # Width above one lane tile
]


@pytest.mark.parametrize('m,h,w,c', SHAPES)
def test_fwd_parity(m, h, w, c):
    rs = np.random.RandomState(42)
    x = jnp.asarray(rs.rand(m, h, w, c), jnp.float32)
    y = jnp.asarray(rs.rand(m, h, w, c), jnp.float32)
    ref = PhotoError(0.85)._call4(x, y)
    out = photo_err_ssim(x, y, 0.85)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize('m,h,w,c', SHAPES)
def test_vjp_parity(m, h, w, c):
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.rand(m, h, w, c), jnp.float32)
    y = jnp.asarray(rs.rand(m, h, w, c), jnp.float32)
    wgt = jnp.asarray(rs.rand(m, h, w, 1), jnp.float32)
    pe = PhotoError(0.85)
    gx_k, gy_k = jax.grad(
        lambda x, y: (photo_err_ssim(x, y, 0.85) * wgt).sum(), argnums=(0, 1))(x, y)
    gx_r, gy_r = jax.grad(
        lambda x, y: (pe._call4(x, y) * wgt).sum(), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy_k), np.asarray(gy_r), atol=2e-5)


def test_saturation_fwd_exact():
    """Identical images saturate SSIM (raw == 0): forward must still match.

    (The BACKWARD at exact clip ties is fp-sensitive: tie detection depends
    on pool summation order, so kernel and XLA may disagree by the tie mask
    at isolated pixels — bounded by |G*du|, irrelevant in training.)"""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 16, 24, 3), jnp.float32)
    out = photo_err_ssim(x, x, 0.85)
    ref = PhotoError(0.85)._call4(x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_photoerror_5d_dispatch():
    """PhotoError accepts the (n, b, ...) stack directly (no vmap)."""
    rs = np.random.RandomState(3)
    pe = PhotoError(0.85)
    pred = jnp.asarray(rs.rand(2, 3, 16, 24, 3), jnp.float32)
    target = jnp.asarray(rs.rand(3, 16, 24, 3), jnp.float32)
    out = pe(pred, target)
    ref = jax.vmap(pe._call4, in_axes=(0, None))(pred, target)
    assert out.shape == (2, 3, 16, 24, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dispatch_guards():
    assert not photo_pallas_supported((4, 384, 640, 3), 'cpu')
    assert photo_pallas_supported((4, 384, 640, 3), 'tpu')
    assert not photo_pallas_supported((4, 385, 640, 3), 'tpu')   # h % 8
    assert not photo_pallas_supported((1, 2000, 2600, 3), 'tpu')  # VMEM
