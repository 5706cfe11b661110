"""Pallas warp kernel: parity + gradients vs the XLA gather path.

Runs the kernel through the Pallas interpreter on the CPU test mesh
(`SLOWTV_FORCE_PALLAS_WARP` routes `grid_sample`'s border path through it),
comparing outputs and BOTH cotangents (grid and image) against the XLA
formulation that is itself golden-tested against torch.
"""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slowtv_monodepth_tpu.ops.pallas_warp import warp_bilinear_pallas  # noqa: E402
from slowtv_monodepth_tpu.ops.sample import grid_sample  # noqa: E402

RNG = np.random.default_rng(17)


def _rand_case(b=2, h=24, w=160, c=3, ho=16, wo=200):
    img = RNG.random((b, h, w, c), dtype=np.float32)
    fx = np.clip(RNG.random((b, ho, wo)) * 1.4 * (w - 1) - 0.2 * w,
                 0, w - 1).astype(np.float32)
    fy = np.clip(RNG.random((b, ho, wo)) * 1.4 * (h - 1) - 0.2 * h,
                 0, h - 1).astype(np.float32)
    grid = np.stack([(2 * fx + 1) / w - 1, (2 * fy + 1) / h - 1],
                    axis=-1).astype(np.float32)
    return img, fx, fy, grid


@pytest.mark.parametrize('shape', [
    (1, 16, 128, 1, 16, 128),   # single tile
    (1, 24, 160, 3, 24, 160),   # non-multiple width, RGB
    (2, 24, 160, 3, 16, 200),   # batched, output shape differs
])
def test_kernel_matches_xla(shape):
    b, h, w, c, ho, wo = shape
    img, fx, fy, grid = _rand_case(b, h, w, c, ho, wo)
    out, _, _ = warp_bilinear_pallas(jnp.asarray(img), jnp.asarray(fx),
                                     jnp.asarray(fy), interpret=True)
    want = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_grid_sample_dispatch_and_grads(monkeypatch):
    """Full grid_sample pallas path (custom_vjp): output + grid/image grads
    match the XLA path."""
    monkeypatch.setenv('SLOWTV_FORCE_PALLAS_WARP', '1')
    img, fx, fy, grid = _rand_case()
    imgj, gridj = jnp.asarray(img), jnp.asarray(grid)

    def loss(im, gr):
        o = grid_sample(im, gr)
        return (o * jnp.cos(o)).sum()

    val_p, (gi_p, gg_p) = jax.value_and_grad(loss, argnums=(0, 1))(imgj, gridj)

    monkeypatch.setenv('SLOWTV_DISABLE_PALLAS_WARP', '1')
    val_x, (gi_x, gg_x) = jax.value_and_grad(loss, argnums=(0, 1))(imgj, gridj)

    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x),
                               atol=1e-3, rtol=1e-3)


def test_derivative_outputs_match_finite_differences():
    img, fx, fy, _ = _rand_case(1, 16, 128, 1, 16, 128)
    imgj = jnp.asarray(img)
    out, ddx, ddy = warp_bilinear_pallas(imgj, jnp.asarray(fx),
                                         jnp.asarray(fy), interpret=True)
    eps = 1e-3
    h, w = img.shape[1:3]
    def off_int(a):  # FD across an integer coordinate straddles a corner.
        fr = a % 1
        return (fr > 5e-3) & (fr < 1 - 5e-3)

    for d, arr, lo_ok in ((ddx, fx, (fx > 1) & (fx < w - 2) & off_int(fx)),
                          (ddy, fy, (fy > 1) & (fy < h - 2) & off_int(fy))):
        bumped = np.clip(arr + eps, 0, None)
        if arr is fx:
            o2, _, _ = warp_bilinear_pallas(imgj, jnp.asarray(bumped),
                                            jnp.asarray(fy), interpret=True)
        else:
            o2, _, _ = warp_bilinear_pallas(imgj, jnp.asarray(fx),
                                            jnp.asarray(bumped), interpret=True)
        fd = (np.asarray(o2) - np.asarray(out)) / eps
        np.testing.assert_allclose(np.asarray(d)[lo_ok], fd[lo_ok], atol=5e-2)


def test_supported_predicate():
    from slowtv_monodepth_tpu.ops.pallas_warp import pallas_warp_supported
    assert pallas_warp_supported((4, 384, 640, 3), 'tpu')
    assert pallas_warp_supported((12, 384, 1216, 3), 'tpu')  # eval KITTI
    assert not pallas_warp_supported((4, 384, 640, 3), 'cpu')
    # Native 720p dispatches per channel; 1080p exceeds even one plane.
    assert pallas_warp_supported((4, 720, 1280, 3), 'tpu')
    assert not pallas_warp_supported((4, 1080, 1920, 3), 'tpu')


def test_per_channel_dispatch_matches(monkeypatch):
    """Images above the whole-stack VMEM budget split per channel."""
    from slowtv_monodepth_tpu.ops import pallas_warp as pw
    monkeypatch.setattr(pw, '_VMEM_IMG_BUDGET', 2 * 24 * 256 * 4 + 64)
    img, fx, fy, grid = _rand_case(1, 24, 160, 3, 16, 200)
    out, _, _ = pw.warp_bilinear_pallas(jnp.asarray(img), jnp.asarray(fx),
                                        jnp.asarray(fy), interpret=True)
    want = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_tile_boundary_coords_exact():
    """Pixels sampling exactly at tile boundaries (lx=127 -> x1 in the next
    column tile, ly=7 -> y1 in the next row tile, and the diagonal corner)
    match the XLA path bit-for-bit-ish."""
    b, h, w, c = 1, 32, 384, 3
    img = RNG.random((b, h, w, c), dtype=np.float32)
    # Dense fractional coords straddling every boundary: x around 127/128,
    # 255/256, w-1; y around 7/8, 15/16, h-1.
    xs = np.concatenate([np.linspace(126.25, 129.75, 20),
                         np.linspace(254.25, 257.75, 20),
                         np.linspace(w - 2.5, w - 1, 10),
                         np.linspace(0, 2, 14)])
    ys = np.concatenate([np.linspace(6.25, 8.75, 20),
                         np.linspace(14.25, 16.75, 20),
                         np.linspace(h - 2.5, h - 1, 14),
                         np.linspace(0, 2, 10)])
    fx = np.broadcast_to(xs[None, None, :], (b, 64, 64)).astype(np.float32)
    fy = np.broadcast_to(ys[None, :, None], (b, 64, 64)).astype(np.float32)
    out, ddx, ddy = warp_bilinear_pallas(jnp.asarray(img), jnp.asarray(fx),
                                         jnp.asarray(fy), interpret=True)
    grid = np.stack([(2 * fx + 1) / w - 1, (2 * fy + 1) / h - 1],
                    axis=-1).astype(np.float32)
    want = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    # Border derivative convention: zero at the far edges.
    edge_x = np.isclose(fx, w - 1)
    edge_y = np.isclose(fy, h - 1)
    assert np.abs(np.asarray(ddx)[edge_x]).max() == 0
    assert np.abs(np.asarray(ddy)[edge_y]).max() == 0


@pytest.mark.parametrize('c', [1, 2, 3, 4, 5])
def test_packed_bf16_matches_quantized_f32(c):
    """bf16 sources run the packed-plane kernel (`_kernel_packed`): bit-exact
    vs the f32 kernel on the bf16-quantized-then-widened image."""
    img, fx, fy, _ = _rand_case(2, 24, 160, c, 16, 200)
    imgj = jnp.asarray(img)
    ref = warp_bilinear_pallas(imgj.astype(jnp.bfloat16).astype(jnp.float32),
                               jnp.asarray(fx), jnp.asarray(fy), interpret=True)
    got = warp_bilinear_pallas(imgj.astype(jnp.bfloat16),
                               jnp.asarray(fx), jnp.asarray(fy), interpret=True)
    for name, r, g in zip(('out', 'ddx', 'ddy'), ref, got):
        assert g.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g), err_msg=name)


def test_grid_sample_bf16_dispatch(monkeypatch):
    """grid_sample on bf16 images: pallas (packed) and XLA fallback both warp
    the SAME quantized source; grads flow through the grid."""
    img, fx, fy, grid = _rand_case()
    imgb = jnp.asarray(img).astype(jnp.bfloat16)
    gridj = jnp.asarray(grid)

    monkeypatch.setenv('SLOWTV_FORCE_PALLAS_WARP', '1')
    out_pallas = grid_sample(imgb, gridj)
    g_pallas = jax.grad(lambda gr: (grid_sample(imgb, gr) ** 2).sum())(gridj)
    monkeypatch.setenv('SLOWTV_DISABLE_PALLAS_WARP', '1')
    out_xla = grid_sample(imgb, gridj)
    g_xla = jax.grad(lambda gr: (grid_sample(imgb, gr) ** 2).sum())(gridj)

    assert out_pallas.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=2e-3, rtol=1e-3)


def test_image_recon_warp_bf16_close_to_f32():
    """The `trainer.warp_bf16` recipe option shifts the photometric loss by no
    more than the bf16 source quantization (~2^-9 relative)."""
    from slowtv_monodepth_tpu.core import handlers as h
    from slowtv_monodepth_tpu.losses import ReconstructionLoss

    b, hh, ww = 2, 32, 64
    imgs = jnp.asarray(RNG.random((b, hh, ww, 3), dtype=np.float32))
    supp = jnp.stack([jnp.roll(imgs, 2, axis=2), jnp.roll(imgs, -2, axis=2)])
    Ts = jnp.broadcast_to(jnp.eye(4), (2, b, 4, 4))
    Ks = jnp.broadcast_to(jnp.asarray(
        [[0.58 * ww, 0, 0.5 * ww, 0], [0, 1.92 * hh, 0.5 * hh, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.0]], dtype=jnp.float32), (b, 4, 4))
    depths = {0: 2 + jnp.asarray(RNG.random((b, hh, ww, 1), dtype=np.float32))}
    crit = ReconstructionLoss(use_min=True, use_automask=True)
    rng = jax.random.PRNGKey(0)

    l32, _ = h.image_recon(crit, depths, None, imgs, supp, Ts, Ks, rng=rng)
    l16, _ = h.image_recon(crit, depths, None, imgs, supp, Ts, Ks, rng=rng,
                           warp_bf16=True)
    np.testing.assert_allclose(float(l32), float(l16), rtol=2e-2)
    assert float(l32) != float(l16)  # It IS a different quantization.
