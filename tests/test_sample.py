"""Golden tests: ops.sample.grid_sample vs torch.nn.functional.grid_sample.

The reference's hot op is `F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=False)` (`src/tools/geometry.py:364`);
warping fidelity defines the loss, so we require near-exact agreement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slowtv_monodepth_tpu.ops import grid_sample


def _rand_case(rng, b=2, h=13, w=17, c=3, gh=11, gw=9, scale=1.5):
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    grid = (rng.random((b, gh, gw, 2)).astype(np.float32) * 2 - 1) * scale
    return img, grid


def _torch_ref(img, grid, padding_mode):
    img_t = torch.from_numpy(img).permute(0, 3, 1, 2)
    grid_t = torch.from_numpy(grid)
    out = F.grid_sample(img_t, grid_t, mode='bilinear',
                        padding_mode=padding_mode, align_corners=False)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize('padding_mode', ['border', 'zeros'])
@pytest.mark.parametrize('scale', [0.8, 1.0, 1.5, 3.0])
def test_matches_torch(padding_mode, scale):
    rng = np.random.default_rng(42)
    img, grid = _rand_case(rng, scale=scale)
    want = _torch_ref(img, grid, padding_mode)
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exact_corners_and_center():
    """Sampling at exact pixel centers reproduces the image."""
    rng = np.random.default_rng(0)
    b, h, w, c = 1, 8, 6, 2
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    gx = (2 * xs + 1) / w - 1  # Inverse of the align_corners=False mapping.
    gy = (2 * ys + 1) / h - 1
    grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, img, rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    """Both image and grid receive non-trivial gradients; border clamp zeros the
    grid gradient far outside the image (torch parity)."""
    rng = np.random.default_rng(1)
    img, grid = _rand_case(rng, scale=0.9)
    img_j, grid_j = jnp.asarray(img), jnp.asarray(grid)

    def loss_fn(i, g):
        return (grid_sample(i, g) ** 2).sum()

    di, dg = jax.grad(loss_fn, argnums=(0, 1))(img_j, grid_j)
    assert float(jnp.abs(di).sum()) > 0
    assert float(jnp.abs(dg).sum()) > 0

    far_grid = jnp.full_like(grid_j, 5.0)
    _, dg_far = jax.grad(loss_fn, argnums=(0, 1))(img_j, far_grid)
    np.testing.assert_allclose(np.asarray(dg_far), 0.0, atol=1e-7)


def test_grad_matches_torch():
    rng = np.random.default_rng(7)
    img, grid = _rand_case(rng, b=1, h=7, w=9, c=2, gh=5, gw=4, scale=1.2)

    img_t = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    grid_t = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(img_t, grid_t, mode='bilinear', padding_mode='border', align_corners=False)
    out.sum().backward()
    want_di = img_t.grad.permute(0, 2, 3, 1).numpy()
    want_dg = grid_t.grad.numpy()

    def loss_fn(i, g):
        return grid_sample(i, g).sum()

    di, dg = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(di), want_di, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg), want_dg, rtol=1e-4, atol=1e-4)
