"""Golden tests for losses vs torch re-derivations of the reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from slowtv_monodepth_tpu.losses import (
    MaskReg, OccReg, PhotoError, ReconstructionLoss, RegressionLoss, SSIMError, SmoothReg,
)

RNG = np.random.default_rng(7)


def _nhwc(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def _torch_ssim(pred, target):
    """Reference SSIM: 3x3 avg pool over reflect pad, eps (.01², .03²)
    (`src/losses/photometric.py:23-51`)."""
    pool, refl = nn.AvgPool2d(3, 1), nn.ReflectionPad2d(1)
    x, y = refl(pred), refl(target)
    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x ** 2) - mu_x ** 2
    sig_y = pool(y ** 2) - mu_y ** 2
    sig_xy = pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sig_xy + 0.03 ** 2)
    den = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sig_x + sig_y + 0.03 ** 2)
    return ((1 - num / den) / 2).clamp(0, 1)


def test_ssim_matches_torch():
    pred = RNG.random((2, 10, 12, 3)).astype(np.float32)
    target = RNG.random((2, 10, 12, 3)).astype(np.float32)
    got = np.asarray(SSIMError()(jnp.asarray(pred), jnp.asarray(target)))
    want = _torch_ssim(_nhwc(pred), _nhwc(target)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_photo_error_matches_torch():
    pred = RNG.random((2, 10, 12, 3)).astype(np.float32)
    target = RNG.random((2, 10, 12, 3)).astype(np.float32)
    got = np.asarray(PhotoError(0.85)(jnp.asarray(pred), jnp.asarray(target)))
    ssim = _torch_ssim(_nhwc(pred), _nhwc(target)).mean(dim=1, keepdim=True)
    l1 = (_nhwc(pred) - _nhwc(target)).abs().mean(dim=1, keepdim=True)
    want = (0.85 * ssim + 0.15 * l1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reconstruction_min_reduce():
    """Min-reprojection over support frames (`reconstruction.py:43-44`)."""
    n, b, h, w = 3, 2, 8, 10
    pred = RNG.random((n, b, h, w, 3)).astype(np.float32)
    target = RNG.random((b, h, w, 3)).astype(np.float32)

    crit = ReconstructionLoss(loss_name='l1', use_min=True)
    loss, ld = crit(jnp.asarray(pred), jnp.asarray(target))

    per_view = np.abs(pred - target[None]).mean(-1)  # (n, b, h, w)
    want = per_view.min(axis=0).mean()
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    crit_mean = ReconstructionLoss(loss_name='l1', use_min=False)
    loss_mean, _ = crit_mean(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(loss_mean), per_view.mean(axis=0).mean(), rtol=1e-5)


def test_reconstruction_automask():
    """Static pixels (identity error < warped error) get masked out."""
    n, b, h, w = 2, 1, 6, 8
    target = RNG.random((b, h, w, 3)).astype(np.float32)
    # Source == target -> static error ~0 everywhere -> automask ~all False.
    source = np.stack([target] * n)
    pred = (target[None] + 0.5).astype(np.float32).repeat(n, 0)

    crit = ReconstructionLoss(loss_name='l1', use_min=True, use_automask=True)
    loss, ld = crit(jnp.asarray(pred), jnp.asarray(target), source=jnp.asarray(source),
                    rng=jax.random.PRNGKey(0))
    automask = np.asarray(ld['automask'])
    assert automask.mean() < 0.01  # Everything static.
    assert float(loss) < 1e-5  # Static error ~0 dominates the min.

    # Now make the warped prediction perfect and the source useless.
    pred2 = np.stack([target] * n)
    source2 = (target[None] + 0.5).astype(np.float32).repeat(n, 0)
    loss2, ld2 = crit(jnp.asarray(pred2), jnp.asarray(target), source=jnp.asarray(source2),
                      rng=jax.random.PRNGKey(0))
    assert np.asarray(ld2['automask']).mean() > 0.99


def test_regression_berhu_matches_torch():
    pred = (5 * RNG.random((2, 8, 10, 1))).astype(np.float32)
    target = (5 * RNG.random((2, 8, 10, 1))).astype(np.float32)
    mask = (RNG.random((2, 8, 10, 1)) > 0.3).astype(np.float32)

    crit = RegressionLoss('berhu')
    loss, ld = crit(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))

    # Torch golden (ref `regression.py:23-37`).
    p, t, m = map(torch.from_numpy, (pred, target, mask))
    diff = (p - t).abs()
    delta = 0.2 * diff.max()
    diff_delta = (diff ** 2 + delta ** 2) / (2 * delta + torch.finfo(torch.float32).eps)
    err = m * torch.where(diff <= delta, diff, diff_delta)
    want = err.sum() / m.sum()
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_regression_invert():
    pred = (1 + 4 * RNG.random((1, 4, 4, 1))).astype(np.float32)
    target = (1 + 4 * RNG.random((1, 4, 4, 1))).astype(np.float32)
    crit = RegressionLoss('l1', invert=True)
    loss, _ = crit(jnp.asarray(pred), jnp.asarray(target))
    want = np.abs(1 / pred - 1 / target).mean()
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_smooth_reg_matches_torch():
    """Edge-aware first-order smoothness (`smooth.py:52-97`) incl. mean-norm."""
    disp = RNG.random((2, 8, 10, 1)).astype(np.float32)
    img = RNG.random((2, 8, 10, 3)).astype(np.float32)

    loss, ld = SmoothReg(use_edges=True)(jnp.asarray(disp), jnp.asarray(img))

    d, i = _nhwc(disp), _nhwc(img)
    d = d / d.mean(dim=(2, 3), keepdim=True).clamp(min=torch.finfo(torch.float32).eps)

    def grad(x, ch_mean=False):
        b, c, h, w = x.shape
        dx = torch.cat([(x[..., :, :-1] - x[..., :, 1:]).abs(), x.new_zeros(b, c, h, 1)], -1)
        dy = torch.cat([(x[..., :-1, :] - x[..., 1:, :]).abs(), x.new_zeros(b, c, 1, w)], -2)
        if ch_mean:
            dx, dy = dx.mean(1, keepdim=True), dy.mean(1, keepdim=True)
        return dx, dy

    ddx, ddy = grad(d)
    idx, idy = grad(i, ch_mean=True)
    want = (ddx * (-idx).exp()).mean() + (ddy * (-idy).exp()).mean()
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-4)

    # Constant disparity -> zero loss.
    const = jnp.ones((1, 8, 10, 1))
    loss0, _ = SmoothReg(use_edges=True)(const, jnp.asarray(img[:1]))
    assert abs(float(loss0)) < 1e-6


def test_occ_and_mask_reg():
    x = RNG.random((2, 6, 8, 1)).astype(np.float32)
    loss, _ = OccReg()(jnp.asarray(x))
    np.testing.assert_allclose(float(loss), x.mean(), rtol=1e-6)
    loss_inv, _ = OccReg(invert=True)(jnp.asarray(x))
    np.testing.assert_allclose(float(loss_inv), -x.mean(), rtol=1e-6)

    m = np.clip(RNG.random((2, 6, 8, 2)), 0.05, 0.95).astype(np.float32)
    loss_m, _ = MaskReg()(jnp.asarray(m))
    want = F.binary_cross_entropy(torch.from_numpy(m), torch.ones_like(torch.from_numpy(m)))
    np.testing.assert_allclose(float(loss_m), float(want), rtol=1e-4)
