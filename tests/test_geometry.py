"""Golden tests for ops.geometry vs torch re-derivations of the reference math.

Each torch "golden" below re-derives the formulas documented in
`src/tools/geometry.py` (cited per function) independently, then the JAX
implementation must agree to float32 tolerance.
"""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from slowtv_monodepth_tpu.ops import (
    T_from_AAt, T_from_Rt, T_from_qt, R_from_q, backproject_depth, blend_stereo,
    centre_crop_K, pad_K, project_points, resize_K, to_inv, to_log, to_scaled,
    view_synth,
)

RNG = np.random.default_rng(123)


def _rand_K(b=2, h=8, w=12):
    K = np.zeros((b, 4, 4), np.float32)
    K[:, 0, 0] = w * (0.9 + 0.2 * RNG.random(b))
    K[:, 1, 1] = h * (0.9 + 0.2 * RNG.random(b))
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    K[:, 2, 2] = 1
    K[:, 3, 3] = 1
    return K


def _rand_T(b=2, scale_r=0.1, scale_t=0.1):
    aa = (RNG.standard_normal((b, 3)) * scale_r).astype(np.float32)
    t = (RNG.standard_normal((b, 3)) * scale_t).astype(np.float32)
    return aa, t


def test_to_scaled_inv_log():
    disp = RNG.random((2, 4, 4, 1)).astype(np.float32)
    d_scaled, depth = to_scaled(jnp.asarray(disp), 0.1, 100)
    want = (1 / 0.1 - 1 / 100) * disp + 1 / 100
    np.testing.assert_allclose(np.asarray(d_scaled), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), 1 / want, rtol=1e-5)

    depth_arr = np.abs(RNG.standard_normal((2, 4, 4, 1))).astype(np.float32)
    depth_arr[0, 0, 0, 0] = 0.0
    inv = np.asarray(to_inv(jnp.asarray(depth_arr)))
    assert inv[0, 0, 0, 0] == 0.0
    nz = depth_arr > 0
    np.testing.assert_allclose(inv[nz], 1 / depth_arr[nz], rtol=1e-5)

    logd = np.asarray(to_log(jnp.asarray(depth_arr)))
    assert logd[0, 0, 0, 0] == 0.0
    np.testing.assert_allclose(logd[nz], np.log(depth_arr[nz]), rtol=1e-5, atol=1e-6)


def test_T_from_AAt_golden():
    """Rodrigues formula ref `geometry.py:181-209`: R = I + W sinθ + W²(1-cosθ)."""
    aa, t = _rand_T(b=4)
    got = np.asarray(T_from_AAt(jnp.asarray(aa), jnp.asarray(t)))

    for i in range(4):
        theta = np.linalg.norm(aa[i])
        axis = aa[i] / max(theta, 1e-12)
        x, y, z = axis
        W = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R = np.eye(3) + W * np.sin(theta) + W @ W * (1 - np.cos(theta))
        np.testing.assert_allclose(got[i, :3, :3], R, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[i, :3, 3], t[i], rtol=1e-6)
        np.testing.assert_allclose(got[i, 3], [0, 0, 0, 1], atol=1e-7)
        # Valid rotation.
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_T_from_qt_R_from_q():
    q = RNG.standard_normal((3, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = RNG.standard_normal((3, 3)).astype(np.float32)
    T = np.asarray(T_from_qt(jnp.asarray(q), jnp.asarray(t)))
    R = np.asarray(R_from_q(jnp.asarray(q)))
    for i in range(3):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(T[i, :3, :3], R[i], atol=1e-6)

    # Identity quaternion -> identity rotation.
    qi = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(R_from_q(qi))[0], np.eye(3), atol=1e-7)


def test_K_ops():
    K = jnp.asarray(_rand_K())
    Kc = np.asarray(centre_crop_K(K, (4, 6), (8, 12)))
    np.testing.assert_allclose(Kc[:, 0, 2], np.asarray(K)[:, 0, 2] * 6 / 12, rtol=1e-6)
    np.testing.assert_allclose(Kc[:, 0, 0], np.asarray(K)[:, 0, 0], rtol=1e-6)  # focal unchanged

    Kr = np.asarray(resize_K(K, (4, 6), (8, 12)))
    np.testing.assert_allclose(Kr[:, 0, 0], np.asarray(K)[:, 0, 0] * 0.5, rtol=1e-6)
    np.testing.assert_allclose(Kr[:, 1, 1], np.asarray(K)[:, 1, 1] * 0.5, rtol=1e-6)

    K3 = jnp.asarray(np.asarray(K)[:, :3, :3])
    K4 = np.asarray(pad_K(K3))
    np.testing.assert_allclose(K4, np.asarray(K), atol=1e-7)


def test_view_synth_vs_torch():
    """Full warp chain vs torch: D K⁻¹x -> T -> K -> grid_sample(border).

    Ref `geometry.py:285-391` (incl. the clamp(z, 0.1) guard and (w-1)/(h-1)
    grid normalization).
    """
    b, h, w = 2, 8, 12
    depth = (1.0 + 4.0 * RNG.random((b, h, w, 1))).astype(np.float32)
    img = RNG.standard_normal((b, h, w, 3)).astype(np.float32)
    K = _rand_K(b, h, w)
    aa, t = _rand_T(b, scale_r=0.05, scale_t=0.2)
    T = np.asarray(T_from_AAt(jnp.asarray(aa), jnp.asarray(t)))

    got_warp, got_depth, got_valid = view_synth(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(T), jnp.asarray(K))

    # ---- torch golden ----
    depth_t = torch.from_numpy(depth).permute(0, 3, 1, 2)
    img_t = torch.from_numpy(img).permute(0, 3, 1, 2)
    K_t, T_t = torch.from_numpy(K), torch.from_numpy(T)
    K_inv = K_t.inverse()

    grid_y, grid_x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing='ij')
    pix = torch.stack([grid_x.flatten(), grid_y.flatten(), torch.ones(h * w)]).float()[None]
    pts = K_inv[:, :3, :3] @ pix.repeat(b, 1, 1)
    pts = pts * depth_t.flatten(-2)
    pts = torch.cat([pts, torch.ones(b, 1, h * w)], 1)
    pts = T_t @ pts

    xyz = pts[:, :3]
    z = xyz[:, 2:].clamp(min=torch.finfo(torch.float32).eps)
    pp = (K_t[:, :3, :3] @ (xyz / z.clamp(min=0.1)))[:, :2]
    want_depth = z.view(b, 1, h, w)
    grid = pp.view(b, 2, h, w).permute(0, 2, 3, 1).clone()
    grid[..., 0] /= w - 1
    grid[..., 1] /= h - 1
    grid = (grid - 0.5) * 2
    want_valid = (grid.abs() < 1).all(dim=-1, keepdim=True)
    want_warp = F.grid_sample(img_t, grid, mode='bilinear', padding_mode='border',
                              align_corners=False).permute(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(got_depth), want_depth.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_valid), want_valid.numpy())
    np.testing.assert_allclose(np.asarray(got_warp), want_warp.numpy(), rtol=1e-3, atol=1e-4)


def test_view_synth_identity():
    """Identity pose: depth passes through; a constant image is unchanged.

    NOTE: the reference normalizes the grid by (w-1, h-1) but samples with
    align_corners=False (`geometry.py:347-349,364`), so identity pose is a
    sub-half-pixel stretch, NOT a pixel-exact identity — a constant image is
    the correct invariance check.
    """
    b, h, w = 1, 10, 14
    depth = np.full((b, h, w, 1), 5.0, np.float32)
    img = np.full((b, h, w, 3), 0.7, np.float32)
    K = _rand_K(b, h, w)
    T = np.eye(4, dtype=np.float32)[None]
    warp, dwarp, valid = view_synth(jnp.asarray(img), jnp.asarray(depth),
                                    jnp.asarray(T), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(warp), img, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dwarp), depth, rtol=1e-5)
    # Interior strictly valid; the extreme edges hit |grid| == 1 exactly.
    assert np.asarray(valid)[0, 1:-1, 1:-1, 0].all()


def test_backproject_project_roundtrip():
    b, h, w = 2, 6, 9
    depth = (1.0 + RNG.random((b, h, w, 1))).astype(np.float32)
    K = jnp.asarray(_rand_K(b, h, w))
    pts = backproject_depth(jnp.asarray(depth), jnp.linalg.inv(K))
    grid, d = project_points(pts, K, (h, w))
    np.testing.assert_allclose(np.asarray(d), depth, rtol=1e-4)
    # Projected grid must equal the identity sampling grid.
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    gx = 2 * (xs / (w - 1)) - 1
    gy = 2 * (ys / (h - 1)) - 1
    want = np.stack([gx, gy], -1)[None].repeat(b, 0)
    np.testing.assert_allclose(np.asarray(grid), want, atol=1e-4)


def test_blend_stereo():
    h, w = 6, 40
    dl = np.ones((1, h, w, 1), np.float32)
    dr = np.zeros((1, h, w, 1), np.float32)
    out = np.asarray(blend_stereo(jnp.asarray(dl), jnp.asarray(dr)))
    # Reference formula (`geometry.py:121-126`): mask_r*disp_l + mask_l*disp_r
    # + mask_mu*mean -> leftmost edge keeps disp_l, rightmost keeps disp_r.
    assert out[0, 0, 0, 0] == 1.0
    assert out[0, 0, -1, 0] == 0.0
    np.testing.assert_allclose(out[0, 0, w // 2, 0], 0.5, atol=1e-5)

    # Torch golden of the exact reference formula.
    import torch
    dl_t = torch.from_numpy(dl).permute(0, 3, 1, 2)
    dr_t = torch.from_numpy(dr).permute(0, 3, 1, 2)
    x = torch.meshgrid(torch.linspace(0, 1, w), torch.linspace(0, 1, h), indexing='xy')[0]
    x = x.expand(1, 1, -1, -1)
    mask_l = (20 * (x - 0.05)).clamp(0, 1)
    mask_r = mask_l.flip(dims=[-1])
    mask_mu = 1 - mask_l - mask_r
    want = mask_r * dl_t + mask_l * dr_t + mask_mu * (dl_t + dr_t) / 2
    np.testing.assert_allclose(out, want.permute(0, 2, 3, 1).numpy(), atol=1e-6)
