"""Camera geometry: depth conversions, pose/intrinsics math, view synthesis.

JAX/NHWC re-design of the reference's compute core (`src/tools/geometry.py`).
Numerics intentionally match the reference exactly (clamps, eps, normalization
conventions) since they define the published results:

- `to_scaled` ref `geometry.py:62-76`, `to_log` `:79-83`, `to_inv` `:86-90`.
- `blend_stereo` ref `geometry.py:93-129`.
- Pose math `T_from_AAt` (Rodrigues) ref `geometry.py:181-209` etc.
- `backproject_depth`/`project_points`/`view_synth` ref `geometry.py:285-391`,
  including the `clamp(z, min=0.1)` projection guard and the strict
  `|grid| < 1` validity mask.

TPU-first departures from the reference:
- No stateful modules with precomputed grid buffers: the pixel grid is a
  traced constant XLA hoists out of the loop.
- Points are (b, n, 3|4) row-vector layout so the projection is a single
  batched (n, 3) x (3, 3) matmul feeding the MXU.
- `view_synth` is a pure function over static shapes; under `jit` the
  backproject->transform->project->gather chain fuses into a couple of
  kernels (and has a Pallas fused variant for the training loss).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .ops import eps, eye_like
from .sample import grid_sample

__all__ = [
    'to_scaled', 'to_log', 'to_inv', 'blend_stereo',
    'decompose_AA', 'R_from_q', 'T_from_Rt', 'T_from_AAt', 'T_from_qt',
    'centre_crop_K', 'resize_K', 'pad_K',
    'pixel_grid', 'backproject_depth', 'project_points', 'view_synth',
    'extract_edges',
]


# DEPTH CONVERSIONS
# -----------------------------------------------------------------------------
def to_scaled(disp: jnp.ndarray, min: float = 0.01, max: Optional[float] = 100):  # noqa: A002
    """Sigmoid disparity [0, 1] -> (scaled disparity, scaled depth).

    Ref `geometry.py:62-76`: disp' = (1/min - 1/max)*disp + 1/max.
    """
    if min <= 0:
        raise ValueError(f'Min depth must be greater than 0. ({min})')
    if max and (max < min):
        raise ValueError(f'Max depth must be greater than min. ({max} vs. {min})')
    i_max, i_min = 1.0 / min, (1.0 / max) if max else 0.0
    disp = (i_max - i_min) * disp + i_min
    return disp, to_inv(disp)


def to_log(depth: jnp.ndarray) -> jnp.ndarray:
    """Linear depth -> log depth, zeroed where depth <= 0 (ref `:79-83`)."""
    return (depth > 0) * jnp.log(jnp.clip(depth, min=eps(depth)))


def to_inv(depth: jnp.ndarray) -> jnp.ndarray:
    """Linear depth -> disparity, zeroed where depth <= 0 (ref `:86-90`)."""
    return (depth > 0) / jnp.clip(depth, min=eps(depth))


def blend_stereo(disp_l: jnp.ndarray, disp_r: jnp.ndarray) -> jnp.ndarray:
    """Monodepth stereo disparity blending (ref `geometry.py:93-129`).

    5% leftmost pixels from the right disparity, 5% rightmost from the left,
    smooth ramp + mean elsewhere. NHWC: (*, h, w, c).
    """
    if disp_l.shape != disp_r.shape:
        raise ValueError(f'Non-matching shapes. ({disp_l.shape} vs. {disp_r.shape})')
    w = disp_l.shape[-2]
    x = jnp.linspace(0.0, 1.0, w, dtype=disp_l.dtype)[:, None]  # (w, 1)

    mask_l = jnp.clip(20 * (x - 0.05), 0.0, 1.0)
    mask_r = mask_l[::-1]
    mask_mu = 1.0 - mask_l - mask_r

    disp_mu = (disp_l + disp_r) / 2
    return mask_r * disp_l + mask_l * disp_r + mask_mu * disp_mu
# -----------------------------------------------------------------------------


# POSE MATH
# -----------------------------------------------------------------------------
def decompose_AA(aa: jnp.ndarray):
    """Axis-angle (*, 3) -> (axis (*, 3), angle (*, 1)) (ref `:135-140`)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.clip(angle, min=eps(angle))
    return axis, angle


def R_from_q(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (*, 4) as (w, x, y, z) -> rotation matrix (*, 3, 3) (ref `:143-159`)."""
    if q.shape[-1] != 4:
        raise ValueError(f'Incorrect quaternion shape. ({q.shape} vs. (*, 4))')
    w, x, y, z = jnp.split(q, 4, axis=-1)
    rows = [
        jnp.concatenate([1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w], axis=-1),
        jnp.concatenate([2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w], axis=-1),
        jnp.concatenate([2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def T_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotation (*, 3, 3) + translation (*, 3) -> transform (*, 4, 4) (ref `:162-178`)."""
    if R.ndim < 2 or R.shape[-2:] != (3, 3):
        raise ValueError(f'Incorrect R shape. ({R.shape} vs. (*, 3, 3))')
    if t.shape[-1] != 3:
        raise ValueError(f'Incorrect t shape. ({t.shape} vs. (*, 3))')
    if R.shape[:-2] != t.shape[:-1]:
        raise ValueError(f'Non-matching shapes. ({R.shape} vs. {t.shape})')
    T = eye_like(jnp.zeros(R.shape[:-2] + (4, 4), R.dtype))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def T_from_AAt(aa: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle + translation -> (*, 4, 4) transform via Rodrigues (ref `:181-209`)."""
    if aa.shape[-1] != 3 or t.shape[-1] != 3 or aa.shape != t.shape:
        raise ValueError(f'Incorrect shapes. ({aa.shape}, {t.shape} vs. (*, 3))')

    axis, angle = decompose_AA(aa)
    x, y, z = jnp.split(axis, 3, axis=-1)
    zr = jnp.zeros_like(x)
    W = jnp.stack([
        jnp.concatenate([zr, -z, y, zr], axis=-1),
        jnp.concatenate([z, zr, -x, zr], axis=-1),
        jnp.concatenate([-y, x, zr, zr], axis=-1),
        jnp.concatenate([zr, zr, zr, zr], axis=-1),
    ], axis=-2)  # (*, 4, 4) skew-symmetric (padded).

    angle = angle[..., None]  # (*, 1, 1)
    T = eye_like(W) + W * jnp.sin(angle) + (W @ W) * (1 - jnp.cos(angle))
    return T.at[..., :3, 3].set(t)


def T_from_qt(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Quaternion + translation -> (*, 4, 4) transform (ref `:212-226`)."""
    return T_from_Rt(R_from_q(q), t)
# -----------------------------------------------------------------------------


# INTRINSICS
# -----------------------------------------------------------------------------
def centre_crop_K(K: jnp.ndarray, new_shape, shape=None) -> jnp.ndarray:
    """Adjust intrinsics for a centre crop (ref `:232-246`). Shapes are (h, w)."""
    if shape is None:
        shape = (1, 1)
    K = K.at[..., 0, 2].multiply(new_shape[1] / shape[1])
    K = K.at[..., 1, 2].multiply(new_shape[0] / shape[0])
    return K


def resize_K(K: jnp.ndarray, new_shape, shape=None) -> jnp.ndarray:
    """Adjust intrinsics for a resize (ref `:249-263`). Shapes are (h, w)."""
    if shape is None:
        shape = (1, 1)
    K = K.at[..., 0, :].multiply(new_shape[1] / shape[1])
    K = K.at[..., 1, :].multiply(new_shape[0] / shape[0])
    return K


def pad_K(K: jnp.ndarray) -> jnp.ndarray:
    """Pad a (*, 3|4, 3|4) intrinsics matrix to (*, 4, 4) (ref `:266-279`)."""
    h, w = K.shape[-2:]
    if h not in (3, 4) or w not in (3, 4):
        raise ValueError(f'Incorrect shape. ({K.shape} vs. (*, 3|4, 3|4))')
    pad = [(0, 0)] * (K.ndim - 2) + [(0, 4 - h), (0, 4 - w)]
    K = jnp.pad(K, pad)
    return K.at[..., 3, 3].set(1.0)
# -----------------------------------------------------------------------------


# REPROJECTION
# -----------------------------------------------------------------------------
def pixel_grid(shape: tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid (h*w, 3) as (x, y, 1) rows (ref `:297-302`)."""
    h, w = shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing='ij')
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(h * w, dtype)], axis=-1)


def backproject_depth(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Backproject a depth map into homogeneous 3D points: D K^-1 [x y 1].

    Ref `geometry.py:285-316`, row-vector layout for the MXU.

    :param depth: (b, h, w, 1) Depth map.
    :param K_inv: (b, 4, 4) Inverse intrinsics.
    :return: (b, h*w, 4) Points as (x, y, z, 1) rows.
    """
    b, h, w, _ = depth.shape
    pix = pixel_grid((h, w), depth.dtype)  # (h*w, 3)
    rays = pix @ jnp.swapaxes(K_inv[:, :3, :3], -1, -2)  # (b, h*w, 3)
    pts = rays * depth.reshape(b, -1, 1)
    ones = jnp.ones((b, h * w, 1), depth.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def project_points(pts: jnp.ndarray, K: jnp.ndarray, shape: tuple[int, int]):
    """Project homogeneous 3D points to normalized grid coords + depth.

    Ref `geometry.py:319-350` including the `clamp(z, 0.1)` division guard.

    :param pts: (b, n, 4) Points (n = h*w of the target shape).
    :param K: (b, 4, 4) Intrinsics.
    :param shape: (h, w) Output image shape.
    :return: (grid (b, h, w, 2) in [-1, 1] as (x, y), depth (b, h, w, 1)).
    """
    h, w = shape
    b = pts.shape[0]
    xyz = pts[..., :3]
    z = jnp.clip(xyz[..., 2:3], min=eps(pts))
    pix = (xyz / jnp.clip(z, min=0.1)) @ jnp.swapaxes(K[:, :3, :3], -1, -2)  # (b, n, 3)

    gx = pix[..., 0] / (w - 1)
    gy = pix[..., 1] / (h - 1)
    grid = (jnp.stack([gx, gy], axis=-1) - 0.5) * 2
    return grid.reshape(b, h, w, 2), z.reshape(b, h, w, 1)


def view_synth(img: jnp.ndarray,
               depth: jnp.ndarray,
               T: jnp.ndarray,
               K: jnp.ndarray,
               K_inv: Optional[jnp.ndarray] = None):
    """Warp `img` (a support frame) to the target frame given depth + pose.

    Backproject -> rigid transform -> project -> bilinear border sample, plus a
    strict in-bounds validity mask. Ref `geometry.py:353-391`.

    :param img: (b, h, w, c) Support image to warp.
    :param depth: (b, h, w, 1) Target-frame depth prediction.
    :param T: (b, 4, 4) Transform from target to support reference frame.
    :param K: (b, 4, 4) Support intrinsics.
    :param K_inv: (b, 4, 4) Target inverse intrinsics (default `inv(K)`).
    :return: (warped (b, h, w, c), depth_warp (b, h, w, 1), valid (b, h, w, 1) bool).
    """
    if K_inv is None:
        K_inv = jnp.linalg.inv(K)
    h, w = depth.shape[1:3]
    b = depth.shape[0]

    # Fold the chain into per-batch 3x3 combines so the per-pixel work is pure
    # elementwise VPU math (broadcast scalars x planes) instead of three
    # K=3/4 matmuls over (b, h*w, 4) intermediates: for a homogeneous pixel
    # p = (x, y, 1),   xyz_support = d * (R K^-1) p + t,  so with
    # A = R K^-1, B = K A, u = K t the projected pixel is
    # (d * B p + u) / max(z, 0.1) with z = d * A[2] p + t[2].
    # Same math as backproject_depth -> @T^T -> project_points (parity-tested
    # against the torch reference chain); only association order differs.
    A = T[:, :3, :3] @ K_inv[:, :3, :3]                    # (b, 3, 3)
    t = T[:, :3, 3]                                        # (b, 3)
    Bm = K[:, :3, :3] @ A                                  # (b, 3, 3)
    u = jnp.einsum('bij,bj->bi', K[:, :3, :3], t)          # (b, 3)

    dtype = depth.dtype
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing='ij')
    d = depth[..., 0]                                      # (b, h, w)

    def plane(M, row):  # broadcast scalar row of a per-batch matrix over (h, w)
        return (M[:, row, 0, None, None] * xs + M[:, row, 1, None, None] * ys
                + M[:, row, 2, None, None])

    z = d * plane(A, 2) + t[:, 2, None, None]
    depth_warp = jnp.clip(z, min=eps(depth))
    cz = jnp.clip(z, min=0.1)
    px = (d * plane(Bm, 0) + u[:, 0, None, None]) / cz
    py = (d * plane(Bm, 1) + u[:, 1, None, None]) / cz

    gx = (px / (w - 1) - 0.5) * 2
    gy = (py / (h - 1) - 0.5) * 2
    grid = jnp.stack([gx, gy], axis=-1)                    # (b, h, w, 2)

    valid = jnp.all(jnp.abs(grid) < 1, axis=-1, keepdims=True)
    warped = grid_sample(img, grid, padding_mode='border')
    return warped, depth_warp[..., None], valid
# -----------------------------------------------------------------------------


def extract_edges(depth, preprocess=None, sigma=1, mask=None, use_canny=True):
    """Host-side depth-edge extraction (numpy). See `eval.edges.extract_edges`."""
    from ..eval.edges import extract_edges as _impl
    return _impl(depth, preprocess=preprocess, sigma=sigma, mask=mask, use_canny=use_canny)
