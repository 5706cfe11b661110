"""Depth-edge extraction (host-side numpy/scipy).

Re-implements the reference's `extract_edges` (`src/tools/geometry.py:23-59`)
without scikit-image (not available here): a faithful Canny detector
(gaussian smoothing with masked normalization, Sobel gradients, interpolated
non-maximum suppression, hysteresis with skimage's default absolute thresholds
low=0.1/high=0.2) plus the Sobel fallback used when `use_canny=False`.
"""
from __future__ import annotations

from typing import Optional

import cv2
import numpy as np
from scipy import ndimage as ndi

__all__ = ['canny', 'extract_edges']


def _smooth_with_mask(image: np.ndarray, sigma: float, mask: np.ndarray):
    """Gaussian smoothing that avoids bleeding values across the mask edge."""
    masked = image * mask
    smoothed = ndi.gaussian_filter(masked, sigma, mode='constant')
    norm = ndi.gaussian_filter(mask.astype(image.dtype), sigma, mode='constant')
    norm = np.where(norm == 0, 1.0, norm)
    smoothed /= norm
    # Erode the mask so NMS never reads garbage across its border.
    s = ndi.generate_binary_structure(2, 2)
    eroded = ndi.binary_erosion(mask, s, border_value=0)
    return smoothed, eroded


def canny(image: np.ndarray,
          sigma: float = 1.0,
          low_threshold: float = 0.1,
          high_threshold: float = 0.2,
          mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Canny edge detection on a float image.

    :param image: (h, w) Float image.
    :param sigma: Gaussian smoothing sigma.
    :param low_threshold: Hysteresis low threshold on gradient magnitude.
    :param high_threshold: Hysteresis high threshold on gradient magnitude.
    :param mask: (h, w) Optional bool mask of valid pixels.
    :return: (h, w) Boolean edge map.
    """
    image = np.asarray(image, dtype=np.float64)
    if mask is None:
        mask = np.ones(image.shape, dtype=bool)

    smoothed, eroded_mask = _smooth_with_mask(image, sigma, mask)

    gy = ndi.sobel(smoothed, axis=0)
    gx = ndi.sobel(smoothed, axis=1)
    magnitude = np.hypot(gx, gy)

    # Interpolated non-maximum suppression along the gradient direction.
    abs_x, abs_y = np.abs(gx), np.abs(gy)
    eroded_mask = eroded_mask & (magnitude > 0)

    # Interpolated NMS: for each of 4 direction cases, the neighbor magnitude
    # is w*diag + (1-w)*axis with w = min/max slope ratio.
    def _shift(a, dy, dx):
        out = np.zeros_like(a)
        h, w = a.shape
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        ys_src = slice(max(-dy, 0), h + min(-dy, 0))
        xs_src = slice(max(-dx, 0), w + min(-dx, 0))
        out[ys, xs] = a[ys_src, xs_src]
        return out

    m_e = _shift(magnitude, 0, 1)
    m_w = _shift(magnitude, 0, -1)
    m_n = _shift(magnitude, -1, 0)
    m_s = _shift(magnitude, 1, 0)
    m_ne = _shift(magnitude, -1, 1)
    m_nw = _shift(magnitude, -1, -1)
    m_se = _shift(magnitude, 1, 1)
    m_sw = _shift(magnitude, 1, -1)

    with np.errstate(divide='ignore', invalid='ignore'):
        # Case 1: gradient mostly horizontal, same signs -> SE/NW diagonal.
        horiz = abs_x >= abs_y
        vert = ~horiz
        same = (gx * gy) >= 0
        w_h = np.where(abs_x > 0, abs_y / np.maximum(abs_x, 1e-30), 0.0)
        w_v = np.where(abs_y > 0, abs_x / np.maximum(abs_y, 1e-30), 0.0)

        # same sign, |gx|>=|gy|: neighbors (E,SE) and (W,NW)
        n1 = w_h * m_se + (1 - w_h) * m_e
        n2 = w_h * m_nw + (1 - w_h) * m_w
        c1 = horiz & same & (magnitude >= n1) & (magnitude >= n2)

        # same sign, |gy|>|gx|: neighbors (S,SE) and (N,NW)
        n1 = w_v * m_se + (1 - w_v) * m_s
        n2 = w_v * m_nw + (1 - w_v) * m_n
        c2 = vert & same & (magnitude >= n1) & (magnitude >= n2)

        # opposite sign, |gx|>=|gy|: neighbors (E,NE) and (W,SW)
        n1 = w_h * m_ne + (1 - w_h) * m_e
        n2 = w_h * m_sw + (1 - w_h) * m_w
        c3 = horiz & ~same & (magnitude >= n1) & (magnitude >= n2)

        # opposite sign, |gy|>|gx|: neighbors (N,NE) and (S,SW)
        n1 = w_v * m_ne + (1 - w_v) * m_n
        n2 = w_v * m_sw + (1 - w_v) * m_s
        c4 = vert & ~same & (magnitude >= n1) & (magnitude >= n2)

    local_maxima = (c1 | c2 | c3 | c4) & eroded_mask

    # Hysteresis thresholding.
    high = local_maxima & (magnitude >= high_threshold)
    low = local_maxima & (magnitude >= low_threshold)
    labels, n = ndi.label(low, structure=np.ones((3, 3), bool))
    if n == 0:
        return np.zeros(image.shape, bool)
    keep = np.zeros(n + 1, bool)
    keep[np.unique(labels[high])] = True
    keep[0] = False
    return keep[labels]


def extract_edges(depth: np.ndarray,
                  preprocess: Optional[str] = None,
                  sigma: float = 1,
                  mask: Optional[np.ndarray] = None,
                  use_canny: bool = True) -> np.ndarray:
    """Detect edges in a dense depth map (ref `geometry.py:23-59`).

    :param depth: (h, w[, 1]) Dense depth map.
    :param preprocess: Depth preprocessing {'log', 'inv', 'none', None}.
    :param sigma: Gaussian blurring sigma.
    :param mask: Optional bool mask of valid pixels.
    :param use_canny: If True use Canny, else thresholded Sobel magnitude.
    :return: (h, w) Boolean edge map.
    """
    if preprocess not in {'log', 'inv', 'none', None}:
        raise ValueError(f'Invalid depth preprocessing. ({preprocess})')

    depth = np.squeeze(np.asarray(depth)).astype(np.float64)
    if preprocess == 'log':
        d = np.where(depth > 0, np.clip(depth, np.finfo(np.float64).eps, None), 1.0)
        depth = np.where(depth > 0, np.log(d), 0.0)
    elif preprocess == 'inv':
        d = np.where(depth > 0, np.clip(depth, np.finfo(np.float64).eps, None), 1.0)
        depth = np.where(depth > 0, 1.0 / d, 0.0)
        depth -= depth.min()
        depth /= max(depth.max(), np.finfo(np.float64).eps)

    if use_canny:
        return canny(depth, sigma=sigma, mask=mask)

    blurred = cv2.GaussianBlur(depth.astype(np.float32), (3, 3), sigmaX=sigma, sigmaY=sigma)
    dx = cv2.Sobel(blurred, ddepth=cv2.CV_64F, dx=1, dy=0, ksize=5)
    dy = cv2.Sobel(blurred, ddepth=cv2.CV_64F, dx=0, dy=1, ksize=5)
    edges = np.sqrt(dx**2 + dy**2)
    edges = edges > edges.mean()
    if mask is not None:
        edges &= mask
    return edges
