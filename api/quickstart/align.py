"""Reference snippet: aligning scaleless predictions to metric ground truth.

Equivalent of `api/quickstart/align.py` (reference): median depth scaling and
MiDaS-style least-squares alignment computed in DISPARITY space. This mirrors
`slowtv_monodepth_tpu.eval.MonoDepthEvaluator.align` for standalone use.
"""
from __future__ import annotations

import numpy as np


def align_median(pred: np.ndarray, target: np.ndarray) -> float:
    """Scale factor for median-depth alignment."""
    return float(np.median(target) / np.median(pred))


def align_lsqr(pred: np.ndarray, target: np.ndarray):
    """Scale & shift for least-squares alignment (with singular guard)."""
    A = np.array([[(pred ** 2).sum(), pred.sum()], [pred.sum(), pred.shape[0]]])
    if np.linalg.det(A) <= 0:
        return 0, 0
    b = np.array([(pred * target).sum(), target.sum()])
    return (np.linalg.inv(A) @ b).tolist()


def main():
    def to_inv(depth: np.ndarray, eps: float = 1e-5) -> np.ndarray:
        return (depth > 0) / (depth + eps)

    depth = np.load('.../kbr/file.npy')    # (h, w) predicted depth.
    lidar = np.load('.../lidar/file.npy')  # (h, w) metric GT.
    valid = (lidar > 0) & (lidar < 100)
    depth_mask, lidar_mask = depth[valid], lidar[valid]

    # Median alignment.
    scale = align_median(depth_mask, lidar_mask)
    depth, depth_mask = depth * scale, depth_mask * scale

    # Least-squares alignment happens in disparity space, not depth.
    disp, disp_mask = to_inv(depth), to_inv(depth_mask)
    scale, shift = align_lsqr(disp_mask, to_inv(lidar_mask))
    disp, disp_mask = disp * scale + shift, disp_mask * scale + shift
    depth, depth_mask = to_inv(disp), to_inv(disp_mask)
    return depth, depth_mask


if __name__ == '__main__':
    main()
