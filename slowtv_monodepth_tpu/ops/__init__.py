from .ops import (
    eps, standardize, unstandardize, to_gray, mean_normalize, eye_like,
    resize, resize_like, upsample2x_nearest, dilate_mask, erode_mask,
)
from .sample import grid_sample
from .pallas_warp import warp_bilinear_pallas, pallas_warp_supported
from .geometry import (
    to_scaled, to_log, to_inv, blend_stereo,
    decompose_AA, R_from_q, T_from_Rt, T_from_AAt, T_from_qt,
    centre_crop_K, resize_K, pad_K,
    pixel_grid, backproject_depth, project_points, view_synth,
    extract_edges,
)

__all__ = [
    'eps', 'standardize', 'unstandardize', 'to_gray', 'mean_normalize', 'eye_like',
    'resize', 'resize_like', 'upsample2x_nearest', 'dilate_mask', 'erode_mask',
    'grid_sample', 'warp_bilinear_pallas', 'pallas_warp_supported',
    'to_scaled', 'to_log', 'to_inv', 'blend_stereo',
    'decompose_AA', 'R_from_q', 'T_from_Rt', 'T_from_AAt', 'T_from_qt',
    'centre_crop_K', 'resize_K', 'pad_K',
    'pixel_grid', 'backproject_depth', 'project_points', 'view_synth',
    'extract_edges',
]
