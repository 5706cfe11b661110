"""Bilinear resize must match torch `F.interpolate(align_corners=False)`
exactly, UP AND DOWN.

Regression test for the round-5 find (via the 200-step convergence-horizon
differential): `jax.image.resize('linear')` antialiases on downsampling
(scale-widened triangle kernel) while torch's bilinear is a plain 2-tap at
half-pixel centers — O(0.1) per-pixel divergence on unit-range images at 2x
downsampling, which surfaced as a persistent 1.7% `disp_smooth` component
offset hiding under the KBR recipe's 1e-3 smoothness weight (the total-loss
differentials could never see it). `ops.resize` now implements the
separable torch-semantics 2-tap (`ops/ops.py:_linear_resize_axis`).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from slowtv_monodepth_tpu.ops import resize  # noqa: E402

SHAPES = [
    ((8, 8), (4, 4)),        # 2x down (the disp_smooth pyramid case)
    ((96, 128), (48, 64)),   # 2x down at test-scale images
    ((96, 128), (24, 32)),   # 4x down
    ((8, 8), (16, 16)),      # 2x up
    ((77, 53), (33, 29)),    # non-integer down
    ((33, 29), (77, 53)),    # non-integer up
    ((4, 6), (3, 5)),        # tiny, edge-clamp heavy
]


@pytest.mark.parametrize('src,dst', SHAPES)
def test_bilinear_matches_torch(src, dst):
    x = np.random.default_rng(0).random((2,) + src + (3,), np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=dst,
                         mode='bilinear', align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize(x, dst))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_noop_and_dtype():
    x = np.random.default_rng(1).random((1, 8, 10, 2), np.float32)
    assert resize(x, (8, 10)) is not None
    assert np.asarray(resize(x, (8, 10))).shape == x.shape
    out = resize(x.astype(np.float16), (4, 5))
    assert out.dtype == np.float16
