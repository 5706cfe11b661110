"""Pallas depthwise-conv kernel: parity vs the XLA grouped conv (fwd + VJP).

Runs the kernel in interpreter mode on CPU (the TPU path compiles the same
Mosaic program; its numerics are additionally swept on-chip by the perf
drives). Reference: flax `nn.Conv(feature_group_count=C)` as used by the
ConvNeXt blocks (timm block structure; our `models/encoders/convnext.py`).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from slowtv_monodepth_tpu.ops import pallas_dwconv as pd


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    """Route dispatch into the kernel (interpret mode on CPU) per-test only —
    a process-global env flag would drag every ConvNeXt suite test through
    the interpreter."""
    monkeypatch.setenv('SLOWTV_FORCE_PALLAS_DWCONV', '1')


def _ref(x, w):
    return lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1])


SHAPES = [
    (2, 16, 24, 96, 7),    # ConvNeXt-ish stage block
    (1, 9, 13, 128, 3),    # Odd spatial dims, small kernel
    (2, 24, 40, 160, 5),   # Non-128-multiple channels
    (1, 17, 160, 96, 7),   # H not a multiple of the row block
]


@pytest.mark.parametrize('b,h,w,c,k', SHAPES)
def test_fwd_parity(b, h, w, c, k):
    rs = np.random.RandomState(42)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rs.randn(k, k, c), jnp.float32) * 0.2
    bias = jnp.asarray(rs.randn(c), jnp.float32)
    out = pd.depthwise_conv(x, wk, bias)
    ref = _ref(x, wk) + bias
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize('b,h,w,c,k', SHAPES[:2])
def test_vjp_parity(b, h, w, c, k):
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rs.randn(k, k, c), jnp.float32) * 0.2

    gx_p, gw_p = jax.grad(lambda x, w: (pd._dwconv_core(x, w) ** 2).mean(),
                          argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(lambda x, w: (_ref(x, w) ** 2).mean(),
                          argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-5)


def test_nnconv_param_layout_accepted():
    """(k, k, 1, c) flax kernels are accepted unchanged (checkpoint compat)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 8, 8, 96), jnp.float32)
    wk = jnp.asarray(rs.randn(7, 7, 1, 96), jnp.float32)
    out = pd.depthwise_conv(x, wk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, wk[:, :, 0])),
                               atol=1e-5)


def test_dispatch_guards():
    assert not pd.dwconv_pallas_supported((1, 8, 8, 96), 7, 'cpu')
    assert pd.dwconv_pallas_supported((4, 96, 160, 128), 7, 'tpu')
    assert not pd.dwconv_pallas_supported((4, 96, 160, 128), 8, 'tpu')  # even k
    assert not pd.dwconv_pallas_supported((1, 8, 4096, 128), 7, 'tpu')  # VMEM
