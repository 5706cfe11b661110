"""Fused decoder-stage kernel: parity vs the unfused Monodepth decoder.

Interpreter mode on CPU; the TPU path compiles the same Mosaic program and
is exercised by the KBR train-step perf drives. Reference semantics:
`models/decoders/monodepth.py` stage loop (conv3x3-reflect + ELU, nearest
up2, sigmoid outconv), ref `src/networks/decoders/monodepth.py:71-89`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from slowtv_monodepth_tpu.ops.pallas_decoder import (decoder_stage_supported,
                                                     fused_upconv_stage)


def _ref_stage(x, wa, ba, wb, bb, wo, bo):
    def conv(v, w_, b_):
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
        return lax.conv_general_dilated(
            vp, w_, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_

    def up2(v):
        b, h, w, c = v.shape
        return jnp.broadcast_to(
            v[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)

    ha = jax.nn.elu(conv(x, wa, ba))
    hb = jax.nn.elu(conv(up2(ha), wb, bb))
    return hb, jax.nn.sigmoid(conv(hb, wo, bo))


def _mk(b, h, w, ci, cd, seed=0):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(b, h, w, ci), jnp.float32) * 0.5,
            jnp.asarray(rs.randn(3, 3, ci, cd), jnp.float32) * 0.3,
            jnp.asarray(rs.randn(cd), jnp.float32) * 0.1,
            jnp.asarray(rs.randn(3, 3, cd, cd), jnp.float32) * 0.3,
            jnp.asarray(rs.randn(cd), jnp.float32) * 0.1,
            jnp.asarray(rs.randn(3, 3, cd, 1), jnp.float32) * 0.3,
            jnp.asarray(rs.randn(1), jnp.float32) * 0.1)


SHAPES = [(2, 32, 24, 6, 5), (1, 48, 40, 8, 4)]


@pytest.mark.parametrize('b,h,w,ci,cd', SHAPES)
def test_fwd_parity(b, h, w, ci, cd):
    args = _mk(b, h, w, ci, cd)
    f_k, d_k = fused_upconv_stage(*args)
    f_r, d_r = _ref_stage(*args)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), atol=1e-5)


@pytest.mark.parametrize('b,h,w,ci,cd', SHAPES)
def test_vjp_parity(b, h, w, ci, cd):
    args = _mk(b, h, w, ci, cd, seed=1)
    rs = np.random.RandomState(2)
    wf = jnp.asarray(rs.rand(b, 2 * h, 2 * w, cd), jnp.float32)
    wd = jnp.asarray(rs.rand(b, 2 * h, 2 * w, 1), jnp.float32)

    def loss(fn):
        def f(*a):
            feat, disp = fn(*a)
            return (feat * wf).sum() + (disp * wd).sum()
        return f

    gk = jax.grad(loss(fused_upconv_stage), argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss(_ref_stage), argnums=tuple(range(7)))(*args)
    for name, a, r in zip(['dx', 'dwa', 'dba', 'dwb', 'dbb', 'dwo', 'dbo'],
                          gk, gr):
        scale = max(1.0, float(jnp.abs(r).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-5 * scale, err_msg=name)


def test_depthnet_dispatch_parity(monkeypatch):
    """DepthNet output is identical with the fused stages forced on."""
    from slowtv_monodepth_tpu.models import DepthNet
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3), jnp.float32)
    net = DepthNet(enc_name='convnext_atto', pretrained=False,
                   out_scales=(0, 1, 2, 3))
    p = net.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.setenv('SLOWTV_ENABLE_PALLAS_DEC', '1')
    monkeypatch.setenv('SLOWTV_FORCE_PALLAS_DEC', '1')
    fused = net.apply(p, x, train=False)['disp']
    monkeypatch.delenv('SLOWTV_ENABLE_PALLAS_DEC')
    ref = net.apply(p, x, train=False)['disp']
    for s in ref:
        np.testing.assert_allclose(np.asarray(fused[s]), np.asarray(ref[s]),
                                   atol=1e-6)


def test_dispatch_guards():
    assert not decoder_stage_supported((4, 96, 160, 32), 16, 'cpu')
    assert decoder_stage_supported((4, 96, 160, 32), 16, 'tpu')
    assert decoder_stage_supported((4, 192, 320, 32), 16, 'tpu')
    assert decoder_stage_supported((8, 96, 160, 64), 32, 'tpu')   # KBR stage1
    assert not decoder_stage_supported((4, 100, 160, 32), 16, 'tpu')  # h % rb
    assert not decoder_stage_supported((4, 8, 160, 32), 16, 'tpu')    # h small
