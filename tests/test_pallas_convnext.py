"""Fused ConvNeXt-block Pallas kernel: numerics (interpreter mode) + dispatch.

The kernel targets the f32 path where XLA's depthwise-conv backward is
pathological at deep-stage shapes (see `ops/pallas_convnext.py` docstring);
bf16 training keeps the XLA path. These tests pin exact numerics against the
plain-XLA block math on CPU, including the custom VJP and the lane-padded
(`c_real < c`) LayerNorm masking.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slowtv_monodepth_tpu.ops.pallas_convnext import (
    convnext_block_supported, fused_convnext_block)


def ref_block(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma, c_real, approx):
    xr = x[..., :c_real]
    u = jax.lax.conv_general_dilated(
        xr, dwk[:, :, None, :c_real], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c_real) + dwb[:c_real]
    mu = u.mean(-1, keepdims=True)
    var = ((u - mu) ** 2).mean(-1, keepdims=True)
    xln = (u - mu) * jax.lax.rsqrt(var + 1e-6) * lns[:c_real] + lnb[:c_real]
    h = xln @ w1[:c_real] + b1
    hg = jax.nn.gelu(h, approximate=approx)
    o = hg @ w2[:, :c_real] + b2[:c_real]
    y = xr + gamma[:c_real] * o
    return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, x.shape[-1] - c_real)))


def make_args(c=128, c_real=128, b=2, h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731

    def lanes(a):  # Zero the pad lanes, as the encoder contract requires.
        return a.at[..., c_real:].set(0) if a.shape[-1] == c else a

    x = lanes(f(b, h, w, c))
    args = (x, lanes(f(7, 7, c)), lanes(f(c)), lanes(f(c)), lanes(f(c)),
            f(c, 4 * c).at[c_real:, :].set(0), f(4 * c),
            f(4 * c, c).at[:, c_real:].set(0), lanes(f(c)),
            lanes(0.1 * f(c)))
    return args


class TestFusedBlockNumerics:
    @pytest.mark.parametrize('approx', [True, False], ids=['tanh', 'erf'])
    def test_forward(self, approx):
        args = make_args()
        y1 = fused_convnext_block(*args, approximate=approx)
        y2 = ref_block(*args, c_real=128, approx=approx)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-4)

    def test_forward_lane_padded(self):
        """c_real < c: LN stats masked to the real lanes, pad lanes stay 0."""
        args = make_args(c=128, c_real=96)
        y1 = fused_convnext_block(*args, c_real=96, approximate=True)
        y2 = ref_block(*args, c_real=96, approx=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-4)
        assert float(jnp.abs(y1[..., 96:]).max()) == 0

    @pytest.mark.parametrize('approx', [True, False], ids=['tanh', 'erf'])
    def test_grads_match_xla(self, approx):
        args = make_args()

        def loss_fused(*a):
            return (fused_convnext_block(*a, approximate=approx) ** 2).mean()

        def loss_ref(*a):
            return (ref_block(*a, c_real=128, approx=approx) ** 2).mean()

        g1 = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
        g2 = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
        for name, a, b in zip('x dwk dwb lns lnb w1 b1 w2 b2 gamma'.split(),
                              g1, g2):
            scale = float(jnp.abs(b).max()) + 1e-9
            err = float(jnp.abs(a - b).max())
            assert err / scale < 1e-4, (name, err, scale)

    def test_supported_gate(self):
        assert convnext_block_supported((2, 12, 16, 128), 128, 'tpu')
        assert not convnext_block_supported((2, 12, 16, 128), 128, 'cpu')
        assert not convnext_block_supported((2, 12, 16, 96), 96, 'tpu')  # lanes
        assert not convnext_block_supported((2, 4, 16, 128), 128, 'tpu')  # h < 6


class TestEncoderDispatch:
    def test_encoder_fused_matches_unfused(self, monkeypatch):
        """Force-flag dispatch inside ConvNeXtEncoder == plain XLA path."""
        from slowtv_monodepth_tpu.models.encoders import ConvNeXtEncoder

        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 64, 3))
        enc = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(128, 128, 128, 128))
        params = enc.init(jax.random.PRNGKey(1), x)

        monkeypatch.delenv('SLOWTV_FORCE_PALLAS_CONVNEXT', raising=False)
        ref = enc.apply(params, x)  # Default: plain XLA path (kernel opt-in).
        monkeypatch.setenv('SLOWTV_FORCE_PALLAS_CONVNEXT', '1')
        got = enc.apply(params, x)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
