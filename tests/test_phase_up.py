"""Phase-decomposed upsample->conv (`ops/phase_up.py`, `dec_phase_up` knob).

The transform is EXACT (same taps, combined linearly in the weights), so the
bar is float-noise equality against the materialized up2+conv path, at the op
level (both pad modes, with/without skip) and through the full DepthNet
(forward + gradients, same param tree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from slowtv_monodepth_tpu.models import DepthNet
from slowtv_monodepth_tpu.ops import upsample2x_nearest
from slowtv_monodepth_tpu.ops.phase_up import phase_upconv3x3

DN = ('NHWC', 'HWIO', 'NHWC')


def _reference(u, skip, k, bias, pad_mode):
    cat = upsample2x_nearest(u)
    if skip is not None:
        cat = jnp.concatenate([cat, skip], -1)
    if pad_mode == 'reflect':
        cat = jnp.pad(cat, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
        return lax.conv_general_dilated(cat, k, (1, 1), 'VALID',
                                        dimension_numbers=DN) + bias
    return lax.conv_general_dilated(cat, k, (1, 1), 'SAME',
                                    dimension_numbers=DN) + bias


@pytest.mark.parametrize('pad_mode', ['zeros', 'reflect'])
@pytest.mark.parametrize('cs', [0, 4])
def test_op_matches_up2_conv(pad_mode, cs):
    rng = np.random.default_rng(0)
    h, w, cu, co = 6, 9, 5, 3
    u = jnp.asarray(rng.standard_normal((2, h, w, cu)), jnp.float32)
    skip = (jnp.asarray(rng.standard_normal((2, 2 * h, 2 * w, cs)), jnp.float32)
            if cs else None)
    k = jnp.asarray(rng.standard_normal((3, 3, cu + cs, co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)

    ref = _reference(u, skip, k, bias, pad_mode)
    got = phase_upconv3x3(u, skip, k, bias, pad_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_op_gradients_match():
    rng = np.random.default_rng(1)
    h, w, cu, cs, co = 5, 7, 6, 4, 3
    u = jnp.asarray(rng.standard_normal((2, h, w, cu)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 2 * h, 2 * w, cs)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cu + cs, co)), jnp.float32)
    b0 = jnp.zeros((co,), jnp.float32)

    for arg in range(3):
        g_ref = jax.grad(lambda k_, u_, s_: (
            _reference(u_, s_, k_, b0, 'zeros') ** 2).sum(), argnums=arg)(k, u, skip)
        g_got = jax.grad(lambda k_, u_, s_: (
            phase_upconv3x3(u_, s_, k_, b0, 'zeros') ** 2).sum(), argnums=arg)(k, u, skip)
        scale = float(jnp.abs(g_ref).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(g_got) / scale,
                                   np.asarray(g_ref) / scale,
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize('pad_mode', ['zeros', 'reflect'])
def test_depthnet_matches(pad_mode):
    """Same params through both decoder paths: forward + grads match."""
    imgs = jnp.asarray(np.random.default_rng(2).random((2, 32, 64, 3)),
                       jnp.float32)
    kw = dict(enc_name='toy', pretrained=False, dec_name='monodepth',
              out_scales=(0, 1), dec_pad_mode=pad_mode)
    net0 = DepthNet(**kw)
    net1 = DepthNet(**kw, dec_phase_up=True)
    params = net0.init(jax.random.PRNGKey(0), imgs, train=False)
    # Identical param trees (the phase path creates nothing new).
    p1 = net1.init(jax.random.PRNGKey(0), imgs, train=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p1))

    def loss(fn_net, p):
        out = fn_net.apply(p, imgs, train=True)['disp']
        return sum((v ** 2).mean() for v in out.values())

    l0, g0 = jax.value_and_grad(lambda p: loss(net0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(net1, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6), g0, g1)
