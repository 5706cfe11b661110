"""Model tests: output contracts for all decoders/nets + torch weight-import parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from slowtv_monodepth_tpu.models import AutoencoderNet, DepthNet, PoseNet
from slowtv_monodepth_tpu.models.encoders import ConvNeXtEncoder, ResNetEncoder
from slowtv_monodepth_tpu.models.encoders.import_torch import (
    adapt_input_conv, convert_convnext, convert_resnet,
)

RNG = np.random.default_rng(3)
KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- encoders
def test_resnet18_feature_shapes():
    enc = ResNetEncoder(block='basic', layers=(2, 2, 2, 2))
    x = jnp.zeros((1, 64, 96, 3))
    var = enc.init(KEY, x)
    feats = enc.apply(var, x)
    assert [f.shape for f in feats] == [
        (1, 32, 48, 64), (1, 16, 24, 64), (1, 8, 12, 128), (1, 4, 6, 256), (1, 2, 3, 512)]


def test_convnext_feature_shapes():
    enc = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
    x = jnp.zeros((1, 64, 96, 3))
    var = enc.init(KEY, x)
    feats = enc.apply(var, x)
    assert [f.shape for f in feats] == [
        (1, 16, 24, 8), (1, 8, 12, 16), (1, 4, 6, 32), (1, 2, 3, 64)]


def test_convnext_gelu_flavors():
    """The tanh GELU option (cfg net.*.gelu, TPU-fast recipe) must share the
    param tree with the exact default and track it to ~1e-2 on activations."""
    import numpy as np

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3), jnp.float32)
    exact = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
    tanh = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), gelu_approx=True)
    var = exact.init(KEY, x)
    # Force non-trivial block outputs (layer-scale init is 1e-6).
    var = jax.tree_util.tree_map(
        lambda v: jnp.ones_like(v) if v.ndim == 1 else v, var)
    f_exact = exact.apply(var, x)
    f_tanh = tanh.apply(var, x)  # Same param tree: swap is checkpoint-compatible.
    for a, b in zip(f_exact, f_tanh):
        assert a.shape == b.shape
        d = float(jnp.abs(a - b).max())
        assert 0 < d < 2e-1, d  # Differs (really the tanh path), but tracks.


# ------------------------------------------------- torch import parity
class _TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.bn2(self.conv2(torch.relu(self.bn1(self.conv1(x)))))
        return torch.relu(out + idt)


class _TorchResNet(nn.Module):
    """Mini timm-style resnet (layers=(1,1,1,1)) for converter goldens."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_TorchBasicBlock(64, 64, 1))
        self.layer2 = nn.Sequential(_TorchBasicBlock(64, 128, 2))
        self.layer3 = nn.Sequential(_TorchBasicBlock(128, 256, 2))
        self.layer4 = nn.Sequential(_TorchBasicBlock(256, 512, 2))

    def forward(self, x):
        feats = []
        x = torch.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _randomize_bn_stats(mod):
    for m in mod.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.LayerNorm)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_resnet_torch_import_parity():
    """Random torch weights -> converter -> identical eval-mode features."""
    tm = _TorchResNet().eval()
    _randomize_bn_stats(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    params, stats = convert_resnet(sd, layers=(1, 1, 1, 1), block='basic')
    enc = ResNetEncoder(block='basic', layers=(1, 1, 1, 1))

    x = RNG.standard_normal((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = [f.permute(0, 2, 3, 1).numpy()
                for f in tm(torch.from_numpy(x).permute(0, 3, 1, 2))]
    got = enc.apply({'params': params, 'batch_stats': stats}, jnp.asarray(x), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3, atol=1e-4)


class _TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        s = x
        x = self.conv_dw(x).permute(0, 2, 3, 1)
        x = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm(x))))
        return s + (self.gamma * x).permute(0, 3, 1, 2)


class _TorchConvNeXt(nn.Module):
    def __init__(self, dims=(8, 16, 32, 64), depths=(1, 1, 1, 1)):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, 4))
        self.stem.add_module('1', nn.LayerNorm(dims[0], eps=1e-6))
        self.stages = nn.ModuleList()
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(nn.LayerNorm(dims[i - 1], eps=1e-6),
                                                 nn.Conv2d(dims[i - 1], dim, 2, 2))
            stage.blocks = nn.Sequential(*[_TorchConvNeXtBlock(dim) for _ in range(depth)])
            self.stages.append(stage)

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        feats = []
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = stage.downsample[0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            x = stage.blocks(x)
            feats.append(x)
        return feats


def test_convnext_torch_import_parity():
    tm = _TorchConvNeXt().eval()
    _randomize_bn_stats(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_convnext(sd, depths=(1, 1, 1, 1))
    enc = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))

    x = RNG.standard_normal((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = [f.permute(0, 2, 3, 1).numpy()
                for f in tm(torch.from_numpy(x).permute(0, 3, 1, 2))]
    got = enc.apply({'params': params}, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3, atol=1e-4)


def test_adapt_input_conv():
    w = RNG.standard_normal((7, 7, 3, 64)).astype(np.float32)
    w6 = adapt_input_conv(w, 6)
    assert w6.shape == (7, 7, 6, 64)
    # Constant input across duplicated channels gives the original response.
    np.testing.assert_allclose(w6[..., :3, :] * 2, w, rtol=1e-5)


# ---------------------------------------------------------------- decoders
@pytest.mark.parametrize('dec_name', ['monodepth', 'hrdepth', 'ddvnet', 'diffnet',
                                      'cadepth', 'superdepth'])
@pytest.mark.parametrize('enc_kind', ['resnet', 'convnext'])
def test_decoder_output_contract(dec_name, enc_kind):
    from slowtv_monodepth_tpu import DEC_REG, trigger_networks
    trigger_networks()

    if enc_kind == 'resnet':
        num_ch_enc, enc_sc = [16, 16, 24, 32, 40], [2, 4, 8, 16, 32]
    else:
        num_ch_enc, enc_sc = [16, 24, 32, 40], [4, 8, 16, 32]

    h, w = 64, 96
    feats = [jnp.asarray(RNG.standard_normal((1, h // s, w // s, c)).astype(np.float32))
             for s, c in zip(enc_sc, num_ch_enc)]

    dec = DEC_REG[dec_name](num_ch_enc=num_ch_enc, enc_sc=enc_sc, out_sc=(0, 1, 2, 3), out_ch=1)
    var = dec.init(KEY, feats)
    out = dec.apply(var, feats, mutable=['batch_stats'])[0] if dec_name == 'cadepth' \
        else dec.apply(var, feats)

    assert sorted(out) == [0, 1, 2, 3]
    for s, v in out.items():
        if dec_name == 'superdepth' and s > 0:
            assert v.shape == (1, h, w, 1)  # Sub-pixel super-resolved outputs.
        else:
            assert v.shape == (1, h // 2 ** s, w // 2 ** s, 1)
        vals = np.asarray(v)
        assert np.all(vals >= 0) and np.all(vals <= 1)  # sigmoid range


# ---------------------------------------------------------------- networks
def test_depth_net_contract():
    net = DepthNet(enc_name='resnet18', dec_name='monodepth', out_scales=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 96, 3))
    var = net.init(KEY, x)
    out = net.apply(var, x)
    assert set(out) == {'depth_feats', 'disp'}
    assert sorted(out['disp']) == [0, 1, 2, 3]
    assert out['disp'][0].shape == (1, 64, 96, 1)
    assert out['disp'][3].shape == (1, 8, 12, 1)


def test_depth_net_virtual_stereo_and_mask():
    net = DepthNet(enc_name='resnet18', use_virtual_stereo=True,
                   mask_name='explainability', num_ch_mask=2)
    x = jnp.zeros((1, 32, 32, 3))
    var = net.init(KEY, x)
    out = net.apply(var, x)
    assert out['disp'][0].shape == (1, 32, 32, 1)
    assert out['disp_stereo'][0].shape == (1, 32, 32, 2)
    assert out['mask'][0].shape == (1, 32, 32, 2)


def test_depth_net_stereo_blend():
    net = DepthNet(enc_name='resnet18', use_stereo_blend=True)
    x = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32))
    var = net.init(KEY, x)
    out = net.apply(var, x)
    assert out['disp'][0].shape == (1, 32, 32, 1)


def test_pose_net_contract():
    net = PoseNet(enc_name='resnet18', learn_K=True)
    x = jnp.zeros((2, 64, 96, 6))
    var = net.init(KEY, x)
    out = net.apply(var, x)
    assert out['R'].shape == (2, 2, 3)
    assert out['t'].shape == (2, 2, 3)
    assert out['fs'].shape == (2, 2)
    assert out['cs'].shape == (2, 2)
    assert np.all(np.asarray(out['fs']) > 0)  # softplus
    assert np.all((np.asarray(out['cs']) > 0) & (np.asarray(out['cs']) < 1))  # sigmoid
    # pose_eps scaling keeps initial poses tiny.
    assert float(jnp.abs(out['R']).max()) < 0.2

    K = PoseNet.build_K(out['fs'], out['cs'])
    assert K.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(K)[:, 3, 3], 1.0)


def test_autoencoder_contract():
    net = AutoencoderNet(enc_name='resnet18')
    x = jnp.zeros((1, 32, 32, 3))
    var = net.init(KEY, x)
    out = net.apply(var, x)
    assert out['autoenc_imgs'][0].shape == (1, 32, 32, 3)
    assert len(out['autoenc_feats']) == 5


class TestDpt:
    def test_vit_dpt_depthnet(self):
        """DPT-style DepthNet: ViT encoder + DPT decoder, mult-of-16 inputs."""
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.models import DepthNet
        net = DepthNet(enc_name='dpt_vitb16_384', pretrained=False, dec_name='dpt',
                       out_scales=(0,))
        x = jnp.zeros((1, 64, 96, 3))
        v = net.init(jax.random.PRNGKey(0), x, train=False)
        out = net.apply(v, x, train=False)
        assert out['disp'][0].shape == (1, 64, 96, 1)
        assert len(out['depth_feats']) == 4
        # Reassembled pyramid at strides 4/8/16/32.
        assert [f.shape[1] for f in out['depth_feats']] == [16, 8, 4, 2]
        d = np.asarray(out['disp'][0])
        assert (d >= 0).all() and (d <= 1).all()

    def test_vit_rejects_bad_shape(self):
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.models.encoders import create_encoder
        enc, chans, reds = create_encoder('vitb16_384')
        assert chans == [96, 192, 384, 768]
        assert reds == [4, 8, 16, 32]
        import pytest as _pytest
        with _pytest.raises(ValueError, match='multiple of 16'):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 60, 96, 3)), train=False)


def _make_torch_resnet_sd():
    """Full resnet18-layout (2,2,2,2) torch state dict as numpy arrays."""
    import torch.nn as nn

    class R18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
            for i, (cin, cout, s) in enumerate(chans):
                setattr(self, f'layer{i + 1}', nn.Sequential(
                    _TorchBasicBlock(cin, cout, s), _TorchBasicBlock(cout, cout, 1)))

    m = R18()
    _randomize_bn_stats(m)
    return {k: v.numpy() for k, v in m.state_dict().items()}


class TestPretrainedLoading:
    def test_graft_resnet_weights(self, tmp_path, monkeypatch):
        """npz dump -> init-time graft; forward uses the grafted weights."""
        import jax
        import jax.numpy as jnp
        import torch
        from slowtv_monodepth_tpu.models.encoders import pretrained as pt

        # Build a random torch resnet18-layout state dict via the test helper.
        sd = _make_torch_resnet_sd()
        f = tmp_path / 'timm' / 'resnet18.npz'
        f.parent.mkdir(parents=True)
        np.savez(f, **sd)
        monkeypatch.setattr(pt, 'MODEL_ROOTS', [tmp_path])

        from slowtv_monodepth_tpu.models import DepthNet
        net = DepthNet(enc_name='resnet18', pretrained=True,
                       dec_name='monodepth', out_scales=(0,))
        x = jnp.zeros((1, 32, 64, 3))
        variables = dict(net.init(jax.random.PRNGKey(0), x, train=False))
        grafted = pt.load_pretrained_encoder(dict(variables), 'resnet18')

        got = np.asarray(grafted['params']['encoder']['conv1']['kernel'])
        want = sd['conv1.weight'].transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # Non-encoder params untouched.
        a = jax.tree_util.tree_leaves(variables['params']['decoders_disp'])
        b = jax.tree_util.tree_leaves(grafted['params']['decoders_disp'])
        for x1, x2 in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_missing_weights_warns_not_raises(self, tmp_path, monkeypatch):
        from slowtv_monodepth_tpu.models.encoders import pretrained as pt
        monkeypatch.setattr(pt, 'MODEL_ROOTS', [tmp_path])
        out = pt.load_pretrained_encoder({'params': {}}, 'resnet18')
        assert out == {'params': {}}


class TestSwinBeit:
    def test_swin_pyramid(self):
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.models.encoders import create_encoder
        enc, chans, reds = create_encoder('swint7_224')
        x = jnp.zeros((1, 64, 64, 3))
        v = enc.init(jax.random.PRNGKey(0), x, train=False)
        feats = enc.apply(v, x, train=False)
        # Natural 4/8/16/32 pyramid:
        assert [f.shape[-1] for f in feats] == chans
        assert [x.shape[1] // f.shape[1] for f in feats] == [4, 8, 16, 32]

    def test_beit_depthnet(self):
        import jax
        import jax.numpy as jnp
        from slowtv_monodepth_tpu.models import DepthNet
        net = DepthNet(enc_name='dpt_beitb16_384', pretrained=False,
                       dec_name='dpt', out_scales=(0,))
        x = jnp.zeros((1, 32, 48, 3))
        v = net.init(jax.random.PRNGKey(0), x, train=False)
        out = net.apply(v, x, train=False)
        assert out['disp'][0].shape == (1, 32, 48, 1)


class TestDecoderPadMode:
    def test_zeros_matches_reflect_away_from_border(self):
        """TPU recipe `pad_mode='zeros'`: identical to reflect except the 1px
        conv border, with an identical parameter tree (checkpoints swap)."""
        from slowtv_monodepth_tpu.models.decoders.utils import conv3x3

        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 24, 8))
        m_r = conv3x3(4, pad_mode='reflect')
        m_z = conv3x3(4, pad_mode='zeros')
        p = m_r.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(m_z.init(jax.random.PRNGKey(1), x)))
        y_r = m_r.apply(p, x)
        y_z = m_z.apply(p, x)
        np.testing.assert_allclose(np.asarray(y_r[:, 1:-1, 1:-1]),
                                   np.asarray(y_z[:, 1:-1, 1:-1]), atol=1e-6)
        assert np.abs(np.asarray(y_r[:, 0]) - np.asarray(y_z[:, 0])).max() > 1e-4

    def test_depthnet_dec_pad_mode_param_tree_stable(self):
        from slowtv_monodepth_tpu.models import DepthNet

        x = jnp.zeros((1, 32, 64, 3))
        kw = dict(enc_name='resnet18', pretrained=False, dec_name='monodepth',
                  out_scales=(0, 1))
        p_r = DepthNet(**kw).init(jax.random.PRNGKey(0), x, train=False)
        net_z = DepthNet(**kw, dec_pad_mode='zeros')
        p_z = net_z.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(p_r)
                == jax.tree_util.tree_structure(p_z))
        out = net_z.apply(p_z, x, train=False)
        assert out['disp'][0].shape == (1, 32, 64, 1)


@pytest.mark.parametrize('policy', ['dots', 'full'])
def test_convnext_enc_remat_exact(policy):
    """`enc_remat` (per-block jax.checkpoint, `encoders/convnext.py`) must be
    math-identical: same param tree, same forward, same gradients. It only
    changes WHAT XLA stores vs recomputes in the backward (the HBM/FLOPs
    trade measured by tools/bench/ab_batch.py --ab-enc-remat)."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 96, 3))
    kw = dict(enc_name='convnext_atto', pretrained=False, dec_name='monodepth')
    base = DepthNet(**kw)
    net = DepthNet(**kw, enc_remat=policy)
    p = base.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(net.init(jax.random.PRNGKey(1), x)))

    def loss(m, v):
        return m.apply(v, x)['disp'][0].mean()

    l0, g0 = jax.value_and_grad(lambda v: loss(base, v))(p)
    l1, g1 = jax.value_and_grad(lambda v: loss(net, v))(p)
    assert float(l0) == float(l1)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-6


def test_enc_remat_rejected_for_non_convnext():
    with pytest.raises(KeyError, match='ConvNeXt'):
        DepthNet(enc_name='resnet18', pretrained=False,
                 enc_remat='dots').init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
