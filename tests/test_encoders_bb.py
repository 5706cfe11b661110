"""Backbone-ablation encoder families: ResNeXt / EfficientNet / MobileNetV3 /
HRNet (`cfg/abl_bb`, `cfg/abl_pretrained` parity).

Differential tests follow the repo pattern (see `test_models.py`): minimal
torch modules mirroring the timm state-dict layout and forward semantics,
random weights mapped through the real converters, outputs compared. This
pins the grouped/depthwise conv conversions, SE blocks, hard-swish/sigmoid
gates and BN handling against torch's kernels. The full stage tables are
pinned separately by the channel-spec test (b0/b4/mnv3-large match timm's
published feature channels). HRNet has no importable torch twin here, so it
gets spec/shape + end-to-end DepthNet tests; weight grafting fails loudly on
any shape mismatch by construction.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RNG = np.random.default_rng(3)


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TestResNeXtGroupedConv:
    def test_grouped_bottleneck_differential(self):
        """ResNeXt-style grouped bottleneck vs torch, through convert_resnet."""
        from slowtv_monodepth_tpu.models.encoders.import_torch import convert_resnet
        from slowtv_monodepth_tpu.models.encoders.resnet import ResNetEncoder

        groups, base_width = 4, 16  # width = planes * 16/64 * 4 = planes.

        class _Torch(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                for stage in range(4):
                    planes = 64 * 2 ** stage
                    inp = 64 if stage == 0 else 64 * 2 ** (stage - 1) * 4
                    width = planes  # int(planes * 16/64) * 4
                    blk = tnn.Module()
                    blk.conv1 = tnn.Conv2d(inp, width, 1, bias=False)
                    blk.bn1 = tnn.BatchNorm2d(width)
                    s = 1 if stage == 0 else 2
                    blk.conv2 = tnn.Conv2d(width, width, 3, s, 1,
                                           groups=groups, bias=False)
                    blk.bn2 = tnn.BatchNorm2d(width)
                    blk.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
                    blk.bn3 = tnn.BatchNorm2d(planes * 4)
                    blk.downsample = tnn.Sequential(
                        tnn.Conv2d(inp, planes * 4, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * 4))
                    setattr(self, f'layer{stage + 1}', tnn.Sequential(blk))

            def forward(self, x):
                x = torch.relu(self.bn1(self.conv1(x)))
                feats = [x]
                x = self.maxpool(x)
                for stage in range(4):
                    blk = getattr(self, f'layer{stage + 1}')[0]
                    idn = blk.downsample(x)
                    y = torch.relu(blk.bn1(blk.conv1(x)))
                    y = torch.relu(blk.bn2(blk.conv2(y)))
                    y = blk.bn3(blk.conv3(y))
                    x = torch.relu(y + idn)
                    feats.append(x)
                return feats

        torch.manual_seed(0)
        tm = _Torch().eval()
        _randomize_bn(tm)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_resnet(sd, (1, 1, 1, 1), block='bottleneck')
        enc = ResNetEncoder(block='bottleneck', layers=(1, 1, 1, 1),
                            groups=groups, width_per_group=base_width)

        x = RNG.standard_normal((1, 64, 96, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = enc.apply({'params': params, 'batch_stats': stats},
                        jnp.asarray(x), train=False)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), _nhwc(w),
                                       rtol=1e-3, atol=1e-4)


# --- Minimal timm-layout MBConv torch modules ---------------------------------

class _TorchSE(tnn.Module):
    def __init__(self, ch, rd, act, gate):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, ch, 1)
        self.act = act
        self.gate = gate

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act(self.conv_reduce(s)))
        return x * self.gate(s)


class _TorchMBNet(tnn.Module):
    """timm-layout EfficientNet/MobileNetV3 trunk for converter parity."""

    def __init__(self, stem, stages, act):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(stem)
        self.act = act
        self.stages_cfg = stages
        self.blocks = tnn.ModuleList()
        in_ch = stem
        acts = {'silu': tnn.functional.silu, 're': torch.relu,
                'hs': tnn.functional.hardswish}
        for blocks in stages:
            stage = tnn.ModuleList()
            for c in blocks:
                m = tnn.Module()
                m.cfg = c
                m.act = acts[c['act']]
                gate = (tnn.functional.hardsigmoid
                        if c['gate'] == 'hard_sigmoid' else torch.sigmoid)
                k, s = c['k'], c['stride']
                if c['type'] == 'cn':
                    m.conv = tnn.Conv2d(in_ch, c['out'], k, s, k // 2, bias=False)
                    m.bn1 = tnn.BatchNorm2d(c['out'])
                elif c['type'] == 'ir':
                    mid = c.get('exp_ch') or in_ch * c['exp_ratio']
                    m.conv_pw = tnn.Conv2d(in_ch, mid, 1, bias=False)
                    m.bn1 = tnn.BatchNorm2d(mid)
                    m.conv_dw = tnn.Conv2d(mid, mid, k, s, k // 2,
                                           groups=mid, bias=False)
                    m.bn2 = tnn.BatchNorm2d(mid)
                    if c['se']:
                        rd = (max(1, int(in_ch * c['se']))
                              if c['gate'] == 'sigmoid' else
                              _mk_div(mid * c['se']))
                        m.se = _TorchSE(mid, rd, m.act, gate)
                    m.conv_pwl = tnn.Conv2d(mid, c['out'], 1, bias=False)
                    m.bn3 = tnn.BatchNorm2d(c['out'])
                else:  # ds
                    m.conv_dw = tnn.Conv2d(in_ch, in_ch, k, s, k // 2,
                                           groups=in_ch, bias=False)
                    m.bn1 = tnn.BatchNorm2d(in_ch)
                    if c['se']:
                        rd = (max(1, int(in_ch * c['se']))
                              if c['gate'] == 'sigmoid' else
                              _mk_div(in_ch * c['se']))
                        m.se = _TorchSE(in_ch, rd, m.act, gate)
                    m.conv_pw = tnn.Conv2d(in_ch, c['out'], 1, bias=False)
                    m.bn2 = tnn.BatchNorm2d(c['out'])
                m.in_ch = in_ch
                in_ch = c['out']
                stage.append(m)
            self.blocks.append(stage)

    def forward(self, x):
        acts = {'silu': tnn.functional.silu, 're': torch.relu,
                'hs': tnn.functional.hardswish}
        x = acts[self.act](self.bn1(self.conv_stem(x)))
        for stage in self.blocks:
            for m in stage:
                c = m.cfg
                if c['type'] == 'cn':
                    x = m.act(m.bn1(m.conv(x)))
                    continue
                sc = x
                if c['type'] == 'ir':
                    y = m.act(m.bn1(m.conv_pw(x)))
                    y = m.act(m.bn2(m.conv_dw(y)))
                    if c['se']:
                        y = m.se(y)
                    y = m.bn3(m.conv_pwl(y))
                else:
                    y = m.act(m.bn1(m.conv_dw(x)))
                    if c['se']:
                        y = m.se(y)
                    y = m.bn2(m.conv_pw(y))
                if c['stride'] == 1 and c['out'] == m.in_ch:
                    y = y + sc
                x = y
        return x


def _mk_div(v, d=8):
    from slowtv_monodepth_tpu.models.encoders.mbnet import _make_divisible
    return _make_divisible(v, d)


@pytest.mark.parametrize('style', ['effnet', 'mnv3'])
def test_mbconv_differential(style):
    """Tiny 3-stage MBConv trunk: timm-layout torch vs MBNetEncoder via the
    real converter — covers ds/ir/cn blocks, SE, silu/relu/hard-swish and
    both SE gates."""
    from slowtv_monodepth_tpu.models.encoders.import_torch import convert_mbnet
    from slowtv_monodepth_tpu.models.encoders.mbnet import MBNetEncoder

    if style == 'effnet':
        act, gate = 'silu', 'sigmoid'
        stages = [
            [dict(type='ds', k=3, stride=1, exp_ratio=1, out=8, se=0.25,
                  act=act, gate=gate)],
            [dict(type='ir', k=3, stride=2, exp_ratio=6, out=12, se=0.25,
                  act=act, gate=gate),
             dict(type='ir', k=5, stride=1, exp_ratio=6, out=12, se=0.25,
                  act=act, gate=gate)],
            [dict(type='ir', k=5, stride=2, exp_ratio=6, out=16, se=0.25,
                  act=act, gate=gate)],
        ]
        stem = 8
    else:
        gate = 'hard_sigmoid'
        stages = [
            [dict(type='ds', k=3, stride=1, exp_ch=None, out=8, se=None,
                  act='re', gate=gate)],
            [dict(type='ir', k=3, stride=2, exp_ch=24, out=12, se=0.25,
                  act='re', gate=gate),
             dict(type='ir', k=5, stride=1, exp_ch=36, out=12, se=0.25,
                  act='hs', gate=gate)],
            [dict(type='cn', k=1, stride=1, exp_ch=None, out=32, se=None,
                  act='hs', gate=gate)],
        ]
        stem = 8
        act = 'hs'

    torch.manual_seed(4)
    tm = _TorchMBNet(stem, stages, act).eval()
    _randomize_bn(tm)
    sd = {k.replace('blocks.', 'blocks.', 1): v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats = convert_mbnet(sd, stages)
    enc = MBNetEncoder(stem=stem, stages=stages, stem_act=act)

    x = RNG.standard_normal((2, 32, 48, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = enc.apply({'params': params, 'batch_stats': stats},
                    jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got[-1]), _nhwc(want),
                               rtol=1e-3, atol=1e-4)


class TestSpecs:
    def test_published_feature_channels(self):
        """Stage tables reproduce timm's published features_only channels."""
        from slowtv_monodepth_tpu.models.encoders.mbnet import MBNET_SPECS
        assert MBNET_SPECS['efficientnet_b0']['channels'] == (16, 24, 40, 112, 320)
        assert MBNET_SPECS['efficientnet_b4']['channels'] == (24, 32, 56, 160, 448)
        assert MBNET_SPECS['mobilenetv3_large_100']['channels'] == (16, 24, 40, 112, 960)

    def test_small_050_shapes(self):
        from slowtv_monodepth_tpu.models.encoders import create_encoder
        enc, chans, reds = create_encoder('mobilenetv3_small_050')
        x = jnp.zeros((1, 64, 96, 3))
        feats = enc.apply(enc.init(jax.random.PRNGKey(0), x), x, train=False)
        assert [f.shape[-1] for f in feats] == list(chans)
        assert [64 // f.shape[1] for f in feats] == list(reds)

    def test_resnext_alias_specs(self):
        from slowtv_monodepth_tpu.models.encoders import ENCODER_SPECS
        for name in ('resnext101_32x8d', 'ssl_resnext101_32x8d',
                     'swsl_resnext101_32x8d'):
            assert ENCODER_SPECS[name]['channels'] == (64, 256, 512, 1024, 2048)


class TestHRNet:
    def test_shapes(self):
        from slowtv_monodepth_tpu.models.encoders import create_encoder
        enc, chans, reds = create_encoder('hrnet_w18')
        x = jnp.zeros((1, 64, 96, 3))
        feats = enc.apply(enc.init(jax.random.PRNGKey(0), x), x, train=False)
        assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 1024]
        assert [64 // f.shape[1] for f in feats] == [2, 4, 8, 16, 32]

    def test_depthnet_with_hrnet(self):
        """End-to-end: DepthNet builds and runs on an HRNet encoder."""
        from slowtv_monodepth_tpu.models import DepthNet
        net = DepthNet(enc_name='hrnet_w18', pretrained=False,
                       dec_name='monodepth', out_scales=(0,))
        x = jnp.zeros((1, 64, 96, 3))
        out = net.apply(net.init(jax.random.PRNGKey(0), x), x, train=False)
        assert out['disp'][0].shape == (1, 64, 96, 1)


class TestDptBackboneMatrix:
    """SwinV2 + hybrid R50-ViT complete the reference's quickstart DPT
    backbone matrix (`api/quickstart/networks/backbones/dpt.py:33-45`)."""

    def test_stdconv_vs_torch(self):
        """_StdConv == torch weight-standardized conv (timm StdConv2d)."""
        from slowtv_monodepth_tpu.models.encoders.vit import _StdConv
        torch.manual_seed(5)
        w = torch.randn(8, 5, 3, 3)
        x = torch.randn(1, 5, 8, 12)
        wn = torch.nn.functional.batch_norm(
            w.reshape(1, 8, -1), None, None, None, None,
            training=True, momentum=0., eps=1e-6).reshape_as(w)
        want = torch.nn.functional.conv2d(x, wn, padding=1)

        m = _StdConv(8, 3)
        kern = jnp.asarray(w.numpy().transpose(2, 3, 1, 0))
        got = m.apply({'params': {'kernel': kern}},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), _nhwc(want),
                                   rtol=1e-4, atol=1e-5)

    def test_swinv2_attention_math(self):
        """Cosine attention + log-CPB bias vs an independent torch spelling
        of the SwinV2 definition, sharing parameters."""
        from slowtv_monodepth_tpu.models.encoders.swin import (
            _WindowAttentionV2, _log_cpb_table, _relative_position_index)

        dim, heads, win = 16, 4, 3
        n = win * win
        m = _WindowAttentionV2(dim, heads, win)
        x = RNG.standard_normal((2, n, dim), dtype=np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
        got = m.apply({'params': params}, jnp.asarray(x))

        p = jax.tree.map(lambda v: torch.from_numpy(np.asarray(v)), params)
        xt = torch.from_numpy(x)
        bias = torch.cat([p['q_bias'], torch.zeros(dim), p['v_bias']])
        qkv = (xt @ p['qkv_kernel'] + bias).reshape(2, n, 3, heads, dim // heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        q = torch.nn.functional.normalize(q, dim=-1)
        k = torch.nn.functional.normalize(k, dim=-1)
        scale = torch.clamp(p['logit_scale'], max=float(np.log(100.0))).exp()
        attn = (q @ k.transpose(-2, -1)) * scale
        table = torch.from_numpy(_log_cpb_table(win)).reshape(-1, 2)
        h = torch.relu(table @ p['cpb_fc1']['kernel'] + p['cpb_fc1']['bias'])
        rel = 16 * torch.sigmoid(h @ p['cpb_fc2']['kernel'])
        idx = torch.from_numpy(_relative_position_index(win).reshape(-1)).long()
        attn = attn + rel[idx].reshape(n, n, heads).permute(2, 0, 1)[None]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(2, n, dim)
        want = out @ p['proj']['kernel'] + p['proj']['bias']
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize('name', ['dpt_swin2t16_256', 'dpt_vitb_rn50_384'])
    def test_depthnet_end_to_end(self, name):
        from slowtv_monodepth_tpu.models import DepthNet
        net = DepthNet(enc_name=name, pretrained=False, dec_name='dpt',
                       out_scales=(0,))
        x = jnp.zeros((1, 96, 128, 3))
        out = net.apply(net.init(jax.random.PRNGKey(0), x), x, train=False)
        assert out['disp'][0].shape == (1, 96, 128, 1)


class TestDptMidasGraft:
    def test_dpt_encoder_grafts_from_midas_dump(self, tmp_path, monkeypatch):
        """`dpt_*` encoders with pretrained=True pull the MiDaS trunk weights
        (the reference's DPT depth nets are MiDaS-initialized)."""
        from slowtv_monodepth_tpu.models.encoders import pretrained as pt

        dim, depth = 768, 12
        sd = {
            'pretrained.model.cls_token': np.full((1, 1, dim), 0.25, np.float32),
            'pretrained.model.pos_embed': np.zeros((1, 577, dim), np.float32),
            'pretrained.model.patch_embed.proj.weight':
                np.ones((dim, 3, 16, 16), np.float32),
            'pretrained.model.patch_embed.proj.bias': np.zeros(dim, np.float32),
        }
        for i in range(depth):
            pre = f'pretrained.model.blocks.{i}'
            sd |= {f'{pre}.norm1.weight': np.ones(dim, np.float32),
                   f'{pre}.norm1.bias': np.zeros(dim, np.float32),
                   f'{pre}.attn.qkv.weight': np.zeros((3 * dim, dim), np.float32),
                   f'{pre}.attn.qkv.bias': np.zeros(3 * dim, np.float32),
                   f'{pre}.attn.proj.weight': np.zeros((dim, dim), np.float32),
                   f'{pre}.attn.proj.bias': np.zeros(dim, np.float32),
                   f'{pre}.norm2.weight': np.ones(dim, np.float32),
                   f'{pre}.norm2.bias': np.zeros(dim, np.float32),
                   f'{pre}.mlp.fc1.weight': np.zeros((4 * dim, dim), np.float32),
                   f'{pre}.mlp.fc1.bias': np.zeros(4 * dim, np.float32),
                   f'{pre}.mlp.fc2.weight': np.zeros((dim, 4 * dim), np.float32),
                   f'{pre}.mlp.fc2.bias': np.zeros(dim, np.float32)}
        for s, ch in enumerate((96, 192, 384, 768)):
            k = s + 1
            sd |= {f'pretrained.act_postprocess{k}.0.project.0.weight':
                       np.zeros((dim, 2 * dim), np.float32),
                   f'pretrained.act_postprocess{k}.0.project.0.bias':
                       np.zeros(dim, np.float32),
                   f'pretrained.act_postprocess{k}.3.weight':
                       np.zeros((ch, dim, 1, 1), np.float32),
                   f'pretrained.act_postprocess{k}.3.bias':
                       np.zeros(ch, np.float32)}
            if s == 0:
                sd[f'pretrained.act_postprocess{k}.4.weight'] = \
                    np.zeros((ch, ch, 4, 4), np.float32)
                sd[f'pretrained.act_postprocess{k}.4.bias'] = np.zeros(ch, np.float32)
            elif s == 1:
                sd[f'pretrained.act_postprocess{k}.4.weight'] = \
                    np.zeros((ch, ch, 2, 2), np.float32)
                sd[f'pretrained.act_postprocess{k}.4.bias'] = np.zeros(ch, np.float32)
            elif s == 3:
                sd[f'pretrained.act_postprocess{k}.4.weight'] = \
                    np.zeros((ch, ch, 3, 3), np.float32)
                sd[f'pretrained.act_postprocess{k}.4.bias'] = np.zeros(ch, np.float32)

        f = tmp_path / 'midas' / 'dpt_b16-test.npz'
        f.parent.mkdir(parents=True)
        np.savez(f, **sd)
        monkeypatch.setattr(pt, 'MODEL_ROOTS', [tmp_path])
        monkeypatch.setitem(pt._DPT_MIDAS_STEMS, 'dpt_vitb16_384',
                            'midas/dpt_b16-test')

        from slowtv_monodepth_tpu.models.encoders import create_encoder
        enc, _, _ = create_encoder('dpt_vitb16_384')
        x = jnp.zeros((1, 64, 96, 3))
        variables = dict(enc.init(jax.random.PRNGKey(0), x))
        wrapped = {'params': {'encoder': variables['params']}}
        grafted = pt.load_pretrained_encoder(dict(wrapped), 'dpt_vitb16_384')
        enc_params = grafted['params']['encoder']
        np.testing.assert_allclose(
            np.asarray(enc_params['cls_token']), 0.25, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(enc_params['patch_embed']['kernel']), 1.0, atol=1e-7)
