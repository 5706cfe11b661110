"""External baseline models: NeWCRFs + MiDaS DPT ports and converters.

The NeWCRFs test is differential against the ACTUAL vendored reference torch
model (`src/external_libs/newcrfs/...`, imported with eval-faithful shims for
timm.models.layers / mmcv.cnn): random-init torch weights are converted with
`convert_newcrfs` and the two implementations must agree, which validates the
architecture port AND the checkpoint converter in one shot.

MiDaS has no importable reference here (needs torch-hub); instead the
conversion primitives (ConvTranspose flip, packed-qkv -> flax MHA) are pinned
against torch directly, and the converter is checked structurally against the
`MidasDPT` parameter tree.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import import_reference_newcrfs  # noqa: E402

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RNG = np.random.default_rng(7)


class TestNewcrfsParity:
    def test_differential_tiny(self):
        """Full-model differential: reference torch NewCRFDepth('tiny07') vs
        our Flax port with converted weights."""
        RefNewCRFDepth = import_reference_newcrfs()
        if RefNewCRFDepth is None:
            pytest.skip('reference NeWCRFs not importable')

        from slowtv_monodepth_tpu.models import NewCRFDepth
        from slowtv_monodepth_tpu.models.import_newcrfs import convert_newcrfs

        torch.manual_seed(0)
        ref = RefNewCRFDepth(version='tiny07', max_depth=10.0,
                             pretrained=None).eval()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}

        x = RNG.standard_normal((1, 160, 224, 3), dtype=np.float32)
        with torch.no_grad():
            d_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        d_ref = d_ref.numpy().transpose(0, 2, 3, 1)

        net = NewCRFDepth(version='tiny07', max_depth=10.0)
        variables = convert_newcrfs(sd, version='tiny07')
        d = np.asarray(net.apply(variables, jnp.asarray(x), train=False))

        assert d.shape == d_ref.shape == (1, 160, 224, 1)
        np.testing.assert_allclose(d, d_ref, atol=2e-3, rtol=1e-3)

    def test_pixel_shuffle(self):
        from slowtv_monodepth_tpu.models.newcrfs import _pixel_shuffle
        x = RNG.standard_normal((2, 3, 5, 16), dtype=np.float32)
        ref = torch.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
        out = _pixel_shuffle(jnp.asarray(x), 2)
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)

    @pytest.mark.parametrize('scale', [1, 2, 3, 6])
    def test_adaptive_avg_pool(self, scale):
        from slowtv_monodepth_tpu.models.newcrfs import _adaptive_avg_pool
        x = RNG.standard_normal((2, 7, 11, 4), dtype=np.float32)
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale)
        out = _adaptive_avg_pool(jnp.asarray(x), scale)
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    def test_predictor_missing_weights(self):
        from slowtv_monodepth_tpu.core.predictors import NewcrfsPredictor
        with pytest.raises(FileNotFoundError):
            NewcrfsPredictor().load_model('indoor')
        with pytest.raises(ValueError):
            NewcrfsPredictor().load_model('underwater')


class TestMidasConversionPrimitives:
    @pytest.mark.parametrize('k,s', [(4, 4), (2, 2)])
    def test_convtranspose_flip(self, k, s):
        """Pin the torch->flax ConvTranspose conversion (kernel must be
        spatially flipped; flax doesn't flip)."""
        import flax.linen as nn
        from slowtv_monodepth_tpu.models.import_midas import _convt

        torch.manual_seed(1)
        tc = torch.nn.ConvTranspose2d(5, 3, k, stride=s)
        x = torch.randn(1, 5, 6, 7)
        with torch.no_grad():
            ref = tc(x).numpy().transpose(0, 2, 3, 1)
        m = nn.ConvTranspose(3, (k, k), strides=(s, s), padding='VALID')
        out = m.apply(
            {'params': {'kernel': jnp.asarray(_convt(tc.weight.detach().numpy())),
                        'bias': jnp.asarray(tc.bias.detach().numpy())}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_packed_qkv_to_flax_mha(self):
        """Pin `_mha`: timm packed-qkv attention == flax MHA with converted
        params."""
        import flax.linen as nn
        from slowtv_monodepth_tpu.models.import_midas import _mha

        dim, heads, n = 32, 4, 9
        torch.manual_seed(2)
        qkv = torch.nn.Linear(dim, dim * 3)
        proj = torch.nn.Linear(dim, dim)
        x = torch.randn(2, n, dim)

        with torch.no_grad():  # timm ViT attention forward, spelled out.
            q, k, v = qkv(x).reshape(2, n, 3, heads, dim // heads) \
                .permute(2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
            attn = attn.softmax(dim=-1)
            ref = proj((attn @ v).transpose(1, 2).reshape(2, n, dim)).numpy()

        sd = {'a.qkv.weight': qkv.weight.detach().numpy(),
              'a.qkv.bias': qkv.bias.detach().numpy(),
              'a.proj.weight': proj.weight.detach().numpy(),
              'a.proj.bias': proj.bias.detach().numpy()}
        params = jax.tree.map(jnp.asarray, _mha(sd, 'a', dim, heads))
        m = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=dim)
        out = m.apply({'params': params}, jnp.asarray(x.numpy()),
                      jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_midas_converter_structure(self):
        """Fake DPT state dict (vitb16) converts to exactly the `MidasDPT`
        init tree (names + shapes)."""
        import chex
        from slowtv_monodepth_tpu.models.import_midas import convert_midas_dpt
        from slowtv_monodepth_tpu.models.midas import MidasDPT

        dim, depth, channels = 768, 12, (96, 192, 384, 768)
        sd = {
            'pretrained.model.cls_token': np.zeros((1, 1, dim), np.float32),
            'pretrained.model.pos_embed': np.zeros((1, 577, dim), np.float32),
            'pretrained.model.patch_embed.proj.weight':
                np.zeros((dim, 3, 16, 16), np.float32),
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
        for s, ch in enumerate(channels):
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
            elif s == 1:
                sd[f'pretrained.act_postprocess{k}.4.weight'] = \
                    np.zeros((ch, ch, 2, 2), np.float32)
            elif s == 3:
                sd[f'pretrained.act_postprocess{k}.4.weight'] = \
                    np.zeros((ch, ch, 3, 3), np.float32)
            if s != 2:
                sd[f'pretrained.act_postprocess{k}.4.bias'] = \
                    np.zeros(ch, np.float32)
            sd[f'scratch.layer{k}_rn.weight'] = np.zeros((256, ch, 3, 3), np.float32)
            pre = f'scratch.refinenet{k}'
            for unit in ('resConfUnit1', 'resConfUnit2'):
                for c in ('conv1', 'conv2'):
                    sd[f'{pre}.{unit}.{c}.weight'] = np.zeros((256, 256, 3, 3), np.float32)
                    sd[f'{pre}.{unit}.{c}.bias'] = np.zeros(256, np.float32)
            sd[f'{pre}.out_conv.weight'] = np.zeros((256, 256, 1, 1), np.float32)
            sd[f'{pre}.out_conv.bias'] = np.zeros(256, np.float32)
        sd |= {'scratch.output_conv.0.weight': np.zeros((128, 256, 3, 3), np.float32),
               'scratch.output_conv.0.bias': np.zeros(128, np.float32),
               'scratch.output_conv.2.weight': np.zeros((32, 128, 3, 3), np.float32),
               'scratch.output_conv.2.bias': np.zeros(32, np.float32),
               'scratch.output_conv.4.weight': np.zeros((1, 32, 1, 1), np.float32),
               'scratch.output_conv.4.bias': np.zeros(1, np.float32)}

        variables = convert_midas_dpt(sd, backbone='vitb16_384')
        net = MidasDPT(backbone='vitb16_384')
        ref = net.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 96, 3), jnp.float32))
        chex.assert_trees_all_equal_shapes(variables['params'], ref['params'])

    def test_midas_predictor_missing_weights(self):
        from slowtv_monodepth_tpu.core.predictors import MidasPredictor
        with pytest.raises(FileNotFoundError):
            MidasPredictor().load_model('DPT_Large')
        with pytest.raises(ValueError):
            MidasPredictor().load_model('DPT_Banana')
