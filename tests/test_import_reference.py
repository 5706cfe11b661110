"""Reference-checkpoint import: Lightning ckpt -> our parameter trees.

Differential against the ACTUAL reference code where importable (the
`monodepth` decoder imports cleanly); the pose head follows the repo pattern
of a minimal torch twin mirroring the reference layout
(`src/networks/pose.py:75-106`). The end-to-end test synthesizes a full
Lightning checkpoint (mini resnet18 depth + pose, KBR-style cfg), converts
it with the real importer, and compares depth-net outputs through our
DepthNet against the torch composition.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import import_reference  # noqa: E402
from test_models import _TorchResNet, _randomize_bn_stats  # noqa: E402

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RNG = np.random.default_rng(11)
src = import_reference()


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _prefixed(module, prefix):
    return {f'{prefix}{k}': v.numpy() for k, v in module.state_dict().items()}


class _TorchPoseHead(tnn.Module):
    """Reference pose/focal/offset head twin (`src/networks/pose.py:75-85`)."""

    def __init__(self, n_ch, out_ch):
        super().__init__()
        self.seq = tnn.Sequential(
            tnn.Sequential(tnn.Conv2d(n_ch, n_ch, 3, 1, 1), tnn.ReLU()),
            tnn.Sequential(tnn.Conv2d(n_ch, n_ch, 3, 1, 1), tnn.ReLU()),
            tnn.Conv2d(n_ch, out_ch, 1),
        )

    def forward(self, x):
        return self.seq(x).mean((2, 3))


@pytest.mark.skipif(src is None, reason='reference not importable')
def test_monodepth_decoder_conversion_differential():
    """Reference MonodepthDecoder (actual code) vs ours via the converter."""
    from src.networks.decoders.monodepth import MonodepthDecoder as RefDec

    from slowtv_monodepth_tpu.models.decoders.monodepth import MonodepthDecoder
    from slowtv_monodepth_tpu.models.import_reference import \
        convert_monodepth_decoder

    num_ch_enc = (16, 24, 40, 64, 96)
    enc_sc = (2, 4, 8, 16, 32)
    torch.manual_seed(0)
    ref = RefDec(num_ch_enc=num_ch_enc, enc_sc=enc_sc).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    feats_np = [RNG.standard_normal((2, 64 // s, 96 // s, c), dtype=np.float32)
                for s, c in zip(enc_sc, num_ch_enc)]
    with torch.no_grad():
        want = ref([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np])

    dec = MonodepthDecoder(num_ch_enc=num_ch_enc, enc_sc=enc_sc)
    params = jax.tree.map(jnp.asarray, convert_monodepth_decoder(sd))
    got = dec.apply({'params': params}, [jnp.asarray(f) for f in feats_np])

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), _nhwc(want[k]),
                                   rtol=1e-4, atol=1e-5)


def test_full_reference_ckpt_import(tmp_path):
    """Synthesized Lightning ckpt (mini resnet18 depth+pose, learn_K) ->
    importer CLI -> our checkpoint -> DepthNet/PoseNet outputs match torch."""
    if src is None:
        pytest.skip('reference not importable')
    from src.networks.decoders.monodepth import MonodepthDecoder as RefDec

    from slowtv_monodepth_tpu.core.checkpoint import load_checkpoint
    from slowtv_monodepth_tpu.models import DepthNet, PoseNet

    torch.manual_seed(1)
    # --- torch side: reference-layout nets (mini resnet18-style encoder).
    depth_enc = _TorchResNet().eval()
    depth_dec = RefDec(num_ch_enc=(64, 64, 128, 256, 512),
                       enc_sc=(2, 4, 8, 16, 32)).eval()
    pose_enc = _TorchResNet().eval()
    pose_enc.conv1 = tnn.Conv2d(6, 64, 7, 2, 3, bias=False)
    squeeze = tnn.Sequential(tnn.Conv2d(512, 256, 1), tnn.ReLU())
    head_pose = _TorchPoseHead(256, 12)
    head_focal = _TorchPoseHead(256, 2)
    head_offset = _TorchPoseHead(256, 2)
    for m in (depth_enc, pose_enc):
        _randomize_bn_stats(m)

    sd = {}
    sd |= _prefixed(depth_enc, 'nets.depth.encoder.')
    sd |= _prefixed(depth_dec, 'nets.depth.decoders.disp.')
    sd |= _prefixed(pose_enc, 'nets.pose.encoder.')
    sd |= {f'nets.pose.squeeze.{k}': v.numpy()
           for k, v in squeeze.state_dict().items()}
    for name, head in (('pose', head_pose), ('focal', head_focal),
                       ('offset', head_offset)):
        sd |= {f'nets.pose.decoders.{name}.{k[4:]}': v.numpy()
               for k, v in head.state_dict().items()}

    cfg = {'net': {'depth': {'enc_name': 'resnet18', 'dec_name': 'monodepth',
                             'out_scales': [0, 1, 2, 3]},
                   'pose': {'enc_name': 'resnet18', 'learn_K': True}},
           'trainer': {'min_depth': 0.1, 'max_depth': 100}}
    ckpt_file = tmp_path / 'ref.ckpt'
    torch.save({'state_dict': {k: torch.from_numpy(v) for k, v in sd.items()},
                'hyper_parameters': {'cfg': cfg}}, ckpt_file)

    # Our mini-resnet has layers (1,1,1,1); patch the spec for the test.
    import slowtv_monodepth_tpu.models.encoders.resnet as resnet_mod
    orig = resnet_mod.RESNET_SPECS['resnet18']
    resnet_mod.RESNET_SPECS['resnet18'] = dict(orig, layers=(1, 1, 1, 1))
    try:
        sys.path.insert(0, str(Path(__file__).parents[1] / 'api' / 'data'))
        from import_reference_ckpt import import_ckpt
        out = import_ckpt(ckpt_file, tmp_path / 'ours')

        state, meta = load_checkpoint(out)
        assert meta['cfg']['net']['depth']['enc_name'] == 'resnet18'

        x = RNG.standard_normal((1, 64, 96, 3), dtype=np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            want = depth_dec(depth_enc(xt))

        net = DepthNet(enc_name='resnet18', pretrained=False,
                       dec_name='monodepth', out_scales=(0, 1, 2, 3))
        variables = {'params': state.params['depth'],
                     **state.aux.get('depth', {})}
        got = net.apply(variables, jnp.asarray(x), train=False)
        for k in want:
            np.testing.assert_allclose(np.asarray(got['disp'][k]),
                                       _nhwc(want[k]), rtol=1e-3, atol=1e-4)

        # Pose side: axis-angle/translation + learned intrinsics.
        xp = RNG.standard_normal((1, 64, 96, 6), dtype=np.float32)
        with torch.no_grad():
            f = pose_enc(torch.from_numpy(xp.transpose(0, 3, 1, 2)))[-1]
            f = squeeze(f)
            want_pose = 0.01 * head_pose(f).reshape(1, 2, 6)
            want_fs = tnn.functional.softplus(head_focal(f))
            want_cs = torch.sigmoid(head_offset(f))

        pnet = PoseNet(enc_name='resnet18', learn_K=True)
        pvars = {'params': state.params['pose'], **state.aux.get('pose', {})}
        pout = pnet.apply(pvars, jnp.asarray(xp), train=False)
        np.testing.assert_allclose(np.asarray(pout['R']),
                                   want_pose[..., :3].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pout['t']),
                                   want_pose[..., 3:].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pout['fs']), want_fs.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pout['cs']), want_cs.numpy(),
                                   rtol=1e-4, atol=1e-5)
    finally:
        resnet_mod.RESNET_SPECS['resnet18'] = orig
