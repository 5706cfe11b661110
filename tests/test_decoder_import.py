"""Decoder checkpoint converters: differential vs the ACTUAL reference
torch decoders (hrdepth/ddvnet/diffnet/cadepth/superdepth; monodepth is
covered in test_import_reference). Random-initialized reference decoder ->
state dict -> converter -> our Flax decoder; outputs must match per scale.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import import_reference  # noqa: E402

src = import_reference()
if src is None:
    pytest.skip('reference not importable', allow_module_level=True)
import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from slowtv_monodepth_tpu.models import decoders as our_dec  # noqa: E402
from slowtv_monodepth_tpu.models.import_reference import (  # noqa: E402
    convert_cadepth_decoder, convert_ddvnet_decoder, convert_diffnet_decoder,
    convert_hrdepth_decoder, convert_superdepth_decoder)

B, H, W = 2, 64, 96
CHANS = (64, 64, 128, 256, 512)
ENC_SC = (2, 4, 8, 16, 32)
OUT_SC = (0, 1, 2, 3)


def _features(seed=0, chans=CHANS, enc_sc=ENC_SC):
    rng = np.random.default_rng(seed)
    feats = [rng.standard_normal((B, c, H // s, W // s)).astype(np.float32)
             for c, s in zip(chans, enc_sc)]
    feats_t = [torch.from_numpy(f) for f in feats]
    feats_j = [np.transpose(f, (0, 2, 3, 1)) for f in feats]
    return feats_t, feats_j


def _randomize(module):
    """Keep torch's variance-stable default init (fully random already), but
    randomize BN running stats and kill symmetric init patterns (SuperDepth's
    ICNR repeat) so channel-ordering bugs can't hide. Blanket std-0.5 re-init
    is NOT used: activations explode through the deep stacks and saturate
    every softmax/sigmoid, making outputs flip on float noise."""
    torch.manual_seed(3)
    from src.networks.decoders.superdepth import SubPixelConv
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, SubPixelConv):
                tnn.init.normal_(m.conv.weight, std=0.05)
                tnn.init.normal_(m.conv.bias, std=0.05)


def _run_pair(ref_cls, our_cls, convert_fn, chans=CHANS, enc_sc=ENC_SC,
              out_ch=1, atol=2e-5, conv_kw=None):
    conv_kw = conv_kw or {}
    ref = ref_cls(num_ch_enc=list(chans), enc_sc=list(enc_sc),
                  out_sc=list(OUT_SC), out_ch=out_ch)
    _randomize(ref)
    ref.eval()
    feats_t, feats_j = _features(chans=chans, enc_sc=enc_sc)
    with torch.no_grad():
        out_ref = ref(feats_t)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = convert_fn(sd, OUT_SC, **conv_kw)

    ours = our_cls(num_ch_enc=tuple(chans), enc_sc=tuple(enc_sc),
                   out_sc=OUT_SC, out_ch=out_ch)
    # The converted tree must be drop-in for a freshly initialized one.
    init_vars = ours.init(jax.random.PRNGKey(0), feats_j, train=False)
    assert (jax.tree_util.tree_structure(init_vars['params'])
            == jax.tree_util.tree_structure(params))
    variables = {'params': params}
    if stats:
        assert (jax.tree_util.tree_structure(init_vars['batch_stats'])
                == jax.tree_util.tree_structure(stats))
        variables['batch_stats'] = stats
    out_ours = ours.apply(variables, feats_j, train=False)

    assert set(out_ours) == set(out_ref)
    for s in out_ref:
        ref_s = out_ref[s].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out_ours[s]), ref_s, atol=atol,
                                   err_msg=f'scale {s}')


def test_hrdepth_import():
    from src.networks.decoders.hrdepth import HRDepthDecoder as Ref
    _run_pair(Ref, our_dec.HRDepthDecoder, convert_hrdepth_decoder)


def test_hrdepth_import_4scale():
    """4-stage encoders (e.g. ConvNeXt) take the duplicated-first-stage path."""
    from src.networks.decoders.hrdepth import HRDepthDecoder as Ref
    with pytest.warns(UserWarning):
        _run_pair(Ref, our_dec.HRDepthDecoder, convert_hrdepth_decoder,
                  chans=(64, 128, 256, 512), enc_sc=(4, 8, 16, 32))


def test_ddvnet_import():
    from src.networks.decoders.ddvnet import DDVNetDecoder as Ref
    # atol: the 128-bin softmax expectation amplifies f32 conv-reassociation
    # noise in the logits; observed diff (~5e-4) is a small fraction of one
    # bin width (1/128 = 7.8e-3), far below any structural divergence.
    _run_pair(Ref, our_dec.DDVNetDecoder, convert_ddvnet_decoder, atol=1e-3)


def test_diffnet_import():
    from src.networks.decoders.diffnet import DiffNetDecoder as Ref
    _run_pair(Ref, our_dec.DiffNetDecoder, convert_diffnet_decoder)


def test_diffnet_import_convnext_scales():
    """With a 4-stage encoder, stages 0 AND 1 are skip-less upsample blocks."""
    from src.networks.decoders.diffnet import DiffNetDecoder as Ref
    _run_pair(Ref, our_dec.DiffNetDecoder, convert_diffnet_decoder,
              chans=(64, 128, 256, 512), enc_sc=(4, 8, 16, 32),
              conv_kw={'enc_sc': (4, 8, 16, 32)})


def test_cadepth_import():
    from src.networks.decoders.cadepth import CaDepthDecoder as Ref
    _run_pair(Ref, our_dec.CaDepthDecoder, convert_cadepth_decoder, atol=1e-4)


def test_superdepth_import():
    from src.networks.decoders.superdepth import SuperdepthDecoder as Ref
    _run_pair(Ref, our_dec.SuperdepthDecoder, convert_superdepth_decoder)


def test_virtual_stereo_channels():
    """Virtual-stereo (3-channel) outputs convert too (DVSO-style ckpts)."""
    from src.networks.decoders.hrdepth import HRDepthDecoder as Ref
    _run_pair(Ref, our_dec.HRDepthDecoder, convert_hrdepth_decoder, out_ch=3)
