"""Golden-path regression: reference ckpt -> import -> predict -> align -> metric.

The accuracy-fidelity anchor while real eval data/weights are unavailable
(VERDICT r02 item 8): a random-init reference-layout Lightning checkpoint
(actual reference MonodepthDecoder weights + mini resnet18 encoders, KBR
learn_K cfg) travels the ENTIRE user chain through the real CLIs —
`api/data/import_reference_ckpt.py` -> `api/eval/export_preds.py`
(BenchmarkPredictor, finished-marker layout) -> `api/eval/eval_depth.py`
(align + metrics) -> `api/quickstart/run.py` — so any regression in the
import->predict->align->metric chain trips a test, not a release.
Output-level parity of the imported nets themselves is pinned separately
(test_import_reference.py); this composes the pipeline around them.
Ref fidelity anchor: `results/kbr/base/*/results/*.yaml` layout.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import import_reference  # noqa: E402
from test_eval_api import API, _run_script, _write_img, syns_root  # noqa: E402,F401
from test_import_reference import _TorchPoseHead, _prefixed  # noqa: E402
from test_models import _TorchResNet, _randomize_bn_stats  # noqa: E402

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

src = import_reference()
if src is None:
    pytest.skip('reference not importable', allow_module_level=True)


def _synthesize_ckpt(ckpt_file: Path) -> dict:
    """Random-init reference-layout KBR checkpoint (depth + pose, learn_K)."""
    from src.networks.decoders.monodepth import MonodepthDecoder as RefDec

    torch.manual_seed(3)
    depth_enc = _TorchResNet().eval()
    depth_dec = RefDec(num_ch_enc=(64, 64, 128, 256, 512),
                       enc_sc=(2, 4, 8, 16, 32)).eval()
    pose_enc = _TorchResNet().eval()
    pose_enc.conv1 = tnn.Conv2d(6, 64, 7, 2, 3, bias=False)
    squeeze = tnn.Sequential(tnn.Conv2d(512, 256, 1), tnn.ReLU())
    heads = {'pose': _TorchPoseHead(256, 12), 'focal': _TorchPoseHead(256, 2),
             'offset': _TorchPoseHead(256, 2)}
    for m in (depth_enc, pose_enc):
        _randomize_bn_stats(m)

    sd = {}
    sd |= _prefixed(depth_enc, 'nets.depth.encoder.')
    sd |= _prefixed(depth_dec, 'nets.depth.decoders.disp.')
    sd |= _prefixed(pose_enc, 'nets.pose.encoder.')
    sd |= {f'nets.pose.squeeze.{k}': v.numpy()
           for k, v in squeeze.state_dict().items()}
    for name, head in heads.items():
        sd |= {f'nets.pose.decoders.{name}.{k[4:]}': v.numpy()
               for k, v in head.state_dict().items()}

    cfg = {'net': {'depth': {'enc_name': 'resnet18', 'dec_name': 'monodepth',
                             'out_scales': [0, 1, 2, 3]},
                   'pose': {'enc_name': 'resnet18', 'learn_K': True}},
           'trainer': {'min_depth': 0.1, 'max_depth': 100}}
    torch.save({'state_dict': {k: torch.from_numpy(v) for k, v in sd.items()},
                'hyper_parameters': {'cfg': cfg}}, ckpt_file)
    return cfg


def test_reference_ckpt_to_metrics_golden_path(syns_root, tmp_path):  # noqa: F811
    import slowtv_monodepth_tpu.models.encoders.resnet as resnet_mod

    ckpt_file = tmp_path / 'ref_kbr.ckpt'
    _synthesize_ckpt(ckpt_file)

    run_dir = tmp_path / 'models' / 'kbr' / 'imported' / '42'
    run_dir.mkdir(parents=True)

    # The torch twin is a mini resnet18 (1 block/stage); mirror the spec.
    orig = resnet_mod.RESNET_SPECS['resnet18']
    resnet_mod.RESNET_SPECS['resnet18'] = dict(orig, layers=(1, 1, 1, 1))
    try:
        # The importer writes <out>/last (the reference's last.ckpt layout).
        _run_script(API / 'data' / 'import_reference_ckpt.py',
                    [ckpt_file, '--out', run_dir])
        (run_dir / 'finished').touch()

        # GT targets for the synthetic SYNS fixture.
        _run_script(API / 'data' / 'export_gt' / 'from_dataset.py',
                    ['--type', 'syns_patches', '--mode', 'test',
                     '--datum', 'image depth edge K'])

        # Predict with the imported checkpoint through the benchmark predictor.
        pred_file = tmp_path / 'preds.npz'
        _run_script(API / 'eval' / 'export_preds.py',
                    ['--cfg-file', Path('cfg/eval/syns_test.yaml'),
                     '--ckpt', run_dir / 'last', '--save-file', pred_file])
        preds = np.load(pred_file)['pred']
        assert preds.shape == (2, 192, 640)
        assert np.isfinite(preds).all() and (preds > 0).all()

        # Align + metrics (both alignment families the results YAMLs publish).
        for mode in ('lsqr', 'median'):
            save_file = run_dir / 'results' / f'syns_test_last_{mode}.yaml'
            _run_script(API / 'eval' / 'eval_depth.py',
                        ['--cfg-file', Path('cfg/eval/syns_test.yaml'),
                         '--pred-file', pred_file, '--save-file', save_file,
                         '--align-mode', mode, '--nproc', 1])
            metrics = yaml.safe_load(save_file.read_text())
            assert np.isfinite(metrics['AbsRel']) and metrics['AbsRel'] > 0
            assert 'F-Score (10)' in metrics

        # Quickstart inference consumes the same imported checkpoint.
        img_dir = tmp_path / 'imgs'
        for i in range(2):
            _write_img(img_dir / f'{i}.png', shape=(70, 110), seed=20 + i)
        out_dir = tmp_path / 'qs_out'
        _run_script(API / 'quickstart' / 'run.py',
                    ['--ckpt-file', run_dir / 'last', '--img-dir', img_dir,
                     '--out-dir', out_dir, '--width', 96, '--height', 64])
        for i in range(2):
            disp = np.load(out_dir / f'{i}.npy')
            assert disp.shape[:2] == (70, 110) and np.isfinite(disp).all()
    finally:
        resnet_mod.RESNET_SPECS['resnet18'] = orig
