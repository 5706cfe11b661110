"""Dress rehearsal of `slowtv-validate-release` (VERDICT r03 item 1).

The release-validation harness must be ready to run the day real
data/weights are provisioned with ZERO new code: a random-init
reference-layout Lightning checkpoint (the golden-path fixture) + the
synthetic SYNS dataset travel the ENTIRE chain through the real CLI —
auto-import -> export_preds -> eval_depth (lsqr + median) -> baseline diff
table -> exit status — exercising both the FAIL path (vs the published
`cfg/validate/baselines.yaml` numbers, which a random net cannot match) and
the PASS path (vs a baselines file seeded from its own measured metrics).

Fidelity anchor: `/root/reference/results/kbr/base/042/results/
syns_test_last_lsqr.yaml` naming + BASELINE.md "Rebuild targets".
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import import_reference  # noqa: E402
from test_eval_api import API, _run_script, syns_root  # noqa: E402,F401
from test_golden_path import _synthesize_ckpt  # noqa: E402

pytest.importorskip('torch')

src = import_reference()
if src is None:
    pytest.skip('reference not importable', allow_module_level=True)

REPO = Path(__file__).resolve().parents[1]


def _run_validate(argv) -> int:
    try:
        _run_script(API / 'eval' / 'validate_release.py', argv)
    except SystemExit as e:
        return int(e.code or 0)
    return 0


@pytest.mark.slow
def test_validate_release_dress_rehearsal(syns_root, tmp_path, capsys):  # noqa: F811
    import slowtv_monodepth_tpu.models.encoders.resnet as resnet_mod

    ckpt_file = tmp_path / 'kbr_042.ckpt'
    _synthesize_ckpt(ckpt_file)

    # GT targets for the synthetic SYNS fixture (as a user would export them).
    _run_script(API / 'data' / 'export_gt' / 'from_dataset.py',
                ['--type', 'syns_patches', '--mode', 'test',
                 '--datum', 'image depth edge K'])

    # The fixture's torch twin is a mini resnet18 (1 block/stage).
    orig = resnet_mod.RESNET_SPECS['resnet18']
    resnet_mod.RESNET_SPECS['resnet18'] = dict(orig, layers=(1, 1, 1, 1))
    try:
        # FAIL path: a random-init net cannot be within 1% of the published
        # kbr/base numbers. Must still emit the per-dataset result YAMLs in
        # the reference layout + the report, and exit 1.
        out1 = tmp_path / 'val_fail'
        rc = _run_validate(['--ckpt', ckpt_file, '--model', 'kbr/base',
                            '--datasets', 'syns_test', '--out', out1,
                            '--nproc', 1, '--num-workers', 0])
        assert rc == 1, f'expected gate failure, got rc={rc}'
        for align in ('lsqr', 'median'):
            f = out1 / 'seed_000' / 'results' / f'syns_test_last_{align}.yaml'
            assert f.is_file(), f'missing result YAML {f}'
            metrics = yaml.safe_load(f.read_text())
            assert np.isfinite(metrics['AbsRel'])
            assert 'F-Score (10)' in metrics
        report = yaml.safe_load((out1 / 'validation_report.yaml').read_text())
        assert report['passed'] is False and report['n_failed'] > 0
        gated = {(r['dataset'], r['align'], r['metric']): r
                 for r in report['rows']}
        assert ('syns_test', 'lsqr', 'AbsRel') in gated
        assert ('syns_test', 'median', 'F-Score (10)') in gated
        table = capsys.readouterr().out
        assert 'FAIL' in table and 'syns_test' in table

        # PASS path: baselines seeded from the measured metrics themselves
        # (what a true release run looks like when fidelity holds). The
        # cached preds npz from the FAIL run is reused via --out.
        ours = {r['metric']: r['ours'] for r in report['rows']
                if r['align'] == 'lsqr'}
        base = {'kbr/base': {'syns_test': {'last': {
            'lsqr': {m: v for m, v in ours.items()},
            'median': {r['metric']: r['ours'] for r in report['rows']
                       if r['align'] == 'median'},
        }}}}
        base_file = tmp_path / 'baselines_self.yaml'
        base_file.write_text(yaml.safe_dump(base))
        out2 = tmp_path / 'val_pass'
        rc = _run_validate(['--ckpt', ckpt_file, '--model', 'kbr/base',
                            '--datasets', 'syns_test', '--out', out2,
                            '--baselines', base_file,
                            '--nproc', 1, '--num-workers', 0])
        assert rc == 0, 'expected pass against self-seeded baselines'
        report2 = yaml.safe_load((out2 / 'validation_report.yaml').read_text())
        assert report2['passed'] is True and report2['n_failed'] == 0
        assert report2['n_evaluated'] == 4  # 2 aligns x {AbsRel, F-Score}.

        # Datasets without provisioned data are SKIPPED, not failed (the
        # real run may provision a subset first); exit reflects evaluated
        # rows only.
        out3 = tmp_path / 'val_skip'
        rc = _run_validate(['--ckpt', ckpt_file, '--model', 'kbr/base',
                            '--datasets', 'syns_test', 'sintel',
                            '--out', out3, '--baselines', base_file,
                            '--nproc', 1, '--num-workers', 0])
        assert rc == 0
        report3 = yaml.safe_load((out3 / 'validation_report.yaml').read_text())
        statuses = {r['dataset']: r['status'] for r in report3['rows']}
        assert statuses.get('sintel') == 'SKIPPED'
    finally:
        resnet_mod.RESNET_SPECS['resnet18'] = orig


def test_validate_release_preds_only(syns_root, tmp_path, capsys):  # noqa: F811
    """`--preds` validates ONLY the evaluator/alignment/metric stack from
    pre-computed prediction NPZs (the reference's released predictions) —
    no checkpoints, conversion, or network forward (VERDICT r04 item 9)."""
    _run_script(API / 'data' / 'export_gt' / 'from_dataset.py',
                ['--type', 'syns_patches', '--mode', 'test',
                 '--datum', 'image depth edge K'])

    released = tmp_path / 'released'
    released.mkdir()
    rng = np.random.default_rng(0)
    # (b, h, w) unscaled disparities, reference release layout
    # (`api/eval/export_preds.py:19`: np.savez_compressed(file, pred=...)).
    preds = (0.05 + rng.random((2, 48, 64))).astype(np.float32)
    np.savez_compressed(released / 'syns_test.npz', pred=preds)

    # FAIL path: random preds cannot match the published kbr/base numbers.
    out1 = tmp_path / 'po_fail'
    rc = _run_validate(['--preds', released, '--model', 'kbr/base',
                        '--datasets', 'syns_test', '--out', out1,
                        '--nproc', 1])
    assert rc == 1, f'expected gate failure, got rc={rc}'
    report = yaml.safe_load((out1 / 'validation_report.yaml').read_text())
    assert report['preds_only'] is True and report['n_seeds'] == 1
    assert report['n_failed'] > 0
    for align in ('lsqr', 'median'):
        f = out1 / 'preds_only' / 'results' / f'syns_test_last_{align}.yaml'
        assert f.is_file(), f'missing result YAML {f}'
        assert np.isfinite(yaml.safe_load(f.read_text())['AbsRel'])

    # PASS path vs self-seeded baselines, using the dataset=path pair form.
    ours = {a: {r['metric']: r['ours'] for r in report['rows']
                if r['align'] == a} for a in ('lsqr', 'median')}
    base_file = tmp_path / 'baselines_po.yaml'
    base_file.write_text(yaml.safe_dump(
        {'kbr/base': {'syns_test': {'last': ours}}}))
    out2 = tmp_path / 'po_pass'
    rc = _run_validate(['--preds', f'syns_test={released / "syns_test.npz"}',
                        '--model', 'kbr/base', '--datasets', 'syns_test',
                        '--out', out2, '--baselines', base_file,
                        '--nproc', 1])
    assert rc == 0, 'expected pass against self-seeded baselines'
    report2 = yaml.safe_load((out2 / 'validation_report.yaml').read_text())
    assert report2['passed'] is True and report2['n_evaluated'] == 4

    # Datasets with no released preds are SKIPPED, not failed.
    out3 = tmp_path / 'po_skip'
    rc = _run_validate(['--preds', released, '--model', 'kbr/base',
                        '--datasets', 'syns_test', 'sintel', '--out', out3,
                        '--baselines', base_file, '--nproc', 1])
    assert rc == 0
    report3 = yaml.safe_load((out3 / 'validation_report.yaml').read_text())
    statuses = {r['dataset']: r['status'] for r in report3['rows']}
    assert statuses.get('sintel') == 'SKIPPED'
