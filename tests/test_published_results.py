"""Differential: the results-aggregation pipeline on the ACTUAL published data.

The reference repo ships its per-seed result YAMLs under
`/root/reference/results/<exp>/<model>/<seed>/results/` (README "Results") —
these define the published headline numbers (BASELINE.md). Here we drive OUR
`api/eval/generate_tables.py` over those real files and differential-test
every stage (model discovery, per-seed frames, legacy-metric merging, seed
means/stddevs, rendered tables) against the reference's own
`api/eval/generate_tables.py` + `TableFormatter` (ref
`api/eval/generate_tables.py:11-109`, `src/tools/table_formatter.py:18`)
imported and run on the same files.

Also pins the aggregated means to the published headline values so the
fixture itself is verified (KBR base on SYNS-Patches test, lsqr: AbsRel
22.40 / F-Score 18.50 — BASELINE.md "Rebuild targets").
"""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from ref_compat import import_reference

RESULTS = Path('/root/reference/results')

pytestmark = pytest.mark.skipif(not RESULTS.is_dir(),
                                reason='reference results not mounted')


def _load_module(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ours():
    return _load_module(Path(__file__).parents[1] / 'api/eval/generate_tables.py',
                        'ours_generate_tables')


@pytest.fixture(scope='module')
def ref():
    assert import_reference() is not None
    return _load_module(Path('/root/reference/api/eval/generate_tables.py'),
                        'ref_generate_tables')


def _aggregate(mod, exp: str, dataset: str, ckpt: str, mode: str):
    files, models = mod.get_models(RESULTS, exp=exp, dataset=dataset,
                                   ckpt=ckpt, mode=mode)
    df, metric_type = mod.filter_df(mod.load_dfs(files))
    df_mean, df_std = mod.get_df_mean(df, models, name=f'{exp}/{dataset}')
    return files, models, df, metric_type, df_mean, df_std


CASES = [
    ('kbr', 'syns_test', 'last', 'lsqr'),
    ('kbr', 'kitti_eigen_benchmark', 'last', 'median'),
    ('benchmark', 'syns_test', 'best', 'lsqr'),
    ('midas', 'kitti_eigen_benchmark', 'best', 'lsqr'),
]


@pytest.mark.parametrize('exp,dataset,ckpt,mode', CASES)
def test_aggregation_matches_reference(ours, ref, exp, dataset, ckpt, mode):
    files_o, models_o, df_o, mt_o, mean_o, std_o = _aggregate(
        ours, exp, dataset, ckpt, mode)
    files_r, models_r, df_r, mt_r, mean_r, std_r = _aggregate(
        ref, exp, dataset, ckpt, mode)

    # Identical model discovery and per-seed file sets.
    assert models_o == models_r
    assert {k: [str(p) for p in v] for k, v in files_o.items()} == \
           {k: [str(p) for p in v] for k, v in files_r.items()}
    assert len(models_o) >= 2  # Real published data, not an empty glob.

    # Identical metric selection + direction and per-seed values.
    assert list(mt_o) == list(mt_r)
    assert df_o.shape == df_r.shape
    np.testing.assert_allclose(df_o.to_numpy(float), df_r.to_numpy(float),
                               rtol=0, atol=0)

    # Identical seed means / stddevs (ordering included).
    assert list(mean_o.index) == list(mean_r.index)
    np.testing.assert_allclose(mean_o.to_numpy(float), mean_r.to_numpy(float))
    np.testing.assert_allclose(std_o.to_numpy(float), std_r.to_numpy(float),
                               equal_nan=True)


def test_rendered_tables_match_reference(ours, ref):
    """Our TableFormatter makes the same highlighting DECISIONS and rounds to
    the same digits as the reference's on the published KBR table (rendering
    cosmetics — booktabs preamble etc. — are deliberately redesigned)."""
    from slowtv_monodepth_tpu.tools import TableFormatter as OurFormatter
    *_, mt, mean, _ = _aggregate(ours, 'kbr', 'syns_test', 'last', 'lsqr')
    *_, mt_r, mean_r, _ = _aggregate(ref, 'kbr', 'syns_test', 'last', 'lsqr')

    ref_fmt = ref.TableFormatter.from_df(mean_r, metrics=mt_r)
    our_fmt = OurFormatter.from_df(mean, metrics=mt)

    # Same best / second-best choices per column.
    np.testing.assert_array_equal(np.asarray(our_fmt.best_mask),
                                  np.asarray(ref_fmt.best_mask))
    np.testing.assert_array_equal(np.asarray(our_fmt.nbest_mask),
                                  np.asarray(ref_fmt.nbest_mask))
    # Same row/column order and 2-digit rendered values.
    assert list(our_fmt.labels) == list(ref_fmt.labels)
    assert list(our_fmt.header) == list(ref_fmt.header)
    fmt = np.vectorize(lambda v: f'{float(v):.2f}')
    np.testing.assert_array_equal(fmt(our_fmt.body), fmt(ref_fmt.body))
    # Every mean value appears in both rendered tables.
    latex, md = our_fmt.to_latex(precision=2), our_fmt.to_markdown(precision=2)
    ref_latex = ref_fmt.to_latex(precision=2)
    for s in fmt(our_fmt.body).ravel():
        assert s in latex and s in md and s in ref_latex


def test_published_headline_numbers(ours):
    """The seed-averaged KBR numbers reproduce BASELINE.md's headline targets
    (means over seeds {042,195,335} of the published YAMLs)."""
    *_, mean, _ = _aggregate(ours, 'kbr', 'syns_test', 'last', 'lsqr')
    base = mean.loc['base']
    assert abs(float(base['Rel']) - 22.40) < 0.01
    assert abs(float(base['F']) - 18.50) < 0.01

    *_, mean_k, _ = _aggregate(ours, 'kbr', 'kitti_eigen_benchmark', 'last',
                               'lsqr')
    assert abs(float(mean_k.loc['base']['Rel']) - 6.84) < 0.01
    assert abs(float(mean_k.loc['base']['F']) - 56.17) < 0.01
