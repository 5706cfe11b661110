"""Config-tree validation: every recipe constructs its nets + losses.

Catches drift between the YAML trees and the registries/constructors without
needing dataset files on disk (dataset sections are structure-checked only).
"""
from pathlib import Path

import pytest

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.config import load_merge_yaml

CFG = Path(__file__).resolve().parents[1] / 'cfg'

KBR = sorted((CFG / 'kbr').glob('*.yaml'))
BENCH = sorted(p for p in (CFG / 'benchmark').glob('*.yaml') if p.stem != 'default')
OURS = sorted(p for p in (CFG / 'benchmark_ours').glob('*.yaml') if p.stem != 'default')
ABL = sorted(p for d in CFG.glob('abl_*') for p in d.glob('*.yaml') if p.stem != 'default')


def _merge(default: Path, override: Path) -> dict:
    return load_merge_yaml(default, override)


@pytest.mark.parametrize('variant', [p for p in KBR if p.stem != 'default'],
                         ids=lambda p: f'kbr/{p.stem}')
def test_kbr_recipes_construct(variant):
    cfg = _merge(CFG / 'kbr' / 'default.yaml', variant)
    nets = parsers.get_net(cfg['net'])
    losses, weights = parsers.get_loss(cfg['loss'])
    assert 'depth' in nets
    assert set(weights) == set(losses)
    assert 'dataset' in cfg and 'trainer' in cfg
    tx = parsers.make_optimizer(cfg, steps_per_epoch=10)
    assert tx is not None


@pytest.mark.parametrize('variant', BENCH + OURS + ABL,
                         ids=lambda p: f'{p.parent.name}/{p.stem}')
def test_benchmark_recipes_construct(variant):
    default = variant.parent / 'default.yaml'
    if variant.parent.name.startswith('abl_'):
        cfg = load_merge_yaml(CFG / 'benchmark' / 'default.yaml', default, variant)
    else:
        cfg = _merge(default, variant)
    nets = parsers.get_net(cfg['net'])
    losses, weights = parsers.get_loss(cfg['loss'])
    assert 'depth' in nets
    # Recipes dropping the pose net must keep a stereo-only supp config.
    if 'pose' not in nets:
        ds = next(iter(cfg['dataset'].values()))
        assert ds.get('supp_idxs') == [0]
    tx = parsers.make_optimizer(cfg, steps_per_epoch=10)
    assert tx is not None


def test_adamw_weight_decay_skips_bias_and_norm_params():
    """timm `filter_bias_and_bn` parity: the reference's module-path optimizer
    (`create_optimizer_v2(module)`, ref `src/tools/parsers.py:243`) excludes
    ndim<=1 params (biases, LN/BN scales) from weight decay."""
    import jax
    import jax.numpy as jnp

    params = {'encoder': {'kernel': jnp.ones((3, 3)), 'bias': jnp.ones((3,))},
              'head': {'scale': jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    tx = parsers.get_opt({'type': 'adamw', 'lr': 0.1, 'weight_decay': 0.1})
    upd, _ = tx.update(grads, tx.init(params), params)
    # Zero grads + fresh state: the only update is the decoupled decay term.
    assert float(jnp.abs(upd['encoder']['kernel']).sum()) > 0
    assert float(jnp.abs(upd['encoder']['bias']).sum()) == 0
    assert float(jnp.abs(upd['head']['scale']).sum()) == 0


def test_adamw_backbone_lr_path_decays_everything():
    """With `backbone_lr` the reference passes explicit param-group lists and
    timm does NOT filter — every param (incl. biases) decays. Gate identically."""
    import jax
    import jax.numpy as jnp

    params = {'encoder': {'kernel': jnp.ones((3, 3)), 'bias': jnp.ones((3,))},
              'head': {'scale': jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    tx = parsers.get_opt({'type': 'adamw', 'lr': 0.1, 'weight_decay': 0.1,
                          'backbone_lr': 0.01})
    upd, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(upd['encoder']['bias']).sum()) > 0
    assert float(jnp.abs(upd['head']['scale']).sum()) > 0


@pytest.mark.parametrize('f', sorted((CFG / 'eval').glob('*.yaml')) +
                         sorted((CFG / 'export').glob('*.yaml')),
                         ids=lambda p: f'{p.parent.name}/{p.stem}')
def test_eval_export_cfgs_parse(f):
    import yaml
    cfg = yaml.safe_load(open(f))
    assert 'dataset' in cfg and 'type' in cfg['dataset']
    if f.parent.name == 'eval':
        assert 'args' in cfg and 'metrics' in cfg['args']


def test_merge_semantics_match_reference_io():
    """Differential: our YAML merge == the reference's `io.load_merge_yaml`
    (recursive dict merge, scalar replace, `~` nulls preserved for the
    parser-level component deletion) over real recipe chains, including a
    3-file chain and a `~`-deletion recipe (garg: `pose: ~`)."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from ref_compat import import_reference
    if import_reference() is None:
        pytest.skip('reference not importable')
    from src.utils.io import load_merge_yaml as ref_merge

    chains = [
        (CFG / 'kbr' / 'default.yaml', CFG / 'kbr' / 'base.yaml'),
        (CFG / 'kbr' / 'default.yaml', CFG / 'kbr' / 'base.yaml',
         CFG / 'kbr' / 'tpu.yaml'),
        (CFG / 'benchmark' / 'default.yaml', CFG / 'benchmark' / 'dvso.yaml'),
        (CFG / 'benchmark' / 'default.yaml', CFG / 'benchmark' / 'garg.yaml'),
        (CFG / 'benchmark' / 'default.yaml', CFG / 'benchmark' / 'feat_depth.yaml'),
    ]
    for chain in chains:
        assert load_merge_yaml(*chain) == ref_merge(*chain), chain


def test_flatten_optimizer_matches_adamw():
    """`optimizer.flatten: true` (flat-buffer adam moments, opt-in perf
    experiment) is update-equivalent to plain optax.adamw incl. the wd mask
    and LR schedule, across several steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    params = {'encoder': {'kernel': jnp.ones((3, 4)), 'bias': jnp.ones((4,))},
              'head': {'w': jnp.full((2, 5), 0.5), 'scale': jnp.ones((5,))}}
    base = dict(lr=0.01, weight_decay=0.01)
    sched = {'steplr': {'step_size': 1, 'gamma': 0.5}}

    tx_a = parsers.get_opt({'type': 'adamw', **base}, steps_per_epoch=2,
                           sched_cfg=sched)
    tx_b = parsers.get_opt({'type': 'adamw', 'flatten': True, **base},
                           steps_per_epoch=2, sched_cfg=sched)

    pa = pb = params
    sa, sb = tx_a.init(pa), tx_b.init(pb)
    rng = np.random.default_rng(0)
    for _ in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32), pa)
        ua, sa = tx_a.update(g, sa, pa)
        ub, sb = tx_b.update(g, sb, pb)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    rtol=1e-6, atol=1e-8), ua, ub)
        import optax
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
