"""End-to-end drive of the eval API scripts, as a user runs them.

Chain (ref `api/eval/README` flow): fabricate a finished training run ->
`api/data/export_gt/from_dataset.py` (GT targets npz) ->
`api/eval/export_preds.py` (predictions npz, finished-marker guard) ->
`api/eval/eval_depth.py` (MonoDepthEvaluator -> mean-metrics YAML) ->
`api/eval/generate_tables.py` (per-seed aggregation -> markdown table).
Every script runs through its own `__main__` (runpy + argv), not internals.
"""
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml
from PIL import Image

import jax
import jax.numpy as jnp

from slowtv_monodepth_tpu import parsers, paths
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.core.checkpoint import save_checkpoint

REPO = Path(__file__).resolve().parents[1]
API = REPO / 'api'


def _write_img(path, shape=(48, 64), seed=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, shape + (3,), dtype=np.uint8)).save(path)


@pytest.fixture
def syns_root(tmp_path):
    root = tmp_path / 'syns_patches'
    scene = '01'
    for i, stem in enumerate(('00.png', '01.png')):
        _write_img(root / scene / 'images' / stem, seed=1 + i)
        (root / scene / 'depths').mkdir(parents=True, exist_ok=True)
        np.save(root / scene / 'depths' / stem.replace('.png', '.npy'),
                1 + 20 * np.random.default_rng(i).random((48, 64)).astype(np.float32))
        edges = np.zeros((48, 64), np.uint8)
        edges[20] = 255
        (root / scene / 'edges').mkdir(parents=True, exist_ok=True)
        Image.fromarray(edges).save(root / scene / 'edges' / stem)
    (root / scene / 'info.txt').write_text('Scene 01\nScene Category: Outdoor: Park\n')
    (root / 'splits').mkdir(parents=True)
    (root / 'splits' / 'test_files.txt').write_text(f'{scene} 00.png\n{scene} 01.png\n')
    paths.DATA_PATHS['syns_patches'] = root
    yield root
    paths.DATA_PATHS.pop('syns_patches', None)


def _run_script(script: Path, argv: list) -> None:
    old_argv = sys.argv
    sys.argv = [str(script)] + [str(a) for a in argv]
    # `python path/to/script.py` puts the script dir on sys.path[0];
    # runpy.run_path does not — mirror the CLI (eval_depth imports its
    # sibling export_preds).
    sys.path.insert(0, str(script.parent))
    try:
        runpy.run_path(str(script), run_name='__main__')
    finally:
        sys.argv = old_argv
        sys.path.remove(str(script.parent))


def _base_cfg(**sections) -> dict:
    """Tiny resnet18 KBR-style recipe shared by every drive in this file."""
    cfg = {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'resnet18', 'pretrained': False},
        },
        'loss': {'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
                 'disp_smooth': {'weight': 0.001, 'use_edges': True}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4},
        'trainer': {'min_depth': 0.1, 'max_depth': 100},
    }
    cfg.update(sections)
    return cfg


def _slowtv_train_sections() -> dict:
    """dataset/loader sections for the synthetic slow_tv fixture."""
    return {
        'dataset': {'slow_tv': {
            'split': 'all', 'datum': 'image support K', 'supp_idxs': [-1, 1],
            'train': {'mode': 'train', 'use_aug': True, 'shape': [32, 64]},
            'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 64]},
        }},
        'loader': {'batch_size': 2, 'drop_last': True, 'num_workers': 0,
                   'train': {'shuffle': True}, 'val': {'shuffle': False}},
    }


def _make_finished_run(tmp_path) -> Path:
    """Fabricate a trained run dir: checkpoint w/ embedded cfg + marker."""
    cfg = _base_cfg()
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg)
    imgs = jnp.zeros((1, 64, 96, 3), jnp.float32)
    x = {'imgs': imgs, 'supp_imgs': jnp.stack([imgs, imgs])}
    state = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx)

    run_dir = tmp_path / 'models' / 'kbr' / 'tiny' / '42'
    run_dir.mkdir(parents=True)
    save_checkpoint(run_dir / 'last', state, cfg)
    return run_dir


def test_eval_api_chain(syns_root, tmp_path, capsys):
    run_dir = _make_finished_run(tmp_path)
    eval_cfg = REPO / 'cfg' / 'eval' / 'syns_test.yaml'

    # GT export: targets npz lands next to the split file.
    _run_script(API / 'data' / 'export_gt' / 'from_dataset.py',
                ['--type', 'syns_patches', '--mode', 'test',
                 '--datum', 'image depth edge K'])
    target_file = syns_root / 'splits' / 'targets_test.npz'
    assert target_file.is_file()
    data = dict(np.load(target_file, allow_pickle=True))
    assert set(data) >= {'depth', 'K', 'edge', 'cat', 'subcat'}
    assert data['cat'].tolist() == ['Outdoor', 'Outdoor']

    # Unfinished run refused (the `finished` marker guard).
    pred_file = tmp_path / 'preds.npz'
    with pytest.raises(SystemExit):
        _run_script(API / 'eval' / 'export_preds.py',
                    ['--cfg-file', eval_cfg, '--ckpt', run_dir / 'last',
                     '--save-file', pred_file])

    (run_dir / 'finished').touch()
    _run_script(API / 'eval' / 'export_preds.py',
                ['--cfg-file', eval_cfg, '--ckpt', run_dir / 'last',
                 '--save-file', pred_file])
    preds = np.load(pred_file)['pred']
    assert preds.shape == (2, 192, 640)  # syns predictor shape
    assert np.isfinite(preds).all() and (preds > 0).any()

    # Evaluate -> per-seed results YAML in the reference layout.
    save_file = run_dir / 'results' / 'syns_test_last_lsqr.yaml'
    _run_script(API / 'eval' / 'eval_depth.py',
                ['--cfg-file', eval_cfg, '--pred-file', pred_file,
                 '--save-file', save_file, '--align-mode', 'lsqr',
                 '--nproc', 2])
    metrics = yaml.safe_load(save_file.read_text())
    assert np.isfinite(metrics['AbsRel'])
    assert 'F-Score (10)' in metrics
    assert any(k.endswith('-Edges') for k in metrics)  # edge second pass

    # Aggregate seeds -> table.
    capsys.readouterr()
    _run_script(API / 'eval' / 'generate_tables.py',
                ['--root', tmp_path / 'models', '--exp', 'kbr',
                 '--dataset', 'syns_test', '--ckpt', 'last',
                 '--mode', 'lsqr', '--fmt', 'markdown'])
    out = capsys.readouterr().out
    assert 'tiny' in out and 'Rel' in out


def test_quickstart_run_script(tmp_path):
    """Drive `api/quickstart/run.py` exactly as the README shows: ckpt +
    image dir -> colormapped png + raw npy disparity per image."""
    run_dir = _make_finished_run(tmp_path)
    img_dir = tmp_path / 'imgs'
    for i in range(2):
        _write_img(img_dir / f'{i}.png', shape=(70, 110), seed=10 + i)
    out_dir = tmp_path / 'out'

    _run_script(API / 'quickstart' / 'run.py',
                ['--ckpt-file', run_dir / 'last', '--img-dir', img_dir,
                 '--out-dir', out_dir, '--width', 96, '--height', 64])

    for i in range(2):
        png, npy = out_dir / f'{i}.png', out_dir / f'{i}.npy'
        assert png.is_file() and npy.is_file()
        disp = np.load(npy)
        # Predictions are resized back to the ORIGINAL image resolution.
        assert disp.shape[:2] == (70, 110)
        assert np.isfinite(disp).all()


def test_mapfree_generate_preds_script(tmp_path):
    """Drive `api/mapfree/generate_preds.py`: predict, lsqr-align to the DPT
    baseline depth, and write challenge-format uint16 mm PNGs in place."""
    import cv2

    root = tmp_path / 'mapfree'
    scene_dir = root / 'val' / 's00000' / 'seq0'
    scene_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        stem = f'frame_{i:05}'
        Image.fromarray(rng.integers(0, 255, (72, 96, 3), dtype=np.uint8)).save(
            scene_dir / f'{stem}.jpg')
        depth_mm = (1000 * (1 + 9 * rng.random((72, 96)))).astype(np.uint16)
        cv2.imwrite(str(scene_dir / f'{stem}.dptkitti.png'), depth_mm)
        lines.append(f's00000 seq0 {stem}\n')
    (root / 'splits').mkdir(parents=True)
    (root / 'splits' / 'val_files.txt').write_text(''.join(lines))
    (root / 'val' / 's00000' / 'intrinsics.txt').write_text(''.join(
        f'seq0/frame_{i:05}.jpg 60.0 60.0 48.0 36.0 96 72\n' for i in range(2)))
    paths.DATA_PATHS['mapfree'] = root
    try:
        run_dir = _make_finished_run(tmp_path)
        (run_dir / 'finished').touch()
        _run_script(API / 'mapfree' / 'generate_preds.py',
                    ['--ckpt', run_dir / 'last', '--name', 'ours',
                     '--mode', 'val'])
        for i in range(2):
            f = scene_dir / f'frame_{i:05}.ours.png'
            assert f.is_file()
            depth = np.array(Image.open(f), dtype=np.float32) / 1000
            # Challenge format: the dataset serves GT at its canonical
            # portrait shape, and preds are upsampled to match.
            assert depth.shape == (720, 540)
            assert np.isfinite(depth).all() and (depth > 0).any()
    finally:
        paths.DATA_PATHS.pop('mapfree', None)


@pytest.fixture
def slowtv_root(tmp_path):
    root = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(8):
        _write_img(root / seq / f'{stem:010}.png', seed=stem)
    np.savetxt(root / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    (root / 'splits' / 'all').mkdir(parents=True)
    (root / 'splits' / 'all' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(1, 5)))
    (root / 'splits' / 'all' / 'val_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(5, 7)))
    (root / 'splits' / 'categories.txt').write_text('natural-hiking\n')
    paths.DATA_PATHS['slow_tv'] = root
    yield root
    paths.DATA_PATHS.pop('slow_tv', None)


def test_train_script_end_to_end(slowtv_root, tmp_path):
    """Drive `api/train/train.py` exactly as a user would: merged cfg yamls ->
    fit 1 epoch -> versioned run dir with ckpts, tensorboard events, and the
    `finished` marker the eval scripts gate on."""
    cfg = _base_cfg(
        **_slowtv_train_sections(),
        optimizer={'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        trainer={'max_epochs': 1, 'min_depth': 0.1, 'max_depth': 100,
                 'monitor': 'loss', 'log_every_n_steps': 1,
                 'logger': 'tensorboard'},
    )
    # Split across two files to exercise the merge chain.
    cfg_a = tmp_path / 'default.yaml'
    cfg_b = tmp_path / 'exp.yaml'
    trainer_over = {'trainer': cfg.pop('trainer')}
    cfg_a.write_text(yaml.safe_dump(cfg))
    cfg_b.write_text(yaml.safe_dump(trainer_over))

    out_root = tmp_path / 'out'
    _run_script(API / 'train' / 'train.py',
                ['-c', cfg_a, cfg_b, '-o', out_root, '-n', 'tiny', '-s', 17,
                 '-g', 1])

    run_dir = out_root / 'tiny' / '000'
    models = run_dir / 'models'
    assert (models / 'last').is_dir() and (models / 'best').is_dir()
    assert (models / 'finished').is_file()
    assert list(run_dir.glob('logs/**/events.out.tfevents.*'))
    # The run is immediately consumable by the eval chain's marker guard.
    from slowtv_monodepth_tpu.core.checkpoint import load_checkpoint
    state, meta = load_checkpoint(models / 'last')
    assert meta['cfg']['net']['depth']['enc_name'] == 'resnet18'
    assert int(state.step) > 0


def test_train_dev_script(slowtv_root, tmp_path):
    """Drive `api/train/train_dev.py` (debug harness): tight epoch/batch
    limits into /tmp, per-step finite-loss checks."""
    cfg = _base_cfg(
        **_slowtv_train_sections(),
        trainer={'min_depth': 0.1, 'max_depth': 100, 'monitor': 'loss',
                 'log_every_n_steps': 1},
    )
    cfg_file = tmp_path / 'dev.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))
    _run_script(API / 'train' / 'train_dev.py',
                ['-c', cfg_file, '--epochs', 1, '--batches', 2, '-s', 7])


def test_export_preds_sharded_matches_single(syns_root, tmp_path):
    """`--devices 8` shards prediction batches over the mesh (a capability the
    reference's single-GPU eval lacks): output must match the single-device
    path, including the partial final batch (2 images on an 8-device mesh ->
    edge-pad to 8, slice back)."""
    from api.eval.export_preds import compute_preds
    from slowtv_monodepth_tpu.config import load_yaml

    run_dir = _make_finished_run(tmp_path)
    (run_dir / 'finished').touch()
    cfg = load_yaml(REPO / 'cfg' / 'eval' / 'syns_test.yaml')['dataset']

    p1 = compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0)
    p8 = compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                       devices=8)
    assert p8.shape == p1.shape == (2, 192, 640)
    np.testing.assert_allclose(p8, p1, rtol=1e-5, atol=1e-6)

    # 2-D (data x model) mesh: batches shard over 2 data shards, weights
    # place under the tensor-parallel rules (`parallel/tp.py`; a ConvNeXt
    # depth net has no TP-matched leaves, so they replicate — the point here
    # is the full CLI path over the 2-D mesh, incl. the partial batch).
    p24 = compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                        devices=8, model_shards=4)
    np.testing.assert_allclose(p24, p1, rtol=1e-5, atol=1e-6)

    # (data x spatial) mesh: the 192-row eval images height-shard 4-ways
    # (XLA halo-exchanges the conv overlaps; `parallel/spatial.py`). Slightly
    # looser tolerance: the partitioned convs reassociate f32 reductions and
    # this random-init net amplifies the noise through depth — a halo BUG
    # would be O(1), far outside it.
    p_sp = compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                         devices=8, spatial_shards=4)
    np.testing.assert_allclose(p_sp, p1, rtol=5e-4, atol=1e-4)

    # Full composition: data x spatial x model.
    p_all = compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                          devices=8, spatial_shards=2, model_shards=2)
    np.testing.assert_allclose(p_all, p1, rtol=5e-4, atol=1e-4)

    with pytest.raises(ValueError, match='must divide'):
        compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                      devices=8, model_shards=3)
    with pytest.raises(ValueError, match='must divide'):
        compute_preds(dict(cfg), str(run_dir / 'last'), num_workers=0,
                      devices=8, spatial_shards=4, model_shards=4)


def test_quickstart_default_img_dir(tmp_path):
    """With --img-dir omitted, quickstart generates + uses `assets/demo`
    (synthetic stand-ins for the reference's assets photos — see
    assets/README.md)."""
    import shutil
    run_dir = _make_finished_run(tmp_path)
    out_dir = tmp_path / 'out_demo'
    demo = Path(__file__).resolve().parents[1] / 'assets' / 'demo'
    existed = demo.is_dir()
    try:
        _run_script(API / 'quickstart' / 'run.py',
                    ['--ckpt-file', run_dir / 'last', '--out-dir', out_dir,
                     '--width', 96, '--height', 64])
        npys = sorted(out_dir.glob('*.npy'))
        assert len(npys) == 6, npys  # 2 images x 3 demo categories
        for f in npys:
            disp = np.load(f)
            assert disp.shape[:2] == (384, 640)  # back at source resolution
            assert np.isfinite(disp).all()
    finally:
        if not existed:
            shutil.rmtree(demo, ignore_errors=True)
