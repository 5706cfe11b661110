"""Worker for the 2-process `MonoDepthLoop.fit` test (test_multihost.py).

Each process owns 4 virtual CPU devices; `initialize_distributed` joins them
into one 8-device runtime. Both processes drive the FULL loop (ref §5.8 loop
semantics, not just array assembly): per-process sharded loaders feeding the
global batch assembly, aspect-ratio aug with the process-synchronized bucket
stream, checkpoint/marker writes gated to process 0, then a resume run.

Writes one JSON line to TWOPROC_OUT with everything the parent asserts on:
sampler shard indices, is_main/marker/ckpt-write observations, the final
param norm (must agree across processes), and the resume bookkeeping.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_cfg(max_epochs: int) -> dict:
    return {
        'seed': 42,
        'net': {
            'depth': {'enc_name': 'toy', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'toy', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'dataset': {
            'slow_tv': {
                'split': 'all', 'datum': 'image support K', 'supp_idxs': [-1, 1],
                'train': {'mode': 'train', 'use_aug': True, 'shape': [40, 72]},
                'val': {'mode': 'val', 'use_aug': False, 'shape': [32, 64]},
            },
        },
        'loader': {'batch_size': 4, 'drop_last': True, 'num_workers': 0,
                   'train': {'shuffle': True}, 'val': {'shuffle': False}},
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'trainer': {'max_epochs': max_epochs, 'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'monitor': 'loss',
                    'log_every_n_steps': 1,
                    'aspect_ratio_aug_prob': 1.0,
                    'aspect_ratio_ref_shape': [32, 64]},
    }


def main() -> None:
    nproc = int(os.environ['TWOPROC_NPROC'])
    pid = int(os.environ.get('TWOPROC_PID', '0'))
    out_file = os.environ['TWOPROC_OUT']
    ckpt_dir = Path(os.environ['TWOPROC_CKPT'])

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 8 // nproc)

    from slowtv_monodepth_tpu.parallel.multihost import initialize_distributed
    if nproc > 1:
        initialize_distributed(os.environ['TWOPROC_COORD'], nproc, pid)
    from jax.experimental import multihost_utils

    from slowtv_monodepth_tpu import paths
    from slowtv_monodepth_tpu.core import MonoDepthLoop
    from slowtv_monodepth_tpu.parallel import make_mesh

    paths.DATA_PATHS['slow_tv'] = Path(os.environ['TWOPROC_DATA'])
    mesh = make_mesh(8, platform='cpu')

    # Observe every checkpoint write that actually happens on this process.
    from slowtv_monodepth_tpu.core import checkpoint as ckpt_mod
    writes = []
    orig_save = ckpt_mod.save_checkpoint

    def counting_save(path, *a, **kw):
        writes.append(str(path))
        return orig_save(path, *a, **kw)

    ckpt_mod.save_checkpoint = counting_save

    # ---- Phase 1: fresh 1-epoch fit, both processes on the SHARED ckpt dir.
    loop = MonoDepthLoop(make_cfg(max_epochs=1), ckpt_dir, mesh=mesh,
                         shard_id=pid, num_shards=nproc)
    loop.fit()

    dl = loop.train_dl  # Single-dataset cfg -> plain DataLoader (no Concat).
    sampler = (dl.loaders[0] if hasattr(dl, 'loaders') else dl).sampler
    sampler.set_epoch(0)
    shard_idxs = list(sampler)
    pnorm = float(np.sqrt(sum(
        float(jax.numpy.sum(v.astype(jax.numpy.float32) ** 2))
        for v in jax.tree_util.tree_leaves(loop.state.params))))
    step1 = int(loop.state.step)

    # ---- Phase 2: resume with more epochs. Process 0 clears the `finished`
    # marker (as `train.py --resume` workflows do); everyone waits, then both
    # processes construct a fresh loop against the same dir and it must pick
    # up at epoch 1 from the `last` checkpoint.
    if loop.is_main:
        (ckpt_dir / 'finished').unlink()
    if nproc > 1:
        multihost_utils.sync_global_devices('resume')
    loop2 = MonoDepthLoop(make_cfg(max_epochs=2), ckpt_dir, mesh=mesh,
                          shard_id=pid, num_shards=nproc)
    loop2.fit()

    rec = {
        'pid': pid,
        'is_main': bool(loop.is_main),
        'had_manager': loop.manager is not None,
        'shard_idxs': shard_idxs,
        'param_norm': pnorm,
        'step_phase1': step1,
        'ckpt_writes': writes,
        'resume_start_epoch': loop2.start_epoch,
        'step_phase2': int(loop2.state.step),
        'finished': (ckpt_dir / 'finished').is_file(),
    }
    with open(out_file, 'w') as f:
        f.write(json.dumps(rec) + '\n')
    print(f'loop worker pid={pid}/{nproc}: {rec["param_norm"]:.4f}')


if __name__ == '__main__':
    main()
