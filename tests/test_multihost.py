"""Multi-host runtime helpers: single-process behaviors in-process, plus a
REAL 2-process `jax.distributed` CPU run (subprocess) covering the
`make_array_from_process_local_data` branch of `global_batch_sharding` and
cross-process collectives in a sharded train step."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slowtv_monodepth_tpu.parallel import make_mesh
from slowtv_monodepth_tpu.parallel.multihost import (
    global_batch_sharding, initialize_distributed, is_main_process,
    process_info)


def test_single_host_identity():
    assert is_main_process()
    assert process_info() == (0, 1)


def test_initialize_distributed_noop_without_env(monkeypatch):
    for var in ('JAX_COORDINATOR_ADDRESS', 'JAX_NUM_PROCESSES', 'JAX_PROCESS_ID'):
        monkeypatch.delenv(var, raising=False)
    initialize_distributed()  # Single host: must not try to join anything.
    assert jax.process_count() == 1


def test_global_batch_sharding_single_host():
    mesh = make_mesh(8, platform='cpu')
    batch = {'imgs': np.arange(8 * 4 * 6 * 3, dtype=np.float32).reshape(8, 4, 6, 3),
             'K': np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))}
    out = global_batch_sharding(mesh, batch)
    assert out['imgs'].shape == (8, 4, 6, 3)
    # Sharded over the data axis: one batch row per device.
    assert len(out['imgs'].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out['imgs']), batch['imgs'])
    np.testing.assert_array_equal(np.asarray(out['K']), batch['K'])


REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).resolve().parent / '_two_process_worker.py'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _worker_env(nproc: int, pid: int, out: Path, coord: str = '') -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS', 'JAX_COORDINATOR_ADDRESS',
                        'JAX_NUM_PROCESSES', 'JAX_PROCESS_ID')}
    env.update(TWOPROC_NPROC=str(nproc), TWOPROC_PID=str(pid),
               TWOPROC_OUT=str(out))
    if coord:
        env['TWOPROC_COORD'] = coord
    return env


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process(tmp_path):
    """2x `jax.distributed` CPU processes (4 devices each) run one sharded
    toy-KBR train step through `global_batch_sharding`; the loss must equal
    the single-process 8-device run on the same global batch.

    Covers the `process_count > 1` branch of `parallel/multihost.py`
    (VERDICT r02 §5.8) — the per-rank batch assembly mirroring the
    reference's per-rank DistributedSampler (`src/tools/parsers.py:191-202`).
    """
    coord = f'127.0.0.1:{_free_port()}'
    outs = [tmp_path / f'p{i}.txt' for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, str(WORKER)], cwd=REPO,
                         env=_worker_env(2, i, outs[i], coord),
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    results = [p.communicate(timeout=700) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, f'worker failed:\n{se[-3000:]}'

    # Single-process reference on the identical global batch.
    ref_out = tmp_path / 'ref.txt'
    r = subprocess.run([sys.executable, str(WORKER)], cwd=REPO,
                       env=_worker_env(1, 0, ref_out),
                       capture_output=True, text=True, timeout=700)
    assert r.returncode == 0, r.stderr[-3000:]

    losses, steps = zip(*(
        (float(f.read_text().split()[0]), int(f.read_text().split()[1]))
        for f in (*outs, ref_out)))
    assert steps == (1, 1, 1)
    assert losses[0] == losses[1], f'ranks disagree: {losses}'
    np.testing.assert_allclose(losses[0], losses[2], rtol=1e-5,
                               err_msg=f'2-proc vs 1-proc: {losses}')


LOOP_WORKER = Path(__file__).resolve().parent / '_two_process_loop_worker.py'


@pytest.mark.slow
def test_two_process_loop_fit(tmp_path):
    """`MonoDepthLoop.fit` driven by BOTH processes of a 2-process
    `jax.distributed` runtime (VERDICT r03 #6 — §5.8 LOOP semantics, not just
    array assembly): per-process loader shards disjoint, AR-aug bucket stream
    process-synchronized, checkpoint/marker writes on process 0 only, resume
    picks up at epoch 1 on both processes.

    Reference behavior being mirrored: per-rank `DistributedSampler`
    (`src/tools/parsers.py:191-202`) + `rank_zero_only` write gating
    (`src/core/trainer.py:186`, Lightning ModelCheckpoint on rank 0).
    """
    import json

    from PIL import Image

    # Shared synthetic SlowTV tree (the "shared filesystem" of a pod).
    data = tmp_path / 'slow_tv'
    seq = '00001'
    for stem in range(20):
        p = data / seq / f'{stem:010}.png'
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.random.default_rng(stem).integers(
            0, 255, (40, 72, 3), dtype=np.uint8)).save(p)
    np.savetxt(data / seq / 'intrinsics.txt',
               np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    (data / 'splits' / 'all').mkdir(parents=True)
    (data / 'splits' / 'all' / 'train_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(2, 18)))
    (data / 'splits' / 'all' / 'val_files.txt').write_text(
        '\n'.join(f'{seq} {i}' for i in range(2, 10)))
    (data / 'splits' / 'categories.txt').write_text('natural-hiking\n')

    ckpt_dir = tmp_path / 'run'
    coord = f'127.0.0.1:{_free_port()}'
    outs = [tmp_path / f'loop_p{i}.json' for i in range(2)]
    procs = []
    for i in range(2):
        env = _worker_env(2, i, outs[i], coord)
        env.update(TWOPROC_DATA=str(data), TWOPROC_CKPT=str(ckpt_dir))
        procs.append(subprocess.Popen(
            [sys.executable, str(LOOP_WORKER)], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = [p.communicate(timeout=1200) for p in procs]
    if any(p.returncode != 0 for p in procs):
        blob = '\n'.join(f'--- worker {i} rc={p.returncode} ---\n{se[-4000:]}'
                         for i, (p, (so, se)) in enumerate(zip(procs, results)))
        raise AssertionError(f'loop worker(s) failed:\n{blob}')

    recs = {r['pid']: r for r in (json.loads(f.read_text()) for f in outs)}
    p0, p1 = recs[0], recs[1]

    # Write gating: markers + checkpoints only on process 0.
    assert p0['is_main'] and p0['had_manager']
    assert not p1['is_main'] and not p1['had_manager']
    assert p0['ckpt_writes'], 'process 0 wrote no checkpoints'
    assert p1['ckpt_writes'] == [], f'process 1 wrote: {p1["ckpt_writes"]}'
    assert p0['finished'] and p1['finished']

    # Loader shards disjoint and jointly exhaustive (16 items, 8 each).
    s0, s1 = set(p0['shard_idxs']), set(p1['shard_idxs'])
    assert len(s0) == len(s1) == 8
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(range(16))

    # One global SPMD computation: identical state on both processes.
    # 16 items / (batch 4 x 2 hosts) = 2 global steps per epoch.
    assert p0['step_phase1'] == p1['step_phase1'] == 2
    np.testing.assert_allclose(p0['param_norm'], p1['param_norm'], rtol=1e-6)

    # Resume: both processes restart at epoch 1 and finish epoch 2.
    assert p0['resume_start_epoch'] == p1['resume_start_epoch'] == 1
    assert p0['step_phase2'] == p1['step_phase2'] == 4
