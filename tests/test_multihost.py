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
