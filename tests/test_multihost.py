"""Multi-host runtime helpers (single-process behaviors; the multi-process
branches delegate to jax.distributed / make_array_from_process_local_data,
exercised on real pods)."""
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
