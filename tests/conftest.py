"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding is validated on host CPU devices
(`--xla_force_host_platform_device_count=8`), the standard JAX recipe for
testing `Mesh`/`pjit` logic without real hardware.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and pins
# jax_platforms; unit tests must run on the 8-device virtual CPU mesh.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

# Persistent compile cache: repeat suite runs skip recompiling the big jitted
# train steps (several minutes each on CPU). Host-keyed under /tmp — never in
# the worktree, which may move between machines (r02 post-mortem).
import sys  # noqa: E402
import pathlib  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('tests')
