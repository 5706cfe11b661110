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
