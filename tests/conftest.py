"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count) — the fake-backend capability the
reference lacks (SURVEY.md §4).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
