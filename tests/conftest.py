"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on a virtual CPU mesh — the
fake-backend capability the reference lacks (SURVEY.md §4).

jax may already be imported by a pytest plugin (jaxtyping) before this file
runs, so env vars alone are unreliable; use jax.config.update, which works
any time before backend initialization.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_num_cpu_devices', 8)
except AttributeError:  # older jax: XLA_FLAGS path above covers it
    pass

assert jax.default_backend() == 'cpu', (
    'tests must run on the virtual CPU mesh, got '
    f'{jax.default_backend()!r}')
assert jax.device_count() >= 8, 'expected 8 virtual CPU devices'

# Persistent compilation cache: the suite is compile-bound on the 1-core
# CPU CI; repeat runs hit the cache.
import tempfile, pathlib  # noqa: E402
_cache = pathlib.Path(tempfile.gettempdir()) / 'wsss_tpu_jax_cache'
_cache.mkdir(exist_ok=True)
jax.config.update('jax_compilation_cache_dir', str(_cache))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
