"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

The session environment pins JAX_PLATFORMS=axon (a remote-compile TPU
tunnel) and *preimports* jax via sitecustomize, so env vars alone are read
too late — ``jax.config.update`` is the only override that sticks.

``PBSED_TEST_TPU=1`` skips the CPU override so the TPU-gated hardware
tests (``-k tpu``: revisited-output RMW semantics the interpreter cannot
certify) run on the attached chip; everything else still passes there
but pays remote compiles, so keep hardware runs to the gated subset.
"""
import os

if os.environ.get('PBSED_TEST_TPU') != '1':
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8'
        ).strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax

    jax.config.update('jax_platforms', 'cpu')
else:
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)
