"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

The session environment pins JAX_PLATFORMS=axon (a remote-compile TPU
tunnel) and *preimports* jax via sitecustomize, so env vars alone are read
too late — ``jax.config.update`` is the only override that sticks.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
