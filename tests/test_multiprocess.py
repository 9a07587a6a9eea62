"""REAL two-process jax.distributed execution (not simulated): two
subprocesses join one coordinator, each contributes 4 virtual CPU
devices to an 8-device global mesh, fetches its batch-level shard and
assembles GLOBAL arrays via ``make_global_batch``
(``jax.make_array_from_process_local_data``), verifying every host
computes the identical global reduction (SURVEY §2.4/§7 multi-host
input pipeline, executed rather than process-simulated)."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_global_batch():
    port = _free_port()
    coordinator = f'127.0.0.1:{port}'
    worker = Path(__file__).parent / 'multiprocess_worker.py'
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (
        env.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=4').strip()
    env['JAX_NUM_CPU_COLLECTIVES_THREADS'] = '1'
    repo_root = str(worker.parent.parent)
    env['PYTHONPATH'] = os.pathsep.join(
        p for p in (repo_root, env.get('PYTHONPATH')) if p)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, '2', str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(worker.parent.parent))
        for i in range(2)
    ]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=600)
            outputs.append(out)
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for i, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f'proc {i} failed:\n{out[-3000:]}'
        assert f'proc {i}: 4 global batches OK' in out, out[-2000:]
