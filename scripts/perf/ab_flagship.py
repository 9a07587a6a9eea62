"""Trace-measure the flagship FBCRNN train step on the attached TPU.

The round-3 perf workflow (PERFORMANCE.md "Measurement methodology"):
wall-clock through the remote tunnel is untrustworthy, so every claim
comes from profiler-trace DEVICE spans — compile + 3 warm steps, trace
6 steps, report the span median (expected jitter-free: min == median)
plus the stall-gap analysis.

A/B discipline: compare two builds in ONE process (monkeypatch the
module under test between `measure()` calls — each Trainer re-traces
and picks up the patch); never compare across processes. Example:

    import pb_sed_tpu.ops.pallas.conv as C
    new = measure('split')
    C._splits = lambda g: ((0, g.tc),)      # disable the half-split
    old = measure('unsplit')

Usage: python scripts/perf/ab_flagship.py  (prints one arm; edit for
the A/B of interest — see the examples in PERFORMANCE.md history).
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)


def measure(tag, batch_size=32, seconds=10., steps=6,
            net_config='shallow'):
    from __graft_entry__ import _batch
    from pb_sed_tpu.models import weak_label
    from pb_sed_tpu.models.net_configs import fbcrnn_config
    from pb_sed_tpu.train.trainer import Trainer
    from pb_sed_tpu.utils.xplane import (
        device_step_times_ms, stall_gaps_ms)

    cfg = fbcrnn_config(net_config=net_config, num_events=10)
    config = weak_label.CRNN.get_config(cfg)
    model = weak_label.CRNN.from_config(config)
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(10 ** 9, 'iteration'))
    batch = _batch(model, batch_size=batch_size, seconds=seconds)
    t0 = time.perf_counter()
    trainer._ensure_ready(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(3):
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    print(f'{tag}: compiled+warm in {time.perf_counter() - t0:.1f}s',
          file=sys.stderr, flush=True)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(steps):
            trainer.train_step(batch)
        jax.block_until_ready(trainer.model.variables)
        jax.profiler.stop_trace()
        times = device_step_times_ms(td)
        gaps = stall_gaps_ms(td)
    med = float(np.median(times))
    print(f'{tag}: span median={med:.3f} '
          f'all={[round(t, 2) for t in sorted(times)]}', flush=True)
    print(f'{tag}: gaps={gaps if not isinstance(gaps, dict) else list(gaps.items())[:6]}',
          flush=True)
    return med


if __name__ == '__main__':
    print('backend:', jax.default_backend(), file=sys.stderr)
    net = sys.argv[1] if len(sys.argv) > 1 else 'shallow'
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else (
        32 if net == 'shallow' else 16)
    measure(net, batch_size=bs, net_config=net)
