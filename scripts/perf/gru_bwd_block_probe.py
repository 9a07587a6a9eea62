"""Compile/time probe of the GRU backward kernel blockings (attached
TPU). For each candidate (block_b, block_t) x {split, fused} this
compiles the backward pallas_call alone and, when it fits scoped VMEM,
trace-times it — the calibration data for _bwd_split_blocks/_bwd_blocks.

Usage: python scripts/perf/gru_bwd_block_probe.py [d] [b] [t] [h]
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from pb_sed_tpu.ops.pallas.gru import (
    _gru_scan_pallas, _gru_scan_pallas_bwd, _to_tm)
from pb_sed_tpu.utils.xplane import device_step_times_ms

d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
t = int(sys.argv[3]) if len(sys.argv) > 3 else 501
h = int(sys.argv[4]) if len(sys.argv) > 4 else 512

rng = np.random.RandomState(0)
xw = jnp.asarray(rng.randn(d, b, t, 3 * h).astype(np.float32))
w_hh = jnp.asarray((rng.randn(d, h, 3 * h) / np.sqrt(h)).astype(np.float32))
b_hh = jnp.asarray(0.1 * rng.randn(d, 3 * h).astype(np.float32))
h0 = jnp.asarray(rng.randn(d, b, h).astype(np.float32))
xw_tm = _to_tm(xw)
y = jax.jit(_gru_scan_pallas)(xw, w_hh, b_hh, h0)
g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))

print(f'D={d} B={b} T={t} H={h}', flush=True)
for split in (True, False):
    for bb, bt in ((32, 16), (32, 8), (16, 16), (16, 8), (8, 8)):
        if bb > b:
            continue
        tag = f'{"split" if split else "fused"} ({bb:2d},{bt:2d})'
        fn = jax.jit(lambda *a, bb=bb, bt=bt, split=split:
                     _gru_scan_pallas_bwd(*a, block_b=bb, block_t=bt,
                                          split=split))
        try:
            out = fn(xw_tm, w_hh, b_hh, h0, y, g)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 - report OOM and move on
            msg = str(e)
            key = ('vmem ' + msg.split('exceeded scoped vmem limit by')
                   [-1].split('.')[0].strip()
                   if 'exceeded scoped vmem' in msg else
                   msg.splitlines()[0][:90])
            print(f'{tag}  FAIL: {key}', flush=True)
            continue
        td = f'/tmp/trace_grubwd_{int(split)}_{bb}_{bt}'
        if os.path.isdir(td):
            shutil.rmtree(td)
        jax.profiler.start_trace(td)
        for _ in range(8):
            out = fn(xw_tm, w_hh, b_hh, h0, y, g)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        times = sorted(device_step_times_ms(td))
        print(f'{tag}  median {times[len(times) // 2]:7.3f} ms',
              flush=True)
