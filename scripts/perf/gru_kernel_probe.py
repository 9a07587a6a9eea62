"""Trace-timed A/B of the Pallas GRU kernels vs lax.scan (attached TPU).

Times by profiler-trace module spans (wall timing on the tunnel is
dispatch-dominated — see PERFORMANCE.md). Shapes: flagship D=2 (the
BiGRU / paired FBCRNN heads) and D=1 (a single unidirectional layer).

Usage: python scripts/perf/gru_kernel_probe.py [d] [b] [t] [h]
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

from pb_sed_tpu.ops.pallas.gru import gru_scan, gru_scan_reference
from pb_sed_tpu.utils.xplane import device_step_times_ms

d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
b = int(sys.argv[2]) if len(sys.argv) > 2 else 32
t = int(sys.argv[3]) if len(sys.argv) > 3 else 501
h = int(sys.argv[4]) if len(sys.argv) > 4 else 256

rng = np.random.RandomState(0)
xw = jnp.asarray(rng.randn(d, b, t, 3 * h).astype(np.float32))
w_hh = jnp.asarray((rng.randn(d, h, 3 * h) / np.sqrt(h)).astype(np.float32))
b_hh = jnp.asarray(0.1 * rng.randn(d, 3 * h).astype(np.float32))
h0 = jnp.asarray(rng.randn(d, b, h).astype(np.float32))


def timed(tag, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    td = f'/tmp/trace_gru_{tag}'
    if os.path.isdir(td):
        shutil.rmtree(td)
    jax.profiler.start_trace(td)
    for _ in range(8):
        out = f(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    times = sorted(device_step_times_ms(td))
    med = times[len(times) // 2]
    print(f'{tag:28s} median {med:7.3f} ms  (min {times[0]:7.3f})',
          flush=True)
    return med


def loss_p(xw, w_hh, b_hh, h0):
    return jnp.sum(gru_scan(xw, w_hh, b_hh, h0) ** 2)


def loss_s(xw, w_hh, b_hh, h0):
    return jnp.sum(gru_scan_reference(xw, w_hh, b_hh, h0) ** 2)


print(f'D={d} B={b} T={t} H={h}')
timed('pallas_fwd', lambda *a: gru_scan(*a), xw, w_hh, b_hh, h0)
timed('scan_fwd', lambda *a: gru_scan_reference(*a), xw, w_hh, b_hh, h0)
timed('pallas_grad', jax.grad(loss_p, argnums=(0, 1, 2, 3)),
      xw, w_hh, b_hh, h0)
timed('scan_grad', jax.grad(loss_s, argnums=(0, 1, 2, 3)),
      xw, w_hh, b_hh, h0)

# parity
gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(xw, w_hh, b_hh, h0)
gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))(xw, w_hh, b_hh, h0)
for name, a, bb_ in zip(('dxw', 'dw_hh', 'db_hh', 'dh0'), gp, gs):
    a = np.asarray(a, dtype=np.float64)
    bb_ = np.asarray(bb_, dtype=np.float64)
    rel = np.max(np.abs(a - bb_)) / np.max(np.abs(bb_))
    print(f'grad parity {name}: max|D|/max|ref| {rel:.2e}')
