"""Block-size sweep of the packed conv kernels at the taps-path layers
(attached TPU; trace-span timed, median of 8).

The per-layer probe (conv_bwd_probe.py) shows L6-L8 dominating the
tower's cost even though both directions run the patch-free tap-wise
path there — whose VMEM footprint the block chooser still models as if
a (K, Lb) patch were allocated. This sweep times the SAME kernels at
manually enlarged row blocks to decide whether a taps-aware footprint
model is worth building.

Usage: python scripts/perf/conv_block_probe.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from pb_sed_tpu.ops.pallas.conv import (
    _with_tc, _fwd_packed, _bwd_fused, lane_mask)
from pb_sed_tpu.utils.xplane import device_step_times_ms

print('backend:', jax.default_backend(), file=sys.stderr)

# (name, f_bins, cin, cout, tc sweep)
CASES = [
    ('L6 F16  64->128', 16, 64, 128, (4, 8, 16)),
    ('L7 F16 128->128', 16, 128, 128, (4, 8, 16)),
    ('L8 F8  128->256', 8, 128, 256, (2, 4, 8)),
]


def _trace_median(jfn, args, n=8):
    out = jfn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(n):
            out = jfn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        times = device_step_times_ms(td)
    return float(np.median(times))


def run(name, f_bins, cin, cout, tcs, t=500, kt=3, kf=3):
    rng = np.random.RandomState(0)
    bsz = 32
    # fm-orientation lane stride: 128-aligned halo-extended frame count
    # (computed like fm_geom — a hard-coded value silently builds a
    # wrong geometry when t/kt change)
    ts = -(-(t + kt - 1) // 128) * 128
    for tc in tcs:
        g = _with_tc(f_bins, t, kf, kt, tc, fs=ts)
        x2 = jnp.asarray(rng.randn(bsz, cin, g.ls).astype(np.float32)
                         ).astype(jnp.bfloat16)
        gy = jnp.asarray(rng.randn(bsz, cout, g.ls).astype(np.float32)
                         ).astype(jnp.bfloat16)
        gy = gy * lane_mask(g, gy.dtype)
        w = jnp.asarray((rng.randn(3, 3, cin, cout) / 30).astype(
            np.float32))
        fwd = jax.jit(lambda a, b: _fwd_packed(a, b, None, g, False))
        bwd = jax.jit(lambda a, m, b: _bwd_fused(a, m, b, g, False))
        try:
            tf = _trace_median(fwd, (x2, w))
        except Exception as e:  # VMEM OOM etc: report and move on
            print(f'{name} tc={tc:3d} fwd FAILED: {str(e)[:120]}',
                  flush=True)
            tf = float('nan')
        try:
            tb = _trace_median(bwd, (x2, gy, w))
        except Exception as e:
            print(f'{name} tc={tc:3d} bwd FAILED: {str(e)[:120]}',
                  flush=True)
            tb = float('nan')
        print(f'{name} tc={tc:3d} nb={g.tp // g.tc} fwd {tf:7.3f} ms  '
              f'bwd {tb:7.3f} ms', flush=True)


if __name__ == '__main__':
    for row in CASES:
        run(*row)
