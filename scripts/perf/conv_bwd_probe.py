"""Per-layer timing of the packed conv FORWARD and fused BACKWARD
kernels at the flagship tower shapes (attached TPU; trace-span timed,
median of 8).

PERFORMANCE.md's sync-op attribution puts the conv backward at 5.4 ms
vs a ~2.5 ms fill bound; this probe splits that by layer so the next
kernel move is targeted. Layers (freq-major, T=500): see
ops/pallas/conv.py module docstring table.

Usage: python scripts/perf/conv_bwd_probe.py
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
    fm_geom, _fwd_packed, _bwd_fused, lane_mask)
from pb_sed_tpu.utils.xplane import device_step_times_ms

print('backend:', jax.default_backend(), file=sys.stderr)

LAYERS = [
    ('L0 F128   8->16', 500, 128, 8, 16),   # cin=1 padded to 8
    ('L1 F128  16->16', 500, 128, 16, 16),
    ('L2 F64   16->32', 500, 64, 16, 32),
    ('L3 F64   32->32', 500, 64, 32, 32),
    ('L4 F32   32->64', 500, 32, 32, 64),
    ('L5 F32   64->64', 500, 32, 64, 64),
    ('L6 F16  64->128', 500, 16, 64, 128),
    ('L7 F16 128->128', 500, 16, 128, 128),
    ('L8 F8  128->256', 500, 8, 128, 256),
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


def run(name, t, f_bins, cin, cout):
    g = fm_geom(t, f_bins, 3, 3, max(cin, cout))
    rng = np.random.RandomState(0)
    bsz = 32
    x2 = jnp.asarray(rng.randn(bsz, cin, g.ls).astype(np.float32)
                     ).astype(jnp.bfloat16)
    gy = jnp.asarray(rng.randn(bsz, cout, g.ls).astype(np.float32)
                     ).astype(jnp.bfloat16)
    gy = gy * lane_mask(g, gy.dtype)
    w = jnp.asarray((rng.randn(3, 3, cin, cout) / 30).astype(np.float32))
    # the fm path transposes the kernel's (kt, kf) — irrelevant for
    # timing, keep the raw orientation
    fwd = jax.jit(lambda a, b: _fwd_packed(a, b, None, g, False))
    bwd = jax.jit(lambda a, m, b: _bwd_fused(a, m, b, g, False))
    tf = _trace_median(fwd, (x2, w))
    tb = _trace_median(bwd, (x2, gy, w))
    print(f'{name:18s} tc={g.tc:3d} fs={g.fs} fwd {tf:7.3f} ms   '
          f'bwd {tb:7.3f} ms', flush=True)
    return tf, tb


if __name__ == '__main__':
    tot_f = tot_b = 0.
    for row in LAYERS:
        tf, tb = run(*row)
        tot_f += tf
        tot_b += tb
    print(f'{"TOTAL":18s}        fwd {tot_f:7.3f} ms   '
          f'bwd {tot_b:7.3f} ms', flush=True)
