"""Calibration sweep of the CHANNEL-BLOCKED kernels' VMEM footprint
model (`_fm_dir_bytes` blocked branch): force row blocks above the
chooser's pick and record compile-OOM vs runtime, separately per
direction. Each case runs in-process; compile failures are caught.

Usage: python scripts/perf/conv_cblock_calib.py
"""
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from pb_sed_tpu.ops.pallas import conv as pc
from pb_sed_tpu.utils.xplane import device_step_times_ms

print('backend:', jax.default_backend(), file=sys.stderr, flush=True)

BS, T = 16, 500
CASES = [  # (label, f_bins, cin, cout, tcs)
    ('L14', 16, 256, 256, (2, 4, 8)),
    ('L16', 8, 256, 512, (2, 4, 8)),
    ('L12b', 16, 128, 256, (4, 8)),   # bwd-only sweep interest
]


def _time(fn, *args):
    y = jax.block_until_ready(fn(*args))
    td = tempfile.mkdtemp(prefix='cal_')
    jax.profiler.start_trace(td)
    for _ in range(8):
        y = fn(*args)
    jax.block_until_ready(y)
    jax.profiler.stop_trace()
    times = device_step_times_ms(td)
    shutil.rmtree(td, ignore_errors=True)
    return float(np.median(times)) if times else float('nan')


def main():
    rng = np.random.RandomState(0)
    for label, f, cin, cout, tcs in CASES:
        w = jnp.asarray((rng.randn(3, 3, cin, cout) * .05)
                        .astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        x4 = jnp.asarray(rng.randn(BS, T, f, cin).astype(np.float32))
        base = pc.fm_geom(T, f, 3, 3, max(cin, cout),
                          cin=cin, cout=cout)
        for tc in tcs:
            if f % tc:
                continue
            g = pc._with_tc(f, T, 3, 3, tc, fs=base.fs)
            x2 = jax.block_until_ready(pc.pack_fm(x4, g))
            gm = jax.block_until_ready(pc.pack_fm(
                jnp.asarray(rng.randn(BS, T, f, cout)
                            .astype(np.float32)), g))
            fb = pc._fm_dir_bytes(tc, g.fs, g.ls, 3, 3, cin, cout,
                                  False) / 2 ** 20
            bb = pc._fm_dir_bytes(tc, g.fs, g.ls, 3, 3, cin, cout,
                                  True) / 2 ** 20
            try:
                tf = _time(jax.jit(
                    lambda a, ww, bbias, g=g: pc.conv2d_packed_fm(
                        a, ww, bbias, g)), x2, w, b)
                msg_f = f'fwd {tf:.3f} ms'
            except Exception as exc:  # noqa: BLE001
                msg_f = f'fwd FAIL {str(exc)[:90]}'
            try:
                tb = _time(jax.jit(
                    lambda a, gm_, ww, g=g: pc._bwd_fused(
                        a, gm_, ww, g, False)), x2, gm, w)
                msg_b = f'bwd {tb:.3f} ms'
            except Exception as exc:  # noqa: BLE001
                msg_b = f'bwd FAIL {str(exc)[:90]}'
            print(f'{label} tc={tc}: {msg_f} (model {fb:.2f} MB) | '
                  f'{msg_b} (model {bb:.2f} MB)', flush=True)


if __name__ == '__main__':
    main()
