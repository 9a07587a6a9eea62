"""On-chip A/B of the CHANNEL-BLOCKED tap-wise conv kernels (attached
TPU; trace-span timed, median of 8) at the deep/shallow tower shapes the
blocking targets (Cin or Cout >= 256):

  old  — `_cb_of` forced to 0: the round-3 unblocked kernels at the
         round-3 chooser blocks (tc=1 at L14; L16 unsupported)
  new  — channel-blocked grid (cb=128) at the new chooser blocks

Each case times forward and forward+grad separately and checks parity
between the two paths on-chip.

Usage: python scripts/perf/conv_cblock_probe.py
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

CASES = [  # (label, f_bins, cin, cout)  t=500, 3x3, bs=16
    ('deep_L12', 16, 128, 256),
    ('deep_L14', 16, 256, 256),
    ('deep_L16', 8, 256, 512),
    ('shallow_L8', 8, 128, 256),
]
BS, T = 16, 500


def _time(fn, *args):
    y = jax.block_until_ready(fn(*args))
    td = tempfile.mkdtemp(prefix='cblk_')
    jax.profiler.start_trace(td)
    for _ in range(8):
        y = fn(*args)
    jax.block_until_ready(y)
    jax.profiler.stop_trace()
    times = device_step_times_ms(td)
    shutil.rmtree(td, ignore_errors=True)
    return float(np.median(times)) if times else float('nan'), y


def main():
    rng = np.random.RandomState(0)
    for label, f, cin, cout in CASES:
        w = jnp.asarray((rng.randn(3, 3, cin, cout) * .05)
                        .astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        x4 = jnp.asarray(rng.randn(BS, T, f, cin).astype(np.float32))
        results = {}
        outs = {}
        for mode in ('old', 'new'):
            orig = pc._cb_of
            if mode == 'old':
                pc._cb_of = lambda c: 0
            try:
                if not pc.fm_supported(T, f, 3, 3, max(cin, cout),
                                       cin=cin, cout=cout):
                    print(f'{label} {mode}: unsupported', flush=True)
                    continue
                g = pc.fm_geom(T, f, 3, 3, max(cin, cout),
                               cin=cin, cout=cout)
                x2 = jax.block_until_ready(pc.pack_fm(x4, g))

                @jax.jit
                def fwd(x2_, w_, b_, g=g):
                    return pc.conv2d_packed_fm(x2_, w_, b_, g)

                @jax.jit
                def fg(x2_, w_, b_, g=g):
                    def loss(a, ww, bb):
                        y = pc.conv2d_packed_fm(a, ww, bb, g)
                        return jnp.sum(y.astype(jnp.float32) ** 2)
                    return jax.grad(loss, argnums=(0, 1, 2))(
                        x2_, w_, b_)

                tf, y = _time(fwd, x2, w, b)
                tg, gr = _time(fg, x2, w, b)
                results[mode] = (tf, tg, g.tc, g.tcb)
                outs[mode] = (np.asarray(y, dtype=np.float32),
                              np.asarray(gr[0], dtype=np.float32),
                              np.asarray(gr[1]), np.asarray(gr[2]))
                print(f'{label} {mode}: fwd {tf:.3f} ms, fwd+grad '
                      f'{tg:.3f} ms (tc={g.tc}, tcb={g.tcb})',
                      flush=True)
            except Exception as exc:  # noqa: BLE001 — evidence
                print(f'{label} {mode}: FAILED {exc!r}'[:400],
                      flush=True)
            finally:
                pc._cb_of = orig
        if 'old' in outs and 'new' in outs:
            for a, o, name in zip(outs['new'], outs['old'],
                                  ('y', 'dx', 'dw', 'db')):
                scale = max(1e-6, float(np.max(np.abs(o))))
                err = float(np.max(np.abs(a - o))) / scale
                print(f'{label} parity {name}: maxrel {err:.2e}',
                      flush=True)


if __name__ == '__main__':
    main()
