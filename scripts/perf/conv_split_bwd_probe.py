"""Fused-vs-split A/B of the UNBLOCKED tap-wise conv backward at
cin=cout=128 shapes (deep L10, shallow L7): the channel-blocked split
kernels degenerate to a plain split of the taps path at nc=1 (cb=128),
so forcing `_cb_of` to engage at c==128 runs the same memory layout
with dx and dw in separate kernels. Parity-checked between arms.

RESULT (v5e, 2026-08-19): both arms measured identical to the
microsecond (deep_L10 3.598/3.598 ms, shal_L7 0.432/0.433) with
bit-exact outputs — consistent with the monkeypatch not changing the
traced program (the geometry carrying tcb is built BEFORE the patch,
and the persistent compile cache then serves one executable). The
c=128 split question is NOT settled by this probe; settling it needs
the blocked path forced at geometry-build time. Left as-is: the
committed split is gated to the >=256-channel blocked path where the
2.2x win was measured in-situ (see PERFORMANCE.md round-4 move 6).

Usage: python scripts/perf/conv_split_bwd_probe.py
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
CASES = [  # (label, f_bins, cin, cout)
    ('deep_L10', 32, 128, 128),
    ('shal_L7', 16, 128, 128),
]


def _time(fn, *args):
    y = jax.block_until_ready(fn(*args))
    td = tempfile.mkdtemp(prefix='sbp_')
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
    orig_cb_of = pc._cb_of
    for label, f, cin, cout in CASES:
        g = pc.fm_geom(T, f, 3, 3, max(cin, cout), cin=cin, cout=cout)
        w = jnp.asarray((rng.randn(3, 3, cin, cout) * .05)
                        .astype(np.float32))
        x2 = jax.block_until_ready(pc.pack_fm(
            jnp.asarray(rng.randn(BS, T, f, cin).astype(np.float32)),
            g).astype(jnp.bfloat16))
        gm2 = jax.block_until_ready(pc.pack_fm(
            jnp.asarray(rng.randn(BS, T, f, cout).astype(np.float32)),
            g).astype(jnp.bfloat16))

        def run_fused(x2, gm2, w, g=g):
            return pc._bwd_fused(x2, gm2, w, g, False)

        try:
            tf_ = _time(jax.jit(run_fused), x2, gm2, w)
            dxf, dwf = jax.jit(run_fused)(x2, gm2, w)
            msg_f = f'fused {tf_:.3f} ms'
        except Exception as exc:  # noqa: BLE001
            dxf = dwf = None
            msg_f = f'fused FAIL {str(exc)[:80]}'
        pc._cb_of = lambda c: 128 if (c % 128 == 0 and c >= 128) else 0
        try:
            ts_ = _time(jax.jit(run_fused), x2, gm2, w)
            dxs, dws = jax.jit(run_fused)(x2, gm2, w)
            msg_s = f'split {ts_:.3f} ms'
        except Exception as exc:  # noqa: BLE001
            dxs = dws = None
            msg_s = f'split FAIL {str(exc)[:80]}'
        finally:
            pc._cb_of = orig_cb_of
        print(f'{label} (tc={g.tc}, tcb={g.tcb}): {msg_f} | {msg_s}',
              flush=True)
        if dxf is not None and dxs is not None:
            for nm, a, b in (('dx', dxf, dxs), ('dw', dwf, dws)):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
                print(f'  parity {nm}: maxrel {rel:.2e}', flush=True)


if __name__ == '__main__':
    main()
