"""Probe: fused vs split backward at cout == 128 (below the cb gate).

The deep-recipe trace (round 5) shows conv_10 — L10, 128->128, F=32 —
paying 3.6 ms for its FUSED dx+dw backward while the split channel-
blocked kernels at C=256 layers (half the spatial) pay ~0.9 ms total.
``_cb_of`` only admits c > 128, so 128-channel layers are locked into
the fused kernel. With cb=128 / nc=1 the existing split kernels
(_bwd_dx_kernel_cb / _bwd_dw_kernel_cb) apply verbatim; this probe
measures both arms at the two production 128-channel shapes:

  deep L10:    (B=16, T=500, F=32, 128->128)  — the 3.6 ms offender
  shallow L7:  (B=32, T=500, F=16, 128->128)  — round-3 fused winner

Split arm sweeps the row block tc over divisors of F; the fused arm
runs the production ``_bwd_fused`` (g.tcb block). Timing via profiler
device spans (median of 8, same methodology as every probe here).

Usage: python scripts/perf/conv_c128_split_probe.py
"""
import functools
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from pb_sed_tpu.ops.pallas import conv as pc
from pb_sed_tpu.utils.xplane import device_step_times_ms

print('backend:', jax.default_backend(), file=sys.stderr, flush=True)

KT = KF = 3


def _time(fn, *args):
    y = jax.block_until_ready(fn(*args))
    td = tempfile.mkdtemp(prefix='c128p_')
    jax.profiler.start_trace(td)
    for _ in range(8):
        y = fn(*args)
    jax.block_until_ready(y)
    jax.profiler.stop_trace()
    times = device_step_times_ms(td)
    shutil.rmtree(td, ignore_errors=True)
    return float(np.median(times)) if times else float('nan')


def split_runner(g, bs, cin, cout, tc):
    """dx + dw through the production cb kernels at cb=cout, nc=1."""
    g = g._replace(tc=tc)
    cb = cout
    nc = 1
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    span = (g.tc + g.kt - 1) * g.fs
    kt, kf = KT, KF

    @jax.jit
    def run(w_fb, x2, gm2):
        dx = pl.pallas_call(
            functools.partial(pc._bwd_dx_kernel_cb, g=g, cb=cb, nc=nc,
                              cin=cin, nb=nb),
            grid=(bs, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, kt * kf * cb),
                             lambda bi, ti, co: (co, 0, 0)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, lb),
                                   lambda bi, ti, co: (bi, 0, ti)),
            out_shape=jax.ShapeDtypeStruct((bs, cin, nb * lb),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
                pltpu.VMEM((cin, lb), jnp.float32),
            ],
        )(w_fb, gm2)
        dwt = pl.pallas_call(
            functools.partial(pc._bwd_dw_kernel_cb, g=g, cb=cb, nb=nb),
            grid=(bs, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, lb),
                             lambda bi, ti, co: (bi, 0, ti)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, kt * kf * cb),
                                   lambda bi, ti, co: (co, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nc, cin, kt * kf * cb),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
            ],
        )(x2, gm2)
        return dx, dwt

    return run


def main():
    rng = np.random.RandomState(0)
    for label, bs, t, f, cin, cout in [
            ('deep-L10 (F=32)', 16, 500, 32, 128, 128),
            ('shallow-L7 (F=16)', 32, 500, 16, 128, 128)]:
        g = pc.fm_geom(t, f, KT, KF, max(cin, cout), cin=cin, cout=cout)
        x4 = rng.randn(bs, t, f, cin).astype(np.float32)
        gm4 = rng.randn(bs, t, f, cout).astype(np.float32)
        gp = g._replace(tc=g.tcb) if g.tcb else g
        x2 = jax.block_until_ready(pc.pack_fm(jnp.asarray(x4), gp))
        gm2 = jax.block_until_ready(
            pc.pack_fm(jnp.asarray(gm4), gp)
            * pc.lane_mask(gp, jnp.bfloat16))
        w = (rng.randn(KT, KF, cin, cout) * .05).astype(np.float32)
        wj = jnp.asarray(w)

        fused = jax.jit(functools.partial(
            pc._bwd_fused, geom=g, interpret=False))
        tf_ = _time(fused, x2, gm2, wj)
        print(f'{label} fused(prod, tc={gp.tc}): {tf_:.3f} ms',
              flush=True)
        dx_ref, dw_ref = jax.block_until_ready(fused(x2, gm2, wj))

        w_flip = jnp.flip(wj, axis=(0, 1)).transpose(0, 1, 3, 2)
        w_fb = w_flip.reshape(KT, KF, 1, cout, cin).transpose(
            2, 4, 0, 1, 3).reshape(1, cin, KT * KF * cout).astype(
                jnp.bfloat16)
        for tc in [d for d in (1, 2, 4, 8) if f % d == 0]:
            try:
                run = split_runner(g, bs, cin, cout, tc)
                ts = _time(run, w_fb, x2, gm2)
                dx, dwt = jax.block_until_ready(run(w_fb, x2, gm2))
                dwt4 = np.asarray(dwt).reshape(
                    cin, KT, KF, cout)[:, ::-1, ::-1, :].transpose(
                        1, 2, 0, 3)
                ddx = float(np.max(np.abs(
                    np.asarray(dx, np.float32)
                    - np.asarray(dx_ref, np.float32))))
                sc = float(np.max(np.abs(dwt4)))
                ddw = float(np.max(np.abs(
                    dwt4 - np.asarray(dw_ref, np.float32)))) / max(sc, 1e-9)
                print(f'{label} split tc={tc}: {ts:.3f} ms '
                      f'(dx max|d| {ddx:.2e}, dw maxrel {ddw:.2e})',
                      flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f'{label} split tc={tc}: FAIL {str(exc)[:140]}',
                      flush=True)


if __name__ == '__main__':
    main()
