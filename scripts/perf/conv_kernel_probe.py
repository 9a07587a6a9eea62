"""On-chip decomposition / split-granularity probe for the packed conv
forward kernel (attached TPU; trace-span timed, median of 8).

Modes per layer shape:
  rot     — one whole-block build + one matmul (pre-rotate build)
  2/4/8   — the block processed in that many row sub-ranges, each a
            build + matmul round (production uses 2: see
            ops/pallas/conv.py:_splits and the measurements there)

Round-3 findings this probe produced: the patch build is issue-bound
(misaligned tap copies at ~1/3 of kernel time -> _build_patch_rot);
split=2 wins ~10% isolated but most of the in-step win was the static
out-mask row the restructure enables; splits >2 are flat-to-worse; a
skewed two-buffer build-ahead pipeline was WORSE (extra grid step).

Usage: python scripts/perf/conv_kernel_probe.py
"""
import functools
import os
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

from pb_sed_tpu.ops.pallas.conv import (
    fm_geom, _build_patch_rot, _out_mask, _w2)
from pb_sed_tpu.utils.xplane import device_step_times_ms

print('backend:', jax.default_backend(), file=sys.stderr)


def _kernel(x_ref, w_ref, y_ref, patch, xr, *, g, cin, cout, nb, mode):
    lb = g.tc * g.fs
    ti = pl.program_id(1)
    nsplit = 1 if mode == 'rot' else int(mode)
    rows_per = g.tc // nsplit
    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            if mode == 'rot':
                _build_patch_rot(x_ref, patch, xr, g, cin, t0)
                return
            for s in range(nsplit):
                row0 = s * rows_per
                rows_n = rows_per if s < nsplit - 1 else g.tc - row0
                _build_patch_rot(x_ref, patch, xr, g, cin, t0, row0,
                                 rows_n)
                lo, n = row0 * g.fs, rows_n * g.fs
                acc = jnp.dot(w_ref[:], patch[:, lo:lo + n],
                              preferred_element_type=jnp.float32)
                acc = acc * _out_mask(g, n, t0 + row0, jnp.float32)
                y_ref[0, :, lo:lo + n] = acc.astype(y_ref.dtype)

    if mode == 'rot':
        acc = jnp.dot(w_ref[:], patch[:],
                      preferred_element_type=jnp.float32)
        acc = acc * _out_mask(g, lb, ti * g.tc, jnp.float32)
        y_ref[0, :, :] = acc.astype(y_ref.dtype)


def run(tag, t, f_bins, cin, cout, mode):
    g = fm_geom(t, f_bins, 3, 3, max(cin, cout))
    rng = np.random.RandomState(0)
    bsz = 32
    x2 = jnp.asarray(rng.randn(bsz, cin, g.ls).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, cin, cout) / 30).astype(np.float32))
    k = 9 * cin
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    span = (g.tc + g.kt - 1) * g.fs
    kernel = functools.partial(_kernel, g=g, cin=cin, cout=cout, nb=nb,
                               mode=mode)
    fn = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, cin, g.ls), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((cout, k), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, lb), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, nb * lb),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((k, lb), jnp.bfloat16),
                        pltpu.VMEM((cin, span), jnp.bfloat16)],
    )
    jfn = jax.jit(lambda a, b: fn(a, _w2(b)))
    out = jfn(x2, w)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(8):
            out = jfn(x2, w)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        times = device_step_times_ms(td)
    med = float(np.median(times))
    print(f'{tag:20s} {mode:6s} {med:7.3f} ms', flush=True)
    return med


if __name__ == '__main__':
    for (t, f_bins, cin, cout, name) in [
            (500, 128, 16, 16, 'L1 F128 16->16'),
            (500, 32, 64, 64, 'L5 F32 64->64'),
            (500, 16, 128, 128, 'L7 F16 128->128'),
    ]:
        g = fm_geom(t, f_bins, 3, 3, max(cin, cout))
        for mode in ['rot'] + [str(s) for s in (2, 4, 8)
                               if g.tc % s == 0]:
            run(name, t, f_bins, cin, cout, mode)
