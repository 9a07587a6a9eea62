"""Decomposition probe of the channel-blocked backward kernel: which
part of the 7.5 ms (L14, tc=2) is dx, dw, or the tap fills? Variants
are numerically WRONG where parts are dropped — timing evidence only.

Usage: python scripts/perf/conv_cblock_bwd_probe.py
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

BS, T, F, CIN, COUT = 16, 500, 16, 256, 256
KT = KF = 3


def _kernel(w_ref, x_ref, gm_ref, dx_ref, dwt_ref, xr_t, tmp, dxacc, *,
            g, cb, nc, cin, nb, do_dx, do_dw, local_dw,
            split_loops=False):
    b_idx = pl.program_id(0)
    ti = pl.program_id(1)
    co = pl.program_id(2)
    lb = g.tc * g.fs

    @pl.when((b_idx == 0) & (ti == 0))
    def _zero_dwt():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    @pl.when(co == 0)
    def _zero_acc():
        dxacc[:] = jnp.zeros_like(dxacc)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _ = pc._fill_shifts(gm_ref, xr_t, g, cb, t0)
            xb = x_ref[0, :, :]
            if split_loops:
                # two passes over the taps: dx matmuls first, then dw
                # — each tap op recomputed, no tap value live across
                # both consumers
                part = jnp.zeros((cin, lb), jnp.float32)
                for dt in range(g.kt):
                    for df in range(g.kf):
                        op = pc._tap_op(gm_ref, xr_t, tmp, g, cb, t0,
                                        dt, df)
                        if op is None:
                            continue
                        kk = dt * g.kf + df
                        part = part + jnp.dot(
                            w_ref[0, :, kk * cb:(kk + 1) * cb], op,
                            preferred_element_type=jnp.float32)
                dxacc[:] += part
                for dt in range(g.kt):
                    for df in range(g.kf):
                        op = pc._tap_op(gm_ref, xr_t, tmp, g, cb, t0,
                                        dt, df)
                        if op is None:
                            continue
                        kk = dt * g.kf + df
                        dwt_ref[0, :, kk * cb:(kk + 1) * cb] += \
                            jax.lax.dot_general(
                                xb, op, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

                @pl.when(co == nc - 1)
                def _write_split():
                    dx = dxacc[:] * pc._out_mask(g, lb, t0,
                                                 jnp.float32)
                    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)
                return
            part = jnp.zeros((cin, lb), jnp.float32)
            dw_parts = []
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = pc._tap_op(gm_ref, xr_t, tmp, g, cb, t0, dt,
                                    df)
                    kk = dt * g.kf + df
                    if op is None:
                        if do_dw and local_dw:
                            dw_parts.append(jnp.zeros((cin, cb),
                                                      jnp.float32))
                        continue
                    if do_dx:
                        part = part + jnp.dot(
                            w_ref[0, :, kk * cb:(kk + 1) * cb], op,
                            preferred_element_type=jnp.float32)
                    if do_dw:
                        dwp = jax.lax.dot_general(
                            xb, op, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        if local_dw:
                            dw_parts.append(dwp)
                        else:
                            dwt_ref[0, :, kk * cb:(kk + 1) * cb] += dwp
            if do_dw and local_dw:
                dwt_ref[0, :, :] += jnp.concatenate(dw_parts, axis=-1)
            dxacc[:] += part

            @pl.when(co == nc - 1)
            def _write():
                dx = dxacc[:] * pc._out_mask(g, lb, t0, jnp.float32)
                dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def build(g, do_dx, do_dw, local_dw, split_loops=False):
    cb = 128
    nc = COUT // cb
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    span = (g.tc + g.kt - 1) * g.fs
    kernel = functools.partial(
        _kernel, g=g, cb=cb, nc=nc, cin=CIN, nb=nb, do_dx=do_dx,
        do_dw=do_dw, local_dw=local_dw, split_loops=split_loops)

    @jax.jit
    def run(wb, x2, gm2):
        return pl.pallas_call(
            kernel,
            grid=(BS, nb, nc),
            in_specs=[
                pl.BlockSpec((1, CIN, KT * KF * cb),
                             lambda bi, ti, co: (co, 0, 0)),
                pl.BlockSpec((1, CIN, lb),
                             lambda bi, ti, co: (bi, 0, ti)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, CIN, lb),
                             lambda bi, ti, co: (bi, 0, ti)),
                pl.BlockSpec((1, CIN, KT * KF * cb),
                             lambda bi, ti, co: (co, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BS, CIN, nb * lb), jnp.bfloat16),
                jax.ShapeDtypeStruct((nc, CIN, KT * KF * cb),
                                     jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
                pltpu.VMEM((CIN, lb), jnp.float32),
            ],
        )(wb, x2, gm2)

    return run


def _time(fn, *args):
    y = jax.block_until_ready(fn(*args))
    td = tempfile.mkdtemp(prefix='bwdp_')
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
    g = pc.fm_geom(T, F, KT, KF, max(CIN, COUT), cin=CIN, cout=COUT)
    g = g._replace(tc=g.tcb) if g.tcb else g
    x4 = jnp.asarray(rng.randn(BS, T, F, CIN).astype(np.float32))
    gm4 = jnp.asarray(rng.randn(BS, T, F, COUT).astype(np.float32))
    x2 = jax.block_until_ready(
        pc.pack_fm(x4, g).astype(jnp.bfloat16))
    gm2 = jax.block_until_ready(
        pc.pack_fm(gm4, g).astype(jnp.bfloat16))
    w = (rng.randn(KT, KF, CIN, COUT) * .05).astype(np.float32)
    w_flip = jnp.flip(jnp.asarray(w), axis=(0, 1)).transpose(0, 1, 3, 2)
    cb = 128
    nc = COUT // cb
    wb = w_flip.reshape(KT, KF, nc, cb, CIN).transpose(
        2, 4, 0, 1, 3).reshape(nc, CIN, KT * KF * cb).astype(
            jnp.bfloat16)
    for label, do_dx, do_dw, local_dw, sl in [
            ('full(rmw-dw)', True, True, False, False),
            ('full(split-loops)', True, True, False, True),
            ('full(local-dw)', True, True, True, False),
            ('dx-only', True, False, False, False),
            ('dw-only(rmw)', False, True, False, False),
            ('dw-only(local)', False, True, True, False),
            ('fills-only', False, False, False, False)]:
        try:
            t = _time(build(g, do_dx, do_dw, local_dw, sl), wb, x2,
          gm2)
            print(f'{label}: {t:.3f} ms (tc={g.tc})', flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f'{label}: FAIL {str(exc)[:120]}', flush=True)


if __name__ == '__main__':
    main()
