"""On-chip parity + timing probe for the BN+ReLU fused conv kernels.

Validates that `bnrelu_conv2d_packed_fm` (ops/pallas/conv.py) lowers
through Mosaic on the attached TPU (interpret-mode CI can't catch
lowering failures) and matches the two-op composition it replaces on
all three kernel paths, forward and gradients. Then times fused vs
composed per-layer to size the win before flipping any config default.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from pb_sed_tpu.ops.pallas import conv as pconv


def run(b, t, f, cin, cout, tag):
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b, t, f, cin).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(
        rng.randn(3, 3, cin, cout).astype(np.float32)
        / (3. * np.sqrt(cin)), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    sc = jnp.asarray(.5 + rng.rand(cin).astype(np.float32))
    sh = jnp.asarray(rng.randn(cin).astype(np.float32) * .2)
    g = pconv.fm_geom(t, f, 3, 3, max(cin, cout), cin=cin, cout=cout,
                      fused=True)
    if g is None:
        print(f'{tag}: fused geometry REJECTED by footprint model',
              flush=True)
        return
    x2 = pconv.pack_fm(x, g)
    struct = pconv.lane_mask(g, jnp.float32)
    gy = jnp.asarray(rng.randn(b, cout, g.ls).astype(np.float32),
                     jnp.bfloat16)

    def a_of(x2_, sc_, sh_):
        return (jnp.maximum(
            x2_.astype(jnp.float32) * sc_.reshape(1, -1, 1)
            + sh_.reshape(1, -1, 1), 0.) * struct).astype(jnp.bfloat16)

    @jax.jit
    def f_ref(x2_, sc_, sh_):
        y = pconv.conv2d_packed_fm(a_of(x2_, sc_, sh_), w, bias, g,
                                   False)
        loss = jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))
        return y, loss

    @jax.jit
    def f_fused(x2_, sc_, sh_):
        y = pconv.bnrelu_conv2d_packed_fm(x2_, sc_, sh_, w, bias, g,
                                          False)
        loss = jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))
        return y, loss

    g_ref = jax.jit(jax.grad(
        lambda *a: f_ref(*a)[1], argnums=(0, 1, 2)))
    g_fused = jax.jit(jax.grad(
        lambda *a: f_fused(*a)[1], argnums=(0, 1, 2)))

    y_r, _ = f_ref(x2, sc, sh)
    y_f, _ = f_fused(x2, sc, sh)
    ymax = float(np.max(np.abs(np.asarray(y_r, np.float32))))
    err = float(np.max(np.abs(
        np.asarray(y_f, np.float32) - np.asarray(y_r, np.float32))))
    print(f'{tag}: fwd max-err {err:.5f} (ymax {ymax:.2f})', flush=True)
    assert err <= 1e-4 + 2e-3 * ymax, (tag, 'fwd', err)

    gr = g_ref(x2, sc, sh)
    gf = g_fused(x2, sc, sh)
    for name, a, b_ in zip(('dx', 'dscale', 'dshift'), gf, gr):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale = max(1e-6, float(np.max(np.abs(b_))))
        rel = float(np.max(np.abs(a - b_))) / scale
        print(f'{tag}: {name} rel-err {rel:.5f}', flush=True)
        assert rel < 2e-2, (tag, name, rel)

    # timing: 30 reps each, wall over the block (tunnel jitter noted)
    for fn, nm in ((f_ref, 'composed'), (f_fused, 'fused')):
        fn(x2, sc, sh)  # warm
        jax.block_until_ready(fn(x2, sc, sh))
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(x2, sc, sh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 30 * 1e3
        print(f'{tag}: {nm} fwd {dt:.3f} ms/call', flush=True)
    for fn, nm in ((g_ref, 'composed'), (g_fused, 'fused')):
        fn(x2, sc, sh)
        jax.block_until_ready(fn(x2, sc, sh))
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(x2, sc, sh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 30 * 1e3
        print(f'{tag}: {nm} fwd+grad {dt:.3f} ms/call', flush=True)


SHAPES = {
    'rot_c16': (32, 1000, 64, 16, 16),    # shallow flagship L1 shape
    'rot_c64': (32, 500, 32, 64, 64),     # shallow mid-tower
    'taps_c128': (32, 250, 16, 128, 128),  # taps path
    'cb_c256': (16, 125, 8, 256, 256),    # channel-blocked path
}

if __name__ == '__main__':
    print('backend:', jax.default_backend(), file=sys.stderr, flush=True)
    names = sys.argv[1:] or list(SHAPES)
    for nm in names:
        t0 = time.perf_counter()
        run(*SHAPES[nm], nm)
        print(f'{nm}: total {time.perf_counter() - t0:.0f}s',
              flush=True)
    print('ALL OK', flush=True)
