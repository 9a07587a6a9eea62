"""Explain the fast_window_probe_ms 1000x cliff (VERDICT r4 weak #7).

bench.py's opportunistic probe re-times ONE tiny jitted program around
every lane: 0.021 ms before the train lane, ~26-32 ms after every
subsequent lane. Hypotheses:

  (a) wall under-blocking (PERFORMANCE.md measurement methodology:
      single-call timing through the axon tunnel "takes" ~0.02 ms for
      ANY program because block_until_ready resolves before device
      execution) — i.e. the 0.021 ms is the ARTIFACT and ~26 ms is the
      true per-call tunnel round trip;
  (b) dispatch-queue backlog left by the lanes;
  (c) genuine device-state degradation.

Discriminator: trace the SAME tiny program in both states and compare
DEVICE spans. If the device span stays ~microseconds while the wall
jumps 0.02 -> ~26 ms, the cliff is host/tunnel semantics (a/b), not the
device (c). Additionally time a no-op roundtrip (device_get of a tiny
buffer) in both states to separate queue backlog (b: roundtrip grows)
from per-call blocking semantics (a: roundtrip ~constant).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')


def tiny():
    x = jnp.ones((256, 256), jnp.bfloat16)
    fn = jax.jit(lambda a: (a @ a).sum())
    fn(x).block_until_ready()  # compile
    return fn, x


def wall_ms(fn, x, n=5):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        out.append((time.perf_counter() - t0) * 1e3)
    return [round(v, 3) for v in out]


def roundtrip_ms(n=5):
    buf = jnp.zeros((8,), jnp.float32)
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(buf)  # device_get forces a real host<-device fence
        out.append((time.perf_counter() - t0) * 1e3)
    return [round(v, 3) for v in out]


def device_span_ms(fn, x, steps=6):
    from pb_sed_tpu.utils.xplane import device_step_times_ms
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(steps):
            fn(x)
        fn(x).block_until_ready()
        jax.profiler.stop_trace()
        times = device_step_times_ms(td)
    return sorted(round(t, 4) for t in times)


def heavy_work():
    """A medium-weight program standing in for a bench lane."""
    w = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048),
                          jnp.bfloat16)
    fn = jax.jit(lambda a: jnp.tanh(a @ a) @ a)
    y = fn(w)
    for _ in range(50):
        y = fn(y)
    y.block_until_ready()


def main():
    print('backend:', jax.default_backend(), flush=True)
    fn, x = tiny()
    print('BEFORE lanes:')
    print('  tiny wall ms:', wall_ms(fn, x), flush=True)
    print('  roundtrip ms:', roundtrip_ms(), flush=True)
    print('  tiny device spans ms:', device_span_ms(fn, x), flush=True)
    heavy_work()
    print('AFTER heavy work:')
    print('  tiny wall ms:', wall_ms(fn, x), flush=True)
    print('  roundtrip ms:', roundtrip_ms(), flush=True)
    print('  tiny device spans ms:', device_span_ms(fn, x), flush=True)
    # does the state decay back?
    time.sleep(10)
    print('AFTER 10s idle:')
    print('  tiny wall ms:', wall_ms(fn, x), flush=True)
    print('  roundtrip ms:', roundtrip_ms(), flush=True)


if __name__ == '__main__':
    main()
