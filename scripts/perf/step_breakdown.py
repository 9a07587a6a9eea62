"""Per-HLO-op attribution of the flagship train step (attached TPU).

Traces 6 steps into a fresh dir, then prints (a) device spans and
(b) SYNCHRONOUS op time grouped by kind — async copy/slice spans are
excluded because their durations include overlap-wait and would
dominate the listing without being on the critical path (the step is
gapless: see stall_gaps_ms). This is the tool that located the
round-2 sort-lowered gathers, the round-3 GRU f32-residual stalls and
the 1.93 ms emulated-rfft STFT.

Usage: python scripts/perf/step_breakdown.py [trace_dir] [net] [bs]
(net: shallow|deep, default shallow; bs default 32 shallow / 16 deep)
"""
import os
import re
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)

from __graft_entry__ import _batch
from pb_sed_tpu.models import weak_label
from pb_sed_tpu.models.net_configs import fbcrnn_config
from pb_sed_tpu.train.trainer import Trainer
from pb_sed_tpu.utils.xplane import device_step_times_ms, op_breakdown_ms

ASYNC = ('copy-start', 'slice-start', 'copy-done', 'slice-done',
         'async-start', 'async-done', 'all-reduce-start')

td = sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_breakdown'
if os.path.isdir(td):
    shutil.rmtree(td)

net = sys.argv[2] if len(sys.argv) > 2 else 'shallow'
bs = int(sys.argv[3]) if len(sys.argv) > 3 else (16 if net == 'deep'
                                                 else 32)
cfg = fbcrnn_config(net_config=net, num_events=10)
config = weak_label.CRNN.get_config(cfg)
model = weak_label.CRNN.from_config(config)
trainer = Trainer(model, storage_dir=None,
                  stop_trigger=(10 ** 9, 'iteration'))
batch = _batch(model, batch_size=bs, seconds=10.)
t0 = time.perf_counter()
trainer._ensure_ready(batch)
batch = {k: jnp.asarray(v) for k, v in batch.items()}
for _ in range(3):
    trainer.train_step(batch)
jax.block_until_ready(trainer.model.variables)
print(f'warm in {time.perf_counter() - t0:.1f}s', file=sys.stderr,
      flush=True)
jax.profiler.start_trace(td)
for _ in range(6):
    trainer.train_step(batch)
jax.block_until_ready(trainer.model.variables)
jax.profiler.stop_trace()

times = device_step_times_ms(td)
print('step spans:', [round(t, 2) for t in sorted(times)])
groups, total = {}, 0.
for name, (ms, n) in op_breakdown_ms(td, collapse=False).items():
    s = name if isinstance(name, str) else name.decode('utf-8', 'ignore')
    m = re.match(r'%([\w\-\.]+)', s)
    op = m.group(1) if m else s[:40]
    base = re.sub(r'[\.\d]+$', '', op)
    if base.startswith(ASYNC):
        continue
    total += ms
    # an op IS a custom call only when its op kind is custom-call —
    # matching 'custom-call' anywhere also catches XLA fusions that
    # merely CONSUME a kernel's output (%custom-call.N operands),
    # which mislabeled ~9 ms of BN-stat fusions as PALLAS in the
    # round-5 deep trace
    key = ('PALLAS ' + op.split('.')[0] if ' custom-call(' in s
           else base)
    g = groups.setdefault(key, [0., 0])
    g[0] += ms
    g[1] += n
for k, (ms, n) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:40]:
    print(f'{ms / 6:8.3f} ms/step x{n // 6:4d}  {k}')
print(f'{total / 6:8.3f} ms/step SYNC TOTAL  (trace in {td})')
