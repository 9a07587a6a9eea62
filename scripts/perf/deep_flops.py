"""XLA cost-model FLOPs for the DEEP train step (kernels disabled).

CPU-compiled: FLOP counts are backend-independent; the Pallas kernels
fall back to scan/XLA on CPU so every op body is visible to the cost
model (same methodology as the shallow 1047 GFLOP figure,
PERFORMANCE.md)."""
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import sys
sys.path.insert(0, '.')

from __graft_entry__ import _batch
from pb_sed_tpu.models import weak_label
from pb_sed_tpu.models.net_configs import fbcrnn_config
from pb_sed_tpu.train.trainer import Trainer

config = weak_label.CRNN.get_config(
    fbcrnn_config(net_config='deep', num_events=10))
model = weak_label.CRNN.from_config(config)
trainer = Trainer(model, storage_dir=None,
                  stop_trigger=(10 ** 9, 'iteration'))
batch = _batch(model, batch_size=16, seconds=10.)
trainer._ensure_ready(batch)
trainer._sync_step_state()
batch = {k: jnp.asarray(v) for k, v in batch.items()}
lowered = trainer._step_fn.lower(
    trainer.model.variables, trainer.opt_state, batch,
    jnp.asarray(trainer._device_step_state[0]),
    jnp.asarray(0, jnp.int32), jnp.asarray(1., jnp.float32))
cost = lowered.compile().cost_analysis()
if isinstance(cost, list):
    cost = cost[0]
print('deep step flops (XLA cost model, CPU lowering):',
      float(cost.get('flops', 0.)) / 1e9, 'GFLOP')
