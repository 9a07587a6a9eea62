"""Worker for the real two-process jax.distributed test
(tests/test_multiprocess.py). Runs in a FRESH subprocess so the env vars
(JAX_PLATFORMS=cpu, xla_force_host_platform_device_count) take effect
before jax initializes.

Each process: joins the distributed runtime, builds the global 8-device
mesh, fetches ITS shard of the global batch (batch-level sharding),
assembles global arrays with make_global_batch and computes a psum-style
global reduction that must equal the full-batch value on every host.
"""
import sys


def main(coordinator, num_processes, process_id):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from pb_sed_tpu.data import lazy
    from pb_sed_tpu.data.fetcher import DataFetcher
    from pb_sed_tpu.parallel.mesh import get_mesh, make_global_batch

    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()  # 4 per process

    # identical deterministic example stream on every host
    examples = []
    for i in range(32):
        examples.append({
            'example_id': f'e{i}', 'dataset': 'a',
            'audio_data': np.full(400, float(i), np.float32),
            'seq_len': 8, 'seq_len_samples': 400,
            'weak_targets': np.zeros(3, np.float32),
        })
    fetcher = DataFetcher(
        prefetch_workers=0, batch_size=8, pad_to_multiple=8,
        drop_incomplete=True, num_shards=num_processes,
        shard_index=process_id)
    batches = list(fetcher(lazy.from_list(examples)))
    assert len(batches) == 4, len(batches)

    mesh = get_mesh()
    assert len(mesh.devices.flat) == 8

    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    for step, batch in enumerate(batches):
        global_batch = make_global_batch(batch, mesh)
        x = global_batch['audio_data']
        assert x.shape[0] == 8, x.shape  # GLOBAL batch size
        total = float(global_sum(x))
        # every host must compute the identical global value
        expected = sum(
            float(i) * 400
            for i in range(step * 8, (step + 1) * 8))
        assert abs(total - expected) < 1e-3, (step, total, expected)
    print(f'proc {process_id}: {len(batches)} global batches OK',
          flush=True)


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
