"""Benchmark: FBCRNN training throughput (clips/sec/chip) on DESED-shaped
batches — the BASELINE.json headline metric ("DESED clips/sec/chip
(feature+CRNN train & infer)").

Runs the full device pipeline per step: waveform -> STFT -> warped mel ->
augmentation -> CNN -> fwd/bwd GRU heads -> losses -> grads -> Adam update,
as one jitted XLA program on the available chip(s).

Baseline: the reference repo publishes no throughput numbers
(BASELINE.md); we compare against an estimated 200 clips/s for the
PyTorch reference FBCRNN train step on one A100 (batch 32, 10 s clips) —
documented assumption, revisited when a measured number exists.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 200.


def main():
    import jax
    sys.path.insert(0, '.')
    from __graft_entry__ import _batch, _flagship_model
    from pb_sed_tpu.train.trainer import Trainer

    batch_size = 32
    seconds = 10.
    model = _flagship_model()
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(10 ** 9, 'iteration'))
    batch = _batch(model, batch_size=batch_size, seconds=seconds)
    trainer._ensure_ready(batch)
    # device-resident batch: isolate step time from host->device transfer
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # warmup (compile)
    for _ in range(3):
        loss = trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    dt_single = time.perf_counter() - t0

    # multi-step lane: K steps per XLA call (lax.scan over stacked
    # batches) — amortizes per-call dispatch/tunnel latency; this is the
    # supported steady-state training mode (Trainer.steps_per_call).
    # Wrapped so a compile hiccup can never cost the headline number.
    n_chips = jax.device_count()
    single = batch_size * n_steps / dt_single / n_chips
    multi = None
    try:
        k = 10
        trainer.steps_per_call = k
        trainer._step_fn = None  # rebuild step fns with the multi lane
        trainer._ensure_ready(batch)
        batches = [batch] * k
        trainer.train_steps(batches)  # compile
        jax.block_until_ready(trainer.model.variables)
        n_calls = 4
        t0 = time.perf_counter()
        for _ in range(n_calls):
            trainer.train_steps(batches)
        jax.block_until_ready(trainer.model.variables)
        dt_multi = time.perf_counter() - t0
        multi = batch_size * k * n_calls / dt_multi / n_chips
    except Exception as exc:  # noqa: BLE001
        print(f'multi-step lane skipped: {exc!r}', file=sys.stderr)

    clips_per_sec_per_chip = max(single, multi or 0.)
    print(json.dumps({
        'metric': 'FBCRNN train clips/sec/chip (10s DESED clips, bs=32, '
                  'full device pipeline)',
        'value': round(clips_per_sec_per_chip, 2),
        'unit': 'clips/s/chip',
        'vs_baseline': round(
            clips_per_sec_per_chip / A100_BASELINE_CLIPS_PER_SEC, 3),
        'single_step_lane': round(single, 2),
        'multi_step_lane_k10': round(multi, 2) if multi else None,
    }))


if __name__ == '__main__':
    main()
