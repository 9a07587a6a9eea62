"""Benchmarks for the BASELINE.json north-star workloads.

Lanes (all on the attached chip(s), compile excluded):

1. ``train``: FBCRNN training throughput, full device pipeline per step
   (waveform -> STFT -> warped mel -> aug -> CNN -> fwd/bwd GRU ->
   losses -> grads -> Adam), single-step and K-steps-per-XLA-call.
2. ``ensemble``: 10-model stacked-ensemble sliding-window SED inference
   (the pseudo-labeling workload: ``BASELINE.json`` "10-model ensemble
   pseudo-labeling inference"); members evaluate as one vmapped XLA
   program.
3. ``host``: end-to-end training including the HOST pipeline — synthetic
   wav corpus decoded, bucketed, collated and shipped per step (nothing
   pre-staged on device).

Evidence against tunnel throttling (PERFORMANCE.md): per-step wall time
is recorded for K=1 and K=50 steps-per-call (dispatch amortized), the
XLA-reported per-step FLOPs give an achieved-TFLOP/s figure, and a JAX
profiler trace is captured next to the result. Baseline: the reference
publishes no throughput numbers; we compare against an estimated 200
clips/s for the PyTorch reference FBCRNN train step on one A100
(documented assumption, BASELINE.md).

Prints ONE final JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""
import argparse
import json
import sys
import time

import numpy as np

# Derived, not assumed (BASELINE.md "Derived A100 throughput
# baseline"): component model of the reference PyTorch FBCRNN train
# step on one A100-SXM — TF32 tensor-core convs at fill-discounted
# efficiency, cuDNN GRU at its small-batch recurrent-GEMM rate, f32
# HBM elementwise terms, eager-mode overhead — lands at ~45 ms/step
# at bs=32, i.e. ~700 clips/s (range 460 tuned-f32 .. 1280 bf16-AMP).
# The reference publishes no throughput numbers to measure against.
A100_BASELINE_CLIPS_PER_SEC = 700.
# TPU v5e chip peak, bf16 MXU (Google spec: 197 TFLOP/s bf16 /
# 394 TOPS int8) — the MFU denominator.
V5E_BF16_PEAK_TFLOPS = 197.
# Deep width-2 recipe step at bs=16: XLA cost model of the identical
# step with the hand kernels disabled (CPU lowering — FLOP counts are
# backend-independent; scripts/perf/deep_flops.py measured 2404.9),
# same methodology as the shallow 1047 figure. Analytic conv/GRU
# arithmetic is 2582 GFLOP; XLA's deduped count sits 7% below it
# (fusion eliding recomputation), matching the shallow 1128-vs-1047
# margin.
DEEP_ARCH_GFLOPS = 2404.9
BATCH_SIZE = 32
SECONDS = 10.


def _timed(fn, n, *args):
    """Wall seconds for n calls of fn (blocking on the last result)."""
    import jax
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


_PROBE = {'fn': None, 'samples': []}


def probe_fast_window(results, label):
    """Opportunistic fast-window probe (VERDICT r2 #2): re-time a tiny
    fixed program between lanes; the MINIMUM across the bench run bounds
    the pool's best-case dispatch+device latency. A ~ms minimum alongside
    ~200 ms module spans for real steps is throttle evidence; a uniform
    floor says the pool caps everything."""
    import jax
    import jax.numpy as jnp
    try:
        if _PROBE['fn'] is None:
            x = jnp.ones((256, 256), jnp.float32)

            @jax.jit
            def tiny(x):
                return (x @ x).sum()

            tiny(x).block_until_ready()  # compile outside the timing
            _PROBE['fn'] = (tiny, x)
        tiny, x = _PROBE['fn']
        best = min(
            _timed(lambda: tiny(x), 1) for _ in range(5)) * 1e3
        _PROBE['samples'].append((label, round(best, 3)))
        results['fast_window_probe_ms'] = dict(_PROBE['samples'])
        results['fast_window_probe_ms_min'] = min(
            v for _, v in _PROBE['samples'])
        # the before/after 1000x cliff explained (r4 weak #7,
        # scripts/perf/probe_cliff.py): the tiny program's DEVICE span
        # is 0.0007 ms in both states — after the first heavy workload
        # the axon client stops completing blocking calls inline and
        # every call pays one true ~24 ms tunnel round trip. Neither
        # figure is device time; PERFORMANCE.md tunnel pathology 6.
        results['fast_window_probe_note'] = (
            'wall of one blocking call through the tunnel: ~0.02 ms = '
            'client inline-completion artifact, ~24-30 ms = true '
            'round trip; device span is 0.0007 ms in both states '
            '(probe_cliff.py)')
    except Exception as exc:  # noqa: BLE001 — evidence only
        print(f'fast-window probe failed: {exc!r}', file=sys.stderr)


def lane_train(results):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _batch, _flagship_model
    from pb_sed_tpu.train.trainer import Trainer

    model = _flagship_model()
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(10 ** 9, 'iteration'))
    batch = _batch(model, batch_size=BATCH_SIZE, seconds=SECONDS)
    trainer._ensure_ready(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    n_chips = jax.device_count()

    for _ in range(3):  # compile + warm
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    n = 20
    wall = []
    for _ in range(n):
        t0 = time.perf_counter()
        trainer.train_step(batch)
        jax.block_until_ready(trainer.model.variables)
        wall.append(time.perf_counter() - t0)
    results['train_single_clips_per_s_chip'] = round(
        BATCH_SIZE / float(np.median(wall)) / n_chips, 2)
    results['train_step_wall_ms'] = {
        'median': round(1e3 * float(np.median(wall)), 3),
        'min': round(1e3 * float(np.min(wall)), 3),
    }

    # XLA-reported per-step FLOPs -> achieved TFLOP/s at the best step
    try:
        lowered = trainer._step_fn.lower(
            trainer.model.variables, trainer.opt_state, batch,
            jnp.asarray(trainer._device_step_state[0]),
            jnp.asarray(0, jnp.int32), jnp.asarray(1., jnp.float32))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', 0.))
        if flops > 0:
            # XLA's cost model cannot see INSIDE Pallas custom calls,
            # so this under-counts once the conv tower + GRU run as
            # hand-written kernels (measured: 233 GFLOP visible vs the
            # 1047 GFLOP the same step reports with the kernels
            # disabled — identical arithmetic, round-2 XLA build)
            results['train_step_gflops_xla_visible'] = round(
                flops / 1e9, 2)
            arch_gflops = 1047.
            results['train_step_gflops_arch'] = arch_gflops
            # reconciliation of the two FLOPs figures: 'arch' is XLA's
            # own cost model for the IDENTICAL step with the hand
            # kernels disabled (round-2 measurement, pure-XLA build);
            # 'xla_visible' omits every custom-call body (packed conv
            # tower fwd+bwd, GRU fwd+bwd kernels), so arch - visible
            # ~= the FLOPs now executed inside Pallas kernels
            results['gflops_note'] = (
                'arch = full-step XLA cost model (kernels disabled); '
                'xla_visible excludes Pallas custom-call bodies; the '
                'difference is the conv-tower + GRU kernel FLOPs')
            results['achieved_tflops_best'] = round(
                arch_gflops / 1e3 / float(np.min(wall)), 2)
            results['mfu_wall'] = round(
                arch_gflops / 1e3 / float(np.min(wall))
                / V5E_BF16_PEAK_TFLOPS, 4)
    except Exception as exc:  # noqa: BLE001 — evidence lane, best effort
        print(f'cost_analysis unavailable: {exc!r}', file=sys.stderr)

    # multi-step lanes: dispatch amortized over K steps per XLA call
    for k in (10, 50):
        try:
            trainer.steps_per_call = k
            trainer._step_fn = None
            trainer._ensure_ready(batch)
            batches = [batch] * k
            trainer.train_steps(batches)  # compile
            jax.block_until_ready(trainer.model.variables)
            n_calls = 3
            dt = _timed(lambda: trainer.train_steps(batches), n_calls)
            jax.block_until_ready(trainer.model.variables)
            per_step = dt / (n_calls * k)
            results[f'train_multi_k{k}_clips_per_s_chip'] = round(
                BATCH_SIZE / per_step / n_chips, 2)
            results[f'train_multi_k{k}_wall_ms_per_step'] = round(
                1e3 * per_step, 3)
        except Exception as exc:  # noqa: BLE001
            print(f'multi-step k={k} skipped: {exc!r}', file=sys.stderr)


def lane_deep(results):
    """Deep width-2 recipe train step (the reference's best-quality
    config — AudioSet pre-training / 'with external data' rows,
    reference ``experiments/weak_label_crnn/training.py:158-185``):
    bs=16 with BOTH TPU kernels active (split-backward Pallas GRU at
    H=512, packed conv tower with residual windows + channel-blocked
    pools). Trace-timed via module spans (wall is untrustworthy on the
    tunnel, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _batch
    from pb_sed_tpu.models import weak_label
    from pb_sed_tpu.models.net_configs import fbcrnn_config
    from pb_sed_tpu.train.trainer import Trainer

    deep_bs = 16
    config = weak_label.CRNN.get_config(
        fbcrnn_config(net_config='deep', num_events=10))
    model = weak_label.CRNN.from_config(config)
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(10 ** 9, 'iteration'))
    batch = _batch(model, batch_size=deep_bs, seconds=SECONDS)
    trainer._ensure_ready(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(3):
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(6):
            trainer.train_step(batch)
        jax.block_until_ready(trainer.model.variables)
        jax.profiler.stop_trace()
        from bench_xplane import dominant_module_span_ms
        dom = dominant_module_span_ms(td)
    if dom:
        span = float(dom[1])
        results['deep_device_ms_per_step'] = round(span, 3)
        results['deep_train_clips_per_s_chip'] = round(
            deep_bs / (span / 1e3) / jax.device_count(), 2)
        # deep fill-model roofline + MFU (VERDICT r4 #4): arch FLOPs =
        # analytic conv/GRU count for the width-2 residual tower at
        # bs=16 (PERFORMANCE.md "Deep recipe roofline" table)
        results['deep_step_gflops_arch'] = DEEP_ARCH_GFLOPS
        results['deep_mfu_device'] = round(
            DEEP_ARCH_GFLOPS / 1e3 / (span / 1e3)
            / V5E_BF16_PEAK_TFLOPS, 4)


def lane_ensemble(results, n_models=10):
    """10-model ensemble sliding-window SED (pseudo-labeling workload),
    through the PRODUCTION path (``default_ensemble_mesh`` — same mesh
    resolution the CLIs get from ``base.inference``), with a 1-member
    scaling point and a device trace (span/busy/duty) so the gap to
    target is attributable (throttle vs program)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _batch, _flagship_model
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    from pb_sed_tpu.parallel.mesh import default_ensemble_mesh

    models = []
    for i in range(n_models):
        m = _flagship_model()
        b = _batch(m, batch_size=2, seconds=SECONDS, seed=i)
        m.init_variables(b, seed=i)
        models.append(m)
    mesh = default_ensemble_mesh(n_models)
    # PRODUCTION shape bs=32 via chunk_size=8: the sliding-window fold
    # multiplies the batch by ~T windows and bs=32 x 10 members
    # OOM-kills the remote AOT compile helper (PERFORMANCE.md tunnel
    # pathology #5), so the ensemble evaluates bs=8 chunks. Round 5:
    # on a single device the chunks run INSIDE one compiled program
    # (lax.map over a (4, 8, ...) reshape) — one dispatch per batch;
    # the r4 host chunk loop serialized ~a dozen tunnel dispatches per
    # chunk (625 ms wall vs ~347 ms device).
    runner = StackedEnsemble(models, mesh=mesh, chunk_size=8)
    results['ensemble10_mesh'] = (
        dict(mesh.shape) if mesh is not None else None)
    results['ensemble10_chunk_size'] = 8
    ens_batch = 32
    batch = _batch(models[0], batch_size=ens_batch, seconds=SECONDS)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}
    n_chips = jax.device_count()
    # tuned scenario-1 window (median of the reference grid) at shift 1
    kwargs = dict(window_length=31, window_shift=1)
    runner.sound_event_detection(batch, **kwargs)  # compile
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        y, _ = runner.sound_event_detection(batch, **kwargs)
    dt = time.perf_counter() - t0
    results['ensemble10_sed_clips_per_s_chip'] = round(
        ens_batch * n / dt / n_chips, 2)
    results['ensemble10_sed_wall_ms_per_batch'] = round(1e3 * dt / n, 2)

    # pipelined production pattern (models/base/inference.py, round 5):
    # batch k+1 is DISPATCHED (runner.dispatch, async device arrays)
    # before batch k's outputs are materialized, so the per-call
    # blocking round trips (~24 ms each on the tunnel after the first
    # heavy workload — PERFORMANCE.md pathology 6) overlap the next
    # batch's device compute. This is the loop the inference driver
    # runs over a dataset; the serial figure above is the
    # dispatch-convert-dispatch pattern the reference uses.
    prev = None
    t0 = time.perf_counter()
    for _ in range(n):
        cur = runner.dispatch('sound_event_detection', batch, **kwargs)
        if prev is not None:
            np.asarray(prev[0])
            np.asarray(prev[1])
        prev = cur
    np.asarray(prev[0])
    np.asarray(prev[1])
    dt_p = time.perf_counter() - t0
    results['ensemble10_sed_pipelined_wall_ms_per_batch'] = round(
        1e3 * dt_p / n, 2)
    results['ensemble10_sed_pipelined_clips_per_s_chip'] = round(
        ens_batch * n / dt_p / n_chips, 2)

    # member-count scaling: 1-member reference point (same batch/window)
    try:
        runner1 = StackedEnsemble(models[:1], mesh=default_ensemble_mesh(1),
                                  chunk_size=8)
        runner1.sound_event_detection(batch, **kwargs)  # compile
        dt1 = _timed(
            lambda: runner1.sound_event_detection(batch, **kwargs), n)
        results['ensemble1_sed_wall_ms_per_batch'] = round(1e3 * dt1 / n, 2)
        results['ensemble10_vs_1_scaling'] = round(dt / dt1, 2)
    except Exception as exc:  # noqa: BLE001
        print(f'ensemble 1-member point skipped: {exc!r}', file=sys.stderr)

    # device-time evidence for workload #2: trace 3 ensemble batches
    try:
        from pathlib import Path
        import shutil
        logdir = Path('bench_profile_ensemble')
        if logdir.exists():
            shutil.rmtree(logdir)
        logdir.mkdir()
        jax.profiler.start_trace(str(logdir))
        for _ in range(3):
            y, _ = runner.sound_event_detection(batch, **kwargs)
        jax.profiler.stop_trace()
        from bench_xplane import dominant_module_span_ms, duty_cycle_summary
        # per-PROGRAM attribution: the chunked-ensemble trace carries the
        # big SED program plus tiny glue modules, so a bare median over
        # all module spans lands on the glue (r4 verdict: 0.001 ms).
        # The dominant module (largest total device time) IS the SED
        # program; its spans are PER CHUNK (bs=chunk_size).
        dom = dominant_module_span_ms(logdir)
        if dom:
            _, span_ms, n_spans = dom
            # scan-chunked: ONE module span covers the whole bs=32
            # batch (all chunks inside the program); the host-loop
            # fallback emits one span PER bs=8 chunk — distinguish by
            # span count over the 3 traced batches
            per_batch = n_spans <= 3
            results['ensemble10_device_ms'] = round(
                span_ms if per_batch
                else span_ms * (ens_batch // 8), 3)
            results['ensemble10_device_ms_per_chunk'] = round(
                span_ms / (ens_batch // 8) if per_batch else span_ms, 3)
            results['ensemble10_device_spans'] = n_spans
            duty = duty_cycle_summary(logdir, min_span_ms=span_ms / 2)
            if duty:
                results['ensemble10_device_busy_ms'] = duty['busy_ms']
                results['ensemble10_duty_cycle'] = duty['duty_cycle']
    except Exception as exc:  # noqa: BLE001
        print(f'ensemble trace skipped: {exc!r}', file=sys.stderr)


def lane_host(results):
    """End-to-end: host pipeline (decode -> bucket -> collate) included."""
    import tempfile
    from pathlib import Path

    import jax
    sys.path.insert(0, 'tests')
    from util_synth import build_database

    from pb_sed_tpu.data.provider import DataProvider
    from pb_sed_tpu.train.trainer import Trainer
    from __graft_entry__ import _flagship_model

    with tempfile.TemporaryDirectory() as tmp:
        # synthetic corpus at the flagship STFT geometry
        _, json_path = build_database(
            Path(tmp) / 'db', num_train=96, num_weak=32,
            clip_seconds=4.)
        config = DataProvider.get_config({
            'json_path': str(json_path),
            'train_set': {'train_strong': 1, 'train_weak': 1},
            'validate_set': 'validation',
            'min_audio_length': 0.2,
            'storage_dir': tmp,
            'train_transform': {
                'provide_boundary_targets': True,
            },
            'train_fetcher': {'batch_size': BATCH_SIZE,
                              'prefetch_workers': 2,
                              'drop_incomplete': True,
                              # halve per-step H2D bytes: the tunnel
                              # charges ~7 ms + ~1 ms/MB per upload
                              'audio_dtype': 'int16'},
            'mix_interval': 2.,
        })
        provider = DataProvider.from_config(config)
        provider.train_transform.label_encoder.initialize_labels(
            dataset=provider.db.get_dataset(
                ['train_strong', 'train_weak']))
        provider.test_transform.label_encoder.initialize_labels()
        model = _flagship_model_for_events(provider)
        trainer = Trainer(model, storage_dir=None,
                          stop_trigger=(10 ** 9, 'iteration'))
        train_set = provider.get_train_set()
        # one epoch to compile every palette shape
        n_warm = 0
        for batch in train_set:
            trainer.train_step(batch)
            n_warm += 1
        jax.block_until_ready(trainer.model.variables)
        clips = 0
        t0 = time.perf_counter()
        for batch in train_set:
            trainer.train_step(batch)
            clips += len(batch['example_id'])
        jax.block_until_ready(trainer.model.variables)
        dt = time.perf_counter() - t0
        n_chips = jax.device_count()
        results['host_pipeline_clips_per_s_chip'] = round(
            clips / dt / n_chips, 2)
        results['host_pipeline_batches'] = n_warm

        # HOST-ONLY throughput (VERDICT r2 #6): decode -> bucket ->
        # collate with NO device step, scaled workers — bounds what the
        # host path can feed an unthrottled chip. Workers capped at the
        # core count (this bench host has ONE vCPU; extra threads only
        # thrash the GIL). f32 transport here: the int16 quantization
        # that wins the transfer-bound END-TO-END lane above costs an
        # extra host pass per batch, which this host-capability lane
        # should not pay
        import os as _os
        provider.train_fetcher.prefetch_workers = min(
            8, _os.cpu_count() or 1)
        provider.train_fetcher.audio_dtype = 'float32'
        results['host_cpu_count'] = _os.cpu_count()
        host_set = provider.get_train_set()
        for _ in host_set:  # warm decode caches / thread pools
            pass
        clips = 0
        t0 = time.perf_counter()
        for _ in range(3):
            for batch in host_set:
                clips += len(batch['example_id'])
        dt = time.perf_counter() - t0
        results['host_only_clips_per_s'] = round(clips / dt, 2)

        # per-STAGE breakdown (sequential, VERDICT r3 #4): attributes
        # the host ms/clip to decode+augment vs transform vs
        # bucket+collate so the worker-scaling extrapolation is
        # principled (the parallelizable stage is the rng-free decode)
        provider.train_fetcher.prefetch_workers = 0
        provider.decode_workers = 0

        def _clips_per_s(ds, passes=2):
            for _ in ds:  # warm caches
                pass
            n = 0
            t0 = time.perf_counter()
            for _ in range(passes):
                for item in ds:
                    n += (len(item['example_id'])
                          if isinstance(item, dict)
                          and isinstance(item.get('example_id'), list)
                          else 1)
            return round(n / (time.perf_counter() - t0), 2)

        try:
            results['host_stage_decode_aug_clips_per_s'] = _clips_per_s(
                provider.prepare_audio(provider.train_set, train=True))
            results['host_stage_plus_transform_clips_per_s'] = \
                _clips_per_s(provider.segment_transform_and_fetch(
                    provider.prepare_audio(provider.train_set,
                                           train=True),
                    fetch=False, train=True))
        except Exception as exc:  # noqa: BLE001 — evidence only
            print(f'host stage breakdown skipped: {exc!r}',
                  file=sys.stderr)

        # decode-workers axis (ordered thread-pool decode,
        # lazy.ParallelMapDataset; the wav decode releases the GIL so
        # the curve scales with CORES — on this 1-vCPU bench host it
        # documents the environmental cap, not the mechanism's limit)
        by_workers = {}
        for w in (0, 2, 4):
            provider.decode_workers = w
            try:
                by_workers[str(w)] = _clips_per_s(
                    provider.get_train_set(), passes=1)
            except Exception as exc:  # noqa: BLE001
                print(f'decode_workers={w} skipped: {exc!r}',
                      file=sys.stderr)
        provider.decode_workers = 0
        results['host_only_clips_per_s_by_decode_workers'] = by_workers

        # cached-features lanes (VERDICT r4 #6): decode ONCE, memmap
        # after — the winnable host story on a 1-vCPU bench host.
        # (a) memmap AUDIO cache (data/cache.py MemmapAudioCache via
        #     provider.cache_dir): removes decode+resample+normalize
        #     per epoch; augmentation randomness stays live, so this is
        #     the production train path on a slow host.
        try:
            provider.cached_datasets = ['train_strong', 'train_weak']
            provider.cache_dir = str(Path(tmp) / 'audio_cache')
            results['host_cached_audio_clips_per_s'] = _clips_per_s(
                provider.get_train_set(), passes=3)
        except Exception as exc:  # noqa: BLE001
            print(f'cached-audio lane skipped: {exc!r}', file=sys.stderr)
        # (b) collated-BATCH cache (BatchCache): palette-shaped batches
        #     replayed verbatim — exact for rng-free pipelines
        #     (validation/inference, aug-free training); bounds what a
        #     fully-precomputed feature store feeds the chip.
        try:
            from pb_sed_tpu.data.cache import BatchCache
            replay = BatchCache(Path(tmp) / 'batch_cache').build(
                provider.get_train_set())
            results['host_cached_batches_clips_per_s'] = _clips_per_s(
                replay, passes=3)
        except Exception as exc:  # noqa: BLE001
            print(f'cached-batch lane skipped: {exc!r}', file=sys.stderr)


def _flagship_model_for_events(provider):
    """Flagship model resized to the synthetic DB's class count."""
    from pb_sed_tpu.models import weak_label
    from pb_sed_tpu.models.net_configs import fbcrnn_config
    k = len(provider.train_transform.label_encoder.label_mapping)
    config = weak_label.CRNN.get_config(fbcrnn_config(
        net_config='shallow', num_events=k))
    return weak_label.CRNN.from_config(config)


def lane_profile(results):
    """Capture a profiler trace of 3 train steps next to the result."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _batch, _flagship_model
    from pb_sed_tpu.train.trainer import Trainer
    from pathlib import Path
    logdir = Path('bench_profile')
    model = _flagship_model()
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(10 ** 9, 'iteration'))
    batch = _batch(model, batch_size=BATCH_SIZE, seconds=SECONDS)
    trainer._ensure_ready(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(2):
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    if logdir.exists():  # stale traces would skew the parsed medians
        import shutil
        shutil.rmtree(logdir)
    logdir.mkdir()
    jax.profiler.start_trace(str(logdir))
    for _ in range(3):
        trainer.train_step(batch)
    jax.block_until_ready(trainer.model.variables)
    jax.profiler.stop_trace()
    results['profile_trace_dir'] = str(logdir)
    try:
        from bench_xplane import device_step_times_ms, duty_cycle_summary
        times = device_step_times_ms(logdir)
        if times:
            results['device_ms_per_step_from_trace'] = round(
                float(np.median(times)), 3)
            # device-span MFU: arch FLOPs over the trace-measured
            # module span (the trustworthy timing on this tunnel,
            # CLAUDE.md) against the documented v5e bf16 peak
            results['mfu_device'] = round(
                results.get('train_step_gflops_arch', 1047.) / 1e3
                / (float(np.median(times)) / 1e3)
                / V5E_BF16_PEAK_TFLOPS, 4)
        # direct duty-cycle measurement (VERDICT r2 #2): op-busy time
        # inside the module span distinguishes a genuinely slow program
        # (busy ~= span) from pool time-slicing (busy << span)
        duty = duty_cycle_summary(logdir)
        if duty:
            results['train_device_busy_ms_per_step'] = duty['busy_ms']
            results['train_duty_cycle'] = duty['duty_cycle']
    except Exception as exc:  # noqa: BLE001 — best-effort evidence
        print(f'trace parse skipped: {exc!r}', file=sys.stderr)


def lane_pallas(results):
    """Pallas GRU kernel vs lax.scan on the attached chip (parity +
    timing; SURVEY §7 flagship kernel)."""
    import jax
    import jax.numpy as jnp
    from pb_sed_tpu.ops.pallas.gru import gru_scan, gru_scan_reference
    if jax.default_backend() != 'tpu':
        print('pallas lane skipped: no TPU', file=sys.stderr)
        return
    rng = np.random.RandomState(0)
    d, b, t, h = 2, BATCH_SIZE, 501, 256
    xw = jnp.asarray(rng.randn(d, b, t, 3 * h).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.randn(d, h, 3 * h) / np.sqrt(h)).astype(np.float32))
    b_hh = jnp.asarray(rng.randn(d, 3 * h).astype(np.float32) * .1)
    h0 = jnp.zeros((d, b, h), jnp.float32)
    ref = jax.jit(gru_scan_reference)
    pal = jax.jit(lambda *a: gru_scan(*a, False))
    y_ref = ref(xw, w_hh, b_hh, h0)
    y_pal = pal(xw, w_hh, b_hh, h0)
    err = float(jnp.max(jnp.abs(y_ref - y_pal)))
    results['pallas_gru_max_abs_err'] = err
    # the kernel runs bf16 MXU matmuls + bf16 xw streaming with f32
    # accumulation/gates; over 501 recurrent steps it drifts ~5e-3 from
    # the scan path (measured)
    assert err < 2e-2, err

    # training path: forward + Pallas backward kernel vs scan autodiff
    def loss_pal(*a):
        return jnp.sum(jnp.square(gru_scan(*a, False)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(gru_scan_reference(*a)))

    grad_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2, 3)))
    grad_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))
    gp = grad_pal(xw, w_hh, b_hh, h0)
    gr = grad_ref(xw, w_hh, b_hh, h0)
    gerr = max(float(jnp.max(jnp.abs(a - b))) / max(
        float(jnp.max(jnp.abs(b))), 1e-9) for a, b in zip(gp, gr))
    results['pallas_gru_grad_max_rel_err'] = round(gerr, 6)

    # DEVICE-span timing from profiler traces: wall timing on the
    # remote tunnel both under-blocks single calls (measures dispatch,
    # ~0.02 ms for any program) and jitters +/-20% across windows; the
    # XLA-module spans are the ground truth
    import tempfile

    def traced_ms(fn, n=8):
        from bench_xplane import device_step_times_ms
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            out = None
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            times = device_step_times_ms(td)
        return round(float(np.median(times)), 3) if times else None

    results['pallas_gru_ms'] = traced_ms(
        lambda: pal(xw, w_hh, b_hh, h0))
    results['scan_gru_ms'] = traced_ms(
        lambda: ref(xw, w_hh, b_hh, h0))
    results['pallas_gru_grad_ms'] = traced_ms(
        lambda: grad_pal(xw, w_hh, b_hh, h0))
    results['scan_gru_grad_ms'] = traced_ms(
        lambda: grad_ref(xw, w_hh, b_hh, h0))


# Historical per-lane durations (r03-r05 stderr timings + margin). The
# budget guard skips a lane unless it can plausibly FINISH inside the
# budget — r04's guard only checked the budget before a lane STARTED,
# so the pallas lane straddled the driver's kill and the final JSON
# never printed (rc=124, parsed=null). Two tiers: COLD (empty
# persistent compile cache) vs WARM (the cache at /tmp/jax_bench_cache
# carries this bench's programs — the normal driver case, since the
# round's own validation bench run populates it); the ensemble lane's
# scan-chunked program compiles ~20 min cold but is cache-hit warm.
EXPECTED_LANE_S_COLD = {
    'train': 700, 'profile': 180, 'deep': 420, 'ensemble': 1650,
    'host': 360, 'pallas': 300,
}
EXPECTED_LANE_S_WARM = {
    'train': 240, 'profile': 120, 'deep': 150, 'ensemble': 240,
    'host': 330, 'pallas': 150,
}


def expected_lane_s(name):
    import glob
    warm = len(glob.glob('/tmp/jax_bench_cache/*')) >= 8
    table = EXPECTED_LANE_S_WARM if warm else EXPECTED_LANE_S_COLD
    return table.get(name, 300)


def _emit_final(results):
    """Print the contract-format final JSON line to STDOUT (flush).

    Called after EVERY lane so the last stdout line is always a
    parseable, current snapshot — a driver kill mid-lane loses only
    that lane, not the round (driver contract: ONE final JSON line,
    last line wins)."""
    candidates = [
        results.get('train_single_clips_per_s_chip'),
        results.get('train_multi_k10_clips_per_s_chip'),
        results.get('train_multi_k50_clips_per_s_chip'),
    ]
    headline = max([c for c in candidates if c] or [0.])
    print(json.dumps({
        'metric': 'FBCRNN train clips/sec/chip (10s DESED clips, bs=32, '
                  'full device pipeline)',
        'value': headline,
        'unit': 'clips/s/chip',
        'vs_baseline': round(headline / A100_BASELINE_CLIPS_PER_SEC, 3),
        'a100_baseline_clips_per_s': A100_BASELINE_CLIPS_PER_SEC,
        'a100_baseline_note': (
            'derived component model of the torch reference on one '
            'A100 (BASELINE.md), range 460-1280; earlier rounds '
            'divided by an assumed 200'),
        **results,
    }), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--lanes', default='train,profile,deep,ensemble,host,pallas',
        help='comma list: train,profile,deep,ensemble,host,pallas')
    args = parser.parse_args()
    lanes = args.lanes.split(',')
    sys.path.insert(0, '.')
    import jax
    try:
        # persistent compile cache: re-runs skip the 5-10 min remote
        # compiles (PERFORMANCE.md tunnel pathology)
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/jax_bench_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass
    import os
    budget_s = float(os.environ.get('BENCH_BUDGET_S', 2100))
    t_start = time.perf_counter()
    results = {'lanes_done': []}
    # evidence-ordered: train/profile carry the headline + device span,
    # pallas (kernel A/B) is the most expendable
    for name, fn in (('train', lane_train), ('profile', lane_profile),
                     ('deep', lane_deep), ('ensemble', lane_ensemble),
                     ('host', lane_host), ('pallas', lane_pallas)):
        if name not in lanes:
            continue
        elapsed = time.perf_counter() - t_start
        if name != 'train' and \
                elapsed + expected_lane_s(name) > budget_s:
            # a lane that cannot FINISH inside the budget must not start
            print(f'lane {name} skipped: {elapsed:.0f}s elapsed + '
                  f'~{expected_lane_s(name)}s expected exceeds '
                  f'budget {budget_s:.0f}s', file=sys.stderr)
            results[f'{name}_skipped'] = 'budget'
            continue
        t_lane = time.perf_counter()
        probe_fast_window(results, f'before_{name}')
        try:
            fn(results)
        except Exception as exc:  # noqa: BLE001 — keep the headline alive
            print(f'lane {name} failed: {exc!r}', file=sys.stderr)
            results[f'{name}_error'] = repr(exc)
        probe_fast_window(results, f'after_{name}')
        results['lanes_done'] = results['lanes_done'] + [name]
        # which hand-written kernels silently fell back to XLA this
        # process (VERDICT r4 #5): [] = every requested kernel engaged
        try:
            from pb_sed_tpu.ops.fallback import fallback_records
            results['kernel_fallbacks'] = [
                list(rec) for rec in fallback_records()]
        except Exception:  # noqa: BLE001
            pass
        print(f'[lane {name} done in '
              f'{time.perf_counter() - t_lane:.1f}s]', file=sys.stderr,
              flush=True)
        # contract line after EVERY lane: a later kill cannot erase it
        _emit_final(results)


if __name__ == '__main__':
    main()
