"""Multiprocessing for per-threshold evaluation sweeps.

Capability parity with the reference's multiprocessing-parallel
evaluation (SURVEY.md §2.3f: ``num_jobs=8`` everywhere, e.g.
``models/base/tuning.py:161``). Uses the ``spawn`` start method: the
evaluation import chain is numpy/pandas-only, so workers start without
importing jax — forking a process whose XLA backend is live (the
inference engine just ran the model) can deadlock, spawn cannot.
"""
import multiprocessing as mp
import os

_WORKER_FN = None
_WORKER_DATA = None


def _init_worker(fn, data):
    global _WORKER_FN, _WORKER_DATA
    _WORKER_FN, _WORKER_DATA = fn, data


def _run_item(item):
    return _WORKER_FN(item, *_WORKER_DATA)


def parallel_map(fn, items, data, num_jobs=1):
    """``[fn(item, *data) for item in items]``, optionally with a
    ``num_jobs``-process pool.

    ``fn`` must be a module-level function (picklable); ``data`` is
    shipped to each worker once via the pool initializer, not per item.
    Falls back to the serial loop when ``num_jobs <= 1``, there is at
    most one item, or only one CPU is available.
    """
    items = list(items)
    cpus = os.cpu_count() or 1
    if num_jobs is None or num_jobs <= 1 or len(items) <= 1 or cpus <= 1:
        return [fn(item, *data) for item in items]
    ctx = mp.get_context('spawn')
    n = min(num_jobs, len(items), cpus)
    with ctx.Pool(n, initializer=_init_worker,
                  initargs=(fn, data)) as pool:
        return pool.map(
            _run_item, items, chunksize=max(1, len(items) // n))
