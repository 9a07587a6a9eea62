"""Disk-backed feature cache tests (data/cache.py): memmap audio cache
equivalence + invalidation, collated-batch cache exact round trip,
DataProvider integration via ``cache_dir``."""
import numpy as np

from pb_sed_tpu.data.cache import BatchCache, MemmapAudioCache
from pb_sed_tpu.data.provider import DataProvider

from tests.util_synth import build_database


def _provider(json_path, tmp_path, **overrides):
    config = DataProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'train_strong': 1, 'train_weak': 1},
        'validate_set': 'validation',
        'min_audio_length': 0.1,
        'storage_dir': str(tmp_path),
        'train_transform': {'provide_boundary_targets': True},
        'train_fetcher': {'batch_size': 4, 'prefetch_workers': 0,
                          'drop_incomplete': False},
        'mix_interval': None,
        **overrides,
    })
    provider = DataProvider.from_config(config)
    provider.train_transform.label_encoder.initialize_labels(
        dataset=provider.db.get_dataset(['train_strong', 'train_weak']))
    provider.test_transform.label_encoder.initialize_labels()
    return provider


def test_memmap_audio_cache_matches_decode(tmp_path):
    _, json_path = build_database(tmp_path / 'db', num_train=6,
                                  num_weak=4, clip_seconds=0.3)
    provider = _provider(json_path, tmp_path)
    raw = provider.get_raw('train_strong',
                           discard_labelless_examples=True)
    decoded = [provider.audio_reader(dict(ex)) for ex in raw]

    cache_dir = tmp_path / 'cache' / 'train_strong'
    fingerprint = ('train_strong', len(raw), 123, 16000)
    cached = MemmapAudioCache.wrap(
        raw.map(provider.audio_reader), cache_dir, fingerprint)
    assert len(cached) == len(decoded)
    for direct, ex in zip(decoded, cached):
        np.testing.assert_array_equal(direct['audio_data'],
                                      np.asarray(ex['audio_data']))
        assert direct['example_id'] == ex['example_id']
        assert direct['seq_len'] == ex['seq_len']
        for key in ('events', 'events_start_samples',
                    'events_stop_samples'):
            if key in direct:
                assert list(direct[key]) == list(ex[key]), key

    # reopen without rebuild: valid() on same fingerprint
    cache = MemmapAudioCache(cache_dir)
    assert cache.valid(fingerprint)
    # fingerprint mismatch invalidates (no silent stale read)
    assert not cache.valid(('train_strong', len(raw), 124, 16000))


def test_provider_cache_dir_streams_identically(tmp_path):
    _, json_path = build_database(tmp_path / 'db', num_train=6,
                                  num_weak=4, clip_seconds=0.3)
    base = _provider(json_path, tmp_path, epoch_shuffle_seed=7)
    cached = _provider(
        json_path, tmp_path, epoch_shuffle_seed=7,
        cached_datasets=['train_strong', 'train_weak'],
        cache_dir=str(tmp_path / 'audio_cache'))
    for b_ref, b_cached in zip(base.get_train_set(),
                               cached.get_train_set()):
        assert b_ref['example_id'] == b_cached['example_id']
        np.testing.assert_allclose(
            b_ref['audio_data'], b_cached['audio_data'], atol=0)
        np.testing.assert_array_equal(b_ref['weak_targets'],
                                      b_cached['weak_targets'])
    # second provider instance re-opens the cache (no rebuild): the
    # index file's mtime must not change
    index = tmp_path / 'audio_cache' / 'train_strong' / 'index.json'
    mtime = index.stat().st_mtime_ns
    again = _provider(
        json_path, tmp_path, epoch_shuffle_seed=7,
        cached_datasets=['train_strong', 'train_weak'],
        cache_dir=str(tmp_path / 'audio_cache'))
    next(iter(again.get_train_set()))
    assert index.stat().st_mtime_ns == mtime


def test_batch_cache_round_trip(tmp_path):
    _, json_path = build_database(tmp_path / 'db', num_train=6,
                                  num_weak=4, clip_seconds=0.3)
    provider = _provider(json_path, tmp_path)
    batches = list(provider.get_validate_set())
    assert batches
    replay = BatchCache(tmp_path / 'bcache').build(batches)
    assert len(replay) == len(batches)
    for ref, got in zip(batches, replay):
        assert set(ref.keys()) == set(got.keys())
        for key, value in ref.items():
            if isinstance(value, np.ndarray):
                assert value.dtype == got[key].dtype, key
                np.testing.assert_array_equal(value, got[key], err_msg=key)
            else:
                assert list(value) == list(got[key]), key
    # replay is indexable -> epoch-order shuffle composes
    shuffled = BatchCache(tmp_path / 'bcache').dataset().shuffle(
        reshuffle=True, rng=np.random.RandomState(0))
    assert len(list(shuffled)) == len(batches)
