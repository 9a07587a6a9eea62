"""Multi-host input-pipeline semantics (process-simulated shards).

SURVEY.md §2.4/§7 hard part: the bucketing policy's
``min_dataset_examples_in_batch`` / ``min_label_diversity_in_batch``
contracts must hold per GLOBAL batch when every host feeds its own shard
(reference contract: ``pb_sed/data_preparation/fetcher.py:38-51``).
"""
import numpy as np

from pb_sed_tpu.data import lazy
from pb_sed_tpu.data.fetcher import DataFetcher, split_quota
from pb_sed_tpu.parallel.mesh import initialize_distributed


def make_examples(n=32):
    rng = np.random.RandomState(0)
    examples = []
    for i in range(n):
        ds_name = 'b' if i % 4 == 0 else 'a'
        seq_len = int(rng.choice([10, 12, 30]))
        k = 4
        weak = np.zeros(k, np.float32)
        weak[i % k] = 1.
        examples.append({
            'example_id': f'e{i}', 'dataset': ds_name,
            'audio_data': np.zeros(seq_len * 50, np.float32),
            'seq_len': seq_len, 'seq_len_samples': seq_len * 50,
            'weak_targets': weak,
        })
    return examples


def fetch(examples, **kwargs):
    fetcher = DataFetcher(
        prefetch_workers=0, pad_to_multiple=8, drop_incomplete=True,
        **kwargs)
    return list(fetcher(lazy.from_list(examples)))


def test_split_quota_deterministic():
    for quota in range(7):
        for n in (1, 2, 3, 4):
            shares = [split_quota(quota, n, i) for i in range(n)]
            assert sum(shares) == quota, (quota, n, shares)
            assert max(shares) - min(shares) <= 1


def test_global_batch_sharding_exact_semantics():
    """shard_level='batch': every host assembles the identical global
    batch and takes its slice -> global composition quotas hold exactly
    and all hosts see the same palette shape per step."""
    initialize_distributed()  # single-host no-op
    examples = make_examples()
    quota = {'b': 1}
    kwargs = dict(batch_size=4, min_dataset_examples_in_batch=quota,
                  min_label_diversity_in_batch=2)
    full = fetch(examples, **kwargs)
    shard0 = fetch(examples, num_shards=2, shard_index=0, **kwargs)
    shard1 = fetch(examples, num_shards=2, shard_index=1, **kwargs)
    assert len(full) == len(shard0) == len(shard1) > 0
    for bf, b0, b1 in zip(full, shard0, shard1):
        ids0, ids1 = set(b0['example_id']), set(b1['example_id'])
        # disjoint slices reassemble the global batch
        assert not ids0 & ids1
        assert ids0 | ids1 == set(bf['example_id'])
        # identical palette shape across hosts (SPMD shape agreement)
        assert (b0['audio_data'].shape[1] == b1['audio_data'].shape[1]
                == bf['audio_data'].shape[1])
        assert (b0['weak_targets'].shape[0] + b1['weak_targets'].shape[0]
                == bf['weak_targets'].shape[0])
        # GLOBAL batch composition quotas (the reference contract)
        union_datasets = list(b0['dataset']) + list(b1['dataset'])
        assert union_datasets.count('b') >= quota['b']
        union_labels = set()
        for b in (b0, b1):
            union_labels |= set(
                np.nonzero(b['weak_targets'].max(0) > .99)[0].tolist())
        assert len(union_labels) >= 2


def test_example_level_sharding_split_quotas():
    """shard_level='example': per-shard bucketing with deterministically
    split quotas -> the union still satisfies the global dataset quota."""
    examples = make_examples()
    quota = {'b': 2}
    kwargs = dict(batch_size=4, min_dataset_examples_in_batch=quota,
                  shard_level='example')
    shards = [
        fetch(examples, num_shards=2, shard_index=i, **kwargs)
        for i in range(2)
    ]
    assert all(shards)
    for b0, b1 in zip(*shards):
        # local batches are batch_size // num_shards
        assert len(b0['example_id']) == len(b1['example_id']) == 2
        union_datasets = list(b0['dataset']) + list(b1['dataset'])
        assert union_datasets.count('b') >= quota['b']
        # no example appears on both shards
        assert not set(b0['example_id']) & set(b1['example_id'])


def test_unsharded_matches_old_behavior():
    examples = make_examples(8)
    for ex in examples:  # uniform length -> a single palette bucket
        ex['seq_len'] = 10
        ex['seq_len_samples'] = 500
        ex['audio_data'] = np.zeros(500, np.float32)
    batches = fetch(examples, batch_size=4)
    ids = [i for b in batches for i in b['example_id']]
    assert sorted(ids, key=lambda s: int(s[1:])) == [
        f'e{i}' for i in range(8)]


def test_example_sharding_with_global_shuffle():
    """Regression: global_shuffle after hash-sharding crashed (the shard
    stream is iterator-only); shuffling happens upstream now."""
    examples = make_examples(16)
    for ex in examples:
        ex['seq_len'] = 10
        ex['seq_len_samples'] = 500
        ex['audio_data'] = np.zeros(500, np.float32)
    shards = [
        fetch(examples, batch_size=4, num_shards=2, shard_index=i,
              shard_level='example', global_shuffle=True,
              shard_shuffle_seed=7)
        for i in range(2)
    ]
    ids = [i for batches in shards for b in batches
           for i in b['example_id']]
    assert len(ids) == len(set(ids))  # disjoint shards
    assert len(ids) >= 12  # most examples survive (complete local batches)


def test_batch_mode_partial_batches_score_every_example():
    """Regression (ADVICE r2): partial batches (end-of-stream drain with
    drop_incomplete=False) silently lost len % num_shards examples and
    dropped batches smaller than num_shards entirely; now they are
    padded by repetition so every example reaches some host."""
    examples = make_examples(10)
    for ex in examples:  # single palette bucket -> one partial drain
        ex['seq_len'] = 10
        ex['seq_len_samples'] = 500
        ex['audio_data'] = np.zeros(500, np.float32)
    kwargs = dict(batch_size=4, drop_incomplete=False)

    def fetch_keep(shard=None):
        fetcher = DataFetcher(prefetch_workers=0, pad_to_multiple=8,
                              **kwargs,
                              **({} if shard is None else shard))
        return list(fetcher(lazy.from_list(examples)))

    shard0 = fetch_keep({'num_shards': 2, 'shard_index': 0})
    shard1 = fetch_keep({'num_shards': 2, 'shard_index': 1})
    ids = set()
    for b0, b1 in zip(shard0, shard1):
        # identical per-host batch sizes every step (SPMD agreement)
        assert len(b0['example_id']) == len(b1['example_id'])
        ids |= set(b0['example_id']) | set(b1['example_id'])
    # ALL 10 examples are scored on some host (2 leftovers included)
    assert ids == {f'e{i}' for i in range(10)}


def test_example_sharding_steps_per_epoch_aligns_hosts():
    """steps_per_epoch truncates every host's stream to the agreed
    budget; aligned_steps_per_epoch computes it from the id list."""
    examples = make_examples(32)
    for ex in examples:
        ex['seq_len'] = 10
        ex['seq_len_samples'] = 500
        ex['audio_data'] = np.zeros(500, np.float32)
    fetcher = DataFetcher(
        prefetch_workers=0, pad_to_multiple=8, drop_incomplete=True,
        batch_size=4, num_shards=2, shard_index=0,
        shard_level='example')
    budget = fetcher.aligned_steps_per_epoch(
        [ex['example_id'] for ex in examples])
    assert budget >= 1
    from pb_sed_tpu.data.lazy import shard_membership_counts
    counts = shard_membership_counts(
        [ex['example_id'] for ex in examples], 2)
    assert budget == min(counts) // 2
    shards = []
    for i in range(2):
        fetcher_i = DataFetcher(
            prefetch_workers=0, pad_to_multiple=8, drop_incomplete=True,
            batch_size=4, num_shards=2, shard_index=i,
            shard_level='example', steps_per_epoch=budget)
        shards.append(list(fetcher_i(lazy.from_list(examples))))
    # both hosts run EXACTLY the same number of steps
    assert len(shards[0]) == len(shards[1]) == budget


def test_batch_mode_requires_divisible_batch():
    import pytest
    examples = make_examples(8)
    with pytest.raises(AssertionError):
        fetch(examples, batch_size=5, num_shards=2, shard_index=0)


def test_provider_raw_shard_filters_before_decode(tmp_path):
    """DataProvider.raw_shard: pre-decode clip-id-hash filter — the
    decode-bound multi-host path (each host decodes only its shard)."""
    import zlib
    from pb_sed_tpu.data.provider import DataProvider
    from tests.util_synth import build_database
    db, json_path = build_database(tmp_path)
    decoded_ids = []

    def make(shard):
        config = DataProvider.get_config({
            'json_path': str(json_path),
            'train_set': {'train_strong': 1},
            'validate_set': 'validation',
            'min_audio_length': 0.2,
            'storage_dir': str(tmp_path),
            'raw_shard': shard,
            'mix_interval': None,
            'train_fetcher': {'batch_size': 2, 'prefetch_workers': 0},
        })
        provider = DataProvider.from_config(config)
        reader = provider.audio_reader

        def tracking_reader(example):
            decoded_ids.append(example['example_id'])
            return reader(example)

        provider.audio_reader = tracking_reader
        return provider

    p0 = make([2, 0])
    ids0 = {ex['example_id']
            for ex in p0.prepare_audio({'train_strong': 1}, train=True)}
    assert ids0  # shard non-empty with this fixture
    assert all(
        zlib.crc32(i.encode()) % 2 == 0 for i in ids0)
    # the decode map only ever touched shard-0 examples
    assert set(decoded_ids) <= {
        i for i in decoded_ids if zlib.crc32(i.encode()) % 2 == 0}
    assert all(zlib.crc32(i.encode()) % 2 == 0 for i in decoded_ids)
