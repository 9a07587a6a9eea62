"""AudioSet-path tests: provider with ontology ancestor expansion and the
weak-label AudioSet training recipe on a synthetic audioset-style json."""
import numpy as np
import pytest

from pb_sed_tpu.database.audioset.provider import AudioSetProvider
from pb_sed_tpu.utils.misc import dump_json

from tests.util_synth import SR, write_wav


def build_audioset_db(root, n=10):
    rng = np.random.RandomState(0)
    classes = ['Animal', 'Dog', 'Bark']
    ontology = {
        'Animal': {'id': '/m/1', 'name': 'Animal',
                   'child_names': ['Dog'], 'parent_names': [],
                   'ancestor_names': [],
                   'descendant_names': ['Bark', 'Dog']},
        'Dog': {'id': '/m/2', 'name': 'Dog', 'child_names': ['Bark'],
                'parent_names': ['Animal'], 'ancestor_names': ['Animal'],
                'descendant_names': ['Bark']},
        'Bark': {'id': '/m/3', 'name': 'Bark', 'child_names': [],
                 'parent_names': ['Dog'],
                 'ancestor_names': ['Animal', 'Dog'],
                 'descendant_names': []},
    }
    datasets = {'balanced_train': {}, 'eval': {}}
    for ds_name, count in [('balanced_train', n), ('eval', 4)]:
        for i in range(count):
            clip_id = f'{ds_name}_{i}'
            path = root / 'audio' / ds_name / f'{clip_id}.wav'
            write_wav(path, 0.1 * rng.randn(SR // 2))
            labels = [classes[rng.randint(3)]]
            datasets[ds_name][clip_id] = {
                'audio_path': str(path),
                'audio_length': 0.5,
                'events': labels,
                'label_types': ['weak'] * len(labels),
            }
    db = {'datasets': datasets, 'ontology': ontology,
          'weak_event_classes': classes, 'strong_event_classes': []}
    json_path = root / 'audioset.json'
    dump_json(db, json_path)
    return db, json_path


def test_audioset_provider_ancestor_expansion(tmp_path):
    db, json_path = build_audioset_db(tmp_path)
    config = AudioSetProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'balanced_train': 1},
        'add_ancestor_events': True,
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'train_fetcher': {
            'batch_size': 4, 'prefetch_workers': 0,
            'pad_to_multiple': 16,
            'min_label_diversity_in_batch': 0,
        },
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0},
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'anchor_sampling_fn': None,
            'anchor_shift_sampling_fn': None,
        },
        'mix_interval': None,
    })
    assert config['validate_set'] == 'eval'
    provider = AudioSetProvider.from_config(config)
    raw = provider.get_raw('balanced_train')
    examples = list(raw)
    # find one with a 'Bark' label: ancestors Dog+Animal must be added
    barked = [ex for ex in examples if 'Bark' in ex['events']]
    if barked:
        assert 'Dog' in barked[0]['events']
        assert 'Animal' in barked[0]['events']
    dogged = [ex for ex in examples if 'Dog' in ex['events']]
    assert all('Animal' in ex['events'] for ex in dogged)


def test_audioset_rebalancing_pipeline(tmp_path):
    """min_class_examples_per_epoch triggers the label-repetition path
    (reference AudioSet recipe, training.py:113-151)."""
    db, json_path = build_audioset_db(tmp_path, n=12)
    config = AudioSetProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'balanced_train': 1},
        'min_class_examples_per_epoch': 6,
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'train_fetcher': {
            'batch_size': 4, 'prefetch_workers': 0,
            'pad_to_multiple': 16,
            'min_label_diversity_in_batch': 0,
            'drop_incomplete': False,
        },
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0},
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'anchor_sampling_fn': None,
            'anchor_shift_sampling_fn': None,
        },
        'mix_interval': None,
    })
    provider = AudioSetProvider.from_config(config)
    provider.train_transform.label_encoder.initialize_labels(
        dataset=provider.db.get_dataset('balanced_train'))
    provider.test_transform.label_encoder.initialize_labels()
    train_set = provider.get_train_set()
    batches = list(train_set)
    total = sum(len(b['example_id']) for b in batches)
    # rebalancing repeats rare-class examples -> epoch grows
    assert total >= 12
