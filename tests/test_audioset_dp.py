"""AudioSet-scale data-parallel pretraining evidence (SURVEY §2.4 DP
workload; reference recipe
``pb_sed/experiments/weak_label_crnn/training.py:113-151``).

Runs the real ``weak_label_crnn.training`` experiment with
``database_name='audioset'`` (527 weak classes) on a synthetic
AudioSet-style corpus for a few hundred sharded steps on the virtual
8-device mesh — the DP pretraining path as an executed experiment, not
just config.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from pb_sed_tpu.utils.misc import dump_json

from tests.util_synth import SR, write_wav

NUM_CLASSES = 527


def build_audioset_527(root, n_train=600, n_eval=16, seed=0):
    """Synthetic audioset.json covering ALL 527 weak classes."""
    rng = np.random.RandomState(seed)
    classes = [f'c{i:03d}' for i in range(NUM_CLASSES)]
    datasets = {'balanced_train': {}, 'unbalanced_train': {}, 'eval': {}}

    def add_clip(ds_name, i, labels):
        clip_id = f'{ds_name}_{i}'
        path = root / 'audio' / ds_name / f'{clip_id}.wav'
        write_wav(path, 0.05 * rng.randn(SR // 2))
        datasets[ds_name][clip_id] = {
            'audio_path': str(path),
            'audio_length': 0.5,
            'events': labels,
            'label_types': ['weak'] * len(labels),
        }

    half = n_train // 2
    for i in range(n_train):
        ds_name = 'balanced_train' if i < half else 'unbalanced_train'
        # class i mod 527 guarantees full coverage; c000 made frequent
        # so min_class_examples_per_epoch=0.01 yields a base count > 1
        labels = sorted({classes[i % NUM_CLASSES],
                         classes[rng.randint(NUM_CLASSES)]}
                        | ({'c000'} if i % 4 == 0 else set()))
        add_clip(ds_name, i, labels)
    for i in range(n_eval):
        add_clip('eval', i, [classes[rng.randint(NUM_CLASSES)]])
    db = {'datasets': datasets, 'ontology': {},
          'weak_event_classes': classes, 'strong_event_classes': []}
    json_path = root / 'audioset.json'
    dump_json(db, json_path)
    return json_path


@pytest.mark.slow
def test_audioset_dp_pretraining(tmp_path):
    json_path = build_audioset_527(tmp_path / 'db')
    storage_dir = tmp_path / 'exp' / 'run' / 'run'

    from pb_sed_tpu.experiments.weak_label_crnn.training import ex
    config_updates = {
        'database_name': 'audioset',
        'timestamp': 'run',
        'group_name': 'run',
        'storage_dir': str(storage_dir),
        'batch_size': 8,
        'data_provider': {
            'json_path': str(json_path),
            'min_audio_length': 0.2,
            'train_fetcher': {
                'batch_size': 8,
                'prefetch_workers': 0,
                'pad_to_multiple': 16,
                'min_label_diversity_in_batch': 0,
                'min_dataset_examples_in_batch': None,
            },
            'test_fetcher': {
                'batch_size': 8,
                'prefetch_workers': 0,
                'pad_to_multiple': 16,
            },
            'train_transform': {
                'stft': {'shift': 160, 'window_length': 480, 'size': 512},
                'anchor_sampling_fn': None,
                'anchor_shift_sampling_fn': None,
            },
            'mix_interval': None,
        },
        'num_iterations': 200,
        'checkpoint_interval': 100,
        'summary_interval': 50,
        'lr_rampup_steps': 20,
        'lr_decay_steps': [120],
        'trainer': {
            'model': {
                'feature_extractor': {
                    'stft_size': 512, 'stft_shift': 160,
                    'stft_window_length': 480,
                    'number_of_filters': 16,
                },
                'cnn': {
                    'cnn_2d': {'out_channels': [4, 4],
                               'pool_size': [[2, 1], [2, 1]],
                               'kernel_size': 3},
                    'cnn_1d': {'out_channels': [16, 16],
                               'kernel_size': 3},
                },
                'rnn_fwd': {
                    'rnn': {'hidden_size': 16, 'num_layers': 1},
                    'output_net': {
                        'out_channels': [32, NUM_CLASSES],
                        'kernel_size': 1},
                },
            },
        },
    }
    ex.run(config_updates=config_updates)

    # 527-class DP run reached the full iteration count
    summary = [
        json.loads(line)
        for line in (storage_dir / 'summary.jsonl').read_text()
        .splitlines()
    ]
    train_rows = [r for r in summary if r['prefix'] == 'training']
    assert train_rows[-1]['iteration'] == 200, train_rows[-1]
    # loss went down over the run
    assert train_rows[-1]['loss'] < train_rows[0]['loss'], (
        train_rows[0]['loss'], train_rows[-1]['loss'])
    # config records the audioset recipe (527 events)
    config = json.loads(
        (storage_dir / '1' / 'config.json').read_text())
    assert config['num_events'] == NUM_CLASSES
    assert (storage_dir / 'checkpoints' / 'ckpt_latest.pkl').exists()
