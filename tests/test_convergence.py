"""Learning-quality evidence: the FBCRNN must actually LEARN the
synthetic sound events, not just run.

Short smoke chains validate plumbing; this trains long enough that the
clip-level tagging quality must become strong (the synthetic beeps /
chirps / hums are trivially separable), which catches semantic bugs in
the loss construction, soft-label masking, target alignment or
augmentation RNG that shape-level tests cannot see.
"""
import numpy as np
import pytest

from pb_sed_tpu.data.provider import DataProvider
from pb_sed_tpu.models import weak_label
from pb_sed_tpu.models import base
from pb_sed_tpu.train.trainer import Trainer

from tests.util_synth import build_database


@pytest.mark.slow
@pytest.mark.parametrize('net', ['shallow', 'deep'])
def test_fbcrnn_learns_synthetic_tagging(tmp_path, net):
    db, json_path = build_database(
        tmp_path / 'db', num_train=24, num_weak=16, num_validate=8,
        clip_seconds=0.5)
    config = DataProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'train_strong': 1, 'train_weak': 1},
        'validate_set': 'validation',
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'provide_boundary_targets': True,
            'anchor_sampling_fn': None,
            'anchor_shift_sampling_fn': None,
        },
        'train_fetcher': {
            'batch_size': 8, 'pad_to_multiple': 16,
            'prefetch_workers': 0, 'drop_incomplete': True,
        },
        'test_fetcher': {
            'batch_size': 8, 'pad_to_multiple': 16,
            'prefetch_workers': 0,
        },
        'mix_interval': None,
    })
    provider = DataProvider.from_config(config)
    provider.train_transform.label_encoder.initialize_labels(
        dataset=provider.db.get_dataset(['train_strong', 'train_weak']))
    provider.test_transform.label_encoder.initialize_labels()

    if net == 'deep':
        # the width-2 recipe's structure at test scale (VERDICT r4 #4):
        # pre-activation residual tower with 3/1-alternating kernels,
        # identity skips crossing pools/channel growth, conv1d
        # residuals, 2-layer GRU (net_configs.py 'deep')
        cnn = {
            'cnn_2d': {'out_channels': [8, 8, 8, 16],
                       'kernel_size': [3, 1, 3, 1],
                       'pool_size': [1, [2, 1], 1, [2, 1]],
                       'residual_connections': [2, None, None, None],
                       'pre_activation': True},
            'cnn_1d': {'out_channels': [16, 16, 16],
                       'kernel_size': [1, 3, 1],
                       'residual_connections': [None, 2, None],
                       'pre_activation': True},
        }
        rnn = {'rnn': {'hidden_size': 32, 'num_layers': 2},
               'output_net': {'out_channels': [16, 3],
                              'kernel_size': 1}}
    else:
        cnn = {
            'cnn_2d': {'out_channels': [8, 8],
                       'pool_size': [[2, 1], [2, 1]], 'kernel_size': 3},
            'cnn_1d': {'out_channels': [16, 16], 'kernel_size': 3},
        }
        rnn = {'rnn': {'hidden_size': 32, 'num_layers': 1},
               'output_net': {'out_channels': [16, 3],
                              'kernel_size': 1}}
    model_config = weak_label.CRNN.get_config({
        'feature_extractor': {
            'sample_rate': 16000, 'stft_size': 512,
            'stft_shift': 160, 'stft_window_length': 480,
            'number_of_filters': 32,
        },
        'cnn': cnn,
        'rnn_fwd': rnn,
    })
    model = weak_label.CRNN.from_config(model_config)
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(300, 'iteration'))
    trainer.optimizer.lr = 3e-3
    train_set = provider.get_train_set()
    losses = []
    while trainer.iteration < 300:
        for batch in train_set:
            if trainer.iteration >= 300:
                break
            losses.append(float(trainer.train_step(batch)))
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20]), (
        np.mean(losses[:20]), np.mean(losses[-20:]))

    # clip-level tagging on the held-out validation set must be strong
    from pb_sed_tpu.evaluation import clip_based
    validate_set = provider.get_validate_set()
    scores = base.tagging([model], validate_set)
    tags_gt = {
        cid: sorted(set(ex['events']))
        for cid, ex in db['datasets']['validation'].items()
    }
    import pandas as pd
    classes = [provider.train_transform.label_encoder
               .inverse_label_mapping[i] for i in range(3)]
    frames = {
        cid: pd.DataFrame({
            'onset': [0.], 'offset': [1.],
            **{c: [float(np.asarray(arr).max())]
               for c, arr in zip(classes, np.asarray(scores[cid]))}
        })
        for cid in scores
    }
    f, p, r, thr, _ = clip_based.best_fscore(frames, tags_gt)
    assert f['macro_average'] > 0.85, f


@pytest.mark.slow
def test_bicrnn_learns_synthetic_frames(tmp_path):
    """Strong-label path: the BiCRNN must learn frame-accurate activity
    (catches strong-loss masking / target-alignment bugs)."""
    from pb_sed_tpu.models import strong_label

    db, json_path = build_database(
        tmp_path / 'db', num_train=24, num_weak=0, num_validate=8,
        clip_seconds=0.5)
    config = DataProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'train_strong': 1},
        'validate_set': 'validation',
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'provide_strong_targets': True,
            'anchor_sampling_fn': None,
            'anchor_shift_sampling_fn': None,
        },
        'train_fetcher': {
            'batch_size': 8, 'pad_to_multiple': 16,
            'prefetch_workers': 0, 'drop_incomplete': True,
        },
        'test_fetcher': {
            'batch_size': 8, 'pad_to_multiple': 16,
            'prefetch_workers': 0,
        },
        'mix_interval': None,
    })
    provider = DataProvider.from_config(config)
    provider.train_transform.label_encoder.initialize_labels(
        dataset=provider.db.get_dataset('train_strong'))
    provider.test_transform.label_encoder.initialize_labels()

    model_config = strong_label.CRNN.get_config({
        'tag_conditioning': False,
        'feature_extractor': {
            'sample_rate': 16000, 'stft_size': 512,
            'stft_shift': 160, 'stft_window_length': 480,
            'number_of_filters': 32,
        },
        'cnn': {
            'cnn_2d': {'out_channels': [8, 8],
                       'pool_size': [[2, 1], [2, 1]], 'kernel_size': 3},
            'cnn_1d': {'out_channels': [16, 16], 'kernel_size': 3},
        },
        'rnn': {
            'rnn': {'hidden_size': 32, 'num_layers': 1},
            'output_net': {'out_channels': [16, 3], 'kernel_size': 1},
        },
    })
    model = strong_label.CRNN.from_config(model_config)
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(300, 'iteration'))
    trainer.optimizer.lr = 3e-3
    train_set = provider.get_train_set()
    losses = []
    while trainer.iteration < 300:
        for batch in train_set:
            if trainer.iteration >= 300:
                break
            losses.append(float(trainer.train_step(batch)))
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20]), (
        np.mean(losses[:20]), np.mean(losses[-20:]))

    # frame-level macro F1 over the held-out validation frames
    from pb_sed_tpu.evaluation.instance_based import (
        get_best_fscore_thresholds)
    y_all, t_all = [], []
    for batch in provider.get_validate_set():
        y, seq_len = model.sound_event_detection(batch)  # (B, K, T)
        targets = np.asarray(batch['strong_targets'])     # (B, K, T)
        for i, n in enumerate(np.asarray(seq_len)):
            y_all.append(np.asarray(y)[i, :, :n].T)       # (n, K)
            t_all.append(targets[i, :, :n].T)
    y_all = np.concatenate(y_all)
    t_all = np.concatenate(t_all)
    _, best_f, _, _ = get_best_fscore_thresholds(t_all, y_all)
    assert float(np.mean(best_f)) > 0.7, best_f
