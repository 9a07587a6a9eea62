"""End-to-end experiment chain test: weak_label_crnn training ->
(auto-chained) tuning -> (auto-chained) inference/evaluation on the
synthetic database — the reference's L7 surface (SURVEY.md §3.5 step 1-3)
with tiny models and debug grids."""
import json
from pathlib import Path

import numpy as np
import pytest

from tests.util_synth import build_database


@pytest.mark.slow
def test_weak_label_chain(tmp_path):
    db, json_path = build_database(tmp_path / 'db', num_train=8,
                                   num_weak=6, num_validate=4)
    storage_root = tmp_path / 'exp'
    ts = '2026-01-01-00-00-00-00'
    training_dir = storage_root / 'training' / ts / ts

    from pb_sed_tpu.experiments.weak_label_crnn.training import ex
    config_updates = {
        'timestamp': ts,
        'group_name': ts,
        'storage_dir': str(training_dir),
        'debug': True,
        'batch_size': 4,
        'data_provider': {
            'json_path': str(json_path),
            'train_set': {
                'train_weak': 1, 'train_strong': 1,
                'train_synthetic20': 0, 'train_synthetic21': 0,
                'train_unlabel_in_domain': 0,
            },
            'cached_datasets': None,
            'min_audio_length': 0.2,
            'train_fetcher': {
                'batch_size': 4,
                'prefetch_workers': 0,
                'pad_to_multiple': 16,
                'min_label_diversity_in_batch': 0,
                'min_dataset_examples_in_batch': None,
            },
            'test_fetcher': {
                'batch_size': 4,
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
        'num_iterations': 6,
        'checkpoint_interval': 3,
        'summary_interval': 2,
        'lr_rampup_steps': 2,
        'lr_decay_steps': [],
        'trainer': {
            'model': {
                'feature_extractor': {
                    'stft_size': 512, 'stft_shift': 160,
                    'stft_window_length': 480,
                    'number_of_filters': 16,
                    'n_time_masks': 1, 'n_frequency_masks': 1,
                    'max_noise_scale': .1,
                },
                'cnn': {
                    'cnn_2d': {'out_channels': [4, 4],
                               'pool_size': [[2, 1], [2, 1]],
                               'kernel_size': 3},
                    'cnn_1d': {'out_channels': [8, 8], 'kernel_size': 3},
                },
                'rnn_fwd': {
                    'rnn': {'hidden_size': 8, 'num_layers': 1},
                    'output_net': {'out_channels': [8, 3],
                                   'kernel_size': 1},
                },
            },
        },
        'hyper_params_tuning_batch_size': 4,
    }
    # tuning/inference derive their own storage dirs from storage_root;
    # patch it for the nested experiments
    import pb_sed_tpu.experiments.weak_label_crnn.tuning as tuning_mod
    import pb_sed_tpu.experiments.weak_label_crnn.inference as inf_mod
    tuning_mod.storage_root = storage_root
    inf_mod.storage_root = storage_root

    result_dir = ex.run(config_updates=config_updates)

    # training artifacts
    assert (training_dir / '1' / 'config.json').exists()
    assert (training_dir / 'checkpoints'
            / 'ckpt_best_macro_fscore_weak.pkl').exists()
    assert (training_dir / 'summary.jsonl').exists()
    # label encoder persisted
    assert (training_dir / 'events.json').exists()

    # tuning artifacts (chained automatically)
    hp_dirs = list((storage_root / 'weak_label_crnn' / 'desed'
                    / 'hyper_params').glob('*'))
    assert hp_dirs, 'tuning did not run'
    hp_dir = hp_dirs[0]
    for name in ['tagging_hyper_params_f.json',
                 'boundaries_detection_hyper_params_f.json',
                 'sed_hyper_params_f.json',
                 'sed_hyper_params_psds1.json',
                 'sed_hyper_params_psds2.json']:
        assert (hp_dir / name).exists(), name
    hp = json.loads((hp_dir / 'sed_hyper_params_f.json').read_text())
    for event_class in ['beep', 'chirp', 'hum']:
        assert 'window_length' in hp[event_class]
        assert 'medfilt_length' in hp[event_class]
        assert 'threshold' in hp[event_class]
    # hyper_params symlinked into the model dir
    assert (training_dir / 'hyper_params' / hp_dir.name).exists()

    # inference/evaluation artifacts (chained from tuning)
    inf_dirs = list((storage_root / 'weak_label_crnn' / 'desed'
                     / 'inference').glob('*'))
    assert inf_dirs, 'inference did not run'
    results = [p for d in inf_dirs for p in d.glob('*_results_*.json')]
    assert results, 'no evaluation results written'
    sed_results = [p for p in results if p.name.startswith('sed_')]
    assert sed_results
    content = json.loads(sed_results[0].read_text())
    assert 'psds[0]' in content
    assert 'macro_average_f' in content


@pytest.mark.slow
def test_weak_inference_pseudo_labeling(tmp_path):
    """Pseudo-labeling round: inference rewrites the database json."""
    db, json_path = build_database(tmp_path / 'db', num_train=6,
                                   num_weak=4, num_validate=3)
    storage_root = tmp_path / 'exp'
    ts = '2026-01-01-11-11-11-00'
    training_dir = storage_root / 'training' / ts / ts

    from pb_sed_tpu.experiments.weak_label_crnn.training import (
        ex as train_ex)
    import pb_sed_tpu.experiments.weak_label_crnn.tuning as tuning_mod
    import pb_sed_tpu.experiments.weak_label_crnn.inference as inf_mod
    tuning_mod.storage_root = storage_root
    inf_mod.storage_root = storage_root

    common_provider = {
        'json_path': str(json_path),
        'train_set': {
            'train_weak': 1, 'train_strong': 1,
            'train_synthetic20': 0, 'train_synthetic21': 0,
            'train_unlabel_in_domain': 0,
        },
        'cached_datasets': None,
        'min_audio_length': 0.2,
        'train_fetcher': {
            'batch_size': 4, 'prefetch_workers': 0,
            'pad_to_multiple': 16,
            'min_label_diversity_in_batch': 0,
            'min_dataset_examples_in_batch': None,
        },
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0,
                         'pad_to_multiple': 16},
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'anchor_sampling_fn': None,
            'anchor_shift_sampling_fn': None,
        },
        'mix_interval': None,
    }
    train_ex.run(config_updates={
        'timestamp': ts, 'group_name': ts,
        'storage_dir': str(training_dir),
        'debug': True, 'batch_size': 4,
        'data_provider': dict(common_provider),
        'num_iterations': 4, 'checkpoint_interval': 2,
        'summary_interval': 2, 'lr_rampup_steps': None,
        'lr_decay_steps': [],
        'validation_set_name': None,  # do not chain tuning
        'trainer': {
            'model': {
                'feature_extractor': {
                    'stft_size': 512, 'stft_shift': 160,
                    'stft_window_length': 480, 'number_of_filters': 16},
                'cnn': {
                    'cnn_2d': {'out_channels': [4, 4],
                               'pool_size': [[2, 1], [2, 1]],
                               'kernel_size': 3},
                    'cnn_1d': {'out_channels': [8, 8],
                               'kernel_size': 3}},
                'rnn_fwd': {
                    'rnn': {'hidden_size': 8, 'num_layers': 1},
                    'output_net': {'out_channels': [8, 3],
                                   'kernel_size': 1}}},
        },
    })
    # run tuning manually (no chain), then inference with pseudo labeling
    hp_dir = tuning_mod.ex.run(config_updates={
        'debug': True,
        'crnn_dirs': [str(training_dir)],
        'storage_dir': str(storage_root / 'hp'),
        'eval_set_name': None,  # do not chain evaluation
    })
    out_dir = inf_mod.ex.run(config_updates={
        'debug': True,
        'hyper_params_dir': str(hp_dir),
        'storage_dir': str(storage_root / 'inf'),
        'dataset_name': ['train_unlabel_in_domain'],
        'weak_pseudo_labeling': [True],
        'strong_pseudo_labeling': [True],
        'pseudo_labeled_dataset_name': ['train_unlabel_in_domain'],
    })
    out_json = Path(out_dir) / Path(json_path).name
    assert out_json.exists(), 'pseudo-labeled database json not written'
    new_db = json.loads(out_json.read_text())
    ds = new_db['datasets']['train_unlabel_in_domain']
    labeled = [ex_ for ex_ in ds.values() if ex_.get('events')]
    # pseudo labels attached with onset/offset times
    for ex_ in labeled:
        assert 'events_start_times' in ex_
        assert len(ex_['label_types']) == len(ex_['events'])


@pytest.mark.slow
def test_self_training_loop_closure(tmp_path):
    """Drive the DCASE self-training loop around a FULL cycle (SURVEY
    §3.5 steps 3-6; reference README:192-200,
    ``weak_label_crnn/training.py:97-99``): round-1 weak training ->
    tuning -> inference writes a pseudo-labeled database json -> ROUND-2
    weak training consumes the REWRITTEN json with
    ``train_unlabel_in_domain=2`` and the x1.5 iteration rule -> strong
    training on the pseudo labels. The round-2/strong models must train
    to finite, non-degenerate losses from the pseudo-labeled data."""
    db, json_path = build_database(tmp_path / 'db', num_train=6,
                                   num_weak=4, num_validate=3)
    storage_root = tmp_path / 'exp'
    ts1 = '2026-01-03-00-00-00-00'
    round1_dir = storage_root / 'r1' / ts1 / ts1

    from pb_sed_tpu.experiments.weak_label_crnn.training import (
        ex as train_ex)
    import pb_sed_tpu.experiments.weak_label_crnn.tuning as tuning_mod
    import pb_sed_tpu.experiments.weak_label_crnn.inference as inf_mod
    import pb_sed_tpu.experiments.strong_label_crnn.training as s_train
    tuning_mod.storage_root = storage_root
    inf_mod.storage_root = storage_root
    s_train.storage_root = storage_root

    tiny_model = {
        'feature_extractor': {
            'stft_size': 512, 'stft_shift': 160,
            'stft_window_length': 480, 'number_of_filters': 16},
        'cnn': {
            'cnn_2d': {'out_channels': [4, 4],
                       'pool_size': [[2, 1], [2, 1]], 'kernel_size': 3},
            'cnn_1d': {'out_channels': [8, 8], 'kernel_size': 3}},
        'rnn_fwd': {'rnn': {'hidden_size': 8, 'num_layers': 1},
                    'output_net': {'out_channels': [8, 3],
                                   'kernel_size': 1}},
    }

    def provider_updates(json_file, train_set):
        return {
            'json_path': str(json_file),
            'train_set': train_set,
            'cached_datasets': None,
            'min_audio_length': 0.2,
            'train_fetcher': {
                'batch_size': 4, 'prefetch_workers': 0,
                'pad_to_multiple': 16,
                'min_label_diversity_in_batch': 0,
                'min_dataset_examples_in_batch': None,
            },
            'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0,
                             'pad_to_multiple': 16},
            'train_transform': {
                'stft': {'shift': 160, 'window_length': 480, 'size': 512},
                'anchor_sampling_fn': None,
                'anchor_shift_sampling_fn': None,
            },
            'mix_interval': None,
        }

    base_train_set = {
        'train_weak': 1, 'train_strong': 1,
        'train_synthetic20': 0, 'train_synthetic21': 0,
        'train_unlabel_in_domain': 0,
    }
    # 1. round-1 weak training (no chain)
    train_ex.run(config_updates={
        'timestamp': ts1, 'group_name': ts1,
        'storage_dir': str(round1_dir), 'debug': True, 'batch_size': 4,
        'data_provider': provider_updates(json_path, base_train_set),
        'num_iterations': 4, 'checkpoint_interval': 2,
        'summary_interval': 2, 'lr_rampup_steps': None,
        'lr_decay_steps': [], 'validation_set_name': None,
        'trainer': {'model': dict(tiny_model)},
    })
    # 2. tuning
    hp_dir = tuning_mod.ex.run(config_updates={
        'debug': True, 'crnn_dirs': [str(round1_dir)],
        'storage_dir': str(storage_root / 'hp'),
        'eval_set_name': None,
    })
    # 3. inference pseudo-labels the in-domain unlabeled set and writes
    # the rewritten database json
    out_dir = inf_mod.ex.run(config_updates={
        'debug': True, 'hyper_params_dir': str(hp_dir),
        'storage_dir': str(storage_root / 'inf'),
        'dataset_name': ['train_unlabel_in_domain'],
        'weak_pseudo_labeling': [True],
        'strong_pseudo_labeling': [True],
        'pseudo_labeled_dataset_name': ['train_unlabel_in_domain'],
    })
    pseudo_json = Path(out_dir) / Path(json_path).name
    assert pseudo_json.exists()
    pseudo_db = json.loads(pseudo_json.read_text())
    pseudo_ds = pseudo_db['datasets']['train_unlabel_in_domain']
    assert any(ex_.get('events') for ex_ in pseudo_ds.values()), \
        'no pseudo labels were attached'

    # 4. ROUND-2 weak training FROM the rewritten json: the pseudo-
    # labeled in-domain data joins with repeat factor 2 and iterations
    # scale x1.5 (reference training.py:97-99)
    ts2 = '2026-01-03-11-00-00-00'
    round2_dir = storage_root / 'r2' / ts2 / ts2
    round2_set = dict(base_train_set, train_unlabel_in_domain=2)
    train_ex.run(config_updates={
        'timestamp': ts2, 'group_name': ts2,
        'storage_dir': str(round2_dir), 'debug': True, 'batch_size': 4,
        'data_provider': provider_updates(pseudo_json, round2_set),
        'num_iterations': 6,  # 4 x 1.5
        'checkpoint_interval': 3, 'summary_interval': 2,
        'lr_rampup_steps': None, 'lr_decay_steps': [],
        'validation_set_name': None,
        'trainer': {'model': dict(tiny_model)},
    })
    assert (round2_dir / 'checkpoints' / 'ckpt_latest.pkl').exists()
    rows = [json.loads(line) for line in
            (round2_dir / 'summary.jsonl').read_text().splitlines()]
    train_rows = [r for r in rows if r['prefix'] == 'training']
    assert train_rows and train_rows[-1]['iteration'] == 6
    losses = [r['loss'] for r in train_rows if 'loss' in r]
    assert losses and np.isfinite(losses).all(), losses

    # the round-2 provider REALLY consumed pseudo-labeled clips: its
    # persisted config points at the rewritten json with repeat 2
    cfg = json.loads((round2_dir / '1' / 'config.json').read_text())
    assert cfg['data_provider']['json_path'] == str(pseudo_json)
    assert cfg['data_provider']['train_set'][
        'train_unlabel_in_domain'] == 2

    # 5-6. strong training on the pseudo-labeled json (SURVEY §3.5
    # step 5: the BiCRNN consumes the boundary/strong pseudo labels)
    ts3 = '2026-01-03-22-00-00-00'
    strong_dir = storage_root / 's2' / ts3 / ts3
    strong_provider = provider_updates(pseudo_json, round2_set)
    strong_provider['train_transform'] = {
        **strong_provider['train_transform'],
        'provide_strong_targets': True,
        'provide_boundary_targets': False,
    }
    s_train.ex.run(config_updates={
        'timestamp': ts3, 'group_name': ts3,
        'storage_dir': str(strong_dir), 'debug': True, 'batch_size': 4,
        'data_provider': strong_provider,
        'num_iterations': 4, 'checkpoint_interval': 2,
        'summary_interval': 2, 'lr_rampup_steps': None,
        'lr_decay_steps': [], 'validation_set_name': None,
        'trainer': {'model': {
            'feature_extractor': dict(tiny_model['feature_extractor']),
            'cnn': dict(tiny_model['cnn']),
            'rnn': {'rnn': {'hidden_size': 8, 'num_layers': 1,
                            'bidirectional': True},
                    'output_net': {'out_channels': [8, 3],
                                   'kernel_size': 1}}}},
    })
    s_rows = [json.loads(line) for line in
              (strong_dir / 'summary.jsonl').read_text().splitlines()]
    s_losses = [r['loss'] for r in s_rows
                if r['prefix'] == 'training' and 'loss' in r]
    assert s_losses and np.isfinite(s_losses).all(), s_losses


@pytest.mark.slow
def test_strong_label_chain(tmp_path):
    """Weak tuning -> strong training -> strong tuning -> strong inference
    with pseudo-label TSV export (reference SURVEY.md §3.5 steps 5-6)."""
    db, json_path = build_database(tmp_path / 'db', num_train=8,
                                   num_weak=6, num_validate=4)
    storage_root = tmp_path / 'exp'
    ts_w = '2026-01-02-00-00-00-00'
    weak_dir = storage_root / 'w' / ts_w / ts_w

    import pb_sed_tpu.experiments.weak_label_crnn.tuning as w_tuning
    import pb_sed_tpu.experiments.weak_label_crnn.inference as w_inf
    import pb_sed_tpu.experiments.strong_label_crnn.training as s_train
    import pb_sed_tpu.experiments.strong_label_crnn.tuning as s_tuning
    import pb_sed_tpu.experiments.strong_label_crnn.inference as s_inf
    from pb_sed_tpu.experiments.weak_label_crnn.training import (
        ex as w_train_ex)
    for mod in (w_tuning, w_inf, s_train, s_tuning, s_inf):
        mod.storage_root = storage_root

    provider_updates = {
        'json_path': str(json_path),
        'train_set': {
            'train_weak': 1, 'train_strong': 1,
            'train_synthetic20': 0, 'train_synthetic21': 0,
            'train_unlabel_in_domain': 0,
        },
        'cached_datasets': None,
        'min_audio_length': 0.2,
        'train_fetcher': {
            'batch_size': 4, 'prefetch_workers': 0, 'pad_to_multiple': 16,
            'min_label_diversity_in_batch': 0,
            'min_dataset_examples_in_batch': None,
        },
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0,
                         'pad_to_multiple': 16},
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'anchor_sampling_fn': None, 'anchor_shift_sampling_fn': None,
        },
        'mix_interval': None,
    }
    tiny_fe = {'stft_size': 512, 'stft_shift': 160,
               'stft_window_length': 480, 'number_of_filters': 16}
    tiny_cnn = {
        'cnn_2d': {'out_channels': [4, 4],
                   'pool_size': [[2, 1], [2, 1]], 'kernel_size': 3},
        'cnn_1d': {'out_channels': [8, 8], 'kernel_size': 3}}

    # 1. weak training (no chain)
    w_train_ex.run(config_updates={
        'timestamp': ts_w, 'group_name': ts_w,
        'storage_dir': str(weak_dir), 'debug': True, 'batch_size': 4,
        'data_provider': dict(provider_updates),
        'num_iterations': 4, 'checkpoint_interval': 2,
        'summary_interval': 2, 'lr_rampup_steps': None,
        'lr_decay_steps': [], 'validation_set_name': None,
        'trainer': {'model': {
            'feature_extractor': dict(tiny_fe), 'cnn': dict(tiny_cnn),
            'rnn_fwd': {'rnn': {'hidden_size': 8, 'num_layers': 1},
                        'output_net': {'out_channels': [8, 3],
                                       'kernel_size': 1}}}},
    })
    # 2. weak tuning (no eval chain)
    weak_hp_dir = w_tuning.ex.run(config_updates={
        'debug': True, 'crnn_dirs': [str(weak_dir)],
        'storage_dir': str(storage_root / 'w_hp'),
        'eval_set_name': None,
    })
    # 3. strong training with tag conditioning (no chain)
    ts_s = '2026-01-02-11-00-00-00'
    strong_dir = storage_root / 's' / ts_s / ts_s
    strong_provider = dict(provider_updates)
    strong_provider['train_transform'] = {
        **provider_updates['train_transform'],
        'provide_strong_targets': True,
        'provide_boundary_targets': False,
    }
    s_train.ex.run(config_updates={
        'timestamp': ts_s, 'group_name': ts_s,
        'storage_dir': str(strong_dir), 'debug': True, 'batch_size': 4,
        'data_provider': strong_provider,
        'num_iterations': 4, 'checkpoint_interval': 2,
        'summary_interval': 2, 'lr_rampup_steps': None,
        'lr_decay_steps': [], 'validation_set_name': None,
        'tag_conditioning': True,
        'trainer': {'model': {
            'feature_extractor': dict(tiny_fe), 'cnn': dict(tiny_cnn),
            'rnn': {'rnn': {'hidden_size': 8, 'num_layers': 1,
                            'bidirectional': True},
                    'output_net': {'out_channels': [8, 3],
                                   'kernel_size': 1}}}},
    })
    assert (strong_dir / 'checkpoints'
            / 'ckpt_best_macro_fscore_strong.pkl').exists() or \
        (strong_dir / 'checkpoints' / 'ckpt_latest.pkl').exists()
    # validation was disabled -> best ckpt may be missing; provide it
    import shutil
    best = strong_dir / 'checkpoints' / 'ckpt_best_macro_fscore_strong.pkl'
    if not best.exists():
        shutil.copyfile(
            strong_dir / 'checkpoints' / 'ckpt_latest.pkl', best)
    wbest = weak_dir / 'checkpoints' / 'ckpt_best_macro_fscore_weak.pkl'
    if not wbest.exists():
        shutil.copyfile(
            weak_dir / 'checkpoints' / 'ckpt_latest.pkl', wbest)

    # 4. strong tuning (no eval chain)
    strong_hp_dir = s_tuning.ex.run(config_updates={
        'debug': True,
        'weak_label_crnn_hyper_params_dir': str(weak_hp_dir),
        'strong_label_crnn_dirs': [str(strong_dir)],
        'storage_dir': str(storage_root / 's_hp'),
        'eval_set_name': None,
    })
    import json as json_mod
    hp = json_mod.loads(
        (Path(strong_hp_dir) / 'sed_hyper_params_f.json').read_text())
    assert 'medfilt_length' in hp['beep']
    # 5. strong inference with pseudo labeling + TSV export
    out_dir = s_inf.ex.run(config_updates={
        'debug': True,
        'strong_label_crnn_hyper_params_dir': str(strong_hp_dir),
        'storage_dir': str(storage_root / 's_inf'),
        'dataset_name': ['train_weak'],
        'strong_pseudo_labeling': [True],
        'pseudo_labeled_dataset_name': ['train_weak'],
    })
    out_dir = Path(out_dir)
    tsv = out_dir / 'train_weak_pseudo_labeled.tsv'
    assert tsv.exists(), 'pseudo-label TSV not exported'
    lines = tsv.read_text().strip().split('\n')
    assert lines[0] == 'filename\tonset\toffset\tevent_label'
    assert (out_dir / Path(json_path).name).exists()
