"""Model tests: config -> build -> init -> loss -> inference for both CRNNs
(mirrors the reference's doctest smoke checks, SURVEY.md §4, on tiny dims)."""
import jax
import numpy as np
import pytest

from pb_sed_tpu.models import strong_label, weak_label


def tiny_weak_config(num_events=10):
    return weak_label.CRNN.get_config({
        'feature_extractor': {
            'sample_rate': 16000,
            'stft_size': 512,
            'number_of_filters': 32,
        },
        'cnn': {
            'cnn_2d': {
                'out_channels': [8, 8, 8],
                'kernel_size': 3,
                'pool_size': [[2, 1], [2, 1], 1],
                'norm': 'batch',
                'norm_kwargs': {'eps': 1e-3},
                'pre_activation': True,
            },
            'cnn_1d': {
                'out_channels': [16, 16],
                'kernel_size': 3,
                'norm': 'batch',
                'pre_activation': True,
            },
        },
        'rnn_fwd': {
            'rnn': {'hidden_size': 16, 'num_layers': 2},
            'output_net': {
                'out_channels': [16, num_events], 'kernel_size': 1},
        },
    })


@pytest.fixture(scope='module')
def weak_model_and_batch():
    config = tiny_weak_config()
    model = weak_label.CRNN.from_config(config)
    rng = np.random.RandomState(3)
    batch = {
        'stft': np.abs(rng.randn(4, 15, 257, 2)).astype(np.float32),
        'seq_len': np.array([15, 14, 13, 12], dtype=np.int32),
        'weak_targets': np.zeros((4, 10), np.float32),
        'boundary_targets': np.zeros((4, 10, 15), np.float32),
    }
    batch['weak_targets'][0, 2] = 1.
    batch['weak_targets'][1] = 0.5  # unlabeled example
    batch['boundary_targets'][0, 2, 3:9] = 1.
    model.init_variables(batch, seed=0)
    return model, batch


def test_weak_config_mirrors_bwd(weak_model_and_batch):
    config = tiny_weak_config()
    assert config['rnn_bwd']['reverse'] is True
    assert config['rnn_bwd']['rnn']['hidden_size'] == 16
    assert config['rnn_fwd']['rnn']['input_size'] == 16
    assert config['cnn']['input_height'] == 32


def test_weak_forward_and_loss(weak_model_and_batch):
    model, batch = weak_model_and_batch
    rngs = {'augment': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    loss, aux = model.loss_fn(model.variables, batch, rngs, training=True)
    assert np.isfinite(float(loss))
    mutated, scalars, buffers, images = aux
    assert 'batch_stats' in mutated
    review = model.review_from_aux(loss, aux)
    # example 1 is fully soft -> excluded from buffers
    assert review['buffers']['y_weak'].shape[0] == 3
    summary = {'scalars': {k: [v] for k, v in review['scalars'].items()},
               'buffers': {k: [v] for k, v in review['buffers'].items()},
               'images': review['images']}
    summary = model.modify_summary(summary)
    assert 'macro_fscore_weak' in summary['scalars']


def test_weak_inference_methods(weak_model_and_batch):
    model, batch = weak_model_and_batch
    y, seq_len = model.tagging(batch)
    assert y.shape == (4, 10, 1)
    assert (y > 0).all() and (y < 1).all()
    assert (seq_len == 1).all()
    y, seq_len = model.boundaries_detection(batch)
    assert y.shape == (4, 10, 15)
    # padded frames masked to zero
    assert np.allclose(y[3, :, 12:], 0)
    y, seq_len = model.sound_event_detection(batch, window_length=5)
    assert y.shape == (4, 10, 15)
    assert (seq_len == batch['seq_len']).all()
    # per-class window lengths
    wl = np.full(10, 5)
    wl[:5] = 3
    y2, _ = model.sound_event_detection(batch, window_length=wl)
    assert y2.shape == (4, 10, 15)
    y3, _ = model.sound_event_detection(batch, window_length=5)
    np.testing.assert_allclose(y2[:, 5:], y3[:, 5:], atol=1e-6)
    # per-paramset window lengths (N, K)
    wl2 = np.stack([np.full(10, 3), np.full(10, 5)])
    y4, _ = model.sound_event_detection(batch, window_length=wl2)
    assert y4.shape == (4, 2, 10, 15)
    np.testing.assert_allclose(y4[:, 1], y3, atol=1e-6)


def test_weak_soft_label_masking(weak_model_and_batch):
    model, batch = weak_model_and_batch
    rngs = {'augment': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    # all-soft targets -> zero weight -> loss must be 0
    b2 = dict(batch)
    b2['weak_targets'] = np.full((4, 10), 0.5, np.float32)
    b2['boundary_targets'] = np.full((4, 10, 15), 0.5, np.float32)
    loss, _ = model.loss_fn(model.variables, b2, rngs, training=True)
    assert float(loss) == 0.


def test_checkpoint_roundtrip(tmp_path, weak_model_and_batch):
    model, batch = weak_model_and_batch
    path = tmp_path / 'ckpt.pkl'
    model.save_checkpoint(path, extra={'iteration': 7})
    flat = model.state_dict()
    some_key = sorted(flat)[0]
    payload = model.load_checkpoint(path)
    assert payload['iteration'] == 7
    np.testing.assert_allclose(model.state_dict()[some_key], flat[some_key])


def test_strong_model():
    config = strong_label.CRNN.get_config({
        'tag_conditioning': True,
        'feature_extractor': {
            'sample_rate': 16000, 'stft_size': 512,
            'number_of_filters': 32,
        },
        'cnn': {
            'cnn_2d': {'out_channels': [8, 8],
                       'pool_size': [[2, 1], 1], 'kernel_size': 3},
            'cnn_1d': {'out_channels': [16, 16], 'kernel_size': 3},
        },
        'rnn': {
            'rnn': {'hidden_size': 16},
            'output_net': {'out_channels': [16, 10], 'kernel_size': 1},
        },
    })
    assert config['rnn']['rnn']['bidirectional'] is True
    assert config['cnn']['conditional_dims'] == 10
    assert config['rnn']['rnn']['input_size'] == 26  # 16 + 10 tags
    model = strong_label.CRNN.from_config(config)
    rng = np.random.RandomState(0)
    batch = {
        'stft': np.abs(rng.randn(2, 9, 257, 2)).astype(np.float32),
        'seq_len': np.array([9, 7], dtype=np.int32),
        'weak_targets': np.zeros((2, 10), np.float32),
        'strong_targets': np.zeros((2, 10, 9), np.float32),
        'tag_condition': np.zeros((2, 10), np.float32),
    }
    batch['strong_targets'][0, 1, 2:5] = 1.
    batch['tag_condition'][0, 1] = 1.
    model.init_variables(batch, seed=0)
    rngs = {'augment': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    loss, aux = model.loss_fn(model.variables, batch, rngs, training=True)
    assert np.isfinite(float(loss)) and float(loss) > 0
    review = model.review_from_aux(loss, aux)
    assert review['buffers']['y_strong'].ndim == 2
    y, seq_len = model.tagging(batch)
    assert y.shape == (2, 10, 1)
    y, seq_len = model.sound_event_detection(batch)
    assert y.shape == (2, 10, 9)
    assert np.allclose(y[1, :, 7:], 0)
    # tag conditioning must influence the output
    b2 = {**batch, 'tag_condition': 1. - batch['tag_condition']}
    y2, _ = model.sound_event_detection(b2)
    assert np.abs(y2 - y).max() > 1e-6


def test_weak_model_with_delta_channels():
    """add_deltas/add_delta_deltas stack derivative channels that flow
    through the CNN2d tower (reference surface
    ``weak_label/crnn.py:324-326``)."""
    config = tiny_weak_config()
    config['feature_extractor']['add_deltas'] = True
    config['feature_extractor']['add_delta_deltas'] = True
    model = weak_label.CRNN.from_config(config)
    rng = np.random.RandomState(5)
    batch = {
        'stft': np.abs(rng.randn(2, 15, 257, 2)).astype(np.float32),
        'seq_len': np.array([15, 12], dtype=np.int32),
        'weak_targets': np.zeros((2, 10), np.float32),
    }
    model.init_variables(batch, seed=0)
    x, seq_len = model.module.apply(
        model.variables, batch, training=False,
        method=type(model.module).features)
    assert x.shape == (2, 15, 32, 3), x.shape  # base + delta + ddelta
    # deltas of a masked (padded) region stay zero
    assert float(np.abs(np.asarray(x[1, 12:])).max()) == 0.
    # time-constant features -> zero deltas EVERYWHERE inside the valid
    # range (regression: the zeroed padding used to leak a spurious
    # derivative spike into each clip's last frames)
    const_batch = dict(batch)
    const_batch['stft'] = np.broadcast_to(
        batch['stft'][:, :1], batch['stft'].shape).copy()
    xc, _ = model.module.apply(
        model.variables, const_batch, training=False,
        method=type(model.module).features)
    assert float(np.abs(np.asarray(xc[1, :12, :, 1:])).max()) < 1e-5
    y_fwd, y_bwd, seq_len_y, *_ = model.module.apply(
        model.variables, batch, training=False)
    assert y_fwd.shape[0] == 2 and np.isfinite(np.asarray(y_fwd)).all()


@pytest.mark.slow
def test_deep_net_config_trains():
    """The 'deep' width-2 residual architecture (the AudioSet
    pre-training network, reference ``training.py:158-185``) must build,
    run forward and take a finite gradient step — exercises the
    residual-index wiring at full depth."""
    import numpy as np
    from pb_sed_tpu.models.net_configs import fbcrnn_config
    from pb_sed_tpu.train.trainer import Trainer

    config = weak_label.CRNN.get_config(
        fbcrnn_config(net_config='deep', num_events=10))
    model = weak_label.CRNN.from_config(config)
    rng = np.random.RandomState(0)
    num_samples = 16000  # 1 s
    stft = model.module.feature_extractor.stft
    frames = int(stft.num_frames(num_samples))
    batch = {
        'audio_data': rng.randn(2, num_samples).astype(np.float32),
        'seq_len': np.array([frames, frames - 10], np.int32),
        'seq_len_samples': np.array([num_samples, num_samples - 3200],
                                    np.int32),
        'weak_targets': (rng.rand(2, 10) > .7).astype(np.float32),
        'boundary_targets': (rng.rand(2, 10, frames) > .9).astype(
            np.float32),
    }
    trainer = Trainer(model, storage_dir=None,
                      stop_trigger=(1, 'iteration'))
    trainer._ensure_ready(batch)
    n_params = model.num_parameters()
    assert n_params > 5_000_000, n_params  # width-2 deep net
    loss = float(trainer.train_step(batch))
    assert np.isfinite(loss), loss
