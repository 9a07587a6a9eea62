"""Data backbone tests: lazy datasets, audio IO, transform targets,
mixing, bucketing/collate, end-to-end DataProvider."""
import numpy as np
import pytest

from pb_sed_tpu.data import lazy
from pb_sed_tpu.data.audio import AudioReader, read_wav, resample
from pb_sed_tpu.data.encoder import MultiHotAlignmentEncoder
from pb_sed_tpu.data.fetcher import Collate, DataFetcher
from pb_sed_tpu.data.mix import MixtureDataset, SuperposeEvents
from pb_sed_tpu.data.provider import DataProvider
from pb_sed_tpu.data.transform import Transform, add_label_types
from pb_sed_tpu.ops.stft import STFT

from tests.util_synth import EVENT_CLASSES, SR, build_database, write_wav


# ----------------------------------------------------------------------
# lazy datasets
# ----------------------------------------------------------------------
def test_lazy_basics():
    ds = lazy.from_dict({'a': {'x': 1}, 'b': {'x': 2}, 'c': {'x': 3}},
                        name='train')
    assert len(ds) == 3
    assert ds['b'] == {'x': 2, 'example_id': 'b', 'dataset': 'train'}
    mapped = ds.map(lambda ex: {**ex, 'x': ex['x'] * 10})
    assert mapped[0]['x'] == 10
    filtered = mapped.filter(lambda ex: ex['x'] > 10, lazy=False)
    assert len(filtered) == 2
    tiled = filtered.tile(3)
    assert len(tiled) == 6
    cached = tiled.cache(lazy=False)
    assert cached[5]['x'] == 30
    assert list(lazy.from_list([1, 2]).batch(2))[0] == [1, 2]


def test_intersperse_proportional():
    a = lazy.from_list(['a'] * 6)
    b = lazy.from_list(['b'] * 2)
    out = list(lazy.intersperse(a, b))
    assert len(out) == 8
    assert out.count('b') == 2
    # proportional: b appears roughly every 4th element
    assert out.index('b') >= 2


def test_shuffle_and_prefetch():
    ds = lazy.from_list(list(range(50)))
    sh = ds.shuffle(reshuffle=True, rng=np.random.RandomState(0))
    first = list(sh)
    second = list(sh)
    assert sorted(first) == list(range(50))
    assert first != second  # reshuffled
    pre = ds.prefetch(2, 4)
    assert sorted(pre) == list(range(50))
    local = ds.shuffle(buffer_size=8, rng=np.random.RandomState(0))
    assert sorted(local) == list(range(50))


def test_parallel_map_matches_sequential():
    """Ordered thread-pool map (host-pipeline worker scaling): values
    and ORDER are bit-identical to the sequential map, exceptions
    propagate, and an early consumer exit doesn't hang the pool."""
    import time

    def slow_square(x):
        # stagger completion so out-of-order completions are real
        time.sleep(0.002 * (x % 5))
        return x * x

    ds = lazy.from_list(list(range(40)))
    seq = list(ds.map(slow_square))
    par = ds.map(slow_square, num_workers=4)
    assert list(par) == seq
    assert list(par) == seq  # re-iterable
    assert len(par) == 40 and par[3] == 9  # indexing stays lazy
    # order preserved under downstream prefetch (the production stack)
    assert list(par.prefetch(2, 4)) == seq

    def boom(x):
        if x == 7:
            raise ValueError('boom')
        return x

    with pytest.raises(ValueError, match='boom'):
        list(ds.map(boom, num_workers=3))
    # early exit: taking a few items then dropping the iterator must
    # not deadlock the puller (bounded queue backpressure)
    it = iter(ds.map(slow_square, num_workers=3))
    got = [next(it) for _ in range(5)]
    assert got == seq[:5]
    del it


def test_provider_parallel_decode_is_bit_identical(tmp_path):
    """decode_workers parallelizes ONLY the rng-free decode map: the
    assembled batch stream must match the sequential provider bit for
    bit (multi-host identical-pipeline contract, fetcher.py)."""
    db, json_path = build_database(tmp_path)
    common = {
        'json_path': str(json_path),
        'train_set': {'train_strong': 1, 'train_weak': 1},
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'epoch_shuffle_seed': 7,
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
        },
        'train_fetcher': {'batch_size': 4, 'pad_to_multiple': 16,
                          'prefetch_workers': 0},
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0},
        'mix_interval': 2.,
    }

    def batches(decode_workers):
        provider = DataProvider.from_config(DataProvider.get_config(
            dict(common, decode_workers=decode_workers)))
        provider.train_transform.label_encoder.initialize_labels(
            dataset=provider.db.get_dataset(
                ['train_strong', 'train_weak']))
        provider.test_transform.label_encoder.initialize_labels()
        return list(provider.get_train_set())

    seq, par = batches(0), batches(4)
    assert len(seq) == len(par)
    for bs, bp in zip(seq, par):
        assert bs['example_id'] == bp['example_id']
        np.testing.assert_array_equal(bs['audio_data'], bp['audio_data'])
        np.testing.assert_array_equal(bs['weak_targets'],
                                      bp['weak_targets'])


# ----------------------------------------------------------------------
# audio
# ----------------------------------------------------------------------
def test_audio_reader(tmp_path):
    audio = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / SR)
    write_wav(tmp_path / 'x.wav', audio)
    data, sr = read_wav(tmp_path / 'x.wav')
    assert sr == SR and data.shape == (1, 8000)
    np.testing.assert_allclose(data[0], audio, atol=1e-3)
    reader = AudioReader(target_sample_rate=SR)
    ex = reader({
        'audio_path': str(tmp_path / 'x.wav'),
        'events': ['beep'],
        'events_start_times': [0.1],
        'events_stop_times': [0.3],
    })
    assert ex['audio_data'].shape == (1, 8000)
    assert np.abs(ex['audio_data']).max() == pytest.approx(1., abs=1e-4)
    assert ex['events_start_samples'] == [1600]
    assert ex['events_stop_samples'] == [4800]
    # resampling halves the length
    assert resample(data, SR, SR // 2).shape[-1] == 4000


# ----------------------------------------------------------------------
# transform
# ----------------------------------------------------------------------
def make_encoder():
    enc = MultiHotAlignmentEncoder(label_key='events')
    enc.initialize_labels(labels=EVENT_CLASSES)
    return enc


def test_add_label_types():
    ex = add_label_types({'audio_data': np.zeros((1, 100))})
    assert ex['unlabeled'] is True and ex['events'] == []
    ex = add_label_types(
        {'audio_data': np.zeros((1, 100)), 'events': ['beep']})
    assert ex['label_types'] == ['weak']
    assert ex['events_stop_samples'] == [100]


def test_transform_targets():
    stft = STFT(shift=80, window_length=240, size=256)
    enc = make_encoder()
    tf = Transform(stft=stft, label_encoder=enc,
                   provide_boundary_targets=True,
                   provide_strong_targets=True)
    audio = np.zeros((1, 1600), np.float32)
    ex = tf({
        'example_id': 'x', 'dataset': 'd', 'audio_data': audio,
        'events': ['beep', 'chirp', 'beep'],
        'events_start_samples': [160, 0, 800],
        'events_stop_samples': [480, 1600, 1200],
        'label_types': ['strong', 'weak', 'strong'],
    })
    t = stft.num_frames(1600)
    assert ex['seq_len'] == t
    k = len(EVENT_CLASSES)
    assert ex['weak_targets'].shape == (k,)
    assert ex['weak_targets'][0] == 1. and ex['weak_targets'][2] == 0.
    st = ex['strong_targets']
    assert st.shape == (k, t)
    # beep strong spans: frames [2, 6) and [10, 15)
    assert st[0, 3] == 1. and st[0, 12] == 1.
    # between the two beep events: no beep occurrence covers frame 8,
    # so it is a certain negative (overall alignment fill semantics)
    assert st[0, 8] == 0.
    # chirp is weak -> 0.5 everywhere (present but not localized)
    assert (ex['strong_targets'][1] == 0.5).all()
    # hum absent -> certain 0
    assert (ex['strong_targets'][2] == 0.).all()
    bt = ex['boundary_targets']
    # boundary = union span of beep strong events: frames [2, 15)
    assert bt[0, 2] == 1. and bt[0, 8] == 1. and bt[0, 14] == 1.
    assert bt[0, 0] == 0. or bt[0, 0] == 0.5  # outside span


def test_transform_unlabeled():
    stft = STFT(shift=80, window_length=240, size=256)
    tf = Transform(stft=stft, label_encoder=make_encoder(),
                   provide_boundary_targets=True)
    ex = tf({'example_id': 'x', 'dataset': 'd',
             'audio_data': np.zeros((1, 800), np.float32)})
    assert (ex['weak_targets'] == 0.5).all()
    assert (ex['boundary_targets'] == 0.5).all()


def test_transform_warp_params():
    from pb_sed_tpu.utils.random import Uniform
    stft = STFT(shift=80, window_length=240, size=256)
    rng = np.random.RandomState(0)
    tf = Transform(stft=stft, label_encoder=make_encoder(),
                   anchor_sampling_fn=Uniform(0.4, 0.6, rng=rng),
                   anchor_shift_sampling_fn=Uniform(-0.1, 0.1, rng=rng))
    ex = tf({'example_id': 'x', 'dataset': 'd',
             'audio_data': np.zeros((1, 800), np.float32),
             'events': ['beep']})
    assert 'warp_anchor_out' in ex and 'warp_anchor_in' in ex
    assert 0 < ex['warp_anchor_out'] < 800


# ----------------------------------------------------------------------
# mixing
# ----------------------------------------------------------------------
def test_superpose_events():
    rng = np.random.RandomState(0)
    mix_fn = SuperposeEvents(min_overlap=1., fade_length=0, rng=rng)
    e1 = {'example_id': 'a', 'dataset': 'd1',
          'audio_data': np.ones((1, 100), np.float32),
          'events': ['beep'], 'events_start_samples': [10],
          'events_stop_samples': [60], 'label_types': ['strong']}
    e2 = {'example_id': 'b', 'dataset': 'd2',
          'audio_data': -np.ones((1, 80), np.float32),
          'events': ['hum'], 'events_start_samples': [0],
          'events_stop_samples': [80], 'label_types': ['weak']}
    mix = mix_fn([e1, e2])
    assert mix['example_id'] == 'a+b'
    assert mix['audio_data'].shape[-1] == 100  # full overlap
    assert set(mix['events']) == {'beep', 'hum'}
    assert mix['label_types'] == ['strong', 'weak']
    # offsets shifted consistently
    for s in mix['events_start_samples']:
        assert 0 <= s < 100


def test_mixture_dataset_interval():
    ds = lazy.from_list([{'i': i} for i in range(9)])
    mixed = MixtureDataset(ds, ds, 1.5, lambda comps: {
        'mixed': [c['i'] for c in comps]})
    out = list(mixed)
    # interval 1.5 -> indices 0, 2, 3, 5, 6, 8 mixed (2 of 3)
    n_mixed = sum('mixed' in ex for ex in out)
    assert n_mixed == 6


# ----------------------------------------------------------------------
# collate / fetcher
# ----------------------------------------------------------------------
def test_collate_pads_to_palette():
    stft = STFT(shift=80, window_length=240, size=256)
    examples = []
    for n in [400, 550, 700]:
        examples.append({
            'example_id': f'e{n}', 'dataset': 'd',
            'audio_data': np.ones(n, np.float32),
            'seq_len': stft.num_frames(n),
            'seq_len_samples': n,
            'weak_targets': np.zeros(3, np.float32),
            'strong_targets': np.zeros((3, stft.num_frames(n)), np.float32),
        })
        assert examples[-1]['seq_len'] > 0
    collate = Collate(pad_frames_to=16,
                      frames_to_samples=stft.num_samples_for_frames)
    batch = collate(examples)
    assert batch['audio_data'].shape == (
        3, stft.num_samples_for_frames(16))
    assert batch['strong_targets'].shape == (3, 3, 16)
    assert batch['weak_targets'].shape == (3, 3)
    assert batch['example_id'] == ['e400', 'e550', 'e700']
    assert batch['seq_len'].dtype == np.int32


def test_collate_single_copy_fill_values():
    """The preallocated-fill collate (round 3, replaces pad-then-stack)
    must zero-pad short arrays, truncate long ones, and preserve
    values/dtypes exactly."""
    from pb_sed_tpu.data.fetcher import _fill_padded
    a = np.arange(5, dtype=np.float64)
    b = np.arange(9, dtype=np.float64)
    out = _fill_padded([a, b], 7)
    assert out.shape == (2, 7) and out.dtype == np.float64
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, 0, 0])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4, 5, 6])
    # 2-D (K, T) rows + dtype override
    m = np.ones((3, 4), np.float32)
    out2 = _fill_padded([m, 2 * m], 6, np.float32)
    assert out2.shape == (2, 3, 6) and out2.dtype == np.float32
    assert out2[1, :, :4].max() == 2. and out2[:, :, 4:].max() == 0.


def test_collate_int16_audio_transport():
    """audio_dtype='int16' halves the shipped bytes; the device-side
    dequantization (feature extractor) must recover the waveform within
    the 1/AUDIO_INT16_SCALE quantization step."""
    from pb_sed_tpu.data.fetcher import Collate
    from pb_sed_tpu.ops.features import AUDIO_INT16_SCALE
    rng = np.random.RandomState(0)
    examples = []
    for n in (400, 700):
        examples.append({
            'example_id': f'e{n}', 'dataset': 'd',
            'audio_data': rng.uniform(-1.5, 1.5, n).astype(np.float32),
            'seq_len': 4, 'seq_len_samples': n,
            'weak_targets': np.zeros(3, np.float32),
        })
    batch = Collate(pad_samples_to=704, audio_dtype='int16')(examples)
    assert batch['audio_data'].dtype == np.int16
    restored = batch['audio_data'].astype(np.float32) / AUDIO_INT16_SCALE
    np.testing.assert_allclose(
        restored[1, :700], examples[1]['audio_data'],
        atol=1. / AUDIO_INT16_SCALE)
    # model forward parity vs float32 transport (quantization-level)
    import jax.numpy as jnp
    from tests.test_trainer import make_model
    model = make_model()
    n_samples = 3200
    frames = STFT(shift=160, window_length=480,
                  size=512).num_frames(n_samples)
    base = {
        'audio_data': rng.randn(2, n_samples).astype(np.float32) * .5,
        'seq_len': np.full(2, frames, np.int32),
        'seq_len_samples': np.full(2, n_samples, np.int32),
        'weak_targets': np.zeros((2, 3), np.float32),
    }
    model.init_variables(base, seed=0)
    y_f32, _ = model.tagging(base)
    q = np.clip(base['audio_data'] * AUDIO_INT16_SCALE,
                -32768, 32767).astype(np.int16)
    y_i16, _ = model.tagging({**base, 'audio_data': q})
    np.testing.assert_allclose(
        np.asarray(y_i16), np.asarray(y_f32), atol=5e-3)


def test_fetcher_buckets_fixed_shapes():
    stft = STFT(shift=80, window_length=240, size=256)
    rng = np.random.RandomState(0)
    examples = []
    for i in range(40):
        n = rng.randint(300, 2000)
        examples.append({
            'example_id': f'e{i}', 'dataset': 'd',
            'audio_data': np.zeros(n, np.float32),
            'seq_len': int(stft.num_frames(n)),
            'seq_len_samples': n,
            'weak_targets': np.zeros(3, np.float32),
        })
    ds = lazy.from_list(examples)
    fetcher = DataFetcher(
        prefetch_workers=0, batch_size=4, pad_to_multiple=8,
        max_padding_rate=None,  # pure palette; rate-hardness tested below
        drop_incomplete=False,
        stft={'shift': 80, 'window_length': 240, 'size': 256})
    batches = list(fetcher(ds))
    seen = sum(len(b['example_id']) for b in batches)
    assert seen == 40
    shapes = {b['audio_data'].shape[-1] for b in batches}
    # palette: few distinct shapes, all matching frames_to_samples grid
    from pb_sed_tpu.data.bucketing import palette_length
    for b in batches:
        t = b['audio_data'].shape[-1]
        frames = b['seq_len'].max()
        t_pad = palette_length(int(frames), 8, fetcher.max_padding_rate)
        assert t == stft.num_samples_for_frames(t_pad)
    assert len(shapes) <= 6


def test_palette_max_padding_rate_is_hard():
    """No example may exceed max_padding_rate (the reference treats it
    as a hard constraint, ``pb_sed/data_preparation/fetcher.py:38-51``);
    short sequences get finer palette rungs instead of a warning.
    Regression: seq_len=50 at multiple 8 used to pad to 56 (rate 0.107
    > 0.1) with only a RuntimeWarning."""
    from pb_sed_tpu.data.bucketing import palette_length
    for p in (0.05, 0.1, 0.2):
        for m in (8, 64):
            for seq_len in list(range(1, 200)) + [450, 500, 1000, 4999]:
                rung = palette_length(seq_len, m, p)
                assert rung >= seq_len
                assert rung % 1 == 0
                assert (rung - seq_len) / rung <= p, (seq_len, m, p, rung)
    # long sequences still land on the coarse multiple (program count)
    assert palette_length(5000, 64, 0.05) == 5056
    assert palette_length(50, 8, 0.1) in (50, 52)
    # rate respected at the regression length
    rung = palette_length(50, 8, 0.1)
    assert (rung - 50) / rung <= 0.1
    # bucketer end-to-end: seq_len=50 examples batch at a legal rung
    examples = [{
        'example_id': f'e{i}', 'dataset': 'd',
        'audio_data': np.zeros(50 * 80, np.float32),
        'seq_len': 50, 'seq_len_samples': 50 * 80,
        'weak_targets': np.zeros(3, np.float32),
    } for i in range(4)]
    fetcher = DataFetcher(
        prefetch_workers=0, batch_size=4, pad_to_multiple=8,
        max_padding_rate=0.1,
        stft={'shift': 80, 'window_length': 240, 'size': 256})
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        (batch,) = list(fetcher(lazy.from_list(examples)))
    t = batch['weak_targets'].shape  # (B, K); strong pads to rung
    assert t == (4, 3)


def test_fetcher_dataset_quota():
    examples = []
    for i in range(30):
        ds_name = 'a' if i % 3 else 'b'
        examples.append({
            'example_id': f'e{i}', 'dataset': ds_name,
            'audio_data': np.zeros(500, np.float32),
            'seq_len': 10, 'seq_len_samples': 500,
            'weak_targets': np.zeros(3, np.float32),
        })
    ds = lazy.from_list(examples)
    fetcher = DataFetcher(
        prefetch_workers=0, batch_size=4, pad_to_multiple=8,
        min_dataset_examples_in_batch={'b': 1}, drop_incomplete=True)
    batches = list(fetcher(ds))
    assert batches
    for b in batches:
        assert b['dataset'].count('b') >= 1


# ----------------------------------------------------------------------
# provider end-to-end
# ----------------------------------------------------------------------
def test_provider_end_to_end(tmp_path):
    db, json_path = build_database(tmp_path)
    config = DataProvider.get_config({
        'json_path': str(json_path),
        'train_set': {'train_strong': 1, 'train_weak': 1},
        'validate_set': 'validation',
        'min_audio_length': 0.2,
        'storage_dir': str(tmp_path),
        'train_transform': {
            'stft': {'shift': 160, 'window_length': 480, 'size': 512},
            'provide_boundary_targets': True,
        },
        'train_fetcher': {
            'batch_size': 4, 'pad_to_multiple': 16,
            'prefetch_workers': 0,
        },
        'test_fetcher': {'batch_size': 4, 'prefetch_workers': 0},
        'mix_interval': 2.,
    })
    provider = DataProvider.from_config(config)
    provider.train_transform.label_encoder.initialize_labels(
        dataset=provider.db.get_dataset(['train_strong', 'train_weak']),
        verbose=True)
    provider.test_transform.label_encoder.initialize_labels()
    train_set = provider.get_train_set()
    batches = list(train_set)
    assert batches, 'no batches produced'
    b = batches[0]
    assert 'audio_data' in b and b['audio_data'].ndim == 2
    assert 'weak_targets' in b and b['weak_targets'].shape[1] == 3
    assert 'boundary_targets' in b
    assert 'warp_anchor_out' in b  # train transform warps
    # mixing happened: some example ids contain '+'
    all_ids = [i for bb in batches for i in bb['example_id']]
    assert any('+' in i for i in all_ids)
    validate_set = provider.get_validate_set()
    vb = list(validate_set)
    assert vb and 'warp_anchor_out' not in vb[0]


def test_native_audio_loader(tmp_path):
    from pb_sed_tpu.data import native
    if not native.available():
        pytest.skip('native library unavailable (no g++?)')
    audio = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / SR)
    write_wav(tmp_path / 'n.wav', audio)
    out = native.load_wav(tmp_path / 'n.wav', SR, peak_normalize=False)
    assert out is not None and out.shape == (1, 8000)
    np.testing.assert_allclose(out[0], audio, atol=2e-3)
    info = native.wav_info(tmp_path / 'n.wav')
    assert info == (8000, SR, 1)
    # resampling path: content preserved at half rate
    half = native.load_wav(tmp_path / 'n.wav', SR // 2,
                           peak_normalize=False)
    assert abs(half.shape[1] - 4000) <= 2
    # python reference resampler agrees within tolerance (interior)
    ref = resample(audio[None, :], SR, SR // 2)
    m = min(half.shape[1], ref.shape[1]) - 50
    np.testing.assert_allclose(half[0, 50:m], ref[0, 50:m], atol=5e-2)
    # AudioReader integration (native fast path)
    reader = AudioReader(target_sample_rate=SR, use_native=True)
    ex = reader({'audio_path': str(tmp_path / 'n.wav')})
    assert ex['audio_data'].shape == (1, 8000)
    assert np.abs(ex['audio_data']).max() == pytest.approx(1., abs=1e-4)


def test_native_batch_loader(tmp_path):
    """C++ worker-pool batch decode matches the single-file path."""
    from pb_sed_tpu.data import native
    from tests.util_synth import write_wav
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.RandomState(11)
    paths = []
    for i in range(6):
        path = tmp_path / f'clip{i}.wav'
        write_wav(path, 0.3 * rng.randn(4000 + 100 * i))
        paths.append(path)
    paths.append(tmp_path / 'missing.wav')  # per-file failure tolerated
    batch = native.load_wav_batch(paths, num_threads=4)
    assert batch is not None and len(batch) == 7
    assert batch[-1] is None
    for i, path in enumerate(paths[:-1]):
        single = native.load_wav(path)
        np.testing.assert_array_equal(batch[i], single)
        assert batch[i].shape == (1, 4000 + 100 * i)
