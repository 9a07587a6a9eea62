"""Integration tests: ensemble inference engine -> score dataframes ->
tuning leaderboards -> pseudo-labeling (the reference's L5/L6 stack) on the
synthetic database with tiny models."""
import numpy as np
import pytest

from pb_sed_tpu.models import base, weak_label
from pb_sed_tpu.models.base import pseudo_label as run_pseudo_label
from pb_sed_tpu.ops.stft import STFT

from tests.test_trainer import make_model, make_provider
from tests.util_synth import EVENT_CLASSES, build_database, \
    ground_truth_events

SR = 16000
GEOM = STFT(shift=160, window_length=480, size=512)


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('inference')
    provider = make_provider(tmp_path / 'db', batch_size=4)
    models = []
    for seed in range(2):
        model = make_model()
        batch = next(iter(provider.get_validate_set()))
        model.init_variables(batch, seed=seed)
        models.append(model)
    import json
    db = json.load(open(tmp_path / 'db' / 'db.json'))
    return provider, models, db, tmp_path


def timestamps_for(max_frames=200):
    return GEOM.frame_timestamps(max_frames, SR)


def test_ensemble_tagging_and_tuning(setup):
    provider, models, db, tmp_path = setup
    dataset = provider.get_validate_set()
    scores = base.tagging(
        models, dataset, timestamps=timestamps_for(),
        event_classes=EVENT_CLASSES)
    assert set(scores) == set(db['datasets']['validation'])
    df = scores[sorted(scores)[0]]
    assert list(df.columns) == ['onset', 'offset', *EVENT_CLASSES]
    assert len(df) == 1  # clip-level score
    gt_tags = {cid: ex['events']
               for cid, ex in db['datasets']['validation'].items()}
    leaderboard = base.tune_tagging(
        scores, medfilt_length_candidates=[1],
        metrics={'f': lambda s: base.f_tag(s, ground_truth=gt_tags,
                                           num_jobs=1)},
        storage_dir=tmp_path)
    values, hyper_params, _ = leaderboard['f']
    assert 'macro_average' in values
    assert all('threshold' in hyper_params[c] for c in EVENT_CLASSES)
    assert (tmp_path / 'tagging_hyper_params_f.json').exists()


def test_ensemble_sed_and_boundaries(setup):
    provider, models, db, tmp_path = setup
    dataset = provider.get_validate_set()
    gt = ground_truth_events(db, 'validation')
    # detection with per-model window length kwargs
    scores = base.sound_event_detection(
        models, dataset, model_kwargs={'window_length': 5},
        timestamps=timestamps_for(), event_classes=EVENT_CLASSES)
    df = scores[sorted(scores)[0]]
    assert len(df) > 1
    tags = {cid: np.ones(len(EVENT_CLASSES)) for cid in scores}
    leaderboard = base.tune_sound_event_detection(
        scores, [1, 3], tags,
        metrics={'f': lambda s: base.f_collar(
            s, ground_truth=gt, onset_collar=.3, offset_collar=.3,
            offset_collar_rate=.3)},
        tag_masking='?', storage_dir=tmp_path)
    assert (tmp_path / 'sed_hyper_params_f.json').exists()
    values, hyper_params, _ = leaderboard['f']
    assert all('medfilt_length' in hyper_params[c]
               for c in EVENT_CLASSES)
    # boundaries detection with stepfilt
    bscores = base.boundaries_detection(
        models, dataset, stepfilt_length=4,
        timestamps=timestamps_for(), event_classes=EVENT_CLASSES)
    bdf = bscores[sorted(bscores)[0]]
    assert len(bdf) > 1
    blb = base.tune_boundaries_detection(
        bscores, [1], [0, 4], tags,
        metrics={'f': lambda s: base.f_collar(
            s, ground_truth=base.boundaries_from_events(gt),
            onset_collar=.5, offset_collar=.5, offset_collar_rate=.0,
            return_onset_offset_bias=True)},
        tag_masking=True, storage_dir=tmp_path)
    values, hyper_params, _ = blb['f']
    assert all('onset_bias' in hyper_params[c] for c in EVENT_CLASSES)


def test_segmented_inference_merges(setup):
    provider, models, db, tmp_path = setup
    dataset = provider.get_validate_set()
    full = base.sound_event_detection(
        models, dataset, timestamps=timestamps_for(),
        event_classes=EVENT_CLASSES, model_kwargs={'window_length': 5})
    seg = base.sound_event_detection(
        models, dataset, model_kwargs={'window_length': 5},
        max_segment_length=32, segment_overlap=8,
        merge_score_segments=True, timestamps=timestamps_for(),
        event_classes=EVENT_CLASSES)
    assert set(seg) == set(full)
    for cid in full:
        assert len(seg[cid]) == len(full[cid]), cid


def test_score_storage(setup, tmp_path):
    provider, models, db, _ = setup
    dataset = provider.get_validate_set()
    stored = base.sound_event_detection(
        models, dataset, timestamps=timestamps_for(),
        event_classes=EVENT_CLASSES, model_kwargs={'window_length': 5},
        score_storage_dir=tmp_path / 'scores')
    cid = sorted(stored.keys())[0]
    df = stored[cid]
    assert (tmp_path / 'scores' / f'{cid}.tsv').exists()
    assert list(df.columns) == ['onset', 'offset', *EVENT_CLASSES]


def test_pseudo_label(setup):
    provider, models, db, tmp_path = setup
    dataset_dict = {
        cid: dict(ex) for cid, ex in
        db['datasets']['train_unlabel_in_domain'].items()}
    tags = {cid: np.array([1., 0., 1.]) for cid in dataset_dict}
    events = {cid: [(0.1, 0.3, 'beep')] for cid in dataset_dict}
    out = run_pseudo_label(
        dataset_dict, EVENT_CLASSES,
        pseudo_tags=True, pseudo_boundaries=False, pseudo_events=True,
        tags=tags, boundaries=None, events=events)
    ex = out[sorted(out)[0]]
    assert 'beep' in ex['events'] and 'hum' in ex['events']
    # beep has a detection -> strong span; hum falls back to full clip
    i_beep = ex['events'].index('beep')
    i_hum = ex['events'].index('hum')
    assert ex['label_types'][i_beep] == 'strong'
    assert ex['label_types'][i_hum] == 'weak'
    assert ex['events_stop_times'][i_hum] == ex['audio_length']


def test_stacked_ensemble_matches_sequential(setup):
    provider, models, db, tmp_path = setup
    dataset = provider.get_validate_set()
    from pb_sed_tpu.models.base.ensemble import (
        StackedEnsemble, same_architecture)
    assert same_architecture(models)
    seq = base.tagging(models, dataset, auto_stack=False)
    stacked = base.tagging(models, dataset, auto_stack=True)
    assert set(seq) == set(stacked)
    for cid in seq:
        np.testing.assert_allclose(
            np.asarray(stacked[cid]), np.asarray(seq[cid]), atol=2e-5)
    # explicit runner API
    runner = StackedEnsemble(models)
    batch = next(iter(dataset))
    y, seq_len = runner.sound_event_detection(batch, window_length=5)
    y_seq0, _ = models[0].sound_event_detection(batch, window_length=5)
    y_seq1, _ = models[1].sound_event_detection(batch, window_length=5)
    np.testing.assert_allclose(y, (y_seq0 + y_seq1) / 2, atol=2e-5)


def test_stacked_ensemble_chunked_matches_unchunked(setup):
    """chunk_size evaluates fixed-size chunks through one program (the
    compile-helper-OOM workaround for big sliding-window programs,
    bench.py ensemble lane): outputs must match the unchunked runner
    bit-for-bit-ish, including the padded final chunk."""
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    provider, models, db, tmp_path = setup
    batch = next(iter(provider.get_validate_set()))
    n = np.shape(batch['seq_len'])[0]
    assert n >= 3, 'fixture batch too small to exercise a partial chunk'
    whole = StackedEnsemble(models)
    chunked = StackedEnsemble(models, chunk_size=2)
    for method in ('tagging', 'sound_event_detection'):
        kw = {'window_length': 5} if method != 'tagging' else {}
        y_w, sl_w = getattr(whole, method)(batch, **kw)
        y_c, sl_c = getattr(chunked, method)(batch, **kw)
        np.testing.assert_allclose(y_c, y_w, atol=2e-5, err_msg=method)
        np.testing.assert_array_equal(sl_c, sl_w)
    # mesh=None chunking runs INSIDE one program (lax.map over chunks,
    # one dispatch per batch — the r4 tunnel-serialization fix) ...
    assert any(k[0] == 'scan' for k in chunked._jit_cache), (
        list(chunked._jit_cache))
    # ... and matches the host chunk loop (the mesh path) bitwise
    looped = StackedEnsemble(models, chunk_size=2)
    looped._scan_disabled = True
    for method in ('tagging', 'sound_event_detection'):
        kw = {'window_length': 5} if method != 'tagging' else {}
        y_s, sl_s = getattr(chunked, method)(batch, **kw)
        y_l, sl_l = getattr(looped, method)(batch, **kw)
        np.testing.assert_allclose(y_s, y_l, atol=1e-6, err_msg=method)
        np.testing.assert_array_equal(sl_s, sl_l)
    assert not any(k[0] == 'scan' for k in looped._jit_cache)


def test_dispatch_matches_public_api(setup):
    """``model.dispatch`` (the async lane behind the pipelined
    inference driver) returns bit-identical values to the public numpy
    methods — it reuses the same cached jitted executables, only the
    final numpy conversion is deferred to the caller."""
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    provider, models, db, tmp_path = setup
    batch = next(iter(provider.get_validate_set()))
    for m in (models[0], StackedEnsemble(models)):
        for method, kw in (
                ('tagging', {}),
                ('boundaries_detection', {}),
                ('sound_event_detection', {'window_length': 5})):
            y_pub, sl_pub = getattr(m, method)(batch, **kw)
            y_d, sl_d = m.dispatch(method, batch, **dict(kw))
            np.testing.assert_array_equal(
                np.asarray(y_d, dtype=np.float64),
                np.asarray(y_pub, dtype=np.float64), err_msg=method)
            np.testing.assert_array_equal(
                np.asarray(sl_d), np.asarray(sl_pub), err_msg=method)


def test_inference_auto_mesh_is_the_production_default(setup, monkeypatch):
    """VERDICT r2 #1: the generic engine (and therefore every experiment
    CLI calling base.tagging/boundaries_detection/sound_event_detection)
    builds a MESHED StackedEnsemble by default — members shard over the
    ensemble axis, the batch over data, replacing the reference's
    sequential member loop (inference.py:133-141)."""
    from pb_sed_tpu.models.base import ensemble as ensemble_mod
    from pb_sed_tpu.parallel.mesh import default_ensemble_mesh
    provider, models, db, tmp_path = setup
    dataset = provider.get_validate_set()
    auto = default_ensemble_mesh(len(models))
    # 8 virtual devices, 2 members -> (ensemble=2, data=4)
    assert auto is not None and auto.shape['ensemble'] == 2
    seen = []
    orig = ensemble_mod.StackedEnsemble.__init__

    def spy(self, models, mesh=None, ensemble_axis='ensemble'):
        seen.append(mesh)
        orig(self, models, mesh=mesh, ensemble_axis=ensemble_axis)

    monkeypatch.setattr(ensemble_mod.StackedEnsemble, '__init__', spy)
    meshed = base.tagging(models, dataset)
    assert seen and seen[0] is not None
    assert seen[0].shape['ensemble'] == 2
    monkeypatch.undo()
    # scores match the unmeshed single-device lane
    unmeshed = base.tagging(models, dataset, mesh=None)
    assert set(meshed) == set(unmeshed)
    for cid in meshed:
        np.testing.assert_allclose(
            np.asarray(meshed[cid]), np.asarray(unmeshed[cid]), atol=2e-5)


def test_default_ensemble_mesh_coprime_counts():
    """Coprime member/device counts: no ensemble axis, but the batch
    still shards over a 1-D data mesh."""
    from pb_sed_tpu.parallel.mesh import default_ensemble_mesh
    mesh = default_ensemble_mesh(3)  # gcd(3, 8) == 1
    assert mesh is not None
    assert mesh.axis_names == ('data',) and mesh.shape['data'] == 8
    mesh10 = default_ensemble_mesh(10)  # gcd(10, 8) == 2
    assert mesh10.shape['ensemble'] == 2 and mesh10.shape['data'] == 4
    import jax
    assert default_ensemble_mesh(4, devices=jax.devices()[:1]) is None


def test_stacked_ensemble_data_only_mesh(setup):
    """StackedEnsemble on a data-only mesh (coprime lane): vmapped
    members, batch sharded over all devices."""
    from pb_sed_tpu.parallel.mesh import get_mesh
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    provider, models, db, tmp_path = setup
    runner = StackedEnsemble(models, mesh=get_mesh())
    batch = next(iter(provider.get_validate_set()))
    y, seq_len = runner.tagging(batch)
    y0, _ = models[0].tagging(batch)
    y1, _ = models[1].tagging(batch)
    assert y.shape[0] == np.shape(y0)[0]
    np.testing.assert_allclose(y, (y0 + y1) / 2, atol=2e-5)


def test_stacked_ensemble_genuine_error_propagates(setup):
    """Regression: the vmapped-path fallback used to eat EVERY exception
    and silently re-run N x slower; only the known grouped-conv/vmap
    lowering failures may fall back."""
    import pytest
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    provider, models, db, tmp_path = setup
    runner = StackedEnsemble(models)
    batch = next(iter(provider.get_validate_set()))

    def bad_method(self, batch, training=False):
        raise ValueError('genuine failure')

    with pytest.raises(ValueError, match='genuine failure'):
        runner._apply(batch, bad_method)


def test_stacked_ensemble_on_mesh(setup):
    """Ensemble axis sharded over the virtual 8-device mesh (ICI plan,
    SURVEY.md §2.4 'ensemble parallel')."""
    import jax
    from pb_sed_tpu.parallel.mesh import get_mesh
    from pb_sed_tpu.models.base.ensemble import StackedEnsemble
    provider, models, db, tmp_path = setup
    # 2 members over a (2, 4) (ensemble, data) mesh
    mesh = get_mesh(ensemble_size=2)
    assert mesh.axis_names == ('ensemble', 'data')
    runner = StackedEnsemble(models, mesh=mesh)
    batch = next(iter(provider.get_validate_set()))
    y, seq_len = runner.tagging(batch)
    y0, _ = models[0].tagging(batch)
    y1, _ = models[1].tagging(batch)
    np.testing.assert_allclose(y, (y0 + y1) / 2, atol=2e-5)
    # batch axis sharded over the data axis incl. a size that does NOT
    # divide it (padded internally, outputs trimmed)
    odd = {k: (v[:3] if isinstance(v, np.ndarray) and v.ndim >= 1
               else v[:3] if isinstance(v, list) else v)
           for k, v in batch.items()}
    y_odd, seq_len_odd = runner.tagging(odd)
    y0_odd, _ = models[0].tagging(odd)
    y1_odd, _ = models[1].tagging(odd)
    assert y_odd.shape[0] == 3 and np.shape(seq_len_odd)[0] == 3
    np.testing.assert_allclose(y_odd, (y0_odd + y1_odd) / 2, atol=2e-5)


def test_update_leaderboard_semantics():
    """Per-class fold semantics (reference contract,
    ``pb_sed/models/base/tuning.py:13-47``): tie-or-better wins, the
    class's hyper-params absorb the winner, the stored scores become a
    per-class mosaic, macro_average tracks the value dict, and
    ``minimize`` works as bool / collection / per-metric dict."""
    import pandas as pd
    from pb_sed_tpu.models.base.tuning import update_leaderboard

    def point(a, b, tag):
        values = {'cat': a, 'dog': b}
        params = {'cat': {'filt': tag}, 'dog': {'filt': tag}}
        scores = {'clip1': pd.DataFrame(
            {'onset': [0.], 'offset': [1.],
             'cat': [float(a)], 'dog': [float(b)]})}
        return values, params, scores

    lb = {}
    update_leaderboard(lb, 'f', *point(.5, .2, 'first'))
    assert lb['f'][0] == {'cat': .5, 'dog': .2, 'macro_average': .35}
    # cat improves, dog regresses -> only cat's column/params move
    update_leaderboard(lb, 'f', *point(.7, .1, 'second'))
    assert lb['f'][0]['cat'] == .7 and lb['f'][0]['dog'] == .2
    assert lb['f'][1] == {'cat': {'filt': 'second'},
                          'dog': {'filt': 'first'}}
    assert lb['f'][2]['clip1']['cat'].iloc[0] == .7
    assert lb['f'][2]['clip1']['dog'].iloc[0] == .2
    assert np.isclose(lb['f'][0]['macro_average'], .45)
    # ties update (the reference keeps the LATEST tying grid point)
    update_leaderboard(lb, 'f', *point(.7, .2, 'tie'))
    assert lb['f'][1]['cat'] == {'filt': 'tie'}
    # minimize as collection and as dict
    lb2 = {}
    update_leaderboard(lb2, 'er', *point(.5, .5, 'a'), minimize=['er'])
    update_leaderboard(lb2, 'er', *point(.3, .9, 'b'), minimize=['er'])
    assert lb2['er'][0]['cat'] == .3 and lb2['er'][0]['dog'] == .5
    lb3 = {}
    update_leaderboard(lb3, 'er', *point(.5, .5, 'a'),
                       minimize={'er': True})
    update_leaderboard(lb3, 'er', *point(.9, .1, 'b'),
                       minimize={'er': True})
    assert lb3['er'][0] == {'cat': .5, 'dog': .1, 'macro_average': .3}
