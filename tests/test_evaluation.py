"""Evaluation backend tests: score dataframes, event extraction,
clip/collar/intersection metrics on hand-constructed fixtures."""
import numpy as np
import pytest

from pb_sed_tpu.evaluation import (
    clip_based, collar_based, intersection_based)
from pb_sed_tpu.evaluation.scores import (
    create_score_dataframe, event_list_from_score_array,
    lazy_sed_scores_loader, read_ground_truth_events, scores_to_event_list,
    validate_score_dataframe, write_detection, write_sed_scores)
from pb_sed_tpu.evaluation.intersection_based import staircase_auc

CLASSES = ['a', 'b']


def make_scores(arr):
    arr = np.asarray(arr, dtype=float)
    t = arr.shape[0]
    timestamps = np.arange(t + 1) * 1.0
    return create_score_dataframe(arr, timestamps, CLASSES)


def test_score_dataframe_roundtrip(tmp_path):
    df = make_scores([[0.1, 0.9], [0.8, 0.2]])
    ts, classes = validate_score_dataframe(df)
    assert classes == CLASSES
    np.testing.assert_allclose(ts, [0., 1., 2.])
    write_sed_scores(df, tmp_path / 'scores' / 'clip1.tsv')
    loader = lazy_sed_scores_loader(tmp_path / 'scores')
    assert 'clip1' in loader
    df2 = loader['clip1']
    np.testing.assert_allclose(df2['a'], df['a'])


def test_event_list_extraction():
    arr = np.array([[0., 0.], [0.8, 0.], [0.9, 0.], [0., 0.], [0.7, 0.6]])
    ts = np.arange(6) * 0.5
    events = event_list_from_score_array(arr, ts, CLASSES, 0.5)
    assert (0.5, 1.5, 'a') in events
    assert (2.0, 2.5, 'a') in events
    assert (2.0, 2.5, 'b') in events
    # per-class thresholds
    events2 = event_list_from_score_array(arr, ts, CLASSES, [0.5, 0.65])
    assert (2.0, 2.5, 'b') not in events2


def test_detection_tsv(tmp_path):
    scores = {'clip1': make_scores([[0.9, 0.], [0., 0.]])}
    write_detection(scores, 0.5, tmp_path / 'det.tsv')
    gt = read_ground_truth_events(tmp_path / 'det.tsv')
    assert gt == {'clip1': [(0., 1., 'a')]}


def test_clip_based():
    scores = {
        'c1': make_scores([[0.9, 0.1], [0.8, 0.2]]),   # tags: a
        'c2': make_scores([[0.2, 0.7], [0.1, 0.9]]),   # tags: b
        'c3': make_scores([[0.6, 0.6], [0.3, 0.2]]),   # tags: a+b-ish
    }
    gt = {'c1': ['a'], 'c2': ['b'], 'c3': ['a', 'b']}
    f, p, r, thr, stats = clip_based.best_fscore(scores, gt)
    assert f['a'] == 1. and f['b'] == 1.
    assert f['macro_average'] == 1.
    # decisions at the returned thresholds reproduce the fscore
    f2, p2, r2, _ = clip_based.fscore(scores, gt, thr)
    assert f2['macro_average'] == 1.
    # events-format ground truth also works
    gt_events = {'c1': [(0., 2., 'a')], 'c2': [(0., 2., 'b')],
                 'c3': [(0., 1., 'a'), (0., 1., 'b')]}
    f3, *_ = clip_based.best_fscore(scores, gt_events)
    assert f3['macro_average'] == 1.


def test_collar_based_exact_match():
    # detection a: [1, 3); gt a: [1, 3) -> perfect
    arr = np.zeros((5, 2))
    arr[1:3, 0] = 0.9
    scores = {'c1': make_scores(arr)}
    gt = {'c1': [(1., 3., 'a')]}
    f, p, r, stats = collar_based.fscore(
        scores, gt, 0.5, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2)
    assert f['a'] == 1.
    assert stats['a']['tps'] == 1
    # shifted beyond collar -> miss
    gt_far = {'c1': [(2.5, 4.5, 'a')]}
    f2, *_ = collar_based.fscore(
        scores, gt_far, 0.5, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2)
    assert f2['a'] == 0.


def test_collar_best_fscore_and_bias():
    arr = np.zeros((10, 2))
    arr[2:5, 0] = 0.6   # event a: [2, 5)
    arr[6:8, 1] = 0.4   # event b: [6, 8)
    scores = {'c1': make_scores(arr)}
    gt = {'c1': [(2., 5., 'a'), (6., 8., 'b')]}
    f, p, r, thr, stats = collar_based.best_fscore(
        scores, gt, onset_collar=.3, offset_collar=.3,
        offset_collar_rate=.3)
    assert f['a'] == 1. and f['b'] == 1.
    assert thr['a'] < 0.6 and thr['b'] < 0.4
    # bias stats via fscore with distance sums
    f2, p2, r2, stats2 = collar_based.fscore(
        scores, gt, thr, onset_collar=.3, offset_collar=.3,
        offset_collar_rate=.3, return_onset_offset_dist_sum=True)
    assert stats2['a']['onset_dist_sum'] == pytest.approx(0.)


def test_staircase_auc():
    # y = 1 for x >= 0 -> auc over [0, 10] = 10
    assert staircase_auc([1., 1.], [0., 5.], 10.) == pytest.approx(10.)
    # step at x=5 from 0 to 1 -> auc = 5
    assert staircase_auc([0., 1.], [0., 5.], 10.) == pytest.approx(5.)
    # points beyond max_x are clipped
    assert staircase_auc([0., 1., 2.], [0., 5., 50.], 10.) == \
        pytest.approx(5.)


def test_psds_perfect_and_noisy():
    # perfect detector: detections == gt
    t = 10
    arr1 = np.zeros((t, 2))
    arr1[2:5, 0] = 0.9
    arr1[6:9, 1] = 0.9
    scores = {'c1': make_scores(arr1)}
    gt = {'c1': [(2., 5., 'a'), (6., 9., 'b')]}
    durations = {'c1': float(t)}
    value, (grid, etpr), rocs = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        alpha_ct=0., alpha_st=0., max_efpr=100.)
    assert value == pytest.approx(1.0)
    assert set(rocs) == {'a', 'b'}
    tpr_a, efpr_a, thr_a = rocs['a']
    assert tpr_a.max() == 1.

    # detector with a false positive far from any gt
    arr2 = arr1.copy()
    arr2[0:1, 1] = 0.9  # spurious b detection
    scores2 = {'c1': make_scores(arr2)}
    value2, _, rocs2 = intersection_based.psds(
        scores2, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        alpha_ct=0., alpha_st=0., max_efpr=100.)
    assert value2 < value
    # approximate variant agrees on the perfect detector
    approx, _, _ = intersection_based.approximate_psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7)
    assert approx == pytest.approx(1.0)


def test_psds_cross_trigger_penalty():
    t = 10
    arr = np.zeros((t, 2))
    arr[2:5, 0] = 0.9
    arr[2:5, 1] = 0.9  # b fires exactly on a's event -> cross trigger
    scores = {'c1': make_scores(arr)}
    gt = {'c1': [(2., 5., 'a')], }
    durations = {'c1': float(t)}
    v_no_ct, *_ = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.1, gtc_threshold=.1,
        cttc_threshold=.3, alpha_ct=0., alpha_st=0.)
    v_ct, *_ = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.1, gtc_threshold=.1,
        cttc_threshold=.3, alpha_ct=1., alpha_st=0.)
    assert v_ct <= v_no_ct


def test_psds_from_detection_files(tmp_path):
    """Detections written per threshold and read back must reproduce the
    in-memory approximate PSDS (score-IO round-trip self-consistency,
    reference inference.py:326-355)."""
    from pb_sed_tpu.evaluation.scores import (
        write_detections_for_multiple_thresholds)
    t = 10
    arr = np.zeros((t, 2))
    arr[2:5, 0] = 0.9
    arr[6:9, 1] = 0.6
    arr[0:1, 1] = 0.4
    scores = {'c1': make_scores(arr)}
    gt = {'c1': [(2., 5., 'a'), (6., 9., 'b')]}
    durations = {'c1': float(t)}
    thresholds = np.linspace(.01, .99, 50)
    in_memory, _, _ = intersection_based.approximate_psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        thresholds=thresholds)
    write_detections_for_multiple_thresholds(
        scores, thresholds, tmp_path / 'dets')
    from_files, _, _ = \
        intersection_based.approximate_psds_from_detections_dir(
            tmp_path / 'dets', gt, durations,
            dtc_threshold=.7, gtc_threshold=.7)
    assert from_files == pytest.approx(in_memory, abs=1e-6)


def test_psds_parallel_matches_serial(monkeypatch):
    """num_jobs>1 (spawn pool) must reproduce the serial sweep exactly
    (reference runs all evaluation with num_jobs=8, SURVEY.md §2.3f)."""
    from pb_sed_tpu.evaluation import parallel as par
    t = 10
    arr = np.zeros((t, 2))
    arr[2:5, 0] = 0.9
    arr[6:9, 1] = 0.7
    arr[0:1, 1] = 0.4
    scores = {'c1': make_scores(arr)}
    gt = {'c1': [(2., 5., 'a'), (6., 9., 'b')]}
    durations = {'c1': float(t)}
    kwargs = dict(dtc_threshold=.7, gtc_threshold=.7,
                  alpha_ct=0., alpha_st=0., max_efpr=100.)
    serial, (grid_s, etpr_s), _ = intersection_based.psds(
        scores, gt, durations, num_jobs=1, **kwargs)
    # this box can report 1 cpu, which forces the serial fallback;
    # pretend there are more so the pool path actually runs
    monkeypatch.setattr(par.os, 'cpu_count', lambda: 4)
    pooled, (grid_p, etpr_p), _ = intersection_based.psds(
        scores, gt, durations, num_jobs=2, **kwargs)
    assert pooled == pytest.approx(serial)
    np.testing.assert_allclose(grid_p, grid_s)
    np.testing.assert_allclose(etpr_p, etpr_s)


# ----------------------------------------------------------------------
# exact change-point enumeration (reference sed_scores_eval semantics)
# ----------------------------------------------------------------------
def test_level_detections_and_curve_accumulator():
    from pb_sed_tpu.evaluation.changepoints import (
        CurveAccumulator, level_detections, representative_thresholds)
    scores = np.array([0.1, 0.9, 0.9, 0.1, 0.5])
    ts = np.arange(6) * 1.0
    levels, dets = level_detections(scores, ts)
    np.testing.assert_allclose(levels, [0.1, 0.5, 0.9])
    np.testing.assert_allclose(dets[0], [(0., 5.)])  # base: everything
    np.testing.assert_allclose(dets[1], [(1., 3.), (4., 5.)])  # > 0.1
    np.testing.assert_allclose(dets[2], [(1., 3.)])            # > 0.5
    assert dets[3].shape == (0, 2)                             # > 0.9

    # two clips' staircases merge at the union of change points
    acc = CurveAccumulator(1)
    acc.add([0.2, 0.6], [[2.], [0.]], [3.])   # clip A
    acc.add([0.4], [[0.]], [1.])              # clip B
    bps, curve = acc.merged()
    np.testing.assert_allclose(bps, [0.2, 0.4, 0.6])
    # t<0.2: 3+1; t in [.2,.4): 2+1; t in [.4,.6): 2+0; t>=.6: 0
    np.testing.assert_allclose(curve[:, 0], [4., 3., 2., 0.])
    reps = representative_thresholds(bps)
    np.testing.assert_allclose(reps, [0.199, 0.3, 0.5, 0.601])


def test_collar_best_fscore_exact_beats_grid():
    """Fixture where the approximate quantile grid misses the only
    threshold window achieving F=1 while exact enumeration finds it
    (hand check: detections == gt exactly for t in [0.7, 0.75))."""
    t = 100
    arr = np.zeros((t, 1))
    arr[:60, 0] = np.linspace(0.1, 0.7, 60)   # rising noise ramp
    arr[60:70, 0] = 0.75                      # the true event
    arr[70:, 0] = 0.1
    ts = np.arange(t + 1) * 1.0
    scores = {'c1': create_score_dataframe(arr, ts, ['a'])}
    gt = {'c1': [(60., 70., 'a')]}
    f, p, r, thr, stats = collar_based.best_fscore(
        scores, gt, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2)
    assert f['a'] == pytest.approx(1.)
    assert 0.7 <= thr['a'] < 0.75, thr
    # decisions at the returned threshold reproduce the best F
    f_at, *_ = collar_based.fscore(
        scores, gt, thr, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2)
    assert f_at['a'] == pytest.approx(1.)
    # the approximate grid (quantiles of 62 distinct values) misses the
    # narrow [0.7, 0.75) window
    f_grid, _, _, thr_grid, _ = collar_based.best_fscore(
        scores, gt, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2, max_thresholds=10)
    assert f_grid['a'] < 1.


def test_psds_exact_beats_50_grid():
    """Hand-computed fixture: the clean operating window (0.898, 0.902)
    falls between the official 50-grid points 0.89 and 0.91, so the
    approximate PSDS sees only (tpr=1 @ efpr=36/h) and (0, 0) while the
    exact enumeration finds (tpr=1 @ efpr=0) -> PSDS 1.0 vs 0.64."""
    t = 100  # 1 s frames -> 100 s clip
    arr = np.zeros((t, 1))
    arr[10:20, 0] = 0.902   # true event
    arr[30:35, 0] = 0.898   # false positive burst
    arr[arr[:, 0] == 0., 0] = 0.1
    ts = np.arange(t + 1) * 1.0
    scores = {'c1': create_score_dataframe(arr, ts, ['a'])}
    gt = {'c1': [(10., 20., 'a')]}
    durations = {'c1': 100.}
    exact, _, rocs = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        alpha_ct=0., alpha_st=0., max_efpr=100.)
    assert exact == pytest.approx(1.0)
    tpr, efpr, thr = rocs['a']
    # the exact ROC contains the (efpr=0, tpr=1) point at a threshold
    # inside the clean window
    i = np.flatnonzero((efpr == 0.) & (tpr == 1.))
    assert i.size and 0.898 <= thr[i[0]] < 0.902
    approx, _, _ = intersection_based.approximate_psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        alpha_ct=0., alpha_st=0., max_efpr=100.)
    assert approx == pytest.approx(0.64), approx
    assert exact > approx


def test_collar_exact_parallel_matches_serial(monkeypatch):
    """The exact path parallelizes over CLIPS; the pool must reproduce
    the serial result exactly."""
    from pb_sed_tpu.evaluation import parallel as par
    rng = np.random.RandomState(7)
    scores = {}
    gt = {}
    for i in range(6):
        arr = rng.rand(30, 2)
        ts = np.arange(31) * 0.5
        scores[f'c{i}'] = create_score_dataframe(arr, ts, CLASSES)
        gt[f'c{i}'] = [(2., 5., 'a'), (7., 9., 'b')]
    serial = collar_based.best_fscore(scores, gt, num_jobs=1)
    monkeypatch.setattr(par.os, 'cpu_count', lambda: 4)
    pooled = collar_based.best_fscore(scores, gt, num_jobs=2)
    assert serial[0] == pooled[0]
    assert serial[3] == pooled[3]
