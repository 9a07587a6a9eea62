"""Instance-metric tests against the reference's documented values
(doctest fixtures from ``pb_sed/evaluation/instance_based.py``)."""
import numpy as np
import pytest

from pb_sed_tpu.evaluation import instance_based as ib


TARGETS = np.array([1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
SCORES = np.array([0.6, 0.2, 0.5, 0.4, 0.3, 0.1, 0.7, 0.0, 0.0])


def test_fscore_curve_matches_reference_fixture():
    thr, f, p, r = ib.fscore_curve(TARGETS, SCORES)
    np.testing.assert_allclose(
        thr, [-np.inf, 0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, np.inf])
    np.testing.assert_allclose(
        f, [0.5, 0.6, 2 / 3, 0.5, 0.57142857, 1 / 3, 0.4, 0., 0.],
        atol=1e-8)
    np.testing.assert_allclose(
        p, [1 / 3, 0.42857143, 0.5, 0.4, 0.5, 1 / 3, 0.5, 0., 0.], atol=1e-8)
    np.testing.assert_allclose(
        r, [1., 1., 1., 2 / 3, 2 / 3, 1 / 3, 1 / 3, 0., 0.], atol=1e-8)


def test_fscore_curve_2d():
    thr, f, p, r = ib.fscore_curve(
        np.stack([TARGETS, TARGETS]).T, np.stack([SCORES, SCORES]).T)
    assert thr.shape == (9, 2)
    np.testing.assert_allclose(f[:, 0], f[:, 1])
    np.testing.assert_allclose(f[2, 0], 2 / 3, atol=1e-8)


def test_best_fscore_thresholds():
    thr, f, p, r = ib.get_best_fscore_thresholds(
        TARGETS[:, None], SCORES[:, None])
    np.testing.assert_allclose(thr, [0.15])
    np.testing.assert_allclose(f, [2 / 3], atol=1e-8)
    thr, f, p, r = ib.get_best_fscore_thresholds(TARGETS, SCORES)
    assert thr == pytest.approx(0.15)
    assert f == pytest.approx(2 / 3)
    # min_precision constraint
    thr, f, *_ = ib.get_best_fscore_thresholds(
        TARGETS, SCORES, min_precision=.51)
    assert thr == np.inf and f == 0.
    thr, f, *_ = ib.get_best_fscore_thresholds(
        TARGETS, SCORES, min_recall=1.0)
    assert thr == pytest.approx(0.15)


def test_best_er_thresholds():
    thr, er, ir, dr = ib.get_best_er_thresholds(TARGETS, SCORES)
    # reference fixture: all-negative decision is optimal here
    assert thr == np.inf
    assert er == pytest.approx(1.0)
    assert ir == pytest.approx(0.0)
    assert dr == pytest.approx(1.0)


def test_decision_fscore_and_error_rate():
    t = np.array([[1, 0, 1], [0, 1, 0]])
    d = np.array([[1, 1, 0], [0, 1, 0]])
    f, p, r = ib.fscore(t, d)
    assert p == pytest.approx(2 / 3)
    assert r == pytest.approx(2 / 3)
    f, p, r = ib.fscore(t, d, event_wise=True)
    assert f.shape == (3,)
    er, s, i, d_ = ib.error_rate(t, d)
    # 1 insertion + 1 deletion pair into a substitution within instance 0
    assert s == pytest.approx(1 / 3)
    assert er == pytest.approx(1 / 3)


def test_lwlrap_perfect_and_random():
    t = np.array([[1, 0, 0], [0, 1, 0]])
    s = np.array([[.9, .1, .0], [.1, .8, .2]])
    val, per_class, w = ib.lwlrap(t, s)
    assert val == pytest.approx(1.0)
    assert w.sum() == pytest.approx(1.0)
    # worst ranking for class 0
    s2 = np.array([[.0, .5, .9], [.1, .8, .2]])
    val2, per_class2, _ = ib.lwlrap(t, s2)
    assert per_class2[0] == pytest.approx(1 / 3)
    # empty targets
    val3, *_ = ib.lwlrap(np.zeros((2, 3)), s)
    assert val3 == 0.0


def test_correlate_matches_numpy():
    """correlate (reference pb_sed/filters.py:6-36 surface) must agree
    with np.correlate per row for every mode, incl. even kernels."""
    from pb_sed_tpu.ops.filters import correlate
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 17)
    for n in (1, 2, 3, 4, 5):
        filt = rng.randn(n)
        for mode in ('same', 'valid', 'full'):
            got = correlate(x, filt, axis=-1, mode=mode)
            expected = np.apply_along_axis(
                lambda m: np.correlate(m, filt, mode=mode), -1, x)
            np.testing.assert_allclose(got, expected, atol=1e-12)
    # non-trailing axis
    got = correlate(x, rng.randn(3), axis=1, mode='same')
    assert got.shape == x.shape


def test_lwlrap_decomposition_helpers():
    """positive_class_precisions + lwlrap_from_precisions reproduce the
    all-in-one lwlrap triple."""
    from pb_sed_tpu.evaluation.instance_based import (
        lwlrap, lwlrap_from_precisions, positive_class_precisions)
    rng = np.random.RandomState(5)
    truth = rng.rand(40, 7) > 0.6
    truth[:2] = False  # samples without positives
    scores = rng.rand(40, 7)
    pos_idx, prec = positive_class_precisions(truth, scores)
    assert pos_idx.shape == prec.shape == (int(truth.sum()),)
    value, per_class, weight = lwlrap_from_precisions(
        prec, pos_idx, num_classes=7)
    value2, per_class2, weight2 = lwlrap(truth, scores)
    assert value == pytest.approx(value2)
    np.testing.assert_allclose(per_class, per_class2)
    np.testing.assert_allclose(weight, weight2)
