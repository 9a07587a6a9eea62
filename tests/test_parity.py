"""Golden parity fixtures vs the reference front-end/eval contract.

The checked-in expected tensors were produced by an INDEPENDENT direct
implementation of the reference contract (see
``tests/fixtures/generate_parity_fixtures.py``): paderbox/padertorch STFT
as configured at ``pb_sed/data_preparation/provider.py:315-322`` (shift
320, window 960, size 1024, 'half' fading, periodic Blackman) and the
128-mel log filterbank of
``pb_sed/experiments/weak_label_crnn/training.py:190-195``. The canned
score dataframes carry hand-derived PSDS1/PSDS2/collar-F1/clip-F1 values
(derivations inline below), pinning the evaluation backend to the
reference's sed_scores_eval semantics (BASELINE.json fidelity contract).
"""
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / 'fixtures'


@pytest.fixture(scope='module')
def wav():
    from pb_sed_tpu.data.audio import read_wav
    audio, sr = read_wav(FIXTURES / 'parity.wav')
    assert sr == 16000
    return audio[0]  # mono


def test_stft_magnitude_golden(wav):
    """Device STFT == reference contract within float32 tolerance."""
    from pb_sed_tpu.ops.stft import STFT
    stft = STFT(shift=320, window_length=960, size=1024, fading='half',
                window='blackman')
    expected = np.load(FIXTURES / 'parity_magnitude.npy')
    assert stft.num_frames(wav.size) == expected.shape[0]
    got = np.asarray(stft.magnitude(wav[None]))[0]
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_logmel_golden(wav):
    """|STFT| @ 128-mel filterbank -> log matches the contract."""
    import jax.numpy as jnp
    from pb_sed_tpu.ops.mel import mel_filterbank
    from pb_sed_tpu.ops.stft import STFT
    stft = STFT(shift=320, window_length=960, size=1024, fading='half',
                window='blackman')
    expected = np.load(FIXTURES / 'parity_logmel.npy')
    mag = stft.magnitude(wav[None])[0]
    fbank = mel_filterbank(128, 16000, 1024, lowest_frequency=50.)
    got = np.asarray(jnp.log(mag @ fbank + 1e-4))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=2e-3)


# ----------------------------------------------------------------------
# evaluation backend golden values (canned score dataframes)
#
# Fixture (10 x 1 s frames per clip, 2 clips of 10 s):
#   c1: a = 0.8 on [2,5) else 0.1;   b = 0.7 on [6,9) else 0.2
#   c2: a = 0.6 on [0,3) else 0.1;   b = 0.9 on [4,6) else 0.3
#   gt: c1 a [2,5), c1 b [6,9), c2 a [0,3)   (c2's b burst is a FP)
#
# Hand derivations:
#  clip-F1: clip scores (max over t): c1 (a .8, b .7), c2 (a .6, b .9).
#    class a: any t < .6 -> p=r=1 -> F=1.  class b: only t < .7 detects
#    the one positive clip but also the negative (score .9) -> p=.5, r=1
#    -> F=2/3.  macro = 5/6.
#  collar-F1 (collars .2/.2/rate .2): class a perfect at t in (.1,.6) ->
#    F=1; class b: t in (.3,.7): c1 [6,9) TP + c2 [4,6) FP -> F=2/3.
#    macro = 5/6.
#  PSDS1 (dtc=gtc=.7, no ct, max_efpr=100): class a reaches tpr=1 at
#    efpr=0 (t in [.1,.6)); class b's best point is tpr=1 at efpr=180/h
#    (1 FP / 20 s) -> contributes 0 below efpr 180 -> etpr = .5 on
#    [0,100] -> PSDS1 = 0.5.
#  PSDS2-style (dtc=gtc=.1, cttc=.3, alpha_ct=.5, max_efpr=200):
#    class a: tpr=1 at efpr=0.  class b: tpr=1 from efpr=180 on ->
#    etpr = .5 below 180, 1.0 on [180,200] ->
#    PSDS = (0.5 * 180 + 1.0 * 20) / 200 = 0.55.
# ----------------------------------------------------------------------
@pytest.fixture(scope='module')
def eval_fixture():
    from pb_sed_tpu.evaluation.scores import (
        lazy_sed_scores_loader, read_ground_truth_events)
    scores = lazy_sed_scores_loader(FIXTURES / 'parity_scores')
    gt = read_ground_truth_events(FIXTURES / 'parity_ground_truth.tsv')
    durations = {'c1': 10., 'c2': 10.}
    return scores, gt, durations


def test_clip_fscore_golden(eval_fixture):
    from pb_sed_tpu.evaluation import clip_based
    scores, gt, _ = eval_fixture
    tags = {cid: sorted({lb for *_, lb in evs}) for cid, evs in gt.items()}
    f, p, r, thr, stats = clip_based.best_fscore(scores, tags)
    assert f['a'] == pytest.approx(1.)
    assert f['b'] == pytest.approx(2. / 3.)
    assert f['macro_average'] == pytest.approx(5. / 6.)


def test_collar_fscore_golden(eval_fixture):
    from pb_sed_tpu.evaluation import collar_based
    scores, gt, _ = eval_fixture
    f, p, r, thr, stats = collar_based.best_fscore(
        scores, gt, onset_collar=.2, offset_collar=.2,
        offset_collar_rate=.2)
    assert f['a'] == pytest.approx(1.)
    assert f['b'] == pytest.approx(2. / 3.)
    assert f['macro_average'] == pytest.approx(5. / 6.)
    assert .1 < thr['a'] < .6
    assert .3 < thr['b'] < .7


def test_psds1_golden(eval_fixture):
    from pb_sed_tpu.evaluation import intersection_based
    scores, gt, durations = eval_fixture
    value, _, rocs = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.7, gtc_threshold=.7,
        alpha_ct=0., alpha_st=0., max_efpr=100.)
    assert value == pytest.approx(0.5, abs=1e-9)
    tpr_a, efpr_a, _ = rocs['a']
    assert tpr_a[efpr_a == 0.].max() == 1.


def test_psds2_golden(eval_fixture):
    from pb_sed_tpu.evaluation import intersection_based
    scores, gt, durations = eval_fixture
    value, _, _ = intersection_based.psds(
        scores, gt, durations, dtc_threshold=.1, gtc_threshold=.1,
        cttc_threshold=.3, alpha_ct=.5, alpha_st=0., max_efpr=200.)
    assert value == pytest.approx(0.55, abs=1e-9)
