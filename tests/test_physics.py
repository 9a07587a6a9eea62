"""Physical sanity tests for the device front-end: a pure tone must land
its energy in the right FFT bin and mel band (golden-feature contract in
the absence of the reference's feature extractor, SURVEY.md §7 stage 3)."""
import numpy as np
import pytest

from pb_sed_tpu.ops.stft import STFT
from pb_sed_tpu.ops import mel as M


def test_sine_peak_bin():
    import jax.numpy as jnp
    sr = 16000
    f0 = 1000.
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
    stft = STFT()  # size 1024 -> bin width 15.625 Hz
    mag = np.asarray(stft.magnitude(jnp.asarray(audio)))[0]
    # interior frames: peak at bin round(f0 / (sr / size)) = 64
    interior = mag[5:-5]
    peaks = interior.argmax(axis=-1)
    assert (peaks == round(f0 * stft.size / sr)).all()
    # parseval-ish: energy concentrated around the peak
    total = interior.sum()
    around = interior[:, 62:67].sum()
    assert around / total > 0.8


def test_sine_mel_band():
    import jax.numpy as jnp
    sr = 16000
    stft = STFT()
    fbank = np.asarray(M.mel_filterbank(128, sr, 1024))
    edges = M.mel_edge_frequencies(128, sr, 1024)
    f0 = 1000.
    audio = np.sin(
        2 * np.pi * f0 * np.arange(sr) / sr).astype(np.float32)[None, :]
    mag = np.asarray(stft.magnitude(jnp.asarray(audio)))[0]
    melspec = mag @ fbank
    band = melspec[10:-10].mean(0).argmax()
    # the winning band's center frequency must bracket f0
    lo, hi = edges[band], edges[band + 2]
    assert lo < f0 < hi, (band, lo, hi)


def test_warp_moves_peak():
    """A warp factor > 1 shifts content to higher warped frequencies,
    moving the winning mel band DOWN (filters sample warped axis)."""
    import jax.numpy as jnp
    sr = 16000
    stft = STFT()
    f0 = 2000.
    audio = np.sin(
        2 * np.pi * f0 * np.arange(sr) / sr).astype(np.float32)[None, :]
    mag = np.asarray(stft.magnitude(jnp.asarray(audio)))
    base_fb = np.asarray(M.warped_mel_filterbank(
        jnp.ones(1), jnp.full(1, .5), 128, sr, 1024))[0]
    warp_fb = np.asarray(M.warped_mel_filterbank(
        jnp.full(1, 1.25), jnp.full(1, .5), 128, sr, 1024))[0]
    base_band = (mag[0][10:-10].mean(0) @ base_fb).argmax()
    warp_band = (mag[0][10:-10].mean(0) @ warp_fb).argmax()
    assert warp_band != base_band
