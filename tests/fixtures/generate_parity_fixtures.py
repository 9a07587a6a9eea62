"""Generates the golden feature-parity fixtures (run once, outputs are
checked in).

The expected tensors are computed with an INDEPENDENT direct
implementation of the reference front-end contract (paderbox/padertorch
STFT as configured at ``pb_sed/data_preparation/provider.py:315-322`` and
the 128-mel filterbank of ``experiments/weak_label_crnn/training.py:
190-195``), written from the spec below — NOT by calling pb_sed_tpu code —
so the test catches regressions in the repo implementation:

- STFT: shift 320, window_length 960, size 1024, fading 'half'
  (pad (window_length - shift) // 2 = 320 zeros at both ends), end pad to
  a full frame grid, periodic Blackman window, rFFT(1024), magnitude.
- mel: 128 triangle filters with edges equally spaced on the mel scale
  between 50 Hz and sample_rate / 2, evaluated at rFFT bin centers
  k * sample_rate / size; log(mel + 1e-4).

Usage: python tests/fixtures/generate_parity_fixtures.py
"""
import wave
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
SR = 16000
SHIFT, WINLEN, SIZE = 320, 960, 1024
N_MELS, F_LO = 128, 50.


def synth_waveform():
    """2 s deterministic test signal: tones + chirp + noise bursts."""
    rng = np.random.RandomState(1234)
    t = np.arange(2 * SR) / SR
    x = (
        0.5 * np.sin(2 * np.pi * 440. * t) * (t < 1.2)
        + 0.3 * np.sin(2 * np.pi * 1320. * t + 0.7) * (t > 0.5)
        + 0.2 * np.sin(2 * np.pi * (200. + 1500. * t) * t)  # chirp
        + 0.05 * rng.randn(t.size) * ((t > 0.8) & (t < 1.6))
    )
    x = 0.8 * x / np.abs(x).max()
    return x.astype(np.float32)


def write_wav(path, x):
    pcm = np.clip(np.round(x * 32768.), -32768, 32767).astype('<i2')
    with wave.open(str(path), 'wb') as fid:
        fid.setnchannels(1)
        fid.setsampwidth(2)
        fid.setframerate(SR)
        fid.writeframes(pcm.tobytes())


def read_wav_int16(path):
    with wave.open(str(path), 'rb') as fid:
        raw = fid.readframes(fid.getnframes())
    return np.frombuffer(raw, dtype='<i2').astype(np.float32) / 32768.


def blackman_periodic(n):
    k = np.arange(n)
    return (0.42 - 0.5 * np.cos(2 * np.pi * k / n)
            + 0.08 * np.cos(4 * np.pi * k / n))


def stft_magnitude(x):
    fade = (WINLEN - SHIFT) // 2
    x = np.concatenate([np.zeros(fade), x, np.zeros(fade)])
    n_frames = int(np.ceil(max(x.size - WINLEN, 0) / SHIFT)) + 1
    total = WINLEN + (n_frames - 1) * SHIFT
    x = np.concatenate([x, np.zeros(total - x.size)])
    win = blackman_periodic(WINLEN)
    mags = np.empty((n_frames, SIZE // 2 + 1))
    for i in range(n_frames):
        frame = x[i * SHIFT:i * SHIFT + WINLEN] * win
        mags[i] = np.abs(np.fft.rfft(frame, n=SIZE))
    return mags


def mel_filterbank():
    def hz2mel(f):
        return 2595. * np.log10(1. + f / 700.)

    def mel2hz(m):
        return 700. * (10. ** (m / 2595.) - 1.)

    edges = mel2hz(np.linspace(
        hz2mel(F_LO), hz2mel(SR / 2), N_MELS + 2))
    bins = np.arange(SIZE // 2 + 1) * SR / SIZE
    fbank = np.zeros((SIZE // 2 + 1, N_MELS))
    for m in range(N_MELS):
        lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
        up = (bins - lo) / max(ce - lo, 1e-6)
        down = (hi - bins) / max(hi - ce, 1e-6)
        fbank[:, m] = np.clip(np.minimum(up, down), 0., 1.)
    return fbank


def write_eval_fixtures():
    """Canned score dataframes + ground truth with hand-derivable
    PSDS/collar-F1/clip-F1 values (see tests/test_parity.py for the
    derivation)."""
    import pandas as pd
    scores_dir = HERE / 'parity_scores'
    scores_dir.mkdir(exist_ok=True)
    ts = np.arange(11) * 1.0

    def df(a, b):
        return pd.DataFrame({
            'onset': ts[:-1], 'offset': ts[1:], 'a': a, 'b': b})

    c1_a = np.full(10, 0.1)
    c1_a[2:5] = 0.8
    c1_b = np.full(10, 0.2)
    c1_b[6:9] = 0.7
    c2_a = np.full(10, 0.1)
    c2_a[0:3] = 0.6
    c2_b = np.full(10, 0.3)
    c2_b[4:6] = 0.9
    df(c1_a, c1_b).to_csv(scores_dir / 'c1.tsv', sep='\t', index=False)
    df(c2_a, c2_b).to_csv(scores_dir / 'c2.tsv', sep='\t', index=False)
    with (HERE / 'parity_ground_truth.tsv').open('w') as fid:
        fid.write('filename\tonset\toffset\tevent_label\n')
        fid.write('c1.wav\t2.0\t5.0\ta\n')
        fid.write('c1.wav\t6.0\t9.0\tb\n')
        fid.write('c2.wav\t0.0\t3.0\ta\n')


def main():
    wav_path = HERE / 'parity.wav'
    write_wav(wav_path, synth_waveform())
    # golden computed from the QUANTIZED signal as read back from disk,
    # so the test's read path sees identical input
    x = read_wav_int16(wav_path)
    mag = stft_magnitude(x)
    logmel = np.log(mag @ mel_filterbank() + 1e-4)
    np.save(HERE / 'parity_magnitude.npy', mag.astype(np.float32))
    np.save(HERE / 'parity_logmel.npy', logmel.astype(np.float32))
    write_eval_fixtures()
    print(f'wav: {x.size} samples; magnitude {mag.shape}; '
          f'logmel {logmel.shape}')


if __name__ == '__main__':
    main()
