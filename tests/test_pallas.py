"""Pallas GRU kernel tests (interpreter mode on CPU)."""
import jax
import numpy as np
import pytest

from pb_sed_tpu.ops.pallas.gru import gru_scan, gru_scan_reference


def test_pallas_gru_matches_reference():
    rng = np.random.RandomState(0)
    b, t, h = 8, 24, 128
    xw = rng.randn(b, t, 3 * h).astype(np.float32) * 0.5
    w_hh = (rng.randn(h, 3 * h) / np.sqrt(h)).astype(np.float32)
    b_hh = rng.randn(3 * h).astype(np.float32) * 0.1
    h0 = np.zeros((b, h), np.float32)
    want = np.asarray(gru_scan_reference(xw, w_hh, b_hh, h0))
    got = np.asarray(gru_scan(xw, w_hh, b_hh, h0, interpret=True))
    assert got.shape == (b, t, h)
    np.testing.assert_allclose(got, want, atol=1e-5)
