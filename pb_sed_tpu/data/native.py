"""ctypes bindings for the native audio loader (native/pbsed_native.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source) and exposes ``load_wav`` / ``wav_info``. Every entry point
returns None on failure so callers can fall back to the numpy path.
"""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / 'native'
_SRC = _NATIVE_DIR / 'pbsed_native.cpp'
_LIB = _NATIVE_DIR / 'libpbsed_native.so'

_lib = None
_tried = False


def _load_library():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or (_SRC.exists()
                                 and _SRC.stat().st_mtime
                                 > _LIB.stat().st_mtime):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-pthread',
                 '-o', str(_LIB), str(_SRC)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB))
        lib.pbsed_load_wav.restype = ctypes.c_int
        lib.pbsed_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.pbsed_wav_info.restype = ctypes.c_long
        lib.pbsed_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.pbsed_load_wav_batch.restype = None
        lib.pbsed_load_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load_library() is not None


def load_wav(path, target_rate=16000, peak_normalize=True,
             max_seconds=700.):
    """Returns (1, S) float32 mono audio at target_rate, or None."""
    lib = _load_library()
    if lib is None:
        return None
    max_out = int(max_seconds * target_rate)
    out = np.empty(max_out, dtype=np.float32)
    n = lib.pbsed_load_wav(
        str(path).encode(), int(target_rate), int(bool(peak_normalize)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
    if n < 0:
        return None
    return out[:n].copy()[None, :]


def load_wav_batch(paths, target_rate=16000, peak_normalize=True,
                   max_seconds=700., num_threads=8):
    """Decode many wavs concurrently on the C++ worker pool.

    Returns a list of (1, S) float32 arrays (None entries for files the
    native decoder rejects), or None when the library is unavailable.
    """
    lib = _load_library()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    max_out = int(max_seconds * target_rate)
    buffers = np.empty((n, max_out), dtype=np.float32)
    out_ptrs = (ctypes.POINTER(ctypes.c_float) * n)(*[
        buffers[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        for i in range(n)
    ])
    path_arr = (ctypes.c_char_p * n)(*[
        str(p).encode() for p in paths])
    lens = (ctypes.c_long * n)()
    lib.pbsed_load_wav_batch(
        path_arr, n, int(target_rate), int(bool(peak_normalize)),
        int(num_threads), out_ptrs, max_out, lens)
    return [
        buffers[i, :lens[i]].copy()[None, :] if lens[i] >= 0 else None
        for i in range(n)
    ]


def wav_info(path):
    """Returns (num_samples, sample_rate, channels) or None."""
    lib = _load_library()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = lib.pbsed_wav_info(str(path).encode(), ctypes.byref(sr),
                           ctypes.byref(ch))
    if n < 0:
        return None
    return int(n), int(sr.value), int(ch.value)
