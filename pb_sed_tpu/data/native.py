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
                ['g++', '-O3', '-shared', '-fPIC', '-o', str(_LIB),
                 str(_SRC)],
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
