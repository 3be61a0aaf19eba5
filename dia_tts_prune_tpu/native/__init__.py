"""Native host-side components (C++), loaded via ctypes.

``libaudioproc.so`` provides PCM conversion, downmix, windowed-sinc
resampling and metering for the data/serving pipelines (the reference's
equivalent functionality lives in torchaudio's native code).  The library is
compiled on demand with g++ when available; every consumer has a pure-Python
fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libaudioproc.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _DIR / "audioproc.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.pcm16_to_f32.argtypes = [i16p, f32p, i64]
    lib.f32_to_pcm16.argtypes = [f32p, i16p, i64]
    lib.pcm24_to_f32.argtypes = [u8p, f32p, i64]
    lib.downmix_mean.argtypes = [f32p, f32p, i64, ctypes.c_int]
    lib.resample_sinc.argtypes = [f32p, i64, f32p, i64, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.resample_sinc.restype = i64
    lib.audio_stats.argtypes = [f32p, i64, f32p, f32p]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(pcm.size, np.float32)
    lib.pcm16_to_f32(pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _fptr(out), pcm.size)
    return out.reshape(pcm.shape)


def f32_to_pcm16(x: np.ndarray) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.size, np.int16)
    lib.f32_to_pcm16(_fptr(x), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.size)
    return out.reshape(x.shape)


def resample_sinc(x: np.ndarray, in_rate: int, out_rate: int, zeros: int = 16) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    cap = int(np.floor(x.size * out_rate / in_rate)) + 1
    out = np.empty(cap, np.float32)
    n = lib.resample_sinc(_fptr(x), x.size, _fptr(out), cap, in_rate, out_rate, zeros)
    return out[:n]


def audio_stats(x: np.ndarray) -> tuple[float, float] | None:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    peak = ctypes.c_float()
    rms = ctypes.c_float()
    lib.audio_stats(_fptr(x), x.size, ctypes.byref(peak), ctypes.byref(rms))
    return float(peak.value), float(rms.value)
