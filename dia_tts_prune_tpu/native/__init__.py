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
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libaudioproc.so"
_lib = None
_tried = False
_load_lock = threading.Lock()  # serializes all three lazy builders/loaders



def _stale(so, *sources) -> bool:
    """True when the built library is missing or older than any source."""
    if not so.exists():
        return True
    t = so.stat().st_mtime
    return any(src.exists() and src.stat().st_mtime > t for src in sources)

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


def _load_locked() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if _stale(_SO, _DIR / 'audioproc.cpp') and not _build():
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


# ---------------------------------------------------------------------------
# libaudiodec: compressed-audio decode via the system FFmpeg libraries
# (libavformat/libavcodec/libswresample) — the torchaudio-equivalent
# catch-all for mp3/ogg/m4a/... voice prompts.  Builds only when the dev
# libraries are present; decode_audio_file returns None when unavailable
# and callers fall through to the in-repo decoders / precise errors.

_ADEC_SO = _DIR / "libaudiodec.so"
_adec = None
_adec_tried = False


def _build_audiodec() -> bool:
    src = _DIR / "audiodec.cpp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_ADEC_SO), str(src),
             "-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load_audiodec_locked() -> ctypes.CDLL | None:
    global _adec, _adec_tried
    if _adec_tried:
        return _adec
    _adec_tried = True
    if _stale(_ADEC_SO, _DIR / 'audiodec.cpp') and not _build_audiodec():
        return None
    try:
        lib = ctypes.CDLL(str(_ADEC_SO))
    except OSError:
        return None
    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.adec_probe.restype = i64
    lib.adec_probe.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, i32p, i32p]
    lib.adec_decode_file.restype = i64
    lib.adec_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                     f32p, i64, i32p, i32p]
    lib.adec_encode_mp3.restype = ctypes.c_int
    lib.adec_encode_mp3.argtypes = [ctypes.c_char_p, f32p, i64, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    lib.adec_encode_file.restype = ctypes.c_int
    lib.adec_encode_file.argtypes = [ctypes.c_char_p, f32p, i64, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
    _adec = lib
    return lib


def decode_audio_file(path, target_sr: int = 0, mono: bool = False):
    """Decode any compressed audio file via libav to float32 PCM.

    Returns ``(samples, sample_rate)`` — samples shaped [n] when mono or the
    source is mono, else [n, channels] — or None when the libav libraries
    are unavailable or the file cannot be decoded.
    """
    lib = load_audiodec()
    if lib is None:
        return None
    p = str(path).encode()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = lib.adec_probe(p, target_sr, int(mono), ctypes.byref(sr), ctypes.byref(ch))
    if n <= 0:
        return None
    nch = max(ch.value, 1)
    buf = np.empty(int(n) * nch, np.float32)
    m = lib.adec_decode_file(p, target_sr, int(mono), _fptr(buf), int(n),
                             ctypes.byref(sr), ctypes.byref(ch))
    if m <= 0:
        return None
    nch = max(ch.value, 1)
    out = buf[: int(m) * nch]
    if nch > 1:
        out = out.reshape(-1, nch)
    return out, int(sr.value)


# ---------------------------------------------------------------------------
# libmp3dec: the in-repo from-scratch ISO 11172-3 Layer III decoder —
# the zero-dependency mp3 path (mp3dec.cpp), cross-validated against
# libaudiodec in tests/test_native.py.

_MP3_SO = _DIR / "libmp3dec.so"
_mp3 = None
_mp3_tried = False


def _build_mp3dec() -> bool:
    src = _DIR / "mp3dec.cpp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_MP3_SO), str(src)],
            check=True, capture_output=True, timeout=180,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load_mp3dec_locked() -> ctypes.CDLL | None:
    global _mp3, _mp3_tried
    if _mp3_tried:
        return _mp3
    _mp3_tried = True
    if _stale(_MP3_SO, _DIR / 'mp3dec.cpp', _DIR / 'mp3_tables.h',
              _DIR / 'mp3_synth_window.h') and not _build_mp3dec():
        return None
    try:
        lib = ctypes.CDLL(str(_MP3_SO))
    except OSError:
        return None
    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mp3_selftest.restype = ctypes.c_int
    lib.mp3_probe.restype = i64
    lib.mp3_probe.argtypes = [u8p, i64, i32p, i32p, i32p]
    lib.mp3_decode.restype = i64
    lib.mp3_decode.argtypes = [u8p, i64, f32p, i64, i32p, i32p, i32p]
    if lib.mp3_selftest() != 0:
        return None  # huffman tables failed structural validation
    _mp3 = lib
    return lib


def decode_mp3(data: bytes):
    """Decode an mp3 byte stream with the in-repo decoder.

    Returns ``(samples, sample_rate, bad_frames)`` — samples [n] mono or
    [n, 2] stereo — or None when the native decoder is unavailable.
    """
    lib = load_mp3dec()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    spf = ctypes.c_int()
    frames = lib.mp3_probe(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           buf.size, ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(spf))
    if frames <= 0:
        return None
    cap = int(frames + 2) * int(spf.value)
    nch = max(ch.value, 1)
    out = np.zeros(cap * nch, np.float32)
    bad = ctypes.c_int()
    n = lib.mp3_decode(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       buf.size, _fptr(out), cap, ctypes.byref(sr),
                       ctypes.byref(ch), ctypes.byref(bad))
    if n <= 0:
        return None
    nch = max(ch.value, 1)
    pcm = out[: int(n) * nch]
    if nch > 1:
        pcm = pcm.reshape(-1, nch)
    return pcm, int(sr.value), int(bad.value)


def encode_mp3(path, pcm: np.ndarray, sample_rate: int,
               bitrate_kbps: int = 128) -> bool:
    """Encode float PCM ([n] mono or [n, ch] interleaved-able) to .mp3 via
    libmp3lame (through libavcodec).  Returns False when unavailable."""
    return encode_audio(path, pcm, sample_rate, bitrate_kbps, codec="libmp3lame")


def encode_audio(path, pcm: np.ndarray, sample_rate: int,
                 bitrate_kbps: int = 128, codec: str = "") -> bool:
    """Encode float PCM to any container libavformat can guess from the
    filename (.mp3/.ogg/.opus/.m4a/.flac/...), using the container's default
    codec unless ``codec`` overrides it.  Returns False when unavailable
    or the encode fails."""
    lib = load_audiodec()
    if lib is None or not hasattr(lib, "adec_encode_file"):
        return False
    if not codec:
        # prefer the battle-tested external encoders over ffmpeg's
        # experimental native ones (the native opus encoder produces junk
        # through this path)
        ext = str(path).rsplit(".", 1)[-1].lower()
        codec = {"mp3": "libmp3lame", "opus": "libopus",
                 "ogg": "libvorbis"}.get(ext, "")
    x = np.ascontiguousarray(pcm, np.float32)
    nch = 1 if x.ndim == 1 else int(x.shape[1])
    flat = np.ascontiguousarray(x.reshape(-1))
    rc = lib.adec_encode_file(str(path).encode(), _fptr(flat),
                              x.shape[0], sample_rate, nch, bitrate_kbps,
                              codec.encode())
    return rc == 0


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable.
    Thread-safe: concurrent first calls serialize on one lock."""
    if _lib is not None:
        return _lib
    with _load_lock:
        return _load_locked()


def load_audiodec() -> ctypes.CDLL | None:
    if _adec is not None:
        return _adec
    with _load_lock:
        return _load_audiodec_locked()


def load_mp3dec() -> ctypes.CDLL | None:
    if _mp3 is not None:
        return _mp3
    with _load_lock:
        return _load_mp3dec_locked()
