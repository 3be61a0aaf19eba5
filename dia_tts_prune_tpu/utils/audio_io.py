"""Host-side audio I/O and resampling.

The reference uses torchaudio (libsox/ffmpeg) + soundfile for I/O and
resampling (dia/model.py:546-595).  Neither is available here; this module
provides WAV read/write via the stdlib ``wave`` module (16/24/32-bit PCM and
float32), FLAC via the in-repo codec (utils/flac.py), other compressed
formats (mp3, ogg) through optional soundfile/ffmpeg with a precise
unsupported-format error otherwise, and polyphase resampling via scipy —
pure host-side work (SURVEY.md §2b: "this is I/O, not kernel work").  A C++
fast path for PCM conversion is used when the native extension is built
(see native/).
"""

from __future__ import annotations

import math
import wave
from pathlib import Path

import numpy as np

DEFAULT_SAMPLE_RATE = 44100


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV file → (float32 samples [C, T] in [-1, 1], sample_rate)."""
    with wave.open(str(path), "rb") as f:
        n_channels = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        n_frames = f.getnframes()
        raw = f.readframes(n_frames)

    if width == 2:
        from .. import native

        pcm = np.frombuffer(raw, dtype="<i2")
        fast = native.pcm16_to_f32(pcm)
        data = fast if fast is not None else pcm.astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {width}")

    data = data.reshape(-1, n_channels).T  # [C, T]
    return data, rate


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int = DEFAULT_SAMPLE_RATE) -> None:
    """Write mono/stereo float audio to 16-bit PCM WAV, clipping to [-1, 1]
    (reference save path semantics: dia/model.py:578-595)."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    if not np.issubdtype(audio.dtype, np.floating):
        audio = audio.astype(np.float32) / np.iinfo(audio.dtype).max
    audio = np.clip(audio, -1.0, 1.0)
    from .. import native

    fast = native.f32_to_pcm16(np.ascontiguousarray(audio.T, np.float32))
    pcm = fast if fast is not None else np.round(audio.T * 32767.0).astype("<i2")  # [T, C]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(pcm.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def _read_via_soundfile(path: Path) -> "tuple[np.ndarray, int] | None":
    try:
        import soundfile  # optional dep; not in the base image
    except ImportError:
        return None
    data, rate = soundfile.read(str(path), dtype="float32", always_2d=True)
    return data.T, int(rate)  # [C, T]


def _read_via_ffmpeg(path: Path) -> "tuple[np.ndarray, int] | None":
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    ffprobe = shutil.which("ffprobe")
    if ffmpeg is None:
        return None
    rate = 44100
    if ffprobe is not None:
        try:
            out = subprocess.run(
                [ffprobe, "-v", "quiet", "-select_streams", "a:0",
                 "-show_entries", "stream=sample_rate", "-of", "csv=p=0", str(path)],
                capture_output=True, check=True, timeout=60)
            rate = int(out.stdout.strip() or rate)
        except Exception:
            pass
    proc = subprocess.run(
        [ffmpeg, "-v", "quiet", "-i", str(path), "-f", "f32le", "-ac", "1",
         "-ar", str(rate), "pipe:1"],
        capture_output=True, check=True, timeout=300)
    return np.frombuffer(proc.stdout, np.float32)[None, :], rate


def _read_via_mp3dec(path: Path) -> "tuple[np.ndarray, int] | None":
    """In-repo from-scratch mp3 decoder (native/mp3dec.cpp), mp3 only.

    Handles every MPEG version (1 / 2 / 2.5), mono and stereo —
    float-rounding exact vs libavcodec at all nine sample rates
    (tests/test_native.py LAME matrix)."""
    data = path.read_bytes()
    head = data[:3]
    looks_mp3 = head[:2] in (b"\xff\xfb", b"\xff\xfa", b"\xff\xf3", b"\xff\xf2") \
        or head == b"ID3" or path.suffix.lower() == ".mp3"
    if not looks_mp3:
        return None
    from .. import native

    got = native.decode_mp3(data)
    if got is None:
        return None
    pcm, rate, bad = got
    if bad > 0:  # corrupt frames: fall through to libav for a second opinion
        return None
    if pcm.ndim == 1:
        return pcm[None, :], rate
    return pcm.T, rate


def _read_via_libav(path: Path) -> "tuple[np.ndarray, int] | None":
    """System FFmpeg libraries via the in-repo shim (native/audiodec.cpp)."""
    from .. import native

    got = native.decode_audio_file(path)
    if got is None:
        return None
    pcm, rate = got
    if pcm.ndim == 1:
        return pcm[None, :], rate
    return pcm.T, rate


def read_audio(path: str | Path) -> tuple[np.ndarray, int]:
    """Read an audio file → (float32 [C, T] in [-1, 1], sample_rate).

    Formats: WAV (stdlib) and FLAC (in-repo decoder, utils/flac.py) always
    work; mp3 decodes with the in-repo native decoder (native/mp3dec.cpp);
    everything else (ogg, m4a, …) goes through the system FFmpeg libraries
    (native/audiodec.cpp), the optional ``soundfile`` package, or an
    ``ffmpeg`` binary — the reference decodes such prompts through
    torchaudio (dia/model.py:551-559).  Raises a ValueError naming the
    supported formats when no decoder can handle the file."""
    p = Path(path)
    head = p.open("rb").read(4)
    if head == b"RIFF":
        return read_wav(p)
    if head == b"fLaC":
        from .flac import read_flac

        return read_flac(p)
    for reader in (_read_via_mp3dec, _read_via_libav, _read_via_soundfile,
                   _read_via_ffmpeg):
        try:
            got = reader(p)
        except Exception as e:  # decoder present but failed on this file
            raise ValueError(f"Failed to decode {p}: {e}") from e
        if got is not None:
            return got
    suffix = p.suffix or "<no extension>"
    raise ValueError(
        f"Unsupported audio format {suffix!r} for {p}: WAV, FLAC and mp3 "
        f"decode natively; other formats (ogg, m4a, …) require the system "
        f"FFmpeg libraries, the optional 'soundfile' package, or an "
        f"'ffmpeg' binary on PATH — none is available. Convert the prompt "
        f"to .wav or .flac."
    )


def to_mono(audio_CxT: np.ndarray) -> np.ndarray:
    """Channel-mean downmix (reference: dia/model.py:553-555)."""
    if audio_CxT.ndim == 1:
        return audio_CxT
    return audio_CxT.mean(axis=0)


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (replaces torchaudio.functional.resample,
    dia/model.py:557-559)."""
    if orig_sr == target_sr:
        return audio
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio_mono(path: str | Path, target_sr: int = DEFAULT_SAMPLE_RATE) -> np.ndarray:
    """Read → mono → resample to target (the reference's load_audio front half,
    dia/model.py:546-562).  WAV/FLAC native; mp3 etc. via soundfile/ffmpeg
    (see ``read_audio``)."""
    data, sr = read_audio(path)
    mono = to_mono(data)
    return resample(mono, sr, target_sr)


def speed_change(audio: np.ndarray, speed_factor: float) -> np.ndarray:
    """Linear-interpolation speed adjustment (reference: app.py:259-268)."""
    speed_factor = max(0.1, min(speed_factor, 5.0))
    if speed_factor == 1.0 or audio.size == 0:
        return audio
    n_out = int(audio.shape[-1] / speed_factor)
    if n_out <= 0:
        return audio
    x_out = np.linspace(0, audio.shape[-1] - 1, n_out)
    x_in = np.arange(audio.shape[-1])
    return np.interp(x_out, x_in, audio).astype(np.float32)


def write_audio(path: str | Path, audio: np.ndarray,
                sample_rate: int = DEFAULT_SAMPLE_RATE) -> None:
    """Write audio by extension: .wav (stdlib), .flac (in-repo codec),
    .mp3 (libmp3lame via the native libav shim).  Anything else gets a
    clear error.  The reference writes wav/whatever soundfile supports
    (dia/model.py:578-595); this covers the same surface natively."""
    p = Path(path)
    ext = p.suffix.lower()
    if ext in ("", ".wav"):
        write_wav(p, audio, sample_rate)
        return
    if ext == ".flac":
        from .flac import write_flac

        a = np.asarray(audio)
        write_flac(p, a, sample_rate)
        return
    if ext in (".mp3", ".ogg", ".opus", ".m4a", ".aac"):
        from .. import native

        a = np.asarray(audio, np.float32)
        if a.ndim == 2 and a.shape[0] in (1, 2) and a.shape[0] < a.shape[1]:
            a = a.T  # [C, T] -> [T, C]
        p.parent.mkdir(parents=True, exist_ok=True)
        if native.encode_audio(p, np.clip(a, -1.0, 1.0), sample_rate):
            return
        raise ValueError(
            f"{ext} export needs the libav shim (native/audiodec.cpp) which "
            f"is unavailable; write {p.stem}.wav or .flac instead")
    raise ValueError(
        f"Unsupported audio output format {ext!r}: use .wav, .flac, .mp3, "
        f".ogg, .opus or .m4a")
