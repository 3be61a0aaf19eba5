"""Host audio I/O tests: WAV round trip, downmix, resample, speed change."""

import numpy as np

from dia_tts_prune_tpu.utils.audio_io import (
    load_audio_mono,
    read_wav,
    resample,
    speed_change,
    to_mono,
    write_wav,
)


def test_wav_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=20000) * 0.3).astype(np.float32).clip(-1, 1)
    p = tmp_path / "a.wav"
    write_wav(p, audio, 44100)
    data, sr = read_wav(p)
    assert sr == 44100
    assert data.shape == (1, 20000)
    np.testing.assert_allclose(data[0], audio, atol=1.0 / 16384)


def test_write_clips(tmp_path):
    audio = np.array([2.0, -2.0, 0.5], dtype=np.float32)
    p = tmp_path / "clip.wav"
    write_wav(p, audio, 8000)
    data, _ = read_wav(p)
    assert data.max() <= 1.0 and data.min() >= -1.0


def test_to_mono():
    stereo = np.stack([np.ones(10), np.zeros(10)])
    np.testing.assert_allclose(to_mono(stereo), np.full(10, 0.5))


def test_resample_length():
    x = np.sin(np.linspace(0, 100, 22050)).astype(np.float32)
    y = resample(x, 22050, 44100)
    assert abs(y.shape[-1] - 44100) <= 2
    assert resample(x, 22050, 22050) is x


def test_load_audio_mono_resamples(tmp_path):
    rng = np.random.default_rng(1)
    stereo = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(p, stereo, 16000)
    mono = load_audio_mono(p, 44100)
    assert mono.ndim == 1
    assert abs(mono.shape[0] - 44100) < 100


def test_speed_change():
    x = np.sin(np.linspace(0, 10, 1000)).astype(np.float32)
    fast = speed_change(x, 2.0)
    slow = speed_change(x, 0.5)
    assert fast.shape[0] == 500
    assert slow.shape[0] == 2000
    assert speed_change(x, 1.0) is x


# ---------------------------------------------------------------------------
# FLAC: in-repo lossless codec for compressed voice prompts (the reference
# loads any torchaudio-decodable prompt, dia/model.py:551-559)
# ---------------------------------------------------------------------------


def test_flac_round_trip_mono(tmp_path):
    from dia_tts_prune_tpu.utils.flac import read_flac, write_flac

    rng = np.random.default_rng(2)
    audio = (rng.normal(size=10000) * 0.3).astype(np.float32).clip(-1, 1)
    p = tmp_path / "a.flac"
    write_flac(p, audio, 22050, block_size=4096)  # 2 full frames + partial
    data, sr = read_flac(p)
    assert sr == 22050 and data.shape == (1, 10000)
    # verbatim subframes: bit-exact vs the int16 quantization
    expect = np.round(audio * 32767.0).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_allclose(data[0], expect, atol=1e-7)


def test_flac_round_trip_stereo(tmp_path):
    from dia_tts_prune_tpu.utils.flac import read_flac, write_flac

    rng = np.random.default_rng(3)
    audio = (rng.normal(size=(2, 5000)) * 0.2).astype(np.float32)
    p = tmp_path / "s.flac"
    write_flac(p, audio, 44100, block_size=1024)
    data, sr = read_flac(p)
    assert sr == 44100 and data.shape == (2, 5000)
    assert np.abs(data - np.round(audio.clip(-1, 1) * 32767) / 32768.0).max() < 1e-7


def _encode_fixed_frame(pcm, sample_rate, order, k):
    """Test-local FLAC encoder: ONE frame, FIXED-order subframe with a
    Rice(k)-coded single residual partition — exercises the decoder's
    prediction + Rice paths, which write_flac's VERBATIM output does not."""
    import struct

    from dia_tts_prune_tpu.utils.flac import (
        _FIXED_COEFFS,
        _BitWriter,
        _crc8,
        _crc16,
        _utf8_number,
    )

    n = len(pcm)
    bw = _BitWriter()
    bw.write_uint(0b11111111111110, 14)
    bw.write_uint(0, 2)
    bw.write_uint(0b0111, 4)  # 16-bit blocksize at end
    bw.write_uint(0, 4)  # rate from STREAMINFO
    bw.write_uint(0, 4)  # mono
    bw.write_uint(0b100, 3)  # 16 bps
    bw.write_uint(0, 1)
    bw.write_bytes(_utf8_number(0))
    bw.write_uint(n - 1, 16)
    hdr = bw.getvalue()

    body = _BitWriter()
    body.write_uint(0, 1)
    body.write_uint(8 + order, 6)  # FIXED subframe, given order
    body.write_uint(0, 1)  # no wasted bits
    for i in range(order):  # warmup
        body.write_uint(int(pcm[i]) & 0xFFFF, 16)
    coeffs = _FIXED_COEFFS[order]
    body.write_uint(0, 2)  # rice method 0
    body.write_uint(0, 4)  # partition order 0 → one partition
    body.write_uint(k, 4)
    for i in range(order, n):
        pred = sum(c * int(pcm[i - 1 - j]) for j, c in enumerate(coeffs))
        e = int(pcm[i]) - pred
        u = (e << 1) ^ (e >> 63) if e < 0 else (e << 1)
        u = (abs(e) << 1) - (1 if e < 0 else 0)
        body.write_uint(0, u >> k)  # q zeros...
        body.write_uint(1, 1)  # ...stop bit
        if k:
            body.write_uint(u & ((1 << k) - 1), k)
    if body._n:
        body.write_uint(0, 8 - body._n)  # pad to byte
    frame = hdr + bytes([_crc8(hdr)]) + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))

    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", n, n)
    streaminfo += (0).to_bytes(3, "big") * 2
    raw = (sample_rate << 44) | (0 << 41) | (15 << 36) | n
    streaminfo += raw.to_bytes(8, "big")
    streaminfo += b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + bytes(streaminfo) + frame)


def test_flac_fixed_and_rice_decode(tmp_path):
    """FIXED orders 0-4 with Rice residuals decode exactly (real-world FLAC
    frames use predicted subframes, not VERBATIM)."""
    from dia_tts_prune_tpu.utils.flac import read_flac

    rng = np.random.default_rng(4)
    t = np.arange(600)
    pcm = (3000 * np.sin(t / 25.0) + rng.integers(-40, 40, 600)).astype(np.int64)
    for order in range(5):
        for k in (0, 3, 7):
            blob = _encode_fixed_frame(pcm, 8000, order, k)
            p = tmp_path / f"fixed{order}_{k}.flac"
            p.write_bytes(blob)
            data, sr = read_flac(p)
            assert sr == 8000
            np.testing.assert_array_equal(
                np.round(data[0] * 32768.0).astype(np.int64), pcm)


def test_read_audio_dispatch_and_clear_error(tmp_path):
    from dia_tts_prune_tpu.utils.audio_io import read_audio, write_wav
    from dia_tts_prune_tpu.utils.flac import write_flac

    rng = np.random.default_rng(5)
    audio = (rng.normal(size=4000) * 0.2).astype(np.float32)
    write_wav(tmp_path / "x.wav", audio, 16000)
    write_flac(tmp_path / "x.flac", audio, 16000)
    w, _ = read_audio(tmp_path / "x.wav")
    f, _ = read_audio(tmp_path / "x.flac")
    np.testing.assert_allclose(w, f, atol=1.0 / 16384)

    # an mp3 with no decoder available → precise, actionable error
    import shutil

    import pytest

    (tmp_path / "x.mp3").write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    if shutil.which("ffmpeg") is None:
        with pytest.raises(ValueError, match=r"soundfile.*ffmpeg|ffmpeg.*soundfile"):
            read_audio(tmp_path / "x.mp3")


def test_read_audio_uses_soundfile_when_available(tmp_path, monkeypatch):
    """With soundfile importable (stubbed), mp3 prompts decode through it —
    the optional-dependency path the reference gets from torchaudio."""
    import sys
    import types

    calls = {}

    stub = types.ModuleType("soundfile")

    def fake_read(path, dtype="float32", always_2d=True):
        calls["path"] = path
        return np.zeros((100, 2), np.float32), 32000

    stub.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", stub)

    from dia_tts_prune_tpu.utils.audio_io import read_audio

    (tmp_path / "y.mp3").write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    data, sr = read_audio(tmp_path / "y.mp3")
    assert sr == 32000 and data.shape == (2, 100)
    assert calls["path"].endswith("y.mp3")


def test_flac_voice_prompt_through_dia(tmp_path):
    """End-to-end: a .flac voice prompt drives Dia.load_audio / generate —
    the reference voice-clone flow with a compressed prompt
    (dia/model.py:546-576; its bundled prompt is an mp3)."""
    import jax

    from dia_tts_prune_tpu.api import Dia
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params
    from dia_tts_prune_tpu.utils.flac import write_flac

    dia = Dia.random_init(tiny_test_config(), seed=0)
    dia.dac_config = DACConfig(encoder_dim=8, encoder_rates=(2, 4),
                               decoder_dim=32, decoder_rates=(4, 2),
                               n_codebooks=9, codebook_size=1024, codebook_dim=4)
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))

    rng = np.random.default_rng(6)
    # keep the encoded prompt well under the tiny config's 128 audio steps
    prompt = (rng.normal(size=24 * dia.dac_config.hop_length) * 0.2).astype(np.float32)
    fp = tmp_path / "prompt.flac"
    write_flac(fp, prompt, dia.dac_config.sample_rate)
    codes = dia.load_audio(fp)
    assert codes.ndim == 2 and codes.shape[1] == 9
    wav = dia.generate("[S2] More.", max_tokens=96, temperature=0.0,
                       audio_prompt=str(fp), audio_prompt_text="[S1] Hello.")
    assert wav is not None and wav.shape[0] > 0


def test_write_audio_by_extension(tmp_path):
    """Dia.save_audio's writer: .wav/.flac always work; .mp3 through the
    libav shim when present (reference writes via soundfile:
    dia/model.py:578-595)."""
    import numpy as np
    import pytest

    from dia_tts_prune_tpu import native
    from dia_tts_prune_tpu.utils.audio_io import read_audio, write_audio

    sr = 44100
    t = np.arange(sr // 2) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    exts = ["wav", "flac"]
    if native.load_audiodec() is not None and hasattr(
            native.load_audiodec(), "adec_encode_file"):
        exts += ["mp3", "ogg", "m4a"]
    for ext in exts:
        p = tmp_path / f"o.{ext}"
        write_audio(p, sig, sr)
        a, r = read_audio(p)
        assert r == sr
        n = min(a.shape[1], len(sig)) - 4000
        best = max(
            float(np.dot(a[0, lag:lag + n], sig[:n])
                  / (np.linalg.norm(a[0, lag:lag + n])
                     * np.linalg.norm(sig[:n]) + 1e-12))
            for lag in range(0, 2500, 8))
        assert best > 0.98, (ext, best)
    with pytest.raises(ValueError, match="Unsupported audio output"):
        write_audio(tmp_path / "o.xyz", sig, sr)
