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
