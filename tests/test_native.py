"""Native (C++) audio-processing library tests — skipped when no toolchain."""

import numpy as np
import pytest

from dia_tts_prune_tpu import native

pytestmark = pytest.mark.skipif(native.load() is None, reason="native lib unavailable")


def test_pcm16_round_trip():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=5000) * 0.4).clip(-1, 1).astype(np.float32)
    pcm = native.f32_to_pcm16(x)
    back = native.pcm16_to_f32(pcm)
    assert np.abs(back - x).max() < 1.0 / 16384


def test_f32_to_pcm16_clips():
    out = native.f32_to_pcm16(np.array([2.0, -2.0], np.float32))
    assert out[0] == 32767 and out[1] == -32767


def test_resample_matches_scipy_closely():
    from scipy.signal import resample_poly

    t = np.linspace(0, 1, 22050, endpoint=False)
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    ours = native.resample_sinc(x, 22050, 44100)
    ref = resample_poly(x, 2, 1).astype(np.float32)
    n = min(len(ours), len(ref))
    # compare away from the edges (different boundary handling)
    a, b = ours[500 : n - 500], ref[500 : n - 500]
    err = np.abs(a - b).max()
    assert err < 5e-3, err


def test_resample_identity():
    x = np.arange(100, dtype=np.float32)
    np.testing.assert_array_equal(native.resample_sinc(x, 44100, 44100), x)


def test_audio_stats():
    x = np.array([0.5, -1.0, 0.25], np.float32)
    peak, rms = native.audio_stats(x)
    assert peak == 1.0
    np.testing.assert_allclose(rms, np.sqrt(np.mean(x**2)), rtol=1e-6)
