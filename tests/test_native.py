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


# ---------------------------------------------------------------------------
# Compressed-audio decode (native/audiodec.cpp via system FFmpeg libraries,
# native/mp3dec.cpp from-scratch) — the torchaudio replacement
# (/root/reference/dia/model.py:551-559; bundled prompt example_prompt.mp3).

REF_MP3 = "/root/reference/example_prompt.mp3"


def _ref_mp3_available():
    import os

    return os.path.exists(REF_MP3) and native.load_audiodec() is not None


@pytest.mark.skipif(not _ref_mp3_available(),
                    reason="reference mp3 or libav unavailable")
def test_libav_decodes_reference_prompt():
    pcm, sr = native.decode_audio_file(REF_MP3, mono=True)
    assert sr == 44100
    assert pcm.ndim == 1
    dur = pcm.shape[0] / sr
    assert 2.0 < dur < 10.0, dur
    rms = float(np.sqrt((pcm ** 2).mean()))
    assert 0.01 < rms < 0.7, rms          # speech, not silence / clipping
    assert float(np.abs(pcm).max()) <= 1.0


@pytest.mark.skipif(native.load_audiodec() is None, reason="libav unavailable")
def test_libav_rejects_garbage(tmp_path):
    p = tmp_path / "junk.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    got = native.decode_audio_file(p)
    assert got is None or got[0].shape[0] == 0


@pytest.mark.skipif(native.load_mp3dec() is None,
                    reason="in-repo mp3 decoder unavailable")
def test_mp3dec_selftest_and_reference_prompt():
    """The from-scratch decoder's huffman tables pass structural validation
    (prefix-free, complete) and, when the reference prompt is present, the
    full file decodes with zero bit-accounting failures and matches the
    libav oracle closely."""
    import os

    lib = native.load_mp3dec()
    assert lib.mp3_selftest() == 0
    if not os.path.exists(REF_MP3):
        pytest.skip("reference mp3 absent")
    got = native.decode_mp3(open(REF_MP3, "rb").read())
    assert got is not None
    pcm, sr, bad = got
    assert sr == 44100
    assert bad == 0, f"{bad} frames failed bit-exact accounting"
    if native.load_audiodec() is not None:
        # Same LAME gapless trim as libav -> outputs are directly
        # comparable, sample for sample, to float32 rounding.
        oracle, osr = native.decode_audio_file(REF_MP3, mono=True)
        assert osr == sr
        assert len(pcm) == len(oracle), (len(pcm), len(oracle))
        err = pcm - oracle
        snr = 10 * np.log10(float((oracle ** 2).sum()) /
                            max(float((err ** 2).sum()), 1e-30))
        assert snr > 90.0, snr


@pytest.mark.skipif(native.load_audiodec() is None or native.load_mp3dec() is None,
                    reason="libav or mp3dec unavailable")
def test_mp3dec_vs_lame_matrix(tmp_path):
    """Encode real LAME streams (via libavcodec/libmp3lame) across rates,
    channel modes and MPEG versions, and demand the from-scratch decoder
    match the libav decode float-rounding exactly at EVERY rate — all
    three MPEG versions, mono and stereo (the huffman tables, synthesis
    window, sfb boundaries and boundary-overrun rules were all recovered /
    verified behaviorally against libav: tools/mp3_recover/)."""
    if not hasattr(native.load_audiodec(), "adec_encode_mp3"):
        pytest.skip("libav build lacks encoder entry")
    rng = np.random.default_rng(0)
    cases = [  # (sr, nch, kbps, min_snr)
        (44100, 1, 128, 90.0),
        (44100, 2, 160, 90.0),
        (48000, 1, 128, 90.0),
        (32000, 1, 96, 90.0),
        (22050, 1, 64, 90.0),
        (16000, 1, 48, 90.0),
        (24000, 2, 64, 90.0),
        (12000, 1, 32, 90.0),
        (8000, 1, 24, 90.0),
    ]
    for sr, nch, kbps, min_snr in cases:
        t = np.arange(int(sr * 1.2)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 440 * t)
               + 0.2 * np.sin(2 * np.pi * 1330 * t * (1 + 0.3 * np.sin(2 * np.pi * 2 * t)))
               + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        pcm = sig if nch == 1 else np.stack([sig, np.roll(sig, 50) * 0.8], 1)
        path = tmp_path / f"m_{sr}_{nch}.mp3"
        assert native.encode_mp3(path, pcm, sr, kbps), (sr, nch)
        ours = native.decode_mp3(path.read_bytes())
        assert ours is not None, (sr, nch)
        po, osr, bad = ours
        assert osr == sr and bad == 0, (sr, nch, bad)
        ref = native.decode_audio_file(path)
        pr = ref[0]
        po = po.reshape(len(po), -1)
        pr = pr.reshape(len(pr), -1)
        n = min(len(po), len(pr))
        err = po[:n] - pr[:n]
        snr = 10 * np.log10(float((pr[:n] ** 2).sum())
                            / max(float((err ** 2).sum()), 1e-30))
        assert snr >= min_snr, (sr, nch, snr)


@pytest.mark.skipif(native.load_audiodec() is None, reason="libav unavailable")
def test_encode_mp3_roundtrip(tmp_path):
    """mp3 EXPORT capability: encode -> decode round trip preserves the
    signal (perceptual codec: correlation, not bit-exactness)."""
    if not hasattr(native.load_audiodec(), "adec_encode_mp3"):
        pytest.skip("libav build lacks encoder entry")
    sr = 44100
    t = np.arange(sr) / sr
    sig = (0.4 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    path = tmp_path / "rt.mp3"
    assert native.encode_mp3(path, sig, sr, 128)
    got = native.decode_audio_file(path, mono=True)
    assert got is not None
    pcm, osr = got
    assert osr == sr
    # the muxer writes the Xing/LAME gapless tag -> sample-aligned at lag 0
    assert len(pcm) == len(sig), (len(pcm), len(sig))
    c = float(np.dot(pcm, sig)
              / (np.linalg.norm(pcm) * np.linalg.norm(sig) + 1e-12))
    assert c > 0.99, c


@pytest.mark.skipif(native.load_mp3dec() is None,
                    reason="in-repo mp3 decoder unavailable")
def test_mp3dec_fuzz_no_crash():
    """Memory safety: random garbage and bit-flipped real frames must never
    crash the C++ decoder (runs in a subprocess so a segfault fails the
    test instead of killing the pytest session).  A 600-buffer sweep across
    4 seeds ran clean when this was written."""
    import subprocess
    import sys as _sys

    code = (
        "import numpy as np, sys\n"
        "sys.path.insert(0, %r)\n"
        "from dia_tts_prune_tpu import native\n"
        "rng = np.random.default_rng(7)\n"
        "import os\n"
        "real = (open('/root/reference/example_prompt.mp3','rb').read()\n"
        "        if os.path.exists('/root/reference/example_prompt.mp3')\n"
        "        else bytes([0xFF,0xFB,0x90,0xC4])*200)\n"
        "for i in range(40):\n"
        "    if i %% 3 == 0:\n"
        "        buf = rng.integers(0,256,rng.integers(10,3000),dtype=np.uint8).tobytes()\n"
        "    elif i %% 3 == 1:\n"
        "        buf = bytes([0xFF,0xFB,int(rng.integers(0,256)),int(rng.integers(0,256))]) \\\n"
        "              + rng.integers(0,256,1000,dtype=np.uint8).tobytes()\n"
        "    else:\n"
        "        b = bytearray(real)\n"
        "        for _ in range(20):\n"
        "            b[int(rng.integers(0,len(b)))] = int(rng.integers(0,256))\n"
        "        buf = bytes(b)\n"
        "    native.decode_mp3(buf)\n"
        "print('ok')\n"
    ) % str(__import__("pathlib").Path(__file__).resolve().parents[1])
    r = subprocess.run([_sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-500:]
