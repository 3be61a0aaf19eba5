"""Cross-validate the from-scratch C++ decoder (mp3dec.cpp) against the
libavcodec oracle on synthesized count1-only streams.

This exercises every stage EXCEPT big-value huffman decode: side info,
scalefactor skipping, count1 quads (both tables), signs, requantization
with various global_gain, alias reduction, IMDCT, overlap-add, frequency
inversion, and the polyphase synthesis with the recovered window.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
from synth_frames import build_frame, oracle_decode  # noqa: E402

sys.path.insert(0, str(HERE.parents[1]))
from dia_tts_prune_tpu import native  # noqa: E402


def rich_stream(seed: int = 0, n_frames: int = 40) -> bytes:
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        quads_per_granule = []
        for g in range(2):
            quads = []
            n_quads = int(rng.integers(0, 80))
            for q in range(n_quads):
                v, w, x, y = (int(b) for b in rng.integers(0, 2, 4))
                signs = tuple(int(s) for s in rng.integers(0, 2, v + w + x + y))
                quads.append((v, w, x, y, signs))
            quads_per_granule.append(quads)
        gg = int(rng.integers(200, 221))
        table = int(rng.integers(0, 2))
        frames.append(build_frame(quads_per_granule, global_gain=gg,
                                  count1table=table))
    return b"".join(frames)


def main() -> None:
    lib = native.load_mp3dec()
    if lib is None:
        raise SystemExit("mp3dec unavailable (build failed or selftest red)")
    print("selftest:", lib.mp3_selftest())

    data = rich_stream()
    ours = native.decode_mp3(data)
    if ours is None:
        raise SystemExit("mp3dec failed to decode the synthesized stream")
    pcm_o, sr_o, bad = ours
    print(f"ours: {len(pcm_o)} samples sr={sr_o} bad_frames={bad}")
    pcm_r, sr_r = oracle_decode(data)
    print(f"oracle: {len(pcm_r)} samples sr={sr_r}")

    n = min(len(pcm_o), len(pcm_r))
    best = (-1.0, 0)
    for lag in range(-1200, 1201):
        a = pcm_o[max(lag, 0): max(lag, 0) + n - 2400]
        b = pcm_r[max(-lag, 0): max(-lag, 0) + n - 2400]
        m = min(len(a), len(b))
        if m < 1000:
            continue
        na, nb = np.linalg.norm(a[:m]), np.linalg.norm(b[:m])
        if na < 1e-9 or nb < 1e-9:
            continue
        c = float(np.dot(a[:m], b[:m]) / (na * nb))
        if c > best[0]:
            best = (c, lag)
    c, lag = best
    a = pcm_o[max(lag, 0):]
    b = pcm_r[max(-lag, 0):]
    m = min(len(a), len(b))
    err = a[:m] - b[:m]
    snr = 10 * np.log10(float((b[:m] ** 2).sum()) /
                        max(float((err ** 2).sum()), 1e-30))
    print(f"alignment lag={lag} corr={c:.6f}  SNR={snr:.1f} dB")
    if snr < 60:
        raise SystemExit("BACKEND MISMATCH")
    print("BACKEND VALIDATED")


if __name__ == "__main__":
    main()
