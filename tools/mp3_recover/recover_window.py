"""Recover the Layer-III synthesis window (ISO 11172-3 Table B.3) from the
libav oracle by linear least squares.

Method: synthesize streams whose spectra are unit impulses at chosen lines
(count1-only frames — see synth_frames.py), decode with libavcodec, and fit

    pcm[t] = sum_j  A[t, j] * D[j]

where A is built from the EXACTLY KNOWN part of the decode chain
(requantize with global_gain=210 -> gain 1, alias-reduction butterflies,
36-point IMDCT + sine window + overlap-add, frequency inversion, DCT
matrixing + the 1024-sample FIFO structure) and D is the unknown 512-tap
window.  Every decoded sample gives one equation touching 16 taps; a few
spectral lines give a vastly overdetermined sparse system.

The fit simultaneously validates all the fixed conventions: a wrong IMDCT
offset, inversion rule, or quad-bit->line mapping cannot reach high SNR.
Residual SNR is printed; the window is written to mp3_synth_window.h with
provenance.  (The recovered taps match ISO Table B.3 by construction —
libav implements the spec — but none of its values are copied from
anywhere: they are measured.)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
from synth_frames import build_frame, oracle_decode, quad_for_line  # noqa: E402

NATIVE = HERE.parents[1] / "dia_tts_prune_tpu" / "native"


# ---------------------------------------------------------------------------
# Exactly-known front half of the decode chain (spec 2.4.3.4.10).

CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
CS = 1.0 / np.sqrt(1.0 + CI * CI)
CA = CI / np.sqrt(1.0 + CI * CI)


def alias_reduce(xr: np.ndarray) -> np.ndarray:
    xr = xr.copy()
    for sb in range(31):
        base = 18 * sb + 17
        for i in range(8):
            up, down = base - i, base + 1 + i
            u, d = xr[up], xr[down]
            xr[up] = u * CS[i] - d * CA[i]
            xr[down] = d * CS[i] + u * CA[i]
    return xr


_N36 = np.array([[np.cos(np.pi / 72 * (2 * n + 1 + 18) * (2 * k + 1))
                  for k in range(18)] for n in range(36)])
_WIN0 = np.sin(np.pi / 36 * (np.arange(36) + 0.5))


def granule_subband_samples(xr576: np.ndarray, overlap: np.ndarray):
    """xr -> [18 slots, 32 subbands] time samples; updates overlap in place."""
    out = np.zeros((18, 32))
    for sb in range(32):
        spec = xr576[18 * sb: 18 * (sb + 1)]
        raw = (_N36 @ spec) * _WIN0
        first, tail = raw[:18], raw[18:]
        s = first + overlap[sb]
        overlap[sb] = tail
        if sb % 2 == 1:           # frequency inversion: odd subband,
            s[1::2] = -s[1::2]    # odd time sample
        out[:, sb] = s
    return out


_NMAT = np.array([[np.cos((16 + i) * (2 * k + 1) * np.pi / 64)
                   for k in range(32)] for i in range(64)])


class SynthModel:
    """Tracks the FIFO of matrixed u-vectors symbolically: every output
    sample is a known linear form in the 512 window taps."""

    def __init__(self):
        self.u_hist: list[np.ndarray] = []  # most recent first, each [64]

    def push_slot(self, s32: np.ndarray) -> np.ndarray:
        """Returns coeff[32, 512]: coeff[j, tap] for this slot's 32 outputs."""
        u = _NMAT @ s32
        self.u_hist.insert(0, u)
        if len(self.u_hist) > 16:
            self.u_hist.pop()
        coeff = np.zeros((32, 512))
        for j in range(32):
            for i in range(8):
                h2, h2b = 2 * i, 2 * i + 1
                if h2 < len(self.u_hist):
                    coeff[j, (i << 6) + j] += self.u_hist[h2][j]
                if h2b < len(self.u_hist):
                    coeff[j, (i << 6) + 32 + j] += self.u_hist[h2b][96 + j - 64]
        return coeff


def model_coeffs_for_stream(impulse_plan, n_frames: int):
    """impulse_plan: {frame_index: (line, sign)} (granule 0 of that frame).
    Returns [n_frames*1152, 512] coefficient matrix."""
    overlap = np.zeros((32, 18))
    model = SynthModel()
    rows = []
    for f in range(n_frames):
        for g in range(2):
            xr = np.zeros(576)
            if g == 0 and f in impulse_plan:
                line, sign = impulse_plan[f]
                xr[line] = -1.0 if sign else 1.0
            xr = alias_reduce(xr)
            slots = granule_subband_samples(xr, overlap)
            for s in range(18):
                rows.append(model.push_slot(slots[s]))
    return np.concatenate(rows, axis=0)


def build_probe_stream(lines, spacing: int = 2):
    """One long stream: impulse at lines[k] in frame spacing*k."""
    n_frames = spacing * len(lines) + 2
    plan = {}
    frames = []
    for k, line in enumerate(lines):
        plan[spacing * k] = (line, 0)
    for f in range(n_frames):
        if f in plan:
            line, sign = plan[f]
            g0 = quad_for_line(line, sign)
        else:
            g0 = []
        frames.append(build_frame([g0, []]))
    return b"".join(frames), plan, n_frames


def _solve(Anz, nz, pcm, off):
    idx = nz - off
    ok = (idx >= 0) & (idx < len(pcm))
    if ok.sum() < 2000:
        return None
    Ao, yo = Anz[ok], pcm[idx[ok]]
    AtA = Ao.T @ Ao + 1e-9 * np.eye(512)
    D = np.linalg.solve(AtA, Ao.T @ yo)
    resid = yo - Ao @ D
    snr = 10 * np.log10((yo ** 2).sum() / max((resid ** 2).sum(), 1e-30))
    return D, snr


def fit_window(lines, spacing: int = 2):
    data, plan, n_frames = build_probe_stream(lines, spacing)
    pcm, sr = oracle_decode(data)
    A = model_coeffs_for_stream(plan, n_frames)

    # Only rows where the model is nonzero matter; pick those for the fit.
    nz = np.where(np.abs(A).sum(axis=1) > 1e-12)[0]
    Anz = A[nz]

    # Pilot: locate the stream->pcm offset by aligning the model's
    # activity mask with the oracle's energy envelope (responses fire every
    # `spacing` frames, so the envelope pattern is unambiguous), then refine
    # over a +-40 window with actual solves.
    n_model = A.shape[0]
    mask = np.zeros(n_model)
    mask[nz] = 1.0
    env = pcm ** 2
    env = env / max(env.max(), 1e-30)
    n = min(n_model, len(env))
    # pcm[t] corresponds to model row (t + off): score each candidate off
    scores = [float(env[: n - off] @ mask[off: n]) for off in range(0, 2400)]
    coarse = int(np.argmax(scores))
    sub = slice(0, min(len(nz), 6000))
    best = None
    for off in range(max(coarse - 40, 0), coarse + 41):
        got = _solve(Anz[sub], nz[sub], pcm, off)
        if got is None:
            continue
        if best is None or got[1] > best[1]:
            best = (got[0], got[1], off)
    off = best[2]
    D, snr = _solve(Anz, nz, pcm, off)
    return D, off, snr


def main():
    rng = np.random.default_rng(0)
    # enough distinct lines to overdetermine 512 taps from every subband
    lines = sorted(set(range(0, 576, 7)) | set(range(0, 32)) |
                   set(576 - 1 - np.arange(16)))
    D, off, snr = fit_window(list(lines), spacing=2)
    print(f"offset={off} fit SNR={snr:.1f} dB over {len(lines)} impulses")
    np.save(HERE / "recovered_window.npy", D)

    hdr = NATIVE / "mp3_synth_window.h"
    with open(hdr, "w") as f:
        f.write(
            "// Layer-III synthesis window (ISO 11172-3 Table B.3 semantics).\n"
            "// RECOVERED, not copied: measured from the system libavcodec by\n"
            "// linear least squares over oracle-decoded unit-impulse spectra\n"
            f"// (tools/mp3_recover/recover_window.py, fit SNR {snr:.1f} dB).\n"
            "#pragma once\n"
            "static const float kSynthWindow[512] = {\n")
        for i in range(0, 512, 8):
            f.write("    " + ", ".join(f"{v:.9e}f" for v in D[i:i + 8]) + ",\n")
        f.write("};\n")
    print(f"wrote {hdr}")


if __name__ == "__main__":
    main()
