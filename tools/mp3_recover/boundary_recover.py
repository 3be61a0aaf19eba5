"""Recover scalefactor-band boundaries from the libav oracle (LSF rates).

The 24 kHz MPEG-2 long-block table in mp3dec.cpp failed the LAME
cross-validation (tones 6-10 kHz decode wrong) — the row was mis-recalled.
This tool measures the TRUE boundaries: synthesize single-granule LSF
frames whose spectrum is ±1 on every line (count1-only), then for each
scalefactor band b a probe with sf[b]=3 (gain 2^-1.5); solving per-line
amplitudes from the oracle's PCM shows exactly which lines attenuated —
the band membership, hence the boundary table.  Short-block tables are
recovered the same way (window probes).

Works for any version/rate the header can express; used for the MPEG-2
rows (22050/24000/16000) and the MPEG-2.5 rows if needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
from recover_window import (  # noqa: E402
    alias_reduce,
    granule_subband_samples,
    SynthModel,
)
from synth_frames import BitWriter, oracle_decode  # noqa: E402

BR_LSF = {8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7, 64: 8,
          80: 9, 96: 10, 112: 11, 128: 12, 144: 13, 160: 14}
SR_IDX = {22050: (2, 0), 24000: (2, 1), 16000: (2, 2),
          11025: (0, 0), 12000: (0, 1), 8000: (0, 2)}  # (version_bits, idx)


def lsf_header(sr: int, kbps: int) -> tuple[bytes, int]:
    ver_bits, sr_idx = SR_IDX[sr]
    b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1  # sync low, layer III, no crc
    b2 = (BR_LSF[kbps] << 4) | (sr_idx << 2)
    b3 = 0xC0  # mono
    frame_bytes = 72 * kbps * 1000 // sr
    return bytes([0xFF, b1, b2, b3]), frame_bytes


def build_lsf_frame(sr: int, kbps: int, sf_raw: list[int], slens: tuple,
                    sfc: int, quad_lines: int, block_type: int = 0,
                    mixed: int = 0, subblock_gain=(0, 0, 0),
                    global_gain: int = 210) -> bytes:
    """Mono LSF frame: scalefactors written as the raw partition list,
    spectrum = count1-B quads (1,1,1,1) positive covering quad_lines."""
    header, frame_bytes = lsf_header(sr, kbps)
    md = BitWriter()
    nr_written = 0
    part = [6, 5, 5, 5] if block_type == 0 else [9, 9, 9, 9]
    for p, n in enumerate(part):
        for _ in range(n):
            if slens[p]:
                md.write(sf_raw[nr_written] if nr_written < len(sf_raw) else 0,
                         slens[p])
            nr_written += 1
    n_quads = quad_lines // 4
    for _ in range(n_quads):
        md.write(0b0000, 4)  # table B code for (1,1,1,1) = ~15
        md.write(0, 4)       # positive signs
    side = BitWriter()
    side.write(0, 8)   # main_data_begin
    side.write(0, 1)   # private (mono)
    side.write(md.nbits(), 12)
    side.write(0, 9)   # big_values
    side.write(global_gain, 8)
    side.write(sfc, 9)
    ws = 1 if block_type else 0
    side.write(ws, 1)
    if ws:
        side.write(block_type, 2)
        side.write(mixed, 1)
        for _ in range(2):
            side.write(1, 5)
        for sb in subblock_gain:
            side.write(sb, 3)
    else:
        for _ in range(3):
            side.write(1, 5)
        side.write(0, 4)
        side.write(0, 3)
    side.write(0, 1)   # scalefac_scale
    side.write(1, 1)   # count1table B
    side_bytes = side.tobytes(9)
    main_bytes = md.tobytes(frame_bytes - 4 - 9)
    return header + side_bytes + main_bytes




def line_gains_cached(sr, kbps, sf_raw, slens, sfc, block_type=0):
    """line_gains with the response matrix cached per process."""
    global _RESP_CACHE
    if "R" not in _RESP_CACHE:
        D = np.load(HERE / "recovered_window.npy")
        R = []
        for line in range(576):
            overlap = np.zeros((32, 18))
            model = SynthModel()
            xr = np.zeros(576)
            xr[line] = 1.0
            xr = alias_reduce(xr)
            outs = []
            slots = granule_subband_samples(xr, overlap)
            for s in range(18):
                outs.append(model.push_slot(slots[s]) @ D)
            for _ in range(2):
                slots = granule_subband_samples(np.zeros(576), overlap)
                for s in range(18):
                    outs.append(model.push_slot(slots[s]) @ D)
            R.append(np.concatenate(outs))
        R = np.stack(R)
        _RESP_CACHE["R"] = R
        _RESP_CACHE["pinv"] = np.linalg.pinv(R.T)
    frame = build_lsf_frame(sr, kbps, sf_raw, slens, sfc, 576,
                            block_type=block_type)
    spacer = build_lsf_frame(sr, kbps, [], (0, 0, 0, 0), 0, 0)
    pcm, got_sr = oracle_decode(frame + spacer * 2)
    T = _RESP_CACHE["R"].shape[1]
    if len(pcm) < T:
        pcm = np.pad(pcm, (0, T - len(pcm)))
    return _RESP_CACHE["pinv"] @ pcm[:T]


def recover_long_row(sr: int, kbps: int = 64):
    # slens (2,2,2,2): sfc = (12<<4) | 0b1010 = 202
    slens = (2, 2, 2, 2)
    sfc = 202
    base = line_gains_cached(sr, kbps, [0] * 21, slens, sfc)
    bounds = [0]
    for b in range(21):
        sf = [0] * 21
        sf[b] = 2  # gain 2^-1 (scalefac_scale=0 -> multiplier 0.5)
        g = line_gains_cached(sr, kbps, sf, slens, sfc)
        ratio = np.where(np.abs(base) > 0.05, g / np.where(base == 0, 1, base), 1.0)
        members = np.where(ratio < 0.75)[0]
        if len(members) == 0:
            print(f"sr={sr} band {b}: EMPTY?")
            continue
        lo, hi = int(members.min()), int(members.max()) + 1
        assert lo == bounds[-1], (b, lo, bounds)
        bounds.append(hi)
        print(f"sr={sr} band {b}: lines [{lo},{hi})  width {hi-lo}")
    bounds.append(576)
    print(f"sr={sr} LONG row: {bounds}")
    return bounds


if __name__ == "__main__":
    for sr in [int(a) for a in (sys.argv[1:] or ["24000"])]:
        recover_long_row(sr)


# ---------------------------------------------------------------------------
# MPEG-1 variant (two granules; probe granule 0, granule 1 empty).

BR_V1 = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8, 128: 9,
         160: 10, 192: 11, 224: 12, 256: 13, 320: 14}
SR_V1 = {44100: 0, 48000: 1, 32000: 2}


def v1_header(sr: int, kbps: int) -> tuple[bytes, int]:
    b1 = 0xFB
    b2 = (BR_V1[kbps] << 4) | (SR_V1[sr] << 2)
    b3 = 0xC0
    return bytes([0xFF, b1, b2, b3]), 144 * kbps * 1000 // sr


def build_v1_frame(sr: int, kbps: int, sf_long: list[int], sfc: int,
                   quad_lines: int, global_gain: int = 210) -> bytes:
    """MPEG-1 mono long-block frame, scalefac_compress=sfc (slen1=slen2=2
    for sfc=9... caller picks), granule 0 carries sf + count1 quads."""
    from synth_frames import BitWriter
    SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
    SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]
    header, frame_bytes = v1_header(sr, kbps)
    md = BitWriter()
    s1, s2 = SLEN1[sfc], SLEN2[sfc]
    for b in range(11):
        if s1:
            md.write(sf_long[b] if b < len(sf_long) else 0, s1)
    for b in range(11, 21):
        if s2:
            md.write(sf_long[b] if b < len(sf_long) else 0, s2)
    for _ in range(quad_lines // 4):
        md.write(0b0000, 4)
        md.write(0, 4)
    side = BitWriter()
    side.write(0, 9)
    side.write(0, 5)
    side.write(0, 4)
    for g in range(2):
        nbits = md.nbits() if g == 0 else 0
        side.write(nbits, 12)
        side.write(0, 9)
        side.write(global_gain, 8)
        side.write(sfc if g == 0 else 0, 4)
        side.write(0, 1)
        for _ in range(3):
            side.write(1, 5)
        side.write(0, 4)
        side.write(0, 3)
        side.write(0, 1)
        side.write(0, 1)
        side.write(1, 1)
    side_bytes = side.tobytes(17)
    main_bytes = md.tobytes(frame_bytes - 4 - 17)
    return header + side_bytes + main_bytes


def line_gains_v1(sr, kbps, sf_long, sfc):
    global _RESP_CACHE
    if "R1" not in _RESP_CACHE:
        D = np.load(HERE / "recovered_window.npy")
        R = []
        for line in range(576):
            overlap = np.zeros((32, 18))
            model = SynthModel()
            outs = []
            for gidx in range(4):  # 2 frames x 2 granules
                xr = np.zeros(576)
                if gidx == 0:
                    xr[line] = 1.0
                xr = alias_reduce(xr)
                slots = granule_subband_samples(xr, overlap)
                for s in range(18):
                    outs.append(model.push_slot(slots[s]) @ D)
            R.append(np.concatenate(outs))
        R = np.stack(R)
        _RESP_CACHE["R1"] = R
        _RESP_CACHE["pinv1"] = np.linalg.pinv(R.T)
    frame = build_v1_frame(sr, kbps, sf_long, sfc, 576)
    spacer = build_v1_frame(sr, kbps, [], 0, 0)
    pcm, got_sr = oracle_decode(frame + spacer)
    T = _RESP_CACHE["R1"].shape[1]
    if len(pcm) < T:
        pcm = np.pad(pcm, (0, T - len(pcm)))
    return _RESP_CACHE["pinv1"] @ pcm[:T]


def recover_long_row_v1(sr: int, kbps: int = 128):
    sfc = 9  # slen1=2, slen2=2
    base = line_gains_v1(sr, kbps, [0] * 21, sfc)
    bounds = [0]
    for b in range(21):
        sf = [0] * 21
        sf[b] = 2
        g = line_gains_v1(sr, kbps, sf, sfc)
        ratio = np.where(np.abs(base) > 0.05, g / np.where(base == 0, 1, base), 1.0)
        members = np.where(ratio < 0.75)[0]
        if len(members) == 0:
            print(f"sr={sr} band {b}: EMPTY?")
            continue
        lo, hi = int(members.min()), int(members.max()) + 1
        assert lo == bounds[-1], (b, lo, bounds)
        bounds.append(hi)
    bounds.append(576)
    print(f"sr={sr} MPEG-1 LONG row: {bounds}")
    return bounds


# ---------------------------------------------------------------------------
# Short-block (block_type 2) support: reorder + 12-point IMDCT model, and
# short-row recovery for both MPEG-1 and LSF rates.

_N12 = np.array([[np.cos(np.pi / 24 * (2 * n + 1 + 6) * (2 * k + 1))
                  for k in range(6)] for n in range(12)])
_WIN2 = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def reorder_short(xr576: np.ndarray, bs: list[int]) -> np.ndarray:
    out = np.zeros(576)
    src = 0
    for b in range(13):
        width = bs[b + 1] - bs[b]
        for w in range(3):
            for k in range(width):
                dst = 3 * bs[b] + 3 * k + w
                if dst < 576 and src < 576:
                    out[dst] = xr576[src]
                src += 1
    return out


def granule_subband_samples_short(xr576: np.ndarray, overlap: np.ndarray):
    """Short-block granule: per subband three 12-point IMDCTs overlapped."""
    out = np.zeros((18, 32))
    for sb in range(32):
        spec = xr576[18 * sb: 18 * (sb + 1)]
        tmp = np.zeros(36)
        for w in range(3):
            s = (_N12 @ spec[w::3]) * _WIN2
            off = 6 + w * 6
            tmp[off: off + 12] += s
        first, tail = tmp[:18], tmp[18:]
        s = first + overlap[sb]
        overlap[sb] = tail
        if sb % 2 == 1:
            s[1::2] = -s[1::2]
        out[:, sb] = s
    return out


def _short_resp_matrix(bs: list[int]):
    """Response matrix for REORDERED short-block spectra: line index is the
    pre-reorder (decoded) index 0..575."""
    D = np.load(HERE / "recovered_window.npy")
    R = []
    for line in range(576):
        overlap = np.zeros((32, 18))
        model = SynthModel()
        raw = np.zeros(576)
        raw[line] = 1.0
        xr = reorder_short(raw, bs)
        # NOTE: alias reduction does NOT apply to pure short blocks
        outs = []
        slots = granule_subband_samples_short(xr, overlap)
        for s in range(18):
            outs.append(model.push_slot(slots[s]) @ D)
        for _ in range(2):
            slots = granule_subband_samples(np.zeros(576), overlap)
            for s in range(18):
                outs.append(model.push_slot(slots[s]) @ D)
        R.append(np.concatenate(outs))
    return np.stack(R)


def build_v1_short_frame(sr: int, kbps: int, sf_short, quad_lines: int,
                         global_gain: int = 210) -> bytes:
    """MPEG-1 mono short-block (bt=2, not mixed) frame; scalefac_compress=9
    (slen1=slen2=2); sf_short: [12 bands][3 windows]."""
    from synth_frames import BitWriter
    header, frame_bytes = v1_header(sr, kbps)
    md = BitWriter()
    for b in range(6):
        for w in range(3):
            md.write(sf_short[b][w] if b < len(sf_short) else 0, 2)
    for b in range(6, 12):
        for w in range(3):
            md.write(sf_short[b][w] if b < len(sf_short) else 0, 2)
    for _ in range(quad_lines // 4):
        md.write(0b0000, 4)
        md.write(0, 4)
    side = BitWriter()
    side.write(0, 9)
    side.write(0, 5)
    side.write(0, 4)
    for g in range(2):
        side.write(md.nbits() if g == 0 else 0, 12)
        side.write(0, 9)
        side.write(global_gain, 8)
        side.write(9 if g == 0 else 0, 4)   # scalefac_compress
        side.write(1 if g == 0 else 0, 1)   # window_switching
        if g == 0:
            side.write(2, 2)   # block_type 2
            side.write(0, 1)   # not mixed
            side.write(1, 5)
            side.write(1, 5)
            for _ in range(3):
                side.write(0, 3)  # subblock_gain
        else:
            for _ in range(3):
                side.write(1, 5)
            side.write(0, 4)
            side.write(0, 3)
        side.write(0, 1)
        side.write(0, 1)
        side.write(1, 1)
    return header + side.tobytes(17) + md.tobytes(frame_bytes - 4 - 17)


def build_lsf_short_frame(sr: int, kbps: int, sf_short, quad_lines: int,
                          global_gain: int = 210) -> bytes:
    """LSF mono short frame: sfc chosen so slens (2,2,2,2), partitions
    {9,9,9,9} in short mode -> 36 raw values = 12 bands x 3 windows."""
    from synth_frames import BitWriter
    header, frame_bytes = lsf_header(sr, kbps)
    md = BitWriter()
    raw = []
    for b in range(12):
        for w in range(3):
            raw.append(sf_short[b][w] if b < len(sf_short) else 0)
    for v in raw:   # partitions 9,9,9,9 with slen 2 each
        md.write(v, 2)
    for _ in range(quad_lines // 4):
        md.write(0b0000, 4)
        md.write(0, 4)
    # sfc for slens (2,2,2,2), sfc<400: (sfc>>4)/5=2,(sfc>>4)%5=2 -> hi4=12
    # (sfc&15)>>2=2, &3=2 -> low4=10 -> sfc=202
    side = BitWriter()
    side.write(0, 8)
    side.write(0, 1)
    side.write(md.nbits(), 12)
    side.write(0, 9)
    side.write(global_gain, 8)
    side.write(202, 9)
    side.write(1, 1)   # window_switching
    side.write(2, 2)   # block_type 2
    side.write(0, 1)   # not mixed
    side.write(1, 5)
    side.write(1, 5)
    for _ in range(3):
        side.write(0, 3)
    side.write(0, 1)
    side.write(1, 1)
    return header + side.tobytes(9) + md.tobytes(frame_bytes - 4 - 9)


def recover_short_row(sr: int, mpeg1: bool, kbps: int = 128):
    """Probe each short band's 3 windows together; decoded-order members
    reveal widths.  Response uses identity bs (memberships read in decoded
    order: band b covers decoded lines [3*bs[b], 3*bs[b+1]) )."""
    if "Rs" not in _RESP_CACHE:
        # decoded-order responses: model with identity reorder — i.e. the
        # response of DECODED line i given candidate bs is independent of
        # bs only through reorder; use the response for REORDERED index
        # directly by probing in decoded order with a fixed assumed bs.
        # Instead: compute responses for the POST-reorder layout (one per
        # spectral position) and map probes through candidate widths.
        D = np.load(HERE / "recovered_window.npy")
        R = []
        for pos in range(576):
            overlap = np.zeros((32, 18))
            model = SynthModel()
            xr = np.zeros(576)
            xr[pos] = 1.0
            outs = []
            slots = granule_subband_samples_short(xr, overlap)
            for s in range(18):
                outs.append(model.push_slot(slots[s]) @ D)
            for _ in range(2):
                slots = granule_subband_samples(np.zeros(576), overlap)
                for s in range(18):
                    outs.append(model.push_slot(slots[s]) @ D)
            R.append(np.concatenate(outs))
        R = np.stack(R)
        _RESP_CACHE["Rs"] = R
        _RESP_CACHE["pinvs"] = np.linalg.pinv(R.T)
    build = build_v1_short_frame if mpeg1 else build_lsf_short_frame
    base_frame = build(sr, kbps, [[0] * 3] * 12, 576)
    spacer = (build_v1_frame(sr, kbps, [], 0, 0) if mpeg1
              else build_lsf_frame(sr, kbps, [], (0, 0, 0, 0), 0, 0))
    def probe(sf):
        pcm, got = oracle_decode(build(sr, kbps, sf, 576) + spacer * 2)
        T = _RESP_CACHE["Rs"].shape[1]
        if len(pcm) < T:
            pcm = np.pad(pcm, (0, T - len(pcm)))
        return _RESP_CACHE["pinvs"] @ pcm[:T]
    base = probe([[0] * 3] * 12)
    bounds = [0]
    for b in range(12):
        sf = [[0] * 3 for _ in range(12)]
        sf[b] = [2, 2, 2]
        g = probe(sf)
        ratio = np.where(np.abs(base) > 0.05, g / np.where(base == 0, 1, base), 1.0)
        members = np.where(ratio < 0.75)[0]   # POST-reorder positions
        if len(members) == 0:
            print(f"sr={sr} short band {b}: EMPTY")
            continue
        lo, hi = int(members.min()), int(members.max()) + 1
        # post-reorder positions of band b = [3*bs[b], 3*bs[b+1])
        assert lo % 3 == 0 and hi % 3 == 0, (lo, hi)
        assert lo // 3 == bounds[-1], (b, lo // 3, bounds)
        bounds.append(hi // 3)
        print(f"sr={sr} short band {b}: lines [{lo//3},{hi//3}) width {hi//3-lo//3}")
    bounds.append(192)
    tag = "MPEG-1" if mpeg1 else "LSF"
    print(f"sr={sr} {tag} SHORT row: {bounds}")
    return bounds
