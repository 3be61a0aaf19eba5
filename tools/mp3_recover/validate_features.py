"""Feature-by-feature cross-validation of mp3dec.cpp vs the libav oracle.

The count1-only validator (validate_backend.py) proved the plain long-block
path.  Real files also use: nonzero scalefactors (+scfsi), preflag,
scalefac_scale, big-value spectra, short & mixed blocks with subblock
gains, and the bit reservoir.  Each synthetic stream here turns on ONE
feature; the first one whose SNR collapses names the broken stage.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
import extract_tables as ET  # noqa: E402
from synth_frames import FRAME_BYTES, HEADER, SIDE_BYTES, BitWriter, oracle_decode  # noqa: E402

sys.path.insert(0, str(HERE.parents[1]))
from dia_tts_prune_tpu import native  # noqa: E402

import json  # noqa: E402

TABLES = {int(t): {v: int(k) for k, v in d.items()}
          for t, d in json.loads((HERE / "extracted_tables.json").read_text()).items()}
# code string -> (x, y) per table
CODES = {t: {code: ((xy >> 4), (xy & 15)) for code, xy in m.items()}
         for t, m in TABLES.items()}
SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]


def encode_pairs(table: int, pairs, rng) -> str:
    inv = {v: c for c, v in CODES[table].items()}
    lin = ET.LINBITS.get(table, 0)
    bits = ""
    for (x, y) in pairs:
        cx, cy = min(x, 15), min(y, 15)
        bits += inv[(cx, cy)]
        for v, cv in ((x, cx), (y, cy)):
            if cv == 15 and lin:
                bits += format(v - 15, f"0{lin}b")
            if v:
                bits += str(rng.integers(0, 2))
    return bits


def build_frame(gr0: dict, gr1: dict | None = None) -> bytes:
    """gr keys: bits, big_values, global_gain, scalefac_compress, sf_bits,
    window_switching, block_type, mixed, table_select(list of 3),
    region0, region1, subblock_gain(list), preflag, scalefac_scale,
    count1table."""
    def g(d, k, default):
        return d.get(k, default)

    side = BitWriter()
    side.write(0, 9)
    side.write(0, 5)
    side.write(0, 4)  # scfsi 0
    grs = [gr0, gr1 or {}]
    datas = []
    for d in grs:
        bits = g(d, "sf_bits", "") + g(d, "bits", "")
        datas.append(bits)
        side.write(len(bits), 12)
        side.write(g(d, "big_values", 0), 9)
        side.write(g(d, "global_gain", 189), 8)
        side.write(g(d, "scalefac_compress", 0), 4)
        ws = g(d, "window_switching", 0)
        side.write(ws, 1)
        if ws:
            side.write(g(d, "block_type", 2), 2)
            side.write(g(d, "mixed", 0), 1)
            for t in g(d, "table_select", [1, 1])[:2]:
                side.write(t, 5)
            for sb in g(d, "subblock_gain", [0, 0, 0]):
                side.write(sb, 3)
        else:
            for t in g(d, "table_select", [1, 1, 1]):
                side.write(t, 5)
            side.write(g(d, "region0", 0), 4)
            side.write(g(d, "region1", 0), 3)
        side.write(g(d, "preflag", 0), 1)
        side.write(g(d, "scalefac_scale", 0), 1)
        side.write(g(d, "count1table", 1), 1)
    main = BitWriter()
    for bits in datas:
        main.write_str(bits)
    return (HEADER + side.tobytes(SIDE_BYTES)
            + main.tobytes(FRAME_BYTES - 4 - SIDE_BYTES))


def compare(name: str, stream: bytes, min_snr: float = 60.0) -> float:
    ours = native.decode_mp3(stream)
    assert ours is not None, f"{name}: mp3dec failed"
    pcm_o, sr, bad = ours
    pcm_r, _ = oracle_decode(stream)
    n = min(len(pcm_o), len(pcm_r))
    err = pcm_o[:n] - pcm_r[:n]
    denom = float((pcm_r[:n] ** 2).sum())
    snr = 10 * np.log10(max(denom, 1e-30) / max(float((err ** 2).sum()), 1e-30))
    status = "OK " if snr >= min_snr else "FAIL"
    print(f"{status} {name}: SNR={snr:.1f} dB bad_frames={bad} n={n}")
    return snr


def sf_bits_long(sfc: int, sfs) -> str:
    s1, s2 = SLEN1[sfc], SLEN2[sfc]
    w = BitWriter()
    for b in range(11):
        w.write(sfs[b], s1) if s1 else None
    for b in range(11, 21):
        w.write(sfs[b], s2) if s2 else None
    return "".join(str(b) for b in w.bits)


def main():
    rng = np.random.default_rng(1)

    # A. big values, table 7, no scalefactors (validates big-value decode)
    pairs = [(int(rng.integers(0, 6)), int(rng.integers(0, 6))) for _ in range(20)]
    bits = encode_pairs(7, pairs, rng)
    fr = build_frame({"bits": bits, "big_values": len(pairs),
                      "table_select": [7, 7, 7]})
    compare("A bigvalues t7", fr * 6)

    # A2. escapes via table 16/24
    pairs = [(int(rng.integers(0, 17)), int(rng.integers(0, 17))) for _ in range(12)]
    bits = encode_pairs(24, pairs, rng)
    fr = build_frame({"bits": bits, "big_values": len(pairs),
                      "table_select": [24, 24, 24]})
    compare("A2 escapes t24", fr * 6)

    # B. nonzero scalefactors, long blocks
    sfc = 9  # slen 2,3
    sfs = [int(rng.integers(0, 4)) for _ in range(21)]
    sfb = sf_bits_long(sfc, sfs)
    pairs = [(int(rng.integers(0, 4)), int(rng.integers(0, 4))) for _ in range(30)]
    bits = encode_pairs(5, pairs, rng)
    fr = build_frame({"sf_bits": sfb, "bits": bits, "big_values": len(pairs),
                      "scalefac_compress": sfc, "table_select": [5, 5, 5],
                      "global_gain": 200})
    compare("B scalefactors", fr * 6)

    # B2. + preflag + scalefac_scale
    fr = build_frame({"sf_bits": sfb, "bits": bits, "big_values": len(pairs),
                      "scalefac_compress": sfc, "table_select": [5, 5, 5],
                      "global_gain": 205, "preflag": 1, "scalefac_scale": 1})
    compare("B2 preflag+sfscale", fr * 6)

    # C. region counts > 0 (multi-table big values)
    pairs = [(int(rng.integers(0, 3)), int(rng.integers(0, 3))) for _ in range(40)]
    # region0 = sfb 0..5 (lines 0..20 -> 10 pairs), region1 next
    b0 = encode_pairs(5, pairs[:12], rng)
    b1 = encode_pairs(2, pairs[12:24], rng)
    b2 = encode_pairs(7, pairs[24:], rng)
    fr = build_frame({"bits": b0 + b1 + b2, "big_values": len(pairs),
                      "table_select": [5, 2, 7], "region0": 5, "region1": 3})
    compare("C regions", fr * 6)

    # D. short blocks (block_type 2, not mixed), with subblock gains
    w = BitWriter()
    s1, s2 = SLEN1[5], SLEN2[5]
    for b in range(6):
        for win in range(3):
            w.write(int(rng.integers(0, 2)), s1) if s1 else None
    for b in range(6, 12):
        for win in range(3):
            w.write(int(rng.integers(0, 2)), s2) if s2 else None
    sfb_s = "".join(str(x) for x in w.bits)
    pairs = [(int(rng.integers(0, 4)), int(rng.integers(0, 4))) for _ in range(30)]
    bits = encode_pairs(5, pairs, rng)
    fr = build_frame({"sf_bits": sfb_s, "bits": bits, "big_values": len(pairs),
                      "scalefac_compress": 5, "window_switching": 1,
                      "block_type": 2, "mixed": 0, "table_select": [5, 5],
                      "subblock_gain": [0, 1, 2], "global_gain": 200})
    compare("D short blocks", fr * 6)

    # D2. mixed blocks
    w = BitWriter()
    for b in range(8):
        w.write(int(rng.integers(0, 2)), s1) if s1 else None
    for b in range(3, 6):
        for win in range(3):
            w.write(int(rng.integers(0, 2)), s1) if s1 else None
    for b in range(6, 12):
        for win in range(3):
            w.write(int(rng.integers(0, 2)), s2) if s2 else None
    sfb_m = "".join(str(x) for x in w.bits)
    fr = build_frame({"sf_bits": sfb_m, "bits": bits, "big_values": len(pairs),
                      "scalefac_compress": 5, "window_switching": 1,
                      "block_type": 2, "mixed": 1, "table_select": [5, 5],
                      "subblock_gain": [0, 0, 1], "global_gain": 200})
    compare("D2 mixed blocks", fr * 6)

    # E. block types 1 and 3 (start/stop windows)
    pairs = [(int(rng.integers(0, 4)), int(rng.integers(0, 4))) for _ in range(30)]
    bits = encode_pairs(5, pairs, rng)
    for bt in (1, 3):
        fr = build_frame({"bits": bits, "big_values": len(pairs),
                          "window_switching": 1, "block_type": bt, "mixed": 0,
                          "table_select": [5, 5], "global_gain": 195})
        compare(f"E block_type {bt}", fr * 6)


if __name__ == "__main__":
    main()
