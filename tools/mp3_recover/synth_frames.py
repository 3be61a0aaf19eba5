"""Layer-III frame synthesizer + libav oracle driver (mp3dec validation).

Builds VALID MPEG-1 Layer III mono frames whose spectral content we choose
exactly, decodes them with the system libavcodec (via native/audiodec.cpp),
and uses the resulting PCM to
  1. validate the from-scratch decoder's back end (requantize -> alias ->
     IMDCT -> polyphase synthesis) against a reference implementation, and
  2. recover the 512-tap synthesis window (ISO 11172-3 Table B.3) by
     linear least squares — the decoded PCM is LINEAR in the window taps
     for known subband time samples.

The trick that makes this table-free: with big_values=0 the whole spectrum
is coded by the count1 quad table (16 four-bit codes, table B), so we can
place ±1 at any spectral line without knowing any big-value huffman table.
Big-value tables are then validated entry-by-entry the same way (each
candidate codeword either decodes to the intended spectrum or visibly
doesn't).

No code or table is copied from any decoder: frames are built from the
spec's bitstream grammar; libav is used only as a black-box oracle.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_str(self, s: str):
        for c in s:
            self.bits.append(1 if c == "1" else 0)

    def nbits(self) -> int:
        return len(self.bits)

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, (len(out), pad_to)
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


# count1 table B: 16 codes, all 4 bits: hcod(v,w,x,y) = ~value & 0xF
# (validated by probe_count1_mapping below: every emitted quad decodes to
# the intended lines).
def count1b_code(v: int, w: int, x: int, y: int) -> tuple[int, int]:
    val = (v << 3) | (w << 2) | (x << 1) | y
    return (~val) & 0xF, 4


# count1 table A (ISO B.7): three codewords confirmed directly by the
# oracle (0111->8, 00100->6, 0100->2), the rest validated by the probe.
COUNT1A = {
    0b0000: "1",
    0b0001: "0101",
    0b0010: "0100",
    0b0011: "00101",
    0b0100: "0110",
    0b0101: "000101",
    0b0110: "00100",
    0b0111: "000100",
    0b1000: "0111",
    0b1001: "00011",
    0b1010: "00110",
    0b1011: "000000",
    0b1100: "00111",
    0b1101: "000010",
    0b1110: "000011",
    0b1111: "000001",
}


FRAME_BYTES = 417  # 128 kbps @ 44100, no padding
SIDE_BYTES = 17    # MPEG-1 mono
HEADER = bytes([0xFF, 0xFB, 0x90, 0xC4])  # MPEG1 L3, 128k, 44.1k, mono, no CRC


def build_frame(quads_per_granule, global_gain: int = 210,
                count1table: int = 1, extra_granule_bits=("", "")):
    """One frame with the given count1 content.

    quads_per_granule: list (len 2) of lists of (v, w, x, y, signs) where
    signs is a tuple of sign bits (1 = negative) for each set field, in
    v,w,x,y order.  Lines are consumed 4 per quad from line 0 upward.
    extra_granule_bits: raw bit strings appended to each granule's data
    (counted in part2_3_length) — used by the probing tools.
    """
    side = BitWriter()
    side.write(0, 9)   # main_data_begin
    side.write(0, 5)   # private
    side.write(0, 4)   # scfsi
    granule_bits = []
    for g in range(2):
        md = BitWriter()
        for (v, w, x, y, signs) in quads_per_granule[g]:
            if count1table == 1:
                code, n = count1b_code(v, w, x, y)
                md.write(code, n)
            else:
                md.write_str(COUNT1A[(v << 3) | (w << 2) | (x << 1) | y])
            si = 0
            for bit in (v, w, x, y):
                if bit:
                    md.write(signs[si], 1)
                    si += 1
        md.write_str(extra_granule_bits[g])
        granule_bits.append(md)
    for g in range(2):
        side.write(granule_bits[g].nbits(), 12)  # part2_3_length
        side.write(0, 9)   # big_values
        side.write(global_gain, 8)
        side.write(0, 4)   # scalefac_compress
        side.write(0, 1)   # window_switching
        for _ in range(3):
            side.write(1, 5)  # table_select (unused; must not be 4/14)
        side.write(0, 4)   # region0_count
        side.write(0, 3)   # region1_count
        side.write(0, 1)   # preflag
        side.write(0, 1)   # scalefac_scale
        side.write(count1table, 1)
    side_bytes = side.tobytes(SIDE_BYTES)

    main = BitWriter()
    main.bits = granule_bits[0].bits + granule_bits[1].bits
    main_bytes = main.tobytes(FRAME_BYTES - 4 - SIDE_BYTES)
    return HEADER + side_bytes + main_bytes


def quad_for_line(line: int, sign: int = 0):
    """A granule's count1 list placing +/-1 at `line`, zeros elsewhere up to
    that quad."""
    q = line // 4
    r = line % 4
    quads = [(0, 0, 0, 0, ())] * q
    flags = [0, 0, 0, 0]
    flags[r] = 1
    quads.append((flags[0], flags[1], flags[2], flags[3], (sign,)))
    return quads


def oracle_decode(mp3_bytes: bytes) -> tuple[np.ndarray, int]:
    from dia_tts_prune_tpu import native

    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(mp3_bytes)
        path = f.name
    got = native.decode_audio_file(path, mono=True)
    Path(path).unlink()
    if got is None:
        raise RuntimeError("oracle failed to decode synthesized frames")
    return got


def probe_count1_mapping(table: int):
    """Empirically validate a count1 table: emit one frame per quad value
    and check the decoded energy matches the value's popcount.

    For value k at quad 0, lines {i: bit i of (v,w,x,y)} get ±1; total
    decoded energy scales with popcount.  A wrong codeword desyncs the
    granule (libav discards it or decodes junk) — visible immediately."""
    results = {}
    for k in range(16):
        v, w, x, y = (k >> 3) & 1, (k >> 2) & 1, (k >> 1) & 1, k & 1
        signs = tuple(0 for _ in range(v + w + x + y))
        frames = b"".join(
            build_frame([[(v, w, x, y, signs)], [(0, 0, 0, 0, ())]],
                        count1table=table)
            for _ in range(6))
        try:
            pcm, sr = oracle_decode(frames)
        except RuntimeError:
            results[k] = None
            continue
        results[k] = float(np.sum(pcm ** 2)) if len(pcm) else 0.0
    return results


if __name__ == "__main__":
    for table in (0, 1):
        res = probe_count1_mapping(table)
        print(f"--- count1 table {'A' if table == 0 else 'B'} ---")
        for k, v in res.items():
            pc = bin(k).count("1")
            print(f"value {k:2d} popcount {pc}: energy={v}")
