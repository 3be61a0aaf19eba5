"""Extract the Layer-III big-value huffman tables from the libavcodec
oracle by prefix-tree walking (behavioral clean-room recovery).

For a candidate bit string s and table T we synthesize a frame with
big_values=1, table_select[0]=T, granule data = s + e zero bits, and
part2_3_length = len(s)+e.  libavcodec discards a granule whose
scalefactor+huffman read does not consume exactly part2_3_length bits, so:

  * if s is a complete codeword for pair (x, y), the probe with
    e = nnz(x,y) + linbits-consumption decodes cleanly and lines 0/1 of the
    spectrum carry x^(4/3), y^(4/3)  (signs positive, global_gain=210 ->
    gain 1), measured by projecting the frame's PCM onto the model
    responses (recovered synthesis window);
  * any other e (or a proper prefix s) yields silence.

The all-silent ambiguity for the (0,0) codeword is resolved with a second
pass: s + <known nonzero codeword> under big_values=2 lights lines 2/3 iff
s decoded as a complete pair first.

The walk starts at {"0","1"} and extends every string that is not (yet) a
codeword; for a complete prefix code this terminates with Kraft sum 1
(gen_tables.py enforces it).  Results go to extracted_tables.json.

Nothing is copied from any source: every codeword is measured from decode
behavior, exactly like a hardware engineer black-box-probing a reference
chip.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
from synth_frames import (  # noqa: E402
    FRAME_BYTES,
    HEADER,
    SIDE_BYTES,
    BitWriter,
    oracle_decode,
)

LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
           24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}
PROBE_GG = 189          # gain 2^(-21/4): value 15 -> 0.97, under the ~16.0
                        # fixed-point ceiling where libav zeroes a line
PROBE_GAIN = 2.0 ** ((PROBE_GG - 210) / 4.0)
POW43 = np.array([float(n) ** (4.0 / 3.0) for n in range(16)]) * PROBE_GAIN
ATOL = 0.02 * PROBE_GAIN


def build_bigvalue_frame(table: int, bits_g0: str, big_values: int,
                         global_gain: int = 210) -> bytes:
    side = BitWriter()
    side.write(0, 9)
    side.write(0, 5)
    side.write(0, 4)
    for g in range(2):
        nbits = len(bits_g0) if g == 0 else 0
        side.write(nbits, 12)          # part2_3_length
        side.write(big_values if g == 0 else 0, 9)
        side.write(global_gain, 8)     # 210 -> gain 1
        side.write(0, 4)               # scalefac_compress
        side.write(0, 1)               # window_switching
        for r in range(3):
            side.write(table, 5)       # table_select
        side.write(0, 4)               # region0_count
        side.write(0, 3)               # region1_count
        side.write(0, 1)               # preflag
        side.write(0, 1)               # scalefac_scale
        side.write(1, 1)               # count1table_select (B; unused)
    main = BitWriter()
    main.write_str(bits_g0)
    return (HEADER + side.tobytes(SIDE_BYTES)
            + main.tobytes(FRAME_BYTES - 4 - SIDE_BYTES))


# ---------------------------------------------------------------------------
# Model responses for lines 0..3 of an isolated frame (fresh decoder state).

def _model_responses() -> np.ndarray:
    from recover_window import model_coeffs_for_stream

    D = np.load(HERE / "recovered_window.npy")
    resp = []
    for line in range(4):
        A = model_coeffs_for_stream({0: (line, 0)}, 2)  # 2 frames of model
        resp.append((A @ D)[:1152])
    return np.stack(resp)  # [4, 1152]


class ProbeBatch:
    """Accumulates probe frames (each followed by a spacer frame so the
    synthesis FIFO drains), decodes once, then answers per-probe spectra."""

    def __init__(self, resp: np.ndarray):
        self.frames: list[bytes] = []
        self.resp = resp
        G = resp @ resp.T
        self.Ginv = np.linalg.inv(G + 1e-12 * np.eye(4))

    def add(self, frame: bytes) -> int:
        idx = len(self.frames)
        self.frames.append(frame)
        return idx

    def run(self):
        spacer = build_bigvalue_frame(1, "", 0)
        stream = b"".join(f + spacer for f in self.frames)
        pcm, sr = oracle_decode(stream)
        n_needed = len(self.frames) * 2304
        if len(pcm) < n_needed:
            pcm = np.pad(pcm, (0, n_needed - len(pcm)))
        self.pcm = pcm

    def amplitudes(self, idx: int):
        """Least-squares amplitudes of lines 0..3 + relative residual."""
        seg = self.pcm[idx * 2304: idx * 2304 + 1152]
        b = self.resp @ seg
        a = self.Ginv @ b
        recon = a @ self.resp
        resid = float(np.sum((seg - recon) ** 2))
        total = float(np.sum(seg ** 2))
        return a, resid, total


def classify_amp(a: np.ndarray, resid: float, total: float):
    """-> (x, y) if the spectrum is a clean positive pair at lines 0/1."""
    if total < 1e-9:
        return None  # silence
    if resid > 1e-4 * max(total, 1.0):
        return "junk"
    if abs(a[2]) > ATOL or abs(a[3]) > ATOL:
        return "junk"
    def match(v):
        k = int(np.argmin(np.abs(POW43 - v)))
        return k if abs(POW43[k] - v) < ATOL else None
    x, y = match(a[0]), match(a[1])
    if x is None or y is None:
        return "junk"
    return (x, y)


def _expect_e(x: int, y: int, linbits: int) -> int:
    e = (1 if x else 0) + (1 if y else 0)
    if linbits:
        e += (linbits if x == 15 else 0) + (linbits if y == 15 else 0)
    return e


def extract_table(table: int, resp: np.ndarray, max_len: int = 20):
    """Walk the prefix tree.  Until a nonzero codeword (the sentinel) is
    known, probes are single-pair (big_values=1); after that every probe is
    sentinel-anchored (big_values=2: candidate pair + sentinel pair), whose
    accept condition — clean lines 0/1 at quantized magnitudes AND lines
    2/3 exactly the sentinel — is unambiguous for codewords, prefixes, and
    the silent (0,0) codeword alike."""
    linbits = LINBITS.get(table, 0)
    e_range = range(0, 3 + 2 * linbits)
    codes: dict[str, tuple[int, int]] = {}
    sentinel: tuple[str, int, int] | None = None
    frontier = ["0", "1"]

    def run_level(level, use_sentinel):
        nonlocal sentinel
        batch = ProbeBatch(resp)
        probes = []
        for s in level:
            for e in e_range:
                if use_sentinel:
                    c, sx, sy = sentinel
                    bits = (s + "0" * e + c
                            + "0" * _expect_e(sx, sy, linbits))
                    idx = batch.add(build_bigvalue_frame(table, bits, 2, global_gain=PROBE_GG))
                else:
                    idx = batch.add(
                        build_bigvalue_frame(table, s + "0" * e, 1, global_gain=PROBE_GG))
                probes.append((s, e, idx))
        batch.run()
        resolved = {}
        for (s, e, idx) in probes:
            if s in resolved:
                continue
            a, resid, total = batch.amplitudes(idx)
            if use_sentinel:
                c, sx, sy = sentinel
                if total < 1e-9 or resid > 1e-4 * max(total, 1e-4):
                    continue
                if (abs(a[2] - POW43[sx]) > ATOL
                        or abs(a[3] - POW43[sy]) > ATOL):
                    continue
                def match(v):
                    k = int(np.argmin(np.abs(POW43 - v)))
                    return k if abs(POW43[k] - v) < ATOL else None
                x, y = match(a[0]), match(a[1])
                if x is None or y is None:
                    continue
                if e == _expect_e(x, y, linbits):
                    resolved[s] = (x, y)
            else:
                got = classify_amp(a, resid, total)
                if isinstance(got, tuple):
                    x, y = got
                    if (x or y) and e == _expect_e(x, y, linbits):
                        resolved[s] = (x, y)
        return resolved

    def sign_bits(x, y, bit):
        """Exact post-codeword bits for pair (x,y): linbits zeros then the
        given sign bit per nonzero field, x first."""
        out = ""
        for v in (x, y):
            if linbits and v == 15:
                out += "0" * linbits
            if v:
                out += bit
        return out

    def confirm(cands: dict[str, tuple[int, int]]):
        """Negative-sign confirmation: a true codeword for (x,y) decodes as
        exactly (-x,-y) when its sign bits are 1 — a prefix that borrowed
        padding zeros cannot reproduce that (its stolen bits shift)."""
        if not cands:
            return {}
        batch = ProbeBatch(resp)
        idxs = {}
        for s, (x, y) in cands.items():
            if x == 0 and y == 0:
                continue  # no sign bits; sentinel-anchored probe was strict
            bits = s + sign_bits(x, y, "1")
            if sentinel is not None:
                c, sx, sy = sentinel
                bits += c + sign_bits(sx, sy, "0")
                idxs[s] = batch.add(build_bigvalue_frame(table, bits, 2, global_gain=PROBE_GG))
            else:
                idxs[s] = batch.add(build_bigvalue_frame(table, bits, 1, global_gain=PROBE_GG))
        if not batch.frames:
            return dict(cands)
        batch.run()
        out = {}
        for s, (x, y) in cands.items():
            if x == 0 and y == 0:
                out[s] = (x, y)
                continue
            a, resid, total = batch.amplitudes(idxs[s])
            if total < 1e-9 or resid > 1e-4 * max(total, 1e-4):
                continue
            exs = -POW43[x] if x else 0.0
            eys = -POW43[y] if y else 0.0
            if abs(a[0] - exs) > ATOL or abs(a[1] - eys) > ATOL:
                continue
            if sentinel is not None:
                c, sx, sy = sentinel
                if (abs(a[2] - POW43[sx]) > ATOL
                        or abs(a[3] - POW43[sy]) > ATOL):
                    continue
            elif abs(a[2]) > 0.05 or abs(a[3]) > 0.05:
                continue
            out[s] = (x, y)
        return out

    import os
    debug = os.environ.get("MP3X_DEBUG") == "1"
    pending_presentinel: list[str] = []
    while frontier:
        use_sent = sentinel is not None
        if debug:
            print(f"  level: |frontier|={len(frontier)} depth<={max(len(s) for s in frontier)} "
                  f"codes={len(codes)} sentinel={sentinel}", flush=True)
        resolved = confirm(run_level(frontier, use_sent))
        next_frontier = []
        for s in frontier:
            if s in resolved:
                codes[s] = resolved[s]
                if sentinel is None:
                    x, y = resolved[s]
                    if x or y:
                        sentinel = (s, x, y)
            elif not use_sent:
                pending_presentinel.append(s)
            elif len(s) < max_len:
                next_frontier.extend((s + "0", s + "1"))
        if sentinel is not None and pending_presentinel:
            # re-probe everything deferred from the pre-sentinel phase
            next_frontier = pending_presentinel + next_frontier
            pending_presentinel = []
        elif sentinel is None and not next_frontier:
            # nothing resolved yet anywhere: extend the deferred strings,
            # KEEPING the parents — a silent parent may be the (0,0)
            # codeword, resolvable only once a sentinel exists
            next_frontier = pending_presentinel + [
                s + b for s in pending_presentinel
                for b in "01" if len(s) < max_len]
            pending_presentinel = []
        frontier = [s for s in next_frontier
                    if not any(s.startswith(c) for c in codes)]
    return codes


def main():
    tables = [int(t) for t in (sys.argv[1:] or
                               [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15,
                                16, 24])]
    resp = _model_responses()
    out_path = HERE / "extracted_tables.json"
    result = json.loads(out_path.read_text()) if out_path.exists() else {}
    for t in tables:
        codes = extract_table(t, resp)
        vals = {}
        for s, (x, y) in codes.items():
            vals[str((x << 4) | y)] = s
        from fractions import Fraction
        kraft = sum(Fraction(1, 2 ** len(s)) for s in codes)
        xs = max(x for (x, y) in codes.values()) + 1
        ys = max(y for (x, y) in codes.values()) + 1
        print(f"table {t}: {len(codes)} codewords, {xs}x{ys}, Kraft={kraft}")
        if kraft != 1 or len(codes) != xs * ys:
            print(f"  WARNING: table {t} incomplete — not saved")
            continue
        result[str(t)] = vals
        out_path.write_text(json.dumps(result, indent=1, sort_keys=True))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
