"""Repair the value-15-involving entries of tables 13/15/16/24.

The base extraction ran at global_gain=210 (gain 1), where libavcodec's
escape-value path (l3_unscale — used for any decoded value >= 15)
UNDERFLOWS to zero, making (15,y) and (x,15) indistinguishable when the
other half is 0.  At global_gain=255 (gain 2^11.25) nothing underflows:
value 15 shows 15^(4/3)*2^11.25, escapes show (15+linval)^(4/3)*2^11.25.
This pass re-probes every 15-involving codeword at high gain, classifies
it unambiguously, and rewrites extracted_tables.json.  It also assigns
table 13's colliding pair — the base walk found two codewords that both
displayed as (15,0)-like; exactly one is (15,0) and the other (0,15).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
from extract_tables import (  # noqa: E402
    LINBITS,
    POW43,
    ProbeBatch,
    _model_responses,
    build_bigvalue_frame,
)

GAIN = 2.0 ** ((255 - 210) / 4.0)
# amplitudes for values 0..31 at gg=255
AMP = np.array([float(v) ** (4.0 / 3.0) for v in range(32)]) * GAIN


def probe_bits(x: int, y: int, lin: int) -> str:
    out = ""
    for v in (x, y):
        if v == 15 and lin:
            out += "0" * lin
        if v:
            out += "0"
    return out


def classify(a) -> tuple[int, int] | None:
    def m(v):
        k = int(np.argmin(np.abs(AMP[:16] - v)))
        return k if abs(AMP[k] - v) < 0.02 * max(AMP[k], GAIN) else None
    x, y = m(a[0]), m(a[1])
    if x is None or y is None:
        return None
    return x, y


def main():
    path = HERE / "extracted_tables.json"
    data = json.loads(path.read_text())
    resp = _model_responses()

    # candidate codewords to (re)classify per table: every entry whose
    # claimed value involves 15, plus table 13's known colliding codeword.
    todo: dict[str, list[str]] = {}
    for tid in ("13", "15", "16", "24"):
        if tid not in data:
            continue
        lst = [code for xy, code in data[tid].items()
               if (int(xy) >> 4) == 15 or (int(xy) & 15) == 15]
        todo[tid] = sorted(set(lst))
    todo.setdefault("13", [])
    for extra in ("000000010000", "0000000010011"):
        if extra not in todo["13"]:
            todo["13"].append(extra)

    for tid, codes in todo.items():
        if not codes:
            continue
        lin = LINBITS.get(int(tid), 0)
        batch = ProbeBatch(resp)
        idxs = {}
        for code in codes:
            # probe as each of the possible 15-shapes; the consumption
            # doesn't matter for classification (overrun tolerated), only
            # the visible amplitudes do — so one probe with generous
            # padding suffices: worst case (15,15) needs 2*(lin+1) bits
            pad = "0" * (2 * (lin + 1) + 2)
            idxs[code] = batch.add(
                build_bigvalue_frame(int(tid), code + pad, 1,
                                     global_gain=255))
        batch.run()
        vals = {int(k): v for k, v in data[tid].items()}
        code_to_val = {v: int(k) for k, v in data[tid].items()}
        fixed = 0
        for code in codes:
            a, resid, total = batch.amplitudes(idxs[code])
            got = classify(a)
            if got is None:
                print(f"table {tid} code {code}: UNCLASSIFIED a={np.round(a[:2],1)}")
                continue
            x, y = got
            new_xy = (x << 4) | y
            old_xy = code_to_val.get(code)
            if old_xy == new_xy:
                continue
            if old_xy is not None:
                vals.pop(old_xy, None)
            vals[new_xy] = code
            fixed += 1
            print(f"table {tid} code {code}: {old_xy if old_xy is None else (old_xy>>4, old_xy&15)} -> ({x},{y})")
        data[tid] = {str(k): v for k, v in sorted(vals.items())}
        missing = [(x, y) for x in range(16) for y in range(16)
                   if ((x << 4) | y) not in vals]
        print(f"table {tid}: {fixed} reassigned, {len(vals)} values, "
              f"missing {missing}")
    path.write_text(json.dumps(data, indent=1, sort_keys=True))
    print("rewrote", path)


if __name__ == "__main__":
    main()
