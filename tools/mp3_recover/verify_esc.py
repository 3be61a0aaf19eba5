"""Verify/repair the escape-involving entries of the ESC tables (16, 24).

libav displays a decoded value of exactly 15 as 0 (sign+linbits still
consumed), which makes (15, y) and (x, 15) indistinguishable in the base
extraction when both visible halves are zero.  For ESC tables the escape
field reads `linbits` extra bits: setting them to 1 yields value 16 —
VISIBLE (16^(4/3) = 40.32) — so each candidate codeword can be probed for
which side actually escapes.  This pass re-probes every 15-involving
codeword of tables 16/24 and rewrites extracted_tables.json with the
corrected (x, y) assignment.

Bit order after a big-value codeword (ISO 2.4.3.4.6, as implemented and
backend-validated in mp3dec.cpp): x-linbits, x-sign, y-linbits, y-sign.
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

P16 = 16.0 ** (4.0 / 3.0)  # 40.3175


def esc_bits(x: int, y: int, table_lin: int, linval: int) -> str:
    """Post-codeword bits for pair (x,y) with the given linbits value for
    any escaped field; signs positive."""
    out = ""
    for v in (x, y):
        if v == 15:
            out += format(linval, f"0{table_lin}b")
        if v:
            out += "0"
    return out


def main():
    path = HERE / "extracted_tables.json"
    data = json.loads(path.read_text())
    resp = _model_responses()
    changed = False
    for tid in ("16", "24"):
        if tid not in data:
            continue
        lin = LINBITS[int(tid)]
        vals = {int(k): v for k, v in data[tid].items()}
        esc_entries = {xy: code for xy, code in vals.items()
                       if (xy >> 4) == 15 or (xy & 15) == 15}
        if not esc_entries:
            continue
        batch = ProbeBatch(resp)
        idxs = {}
        for xy, code in esc_entries.items():
            x, y = xy >> 4, xy & 15
            idxs[xy] = batch.add(build_bigvalue_frame(
                int(tid), code + esc_bits(x, y, lin, 1), 1))
        batch.run()
        fixes = {}
        for xy, code in esc_entries.items():
            x, y = xy >> 4, xy & 15
            a, resid, total = batch.amplitudes(idxs[xy])
            x_vis = abs(a[0] - P16) < 0.1
            y_vis = abs(a[1] - P16) < 0.1
            x_zero = abs(a[0]) < 0.1
            y_zero = abs(a[1]) < 0.1
            if x == 15 and y == 15:
                ok = x_vis and y_vis
                true_xy = xy
            elif x == 15:
                # claimed (15, y): escape on x -> line0 should be 16^(4/3)
                if x_vis:
                    true_xy = xy
                    ok = True
                elif y_zero and abs(a[1] - P16) < 0.1 or a[1] > 1.0:
                    ok = False
                    true_xy = None
                else:
                    ok = False
                    true_xy = None
            else:
                # claimed (x, 15)
                if y_vis:
                    true_xy = xy
                    ok = True
                else:
                    ok = False
                    true_xy = None
            if not ok:
                # re-infer: which line carries 16^(4/3)?
                other = ((15 << 4) | x) if y == 15 else ((y << 4) | 15)
                if x_vis and not y_vis:
                    inferred = (15 << 4) | (xy & 15 if y != 15 else x)
                elif y_vis and not x_vis:
                    inferred = ((xy >> 4) if x != 15 else y) << 4 | 15
                else:
                    print(f"table {tid} code {code} claimed ({x},{y}): "
                          f"amps {np.round(a[:2],2)} — UNRESOLVED")
                    continue
                print(f"table {tid} code {code}: claimed ({x},{y}) -> "
                      f"fixed to ({inferred>>4},{inferred&15})")
                fixes[xy] = (code, inferred)
                _ = other
        for old_xy, (code, new_xy) in fixes.items():
            # swap: the code moves to new_xy; whatever code sat at new_xy
            # (if part of the same confusion) moves in the counterpart fix
            vals.pop(old_xy, None)
            vals[new_xy] = code
            changed = True
        data[tid] = {str(k): v for k, v in sorted(vals.items())}
        n_ok = sum(1 for xy in esc_entries if xy not in fixes)
        print(f"table {tid}: {n_ok}/{len(esc_entries)} escape entries "
              f"confirmed, {len(fixes)} fixed")
    if changed:
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
        print("rewrote", path)
    else:
        print("no changes")


if __name__ == "__main__":
    main()
