"""Aggregate a tools/trace_decode.py hlo_stats dump into a decode-step
decomposition table (round-5 verdict item 4: attribute the int4 roofline
residual).

Reads the raw hlo_stats JSON (as captured in tools/r5/trace_*.txt or a
fresh /tmp/decode_hlo_stats.out), buckets every op by its source location /
HLO category into serving-relevant components, and prints per-step
microseconds (the trace runs `--steps` decode steps; occurrences divide
out).

Run:  python tools/analyze_trace.py tools/r5/trace_int4_kvq.txt --steps 64
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict


def load_rows(path: str):
    text = open(path).read()
    start = text.find('{\n "cols"')
    if start < 0:
        start = text.find('{"cols"')
    if start < 0:
        raise SystemExit(f"no hlo_stats JSON found in {path}")
    doc = json.loads(text[start:], strict=False)  # source-info cells embed \n
    cols = [c["id"] for c in doc["cols"]]
    rows = []
    for r in doc["rows"]:
        rows.append({cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])})
    return rows


SOURCE_BUCKETS = [
    # (bucket, regex over source locations — highest-priority attribution)
    ("int4 weight GEMV (s4 matmul)", r"int4_matmul\.py"),
    ("int8 weight GEMV", r"int8_matmul\.py|ops/quant\.py"),
    ("attention QK/AV + softmax", r"ops/modules\.py:(2[4-9]\d|3[0-2]\d)|"
                                  r"models/dia\.py:(6[5-9]\d|7[0-1]\d)"),
    ("RoPE/norm/embed/logits", r"ops/modules\.py:(1?\d\d?|2[0-3]\d)$|"
                               r"ops/modules\.py:(1?\d\d|2[0-3]\d):"),
    ("sampling", r"sampling\.py"),
]
EXPR_BUCKETS = [
    ("self-attn cache update", r"dynamic-update-slice|dynamic_update_slice"),
    ("attention QK/AV + softmax", r"bngts|btngh|softmax|reduce.*max|exponential"),
    ("sampling", r"sort|top_k|cumsum|categorical|iota"),
    ("copies / converts / tuples", r"copy|tuple|bitcast|convert|select|broadcast"),
]


def bucket_of(row) -> str:
    src = str(row.get("source_info") or "")
    for name, pat in SOURCE_BUCKETS:
        if re.search(pat, src):
            return name
    blob = " ".join(str(row.get(k) or "") for k in
                    ("hlo_op_expression", "tf_op_name", "hlo_op_name", "category"))
    for name, pat in EXPR_BUCKETS:
        if re.search(pat, blob, re.IGNORECASE):
            return name
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--steps", type=int, default=64,
                   help="decode steps the trace ran (trace_decode --steps)")
    p.add_argument("--top", type=int, default=12,
                   help="also print the top-N individual ops")
    args = p.parse_args()

    rows = load_rows(args.path)
    agg = defaultdict(float)
    total = 0.0
    hbm = 0.0
    for r in rows:
        t = float(r.get("total_self_time") or 0.0)
        agg[bucket_of(r)] += t
        total += t
        try:
            hbm += float(r.get("bytes_accessed") or 0.0)
        except (TypeError, ValueError):
            pass

    print(f"# {args.path}: {len(rows)} ops, total self time "
          f"{total/1000:.2f} ms over {args.steps} steps "
          f"=> {total/args.steps:.1f} us/step")
    print(f"{'component':<34}{'us/step':>9}{'share':>8}")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{name:<34}{t/args.steps:>9.1f}{t/total:>7.1%}")

    print("\n# top individual ops")
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    for r in rows[: args.top]:
        t = float(r.get("total_self_time") or 0)
        src = str(r.get("source_info") or "")
        m = re.search(r"([\w/]+\.py:\d+)", src)
        srcs = m.group(1) if m else (str(r.get("tf_op_name") or ""))[:60]
        occ = r.get("occurrences")
        print(f"{t/args.steps:>8.1f} us/step  x{occ:<6} {r.get('category'):<22}"
              f" {srcs}")


if __name__ == "__main__":
    main()
