"""THE test gate: run the full suite in a few isolated pytest processes.

Why not one `pytest tests/`: a single session accumulates ~300+ XLA:CPU
compilations (plus the resident torch oracle), and the interpreter then
SEGFAULTS inside a later pjit compile — deterministically at
test_speculative.py::test_greedy_token_exact_with_voice_clone, the largest
program in the suite (reproduced rounds 4 and 5; the same file passes alone
in seconds).  The crash needs full-session accumulated compiler state, so
the structural fix is bounding accumulation: the suite runs as N sequential
pytest processes (round-robin over test files — deterministic), each well
under half the observed crash threshold.  One command, every test, honest
aggregate summary:

    python tools/run_tests.py            # full gate (~30 min on 1 CPU core)
    python tools/run_tests.py --shards 3 -- -k delay   # forward pytest args

Single modules can still be run directly (`pytest tests/test_x.py -q`).
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TESTS = REPO / "tests"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=3,
                    help="number of isolated pytest processes (default 3: "
                         "~110 tests each, far under the ~300-compile "
                         "single-session crash threshold)")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args forwarded to every pytest invocation "
                         "(prefix with --)")
    args = ap.parse_args(argv)

    files = sorted(TESTS.glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    totals = {"passed": 0, "failed": 0, "errors": 0, "skipped": 0}
    rcs = []
    t0 = time.time()
    for i in range(args.shards):
        shard = [str(f) for f in files[i::args.shards]]
        if not shard:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *shard, *args.pytest_args]
        print(f"--- shard {i + 1}/{args.shards}: {len(shard)} files ---",
              flush=True)
        proc = subprocess.run(cmd, cwd=REPO, text=True,
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        rcs.append(proc.returncode)
        # pytest summary line: "N passed, M skipped, K failed in S.SSs"
        for key, pat in (("passed", r"(\d+) passed"), ("failed", r"(\d+) failed"),
                         ("errors", r"(\d+) errors?"), ("skipped", r"(\d+) skipped")):
            m = re.findall(pat, proc.stdout)
            if m:
                totals[key] += int(m[-1])
        if proc.returncode not in (0, 5):
            # keep going: report EVERY shard's result, then fail at the end
            print(f"shard {i + 1} exited rc={proc.returncode}", flush=True)

    ok = all(rc in (0, 5) for rc in rcs) and totals["failed"] == 0 and totals["errors"] == 0
    print(f"=== gate {'GREEN' if ok else 'RED'}: "
          f"{totals['passed']} passed, {totals['skipped']} skipped, "
          f"{totals['failed']} failed, {totals['errors']} errors "
          f"across {len(rcs)} shards in {time.time() - t0:.0f}s ===")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
