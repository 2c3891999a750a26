"""One-command sf1 round ritual (the r7 verdict ask): regenerate the
synthetic 10× scale point, run the FULL oracle gate on it, bench it,
and guard the result against the recorded sf1 curve — exit 0 only when
every step is green.

The scaled data is untracked by design (it is derived, large, and
regenerable in ~1 min), so each round re-synthesizes it; determinism in
``make_scale.py`` means a regenerated sf1 is bit-identical round over
round for the same source and factor.

Usage::

    python tools/scale_gate.py                 # regen + oracle + bench
    python tools/scale_gate.py --skip-regen    # reuse existing .scale/sf1
    python tools/scale_gate.py --skip-bench    # oracle gate only
    python tools/scale_gate.py --queries dedup_simhash pricing_summary

On a green bench the committed ``BENCH_sf1.json`` is refreshed with the
fresh run (it doubles as next round's anchor); a guard breach leaves it
untouched and exits nonzero.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCALE_DIR = REPO / ".scale" / "sf1"
SF1_BENCH = REPO / "BENCH_sf1.json"


def run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print(f"\n=== {' '.join(map(str, cmd))}", flush=True)
    return subprocess.run([str(c) for c in cmd], **kw)


def _parse_headline(stdout: str) -> str | None:
    """Last stdout line iff it parses as a bench headline dict — a
    0-exit bench with empty or non-JSON output must fail the gate, not
    IndexError or poison BENCH_sf1.json."""
    lines = stdout.strip().splitlines()
    if not lines:
        return None
    candidate = lines[-1]
    try:
        parsed = json.loads(candidate)
    except ValueError:
        return None
    return candidate if isinstance(parsed, dict) and "value" in parsed \
        else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skip-regen", action="store_true",
                    help="reuse an existing .scale/sf1")
    ap.add_argument("--skip-bench", action="store_true",
                    help="oracle gate only")
    ap.add_argument("--queries", nargs="*", default=[],
                    help="restrict the oracle gate to these entries")
    ap.add_argument("--max-ratio", type=float, default=2.0)
    args = ap.parse_args()

    if args.skip_regen and not SCALE_DIR.exists():
        print(f"--skip-regen but {SCALE_DIR} is absent", file=sys.stderr)
        return 2
    if not args.skip_regen:
        rc = run([sys.executable, REPO / "tools" / "make_scale.py",
                  "--src", args.src, "--factor", str(args.factor),
                  "--out", SCALE_DIR]).returncode
        if rc:
            print("FAIL: make_scale", file=sys.stderr)
            return rc

    rc = run([sys.executable, REPO / "tools" / "check_oracle.py",
              SCALE_DIR, *args.queries]).returncode
    if rc:
        print("FAIL: sf1 oracle gate", file=sys.stderr)
        return rc
    print("sf1 oracle gate: green")

    if args.skip_bench:
        return 0

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=str(SCALE_DIR))
    proc = run([sys.executable, REPO / "bench.py"], env=env,
               capture_output=True, text=True)
    if proc.returncode:
        sys.stderr.write(proc.stderr[-2000:])
        print("FAIL: bench at sf1", file=sys.stderr)
        return proc.returncode
    headline = _parse_headline(proc.stdout)
    if headline is None:
        sys.stderr.write(proc.stdout[-2000:])
        print("FAIL: bench at sf1 printed no JSON headline",
              file=sys.stderr)
        return 1
    fresh = REPO / ".scale" / "BENCH_sf1_fresh.json"
    fresh.write_text(headline + "\n")
    print(headline[:200] + (" ..." if len(headline) > 200 else ""))

    if SF1_BENCH.exists():
        rc = run([sys.executable, REPO / "tools" / "bench_guard.py",
                  fresh, "--anchor", SF1_BENCH,
                  "--max-ratio", str(args.max_ratio)]).returncode
        if rc:
            print("FAIL: sf1 bench guard (BENCH_sf1.json left "
                  "untouched)", file=sys.stderr)
            return rc
    SF1_BENCH.write_text(headline + "\n")
    print(f"refreshed {SF1_BENCH.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
