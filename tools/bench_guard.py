"""Bench regression guard: compare a bench run against BENCH_ANCHOR.json.

The driver's acceptance envelope is "within 2x of BASELINE at the same
scale factor" (BASELINE.md); the anchor is the first recorded green run.
Mirrors the reference's compare tool
(``/root/reference/zcollection/benches/__main__.py:13-64``: per-scenario
``ratio = baseline / current``, worst-ratio summary, nonzero exit on
breach).

Usage::

    python bench.py > /tmp/bench.json
    python tools/bench_guard.py /tmp/bench.json          # exit 1 on breach
    python tools/bench_guard.py /tmp/bench.json --max-ratio 2.0
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: scenarios under ~0.3 s in the anchor: dominated by Spark fixed costs,
#: a ratio there is noise, not a plan regression — gate on absolute slack
NOISE_FLOOR_SEC = 0.3


def compare(anchor: dict, current: dict, max_ratio: float) -> int:
    if anchor.get("sf") != current.get("sf"):
        print(f"sf mismatch: anchor {anchor.get('sf')} vs "
              f"current {current.get('sf')} — not comparable")
        return 2
    a_q, c_q = anchor["queries"], current["queries"]
    missing = sorted(set(a_q) - set(c_q))
    if missing:
        print(f"BREACH: scenarios dropped from bench: {missing}")
        return 1
    breaches = []
    worst = ("", 0.0)
    for name, base in sorted(a_q.items()):
        cur = c_q[name]
        floor = max(base, NOISE_FLOOR_SEC)
        ratio = cur / floor if floor else 0.0
        raw = cur / base if base else 0.0
        flag = ""
        if ratio > max_ratio:
            breaches.append(name)
            flag = "  <-- BREACH"
        if ratio > worst[1]:
            worst = (name, ratio)
        # sub-floor anchors gate on absolute slack, but the GATED ratio
        # must never read as a speedup when the raw one is a slowdown
        # (0.126s -> 0.181s used to print "x0.60"): show the raw ratio
        # and mark the row as floored
        shown = (f"x{raw:4.2f} (floored, gate x{ratio:4.2f})"
                 if base < NOISE_FLOOR_SEC else f"x{ratio:4.2f}")
        print(f"{name:28s} anchor {base:7.3f}s  now {cur:7.3f}s  "
              f"{shown}{flag}")
    total_ratio = current["value"] / anchor["value"]
    print(f"{'TOTAL':28s} anchor {anchor['value']:7.3f}s  "
          f"now {current['value']:7.3f}s  x{total_ratio:4.2f}")
    print(f"worst scenario: {worst[0]} x{worst[1]:.2f}")
    if total_ratio > max_ratio:
        breaches.append("TOTAL")
    if breaches:
        print(f"BREACH ({max_ratio:.1f}x envelope): {sorted(set(breaches))}")
        return 1
    print("OK: within envelope")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", help="path to a bench.py output line")
    ap.add_argument("--anchor", default=str(REPO / "BENCH_ANCHOR.json"))
    ap.add_argument("--max-ratio", type=float, default=2.0)
    args = ap.parse_args()
    anchor = json.loads(Path(args.anchor).read_text())
    text = Path(args.bench_json).read_text().strip()
    try:
        # whole-file JSON: raw headline object OR the driver wrapper
        # (BENCH_r0N.json — pretty-printed, headline under "parsed")
        current = json.loads(text)
    except json.JSONDecodeError:
        # bench.py stdout capture: headline is the last line
        current = json.loads(text.splitlines()[-1])
    if "parsed" in current and "queries" not in current:
        current = current["parsed"]
    return compare(anchor, current, args.max_ratio)


if __name__ == "__main__":
    sys.exit(main())
