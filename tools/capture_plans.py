"""Capture ``explain("formatted")`` for every registry query.

Writes ``plans/<tag>/<query>_<suffix>.txt`` for each ``queries()``
entry (or the subset named on the command line) — the optimization
round's plan evidence (guide §1: measure first; §7.2: read the plan).

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/capture_plans.py r16 before /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from zcollection_spark import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            # _sc variant exists on connect only; local DataFrame has
            # _jdf.queryExecution().explainString
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            failures.append(name)
            plan = "CAPTURE FAILED\n" + traceback.format_exc()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"captured {name}")
    spark.stop()
    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
