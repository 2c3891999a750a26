"""Isolate-time registry queries with the noop sink (guide §1.1/§1.4).

Times each named query's COMPUTATION (noop write — materializes every
column of every row, no sink cost, no driver collect) after one
untimed warm-up repeat, best of N.  Collections the query reads are
built by the first (untimed) repeat via the entry_queries cache, so
the recorded number is the warm query itself — the same convention as
bench.py.

Usage: python tools/time_query.py [-n N] [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from zcollection_spark import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        # untimed warm-up: builds cached collections, JIT, page cache
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"\n{name}: {out[name]} s", flush=True)
    print("\n" + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
