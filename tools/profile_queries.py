"""Profile the read-path scenarios — parity with the reference's
``scripts/profile_queries.py:211-238`` (pyinstrument there, cProfile
here; same four scenario shapes: full query, one partition, variable
subset, first-three partitions).

Usage::

    python tools/profile_queries.py [sf_dir] [scenario ...]

Prints per-scenario wall time and the top driver-side functions by
cumulative time.  Executor-side (JVM + Python-worker) time is invisible
to cProfile — for plan-level analysis use ``.explain("formatted")`` or
the Spark UI; this tool is for catching DRIVER-side regressions
(listing, catalog, planning loops), which are exactly the parts that
scale with partition count rather than data size.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zcollection_spark as zc  # noqa: E402
from zcollection_spark.data import load_table  # noqa: E402
from zcollection_spark.schema import infer_schema  # noqa: E402


def scenarios(coll):
    return {
        "query_full": lambda: coll.query().count(),
        "query_one_partition": lambda: coll.query(
            filters="year == 2024 and month == 1 and day == 5").count(),
        "query_variable_subset": lambda: coll.query(
            variables=["event_id", "value"]).count(),
        "query_first_three_partitions": lambda: coll.query(
            filters="day <= 3").count(),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/testdata/sf0.001"
    wanted = set(sys.argv[2:])
    spark = zc.get_spark("zcs-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="zcs_prof_")
    events = load_table(spark, sf_dir, "events")
    coll = zc.create_collection(
        spark, f"{tmp}/events",
        schema=infer_schema(events.schema, axis="ts"),
        axis="ts", partitioning=zc.Date(("ts",), resolution="D"))
    coll.insert(events)

    for name, fn in scenarios(coll).items():
        if wanted and name not in wanted:
            continue
        fn()  # warm (JVM+plan caches out of the profile)
        profiler = cProfile.Profile()
        t0 = time.time()
        profiler.enable()
        fn()
        profiler.disable()
        elapsed = time.time() - t0
        out = io.StringIO()
        stats = pstats.Stats(profiler, stream=out)
        stats.sort_stats("cumulative").print_stats(8)
        print(f"== {name}: {elapsed:.3f}s ==")
        body = [ln for ln in out.getvalue().splitlines()
                if ln.strip()][4:12]
        print("\n".join(body))
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
