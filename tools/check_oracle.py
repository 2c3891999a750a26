"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, comparing row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name, values
stringified with float rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from zcollection_spark import get_spark  # noqa: E402
from zcollection_spark.data import TABLES  # noqa: E402


def norm_value(v) -> str:
    # STRICT mode: no normalization beyond type-faithful stringification.
    # The driver's hasher cannot reconcile representation differences
    # (DuckDB DECIMAL/HUGEINT vs Spark long/double), so neither do we:
    # a query only passes here if its final types stringify identically
    # on both engines. Keep final projections BIGINT/DOUBLE on both sides.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return f"{type(v).__name__}:{v}"


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_value(row[i]) for i in order) for row in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return digest


def say(msg: str) -> None:
    # Status lines start on a fresh line and flush immediately: Spark's
    # console progress bar emits carriage-return frames that otherwise
    # glue onto our output, breaking `grep -c '^OK'` (this tool is the
    # local correctness gate — its output must be robustly greppable).
    sys.stdout.write("\n" + msg + "\n")
    sys.stdout.flush()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql(sf_dir)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            say(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            say(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows) "
                f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as exc:
            say(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        # Driver-strict final-type gate: DuckDB DECIMAL/HUGEINT outputs (and
        # Spark decimal outputs) fail the driver's hasher even when values
        # are numerically equal — its fetch path surfaces them with a
        # different representation. Fail them here before hashing.
        try:
            dtypes = con.execute(
                f"DESCRIBE ({oracles[name]})").fetchall()
            bad_duck = [f"{r[0]}:{r[1]}" for r in dtypes
                        if "DECIMAL" in r[1] or "HUGEINT" in r[1]]
            if bad_duck:
                problems.append(f"oracle DECIMAL/HUGEINT cols {bad_duck}")
        except Exception:
            pass
        bad_spark = [f"{c}:{t}" for c, t in sdf.dtypes
                     if t.startswith("decimal")]
        if bad_spark:
            problems.append(f"spark decimal cols {bad_spark}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                sset = set("|".join(norm_value(r[i]) for i in
                           sorted(range(len(scols)),
                                  key=lambda i: scols[i])) for r in srows)
                dset = set("|".join(norm_value(r[i]) for i in
                           sorted(range(len(dcols)),
                                  key=lambda i: dcols[i])) for r in drows)
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                problems.append(f"spark-only={only_s} duck-only={only_d}")
        status = "OK  " if not problems else "FAIL"
        say(f"{status} {name}: {len(srows)} rows "
            f"[{time.time()-t0:.1f}s]"
            + ("" if not problems else " :: " + "; ".join(problems)))
        if problems:
            failures.append(name)
    say(f"{len(failures)} failures" + (f": {failures}" if failures
                                       else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
