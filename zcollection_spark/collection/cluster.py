"""Multi-column Z-order clustering expression for the write path.

``cluster_by=[a, b]`` with the default ``cluster_mode="range"`` sorts
lexicographically — row groups become tight on ``a`` but the trailing
columns span their full range inside every leading-column run, so a
predicate on ``b`` alone prunes nothing.  ``cluster_mode="zorder"``
sorts by a space-filling Z-curve instead: each column is bucketed into
``2^B`` quantile-free bins against the WRITE BATCH's min/max (exactly
the data the files will hold, so the curve is balanced for them by
construction — the same trick Delta's OPTIMIZE ZORDER plays with
range-partition ids, without the extra global sort), and the bucket
bits are interleaved into one long.  Sorting by that long gives every
row group a bounded extent in EVERY clustered column, so parquet
row-group pruning works for predicates on any of them.

All JVM expressions (casts, shifts, bitwise ops) — whole-stage
codegen'd, no Python in the write path beyond collecting 2·n bound
scalars from one aggregate job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: max interleaved bits — a bigint sign bit must stay clear
_MAX_TOTAL_BITS = 63

#: per-column bucket resolution cap; 16 bits = 65 536 bins is far past
#: row-group granularity at any realistic file count
_MAX_COL_BITS = 16


def batch_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """(min, max) per column over the write batch, as doubles — ONE
    aggregate job, 2·n scalars to the driver."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_column(cols: list[str], bounds: dict[str, tuple]) -> Column:
    """The interleaved Z-value for ``cols`` given per-column bounds.

    Nulls and degenerate (constant / unbounded) columns land in bucket
    0 — they cluster together, which is exactly what a scan wants.
    """
    n = len(cols)
    bits = min(_MAX_COL_BITS, _MAX_TOTAL_BITS // n)
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = bounds[c]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = ((F.col(c).cast("double") - F.lit(float(mn)))
                  / F.lit(float(mx - mn)) * F.lit(float(top)))
        b = F.floor(scaled).cast("long")
        b = F.greatest(F.lit(0), F.least(F.lit(top), b))
        buckets.append(F.coalesce(b, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
