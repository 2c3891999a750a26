"""Interval (point-in-range) join via grid bucketing — no pair explosion.

Naive point-in-interval joins plan as BroadcastNestedLoopJoin (small
side) or a cartesian filter (both big) — O(n*m) at scale.  This operator
uses the classic grid trick: pick a bucket width, explode each interval
into the buckets it covers (``F.sequence``), bucket each point once,
then **equi-join on (keys..., bucket)** and post-filter the exact range.
A point lives in exactly one bucket, so a (point, interval) pair meets
at most once — no dedup pass needed.

Cost: one shuffle on (keys, bucket) + interval fan-out of
``len(interval)/bucket_width`` rows.  Choose ``bucket`` near the median
interval length: fan-out stays O(1) per interval while each bucket cell
holds few candidates.  Skewed cells are AQE-splittable because the join
is a plain equi-join.
"""

from __future__ import annotations

from typing import Sequence as Seq

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__iv_bucket"


def _numeric(col: Column) -> Column:
    # timestamps become epoch seconds; numerics pass through
    return col.cast("double")


def estimate_bucket(intervals: DataFrame, start: str, end: str) -> float:
    """Median interval length (one tiny aggregate) — the sweet-spot grid
    width: fan-out stays ~O(1) per interval while cells hold few
    candidates."""
    med = (intervals
           .select((_numeric(F.col(end)) - _numeric(F.col(start)))
                   .alias("len"))
           .agg(F.percentile_approx("len", 0.5).alias("m"))
           .first()["m"])
    return float(med) if med and med > 0 else 3600.0


def interval_join(points: DataFrame, intervals: DataFrame, *, on: str,
                  start: str, end: str, by: str | Seq[str] = (),
                  bucket: float | None = 3600.0,
                  how: str = "inner") -> DataFrame:
    """Join each point row to every interval row containing it.

    Args:
        on: point column (timestamp or numeric).
        start/end: interval bound columns on ``intervals`` (inclusive).
        by: optional equality key(s) present on both sides.
        bucket: grid width — seconds for timestamps, plain units for
            numerics.  Near the median interval length is optimal;
            ``None`` estimates it from the data (:func:`estimate_bucket`).
        how: ``inner`` or ``left`` (keep pointless-interval points with
            null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")
    if bucket is None:
        bucket = estimate_bucket(intervals, start, end)
    by = [by] if isinstance(by, str) else list(by)
    if _BUCKET in points.columns or _BUCKET in intervals.columns:
        raise ValueError(f"reserved column name {_BUCKET!r}")
    overlap = [c for c in intervals.columns
               if c in points.columns and c not in by]
    if overlap:
        raise ValueError(f"rename overlapping interval columns {overlap}")

    p = points.withColumn(
        _BUCKET, F.floor(_numeric(F.col(on)) / F.lit(bucket)))
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(
            F.floor(_numeric(F.col(start)) / F.lit(bucket)),
            F.floor(_numeric(F.col(end)) / F.lit(bucket)))))
    cond = F.lit(True)
    for k in by:
        cond = cond & (p[k] == iv[k])
    cond = cond & (p[_BUCKET] == iv[_BUCKET]) \
        & (p[on] >= iv[start]) & (p[on] <= iv[end])
    out_cols = [p[c] for c in points.columns] + \
        [iv[c] for c in intervals.columns if c not in by]
    return p.join(iv, on=cond, how=how).select(*out_cols)
