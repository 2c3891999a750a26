"""Merge strategies — the reference's upsert family as DataFrame programs.

Re-expresses ``/root/reference/zcollection/collection/merge.py``.  The
reference invokes a ``MergeCallable`` once per colliding partition with both
sides materialized in driver memory; here each strategy is ONE distributed
DataFrame program over *all* colliding partitions at once, with the
per-partition semantics recovered by grouping/joining on the partition-key
columns.  That keeps the merge shuffle-parallel (no per-partition driver
loop) and broadcast-friendly: the inserted batch is typically small relative
to the collection, so its per-partition bounds / axis sets are broadcast.

Signature: ``fn(existing, inserted, *, axis, keys) -> DataFrame`` where both
frames carry the partition-key columns.  String aliases resolved by
:func:`resolve_merge` (``merge.py:424-462``; ``None`` → replace).
"""

from __future__ import annotations

from typing import Callable, Protocol

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MergeCallable(Protocol):
    def __call__(self, existing: DataFrame, inserted: DataFrame, *,
                 axis: str, keys: tuple[str, ...]) -> DataFrame: ...


def _union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Outer-union: one-sided variables pass through as nulls
    (the reference's ``_concat_along``, ``merge.py:329-361``)."""
    return a.unionByName(b, allowMissingColumns=True)


def replace(existing: DataFrame, inserted: DataFrame, *, axis: str,
            keys: tuple[str, ...]) -> DataFrame:
    """Inserted wins outright (``merge.py:87-106``)."""
    return inserted


def concat(existing: DataFrame, inserted: DataFrame, *, axis: str,
           keys: tuple[str, ...]) -> DataFrame:
    """Append after existing; no dedup, no sort (``merge.py:109-129``)."""
    return _union(existing, inserted)


def time_series(existing: DataFrame, inserted: DataFrame, *, axis: str,
                keys: tuple[str, ...]) -> DataFrame:
    """Drop existing rows with ``axis ∈ [inserted.min, inserted.max]``
    *per partition*, then concat (``merge.py:132-186``).

    The window bounds are the per-partition min/max of the inserted slice —
    computed with a tiny groupBy and broadcast into a left join, so existing
    data streams through one scan with no driver round-trip.
    """
    bounds = inserted.groupBy(*keys).agg(
        F.min(axis).alias("__lo"), F.max(axis).alias("__hi"))
    kept = (existing
            .join(F.broadcast(bounds), on=list(keys), how="left")
            .where(F.col("__lo").isNull()
                   | (F.col(axis) < F.col("__lo"))
                   | (F.col(axis) > F.col("__hi")))
            .drop("__lo", "__hi"))
    return _union(kept, inserted)


def _axis_distance(left: Column, right: Column, dtype: T.DataType) -> Column:
    """|left - right| in axis units (seconds for timestamps)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.abs(left.cast("double") - right.cast("double"))
    return F.abs(left - right)


def upsert(existing: DataFrame, inserted: DataFrame, *, axis: str,
           keys: tuple[str, ...], tolerance: float | None = None
           ) -> DataFrame:
    """Keep existing rows whose axis value has no match in the inserted
    slice of the same partition; then concat (``merge.py:189-279``).

    Exact mode: a left-anti join on ``keys + axis`` (equal axis ⇒ same
    partition, so this is exactly the reference's per-partition
    ``numpy.isin``; no broadcast hint — the batch scales with the
    insert, AQE picks the side).  Tolerance mode: an existing row is
    dropped when ANY inserted axis value in the same partition lies
    within ``tolerance`` — equivalent to the reference's
    nearest-within-tolerance ``searchsorted`` check (``merge.py:262-272``:
    the nearest value is within tolerance iff any value is).  Expressed
    as a GRID anti-join: bucket width = tolerance, each inserted value
    fans out to its bucket ±1, the anti-join is an equi-join on
    ``(keys, bucket)`` with the exact distance filter in the condition —
    a match within tolerance is always in an adjacent bucket, and the
    plan stays a shuffled anti-join at any batch size (no forced
    broadcast, no nested loop).
    """
    # the axis may itself BE a partition key (Sequence partitioning on
    # the axis column): dedupe so the join key list stays unambiguous
    on_cols = list(dict.fromkeys([*keys, axis]))
    ins_axis = inserted.select(*on_cols).distinct()
    if tolerance is None or float(tolerance) == 0.0:
        # tolerance 0 == exact equality (searchsorted nearest within 0)
        kept = existing.join(ins_axis, on=on_cols, how="left_anti")
    else:
        dtype = existing.schema[axis].dataType
        tol = float(tolerance)

        def numeric(col: Column) -> Column:
            return col.cast("double") if isinstance(
                dtype, (T.TimestampType, T.TimestampNTZType)) else col

        e_bucket = F.floor(numeric(existing[axis]) / F.lit(tol))
        ins_bucket = F.floor(numeric(F.col("__ins_axis")) / F.lit(tol))
        # keep the key columns intact when the axis is one of them
        aliased = (ins_axis.withColumn("__ins_axis", F.col(axis))
                   if axis in keys
                   else ins_axis.withColumnRenamed(axis, "__ins_axis"))
        fanned = (aliased
                  .withColumn("__bucket", F.explode(F.transform(
                      F.array(F.lit(-1), F.lit(0), F.lit(1)),
                      lambda d: d + ins_bucket))))
        cond = e_bucket == fanned["__bucket"]
        for key in keys:
            cond = cond & (existing[key] == fanned[key])
        cond = cond & (_axis_distance(existing[axis],
                                      fanned["__ins_axis"],
                                      dtype) <= F.lit(tol))
        kept = existing.join(fanned, on=cond, how="left_anti")
    return _union(kept, inserted)


def upsert_within(tolerance: float) -> MergeCallable:
    """Factory baking a tolerance into :func:`upsert`
    (``merge.py:282-323`` — string aliases can't carry arguments)."""
    def merge(existing: DataFrame, inserted: DataFrame, *, axis: str,
              keys: tuple[str, ...]) -> DataFrame:
        return upsert(existing, inserted, axis=axis, keys=keys,
                      tolerance=tolerance)
    merge.__name__ = f"upsert_within({tolerance})"
    return merge


_ALIASES: dict[str, MergeCallable] = {
    "replace": replace, "concat": concat, "time_series": time_series,
    "upsert": upsert,
}


def resolve_merge(merge: str | MergeCallable | None) -> MergeCallable:
    """``None`` → replace; strings resolved; callables passed through
    (``merge.py:424-462``)."""
    if merge is None:
        return replace
    if callable(merge):
        return merge
    try:
        return _ALIASES[merge]
    except KeyError:
        raise ValueError(
            f"unknown merge strategy {merge!r}; one of {sorted(_ALIASES)} "
            f"or a callable") from None
