"""As-of (nearest-temporal) join — a first-class operator.

The reference's only nearest-match surface is the tolerance upsert
(``/root/reference/zcollection/collection/merge.py:189-279``:
``searchsorted`` nearest-within-tolerance on the sorted axis).  This
module generalizes that to a standalone as-of join with pandas
``merge_asof`` semantics (backward / forward / nearest + tolerance),
built Spark-first:

Instead of a range join (which explodes into an O(n·m) interval overlap
or a BroadcastNestedLoopJoin), the two sides are **unioned and sorted
once**: tag each side, ``unionByName``, then one window pass per
direction carries the most recent right-side values onto every left row
(``last(..., ignorenulls=True)`` over rows-unbounded-preceding).  Cost =
ONE shuffle on ``by`` + a linear in-partition scan — the same plan shape
at 100 TB, no pair blow-up, AQE-skew-splittable.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_MATCH = "__asof_t"


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              by: str | Sequence[str] = (),
              tolerance=None, direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """Join each left row to the temporally closest right row.

    Args:
        on: ordering column present on both sides (timestamp or numeric).
        by: optional equality key(s) — matches are per-group.
        tolerance: max |left.on - right.on| for a match; a ``Column``
            interval expression (e.g. ``F.expr("INTERVAL 1 HOUR")``) or a
            numeric for numeric axes.  ``None`` = unbounded.
        direction: ``backward`` (latest right at-or-before left),
            ``forward`` (earliest right at-or-after), or ``nearest``.
        suffix: appended to right value columns that collide with left.

    Right value columns come back null where no match qualifies (left
    rows are always kept — this is a left as-of join).

    Scale note: with no ``by`` the window is GLOBAL — a single-task
    sort, fine for driver-sized data only.  At scale always pass a
    ``by`` key (the shuffle key), or pre-bucket time into coarse epochs
    and as-of within each.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    value_cols = [c for c in right.columns if c != on and c not in by]
    renames = {c: (c + suffix if c in left.columns else c)
               for c in value_cols}

    lhs = left
    for c in (_SIDE, _MATCH):
        if c in lhs.columns:
            raise ValueError(f"reserved column name {c!r} in left")

    rhs = right.select(
        *by, F.col(on).alias(on),
        *[F.col(c).alias(renames[c]) for c in value_cols])
    out_vals = [renames[c] for c in value_cols]

    # union with side tags; missing columns null-filled
    tagged_l = lhs.withColumn(_SIDE, F.lit(1))
    tagged_r = rhs.withColumn(_SIDE, F.lit(0)).withColumn(_MATCH, F.col(on))
    both = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    def carried(sort_side_first: bool, forward: bool) -> list[Column]:
        # right rows must sort before left rows at EQUAL timestamps so an
        # exact-time match is visible to the left row (merge_asof allows
        # exact matches in both directions)
        order = [F.col(on).desc() if forward else F.col(on).asc(),
                 F.col(_SIDE).asc() if sort_side_first
                 else F.col(_SIDE).desc()]
        w = (Window.partitionBy(*by) if by else Window.partitionBy()) \
            .orderBy(*order) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return [F.last(F.col(c), ignorenulls=True).over(w)
                for c in (*out_vals, _MATCH)]

    def delta_ok(matched: Column) -> Column:
        if tolerance is None:
            return matched.isNotNull()
        lo = F.col(on) - tolerance
        hi = F.col(on) + tolerance
        return matched.isNotNull() & matched.between(lo, hi)

    if direction in ("backward", "forward"):
        cols = carried(sort_side_first=True, forward=direction == "forward")
        projected = both.select(
            "*", *[c.alias(f"__c_{i}") for i, c in enumerate(cols)])
        matched = F.col(f"__c_{len(out_vals)}")
        keep = delta_ok(matched)
        result = (projected.where(F.col(_SIDE) == 1)
                  .select(*[F.when(keep, F.col(f"__c_{i}"))
                            .otherwise(F.lit(None)).alias(out_vals[i])
                            for i in range(len(out_vals))],
                          *left.columns))
        return result.select(*left.columns, *out_vals)

    # nearest: run both passes, keep the closer qualifying match
    back = carried(sort_side_first=True, forward=False)
    fwd = carried(sort_side_first=True, forward=True)
    n = len(out_vals)
    projected = both.select(
        "*",
        *[c.alias(f"__b_{i}") for i, c in enumerate(back)],
        *[c.alias(f"__f_{i}") for i, c in enumerate(fwd)])
    bt, ft = F.col(f"__b_{n}"), F.col(f"__f_{n}")
    b_ok, f_ok = delta_ok(bt), delta_ok(ft)
    b_delta = F.col(on).cast("double") - bt.cast("double")
    f_delta = ft.cast("double") - F.col(on).cast("double")
    use_back = b_ok & (~f_ok | (b_delta <= f_delta))
    picked = [F.when(use_back, F.col(f"__b_{i}"))
              .when(f_ok, F.col(f"__f_{i}"))
              .otherwise(F.lit(None)).alias(out_vals[i])
              for i in range(n)]
    return (projected.where(F.col(_SIDE) == 1)
            .select(*left.columns, *picked))
