"""Zone-map statistics collection, shared by both storage layouts.

One map-side-combined aggregation over the DataFrame being written
produces ``{relpath: {col: [min, max, null_count]}}`` — committed with
the publish (staging intent → catalog PUT) and consumed by
``query(where=...)``'s conservative partition skipping
(``partitioning/zonemap.py``).

Correctness invariants (pruning must NEVER be a correctness boundary):

* **NaN poisoning** — Spark's aggregate ordering ranks NaN above every
  number, so a raw ``F.max`` over a float column containing NaN yields
  ``hi = NaN``; Python comparisons against NaN are all False, which
  would silently prune partitions that hold matching rows.  Floating
  columns therefore aggregate NaN-FREE bounds plus a NaN count, and any
  partition-column containing a NaN stores no bounds at all (evaluates
  as TOP — NaN compares greater than any number under Spark semantics,
  so such a partition may match ANY ordering predicate).
* **Decimal widening** — converting a Decimal bound to a JSON float
  rounds to nearest, which can round a min UP past the true min (or a
  max DOWN).  Bounds are widened outward (``math.nextafter`` toward
  ±inf) so the stored interval always contains the true one.
"""

from __future__ import annotations

import math
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark type names whose columns can hold NaN (F.isnan is only legal
#: on these).
_FLOATING = {"float", "double"}


def json_stat(value: Any, direction: str | None = None) -> Any:
    """JSON-encodable scalar for a zone-map bound.  Timestamps become
    ISO-8601 strings (which order lexicographically, so string literals
    in ``where`` compare correctly); numpy scalars unwrap; anything
    exotic falls back to ``str`` — orderings must stay consistent
    between what is stored and what the evaluator compares.

    ``direction`` ('lo' | 'hi' | None) widens lossy float conversions
    outward: a Decimal min rounds toward -inf, a max toward +inf, so an
    equality/boundary predicate on the extreme row can never be pruned
    by a rounded bound."""
    if value is None or isinstance(value, (int, float, str)):
        return value
    if hasattr(value, "item"):  # numpy scalar
        return json_stat(value.item(), direction)
    if hasattr(value, "isoformat"):  # datetime / date / pd.Timestamp
        return value.isoformat()
    try:
        f = float(value)  # Decimal and friends
    except (TypeError, ValueError):
        return str(value)
    if isinstance(value, Decimal) and Decimal(repr(f)) != value:
        if direction == "lo":
            f = math.nextafter(f, -math.inf)
        elif direction == "hi":
            f = math.nextafter(f, math.inf)
    return f


def collect_zone_stats(df: DataFrame, partitioning, stats_columns,
                       relpaths: list[str]) -> dict | None:
    """Per-partition ``{col: [min, max, nulls]}`` for the
    ``stats_columns`` present in ``df``.

    One extra aggregation job over the write's lineage — map-side
    partial aggregation keeps the shuffle at a few rows per partition,
    and the driver result is bounded by partition count (the same bound
    as the write path's distinct-keys collect).  If the lineage re-scan
    ever dominates at very large inserts, the drop-in alternative is a
    column-pruned re-read of the staged output."""
    cols = [c for c in stats_columns if c in df.columns]
    if not cols:
        return None
    keys = list(partitioning.keys)
    floating = {f.name for f in df.schema.fields
                if f.dataType.typeName() in _FLOATING}
    aggs = []
    for c in cols:
        val = (F.when(~F.isnan(c), F.col(c)) if c in floating
               else F.col(c))
        aggs += [F.min(val).alias(f"__lo_{c}"),
                 F.max(val).alias(f"__hi_{c}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")]
        if c in floating:
            aggs.append(F.sum(F.isnan(c).cast("long"))
                        .alias(f"__nan_{c}"))
    wanted = set(relpaths)
    out: dict = {}
    for row in df.groupBy(*keys).agg(*aggs).collect():
        rel = partitioning.encode({k: int(row[k]) for k in keys})
        if rel not in wanted:
            continue
        entry = {}
        for c in cols:
            if c in floating and int(row[f"__nan_{c}"] or 0):
                # NaN present: no orderable bounds exist for this
                # partition-column — store the TOP form (no pruning)
                entry[c] = [None, None, 0]
                continue
            entry[c] = [json_stat(row[f"__lo_{c}"], "lo"),
                        json_stat(row[f"__hi_{c}"], "hi"),
                        int(row[f"__nn_{c}"] or 0)]
        out[rel] = entry
    return out or None
