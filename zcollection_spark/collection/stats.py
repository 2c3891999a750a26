"""Zone-map statistics collection, shared by both storage layouts.

One map-side-combined aggregation over the DataFrame being written
produces ``{relpath: {col: [min, max, null_count]}}`` — committed with
the publish (staging intent → catalog PUT) and consumed by
``query(where=...)``'s conservative partition skipping
(``partitioning/zonemap.py``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_stat(value: Any) -> Any:
    """JSON-encodable scalar for a zone-map bound.  Timestamps become
    ISO-8601 strings (which order lexicographically, so string literals
    in ``where`` compare correctly); numpy scalars unwrap; anything
    exotic falls back to ``str`` — orderings must stay consistent
    between what is stored and what the evaluator compares."""
    if value is None or isinstance(value, (int, float, str)):
        return value
    if hasattr(value, "item"):  # numpy scalar
        return json_stat(value.item())
    if hasattr(value, "isoformat"):  # datetime / date / pd.Timestamp
        return value.isoformat()
    try:
        return float(value)  # Decimal and friends
    except (TypeError, ValueError):
        return str(value)


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
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"),
                 F.max(c).alias(f"__hi_{c}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")]
    wanted = set(relpaths)
    out: dict = {}
    for row in df.groupBy(*keys).agg(*aggs).collect():
        rel = partitioning.encode({k: int(row[k]) for k in keys})
        if rel not in wanted:
            continue
        out[rel] = {c: [json_stat(row[f"__lo_{c}"]),
                        json_stat(row[f"__hi_{c}"]),
                        int(row[f"__nn_{c}"] or 0)] for c in cols}
    return out or None
