"""Parquet-backed secondary index: ``(key cols, _partition, _start, _stop)``.

Re-expresses ``/root/reference/zcollection/indexing/parquet.py:44`` for
Spark.  The index is one small parquet table of row-ranges per partition;
``build`` walks the collection with one ``applyInPandas`` pass (the shuffle
IS the partition walk), ``lookup`` filters the index (scalar = equality,
list/tuple/set = IN, AND-ed — ``parquet.py:150-195``), and ``query`` pushes
the matched ranges back into a pruned read as a broadcast range-join on
``(partition keys, _row_idx)`` — partitions with no matching range are never
read (listing-time pruning), and within read partitions only rows inside
the ranges survive.

``_start``/``_stop`` are half-open ``[start, stop)`` 0-based positions along
the partition axis order (the engine's persisted ``_row_idx``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .collection.collection import Collection, ROW_IDX
from .errors import IndexerError

RESERVED = ("_start", "_stop")


def ranges_for(pdf: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """Helper builder: one row per contiguous run of equal ``columns``
    values, with half-open ``[_start, _stop)`` row ranges.

    The analog of the reference's ``runs_from_inverse``
    (``partitioning/base.py:91-115``) applied at index-build time
    (``examples/ex_indexing.py:40-120``).  ``pdf`` must be sorted by
    ``_row_idx`` (Collection.map with ``keep_internal=True`` provides it).
    """
    pdf = pdf.sort_values(ROW_IDX).reset_index(drop=True)
    if len(pdf) == 0:
        return pd.DataFrame(columns=[*columns, "_start", "_stop"])
    change = (pdf[columns] != pdf[columns].shift()).any(axis=1)
    group_id = change.cumsum()
    out = []
    for _, group in pdf.groupby(group_id):
        first = group.iloc[0]
        out.append({**{c: first[c] for c in columns},
                    "_start": int(group[ROW_IDX].min()),
                    "_stop": int(group[ROW_IDX].max()) + 1})
    return pd.DataFrame(out)


class Indexer:
    """Secondary index stored as parquet at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._df: DataFrame | None = None

    # ------------------------------------------------------------------
    def build(self, collection: Collection, *,
              builder: Callable[[pd.DataFrame], pd.DataFrame],
              schema: T.StructType | str,
              filters: str | None = None,
              variables: Iterable[str] | None = None) -> DataFrame:
        """Walk partitions via ``collection.map`` and persist the index
        (``indexing/parquet.py:65-121``).

        ``builder(pdf) -> pdf`` emits index key columns plus
        ``_start``/``_stop``; ``schema`` declares those columns (WITHOUT the
        partition keys — they are appended automatically).
        """
        keys = list(collection.partitioning.keys)
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        for res in RESERVED:
            if res not in schema.fieldNames():
                schema = schema.add(res, T.LongType())

        def wrapper(pdf: pd.DataFrame) -> pd.DataFrame:
            key_vals = {k: pdf[k].iloc[0] for k in keys}
            out = builder(pdf)
            for k in keys:
                out[k] = key_vals[k]
            return out

        full_schema = T.StructType(list(schema.fields))
        base_df = collection._load(filters=filters, keep_internal=True)
        if base_df is None:
            raise IndexerError("no partitions matched the index build filter")
        for k in keys:
            full_schema = full_schema.add(base_df.schema[k])
        wanted = set(variables) if variables is not None else None
        if wanted is not None:
            keep = [c for c in base_df.columns
                    if c in wanted or c in keys or c == ROW_IDX]
            base_df = base_df.select(*keep)
        index_df = (base_df.groupBy(*keys)
                    .applyInPandas(wrapper, full_schema))
        index_df.write.mode("overwrite").parquet(self.path)
        self._df = None
        return self.read()

    # ------------------------------------------------------------------
    def read(self) -> DataFrame:
        """(Re)load the index table (``indexing/parquet.py:123-130``)."""
        if self._df is None:
            self._df = self.spark.read.parquet(self.path)
        return self._df

    def _filtered(self, collection: Collection,
                  predicates: dict[str, Any]) -> DataFrame:
        index = self.read()
        keys = set(collection.partitioning.keys)
        cond = F.lit(True)
        for name, value in predicates.items():
            if name not in index.columns:
                raise IndexerError(f"unknown index column {name!r}")
            if isinstance(value, (list, tuple, set, frozenset)):
                cond = cond & F.col(name).isin(*value)
            else:
                cond = cond & (F.col(name) == F.lit(value))
        return index.where(cond)

    def lookup(self, collection: Collection,
               **predicates: Any) -> dict[str, list[tuple[int, int]]]:
        """AND-ed predicates → ``{partition_relpath: [(start, stop), ...]}``
        (``indexing/parquet.py:150-195``)."""
        keys = list(collection.partitioning.keys)
        rows = (self._filtered(collection, predicates)
                .select(*keys, "_start", "_stop")
                .orderBy(*keys, "_start").collect())
        out: dict[str, list[tuple[int, int]]] = {}
        for row in rows:
            rel = collection.partitioning.encode(
                {k: int(row[k]) for k in keys})
            out.setdefault(rel, []).append((int(row["_start"]),
                                            int(row["_stop"])))
        return out

    def query(self, collection: Collection, *,
              variables: Iterable[str] | None = None,
              **predicates: Any) -> DataFrame:
        """Index-pushdown read: prune partitions to those with matching
        ranges, then keep only rows inside the ranges (broadcast range
        join on ``_row_idx``)."""
        keys = list(collection.partitioning.keys)
        ranges = self._filtered(collection, predicates).select(
            *keys, "_start", "_stop")
        matched = ranges.select(*keys).distinct().collect()
        if not matched:
            return None
        # listing-time pruning: build an explicit filter over matched keys
        filters = " or ".join(
            "(" + " and ".join(f"{k} == {int(row[k])}" for k in keys) + ")"
            for row in matched)
        df = collection._load(filters=filters, keep_internal=True)
        # grid semi-join: ranges fan out to the _row_idx buckets they
        # cover, rows bucket once — the semi-join is an equi-join on
        # (keys, bucket) with the exact range in the condition.  Scales
        # with the match count instead of forcing a broadcast of the
        # matched ranges (a low-selectivity lookup could match millions).
        bucket_rows = 4096
        fanned = ranges.withColumn(
            "__bucket",
            F.explode(F.sequence(
                F.floor(F.col("_start") / bucket_rows),
                F.floor((F.col("_stop") - 1) / bucket_rows))))
        row_bucket = F.floor(df[ROW_IDX] / bucket_rows)
        cond = row_bucket == fanned["__bucket"]
        for k in keys:
            cond = cond & (df[k] == fanned[k])
        cond = cond & (df[ROW_IDX] >= fanned["_start"]) \
                    & (df[ROW_IDX] < fanned["_stop"])
        joined = df.join(fanned, on=cond, how="left_semi")
        keep = [v.name for v in collection.schema.partitioned_variables
                if v.name in joined.columns]
        if variables is not None:
            wanted = set(variables)
            keep = [c for c in keep
                    if c in wanted or c.rsplit("/", 1)[-1] in wanted]
        return joined.select(*keep)
