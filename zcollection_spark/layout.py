"""Bucketed table layout: shuffle-free (co-located) joins at scale.

The reference is a single-process engine and never joins; its only
"layout" lever is the partition tree.  At 100 TB on a cluster the
dominant join cost is the shuffle of both sides onto the join key, so
this module adds the Spark-native answer: persist a DataFrame (e.g. a
collection read, ``Collection.to_df()``) as a **bucketed, sorted
table**.  Two tables bucketed on the same key with the same bucket
count sort-merge-join with *zero* Exchange — each task reads matching
bucket files from both sides.  Re-used across N downstream joins this
amortizes one write into N saved shuffles.

Bucket-count guidance: pick ``buckets`` so one bucket of the LARGER
table is ~128-512 MiB (e.g. 100 TB / 512 MiB ≈ 200k buckets is too
many files per write task — bucket the join-heavy subset, or combine
with partitioning so each partition holds ``buckets`` files).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, name: str, *,
                   key: str | Iterable[str], buckets: int = 32,
                   sort: bool = True, mode: str = "overwrite",
                   format: str = "parquet") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets lets the sort-merge join skip its per-task
    sort as well — the join becomes a pure streaming merge.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format(format).mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def bucketed_join(spark: SparkSession, left: str, right: str, *,
                  on: str | Iterable[str], how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children are bare scans — no Exchange, no Sort.  ``explain_shuffles``
    verifies the claim; tests pin it.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left).join(spark.table(right), on=on_cols, how=how)


def salted_join(left: DataFrame, right: DataFrame, *,
                on: str | Iterable[str], salts: int = 16,
                how: str = "inner", seed: int = 42) -> DataFrame:
    """Skew-safe equi-join for hot keys when neither side broadcasts.

    A single hot key sends all its rows to one task in a plain shuffle
    join; AQE's skew splitting handles sort-merge spills, but when one
    key dominates *both* sides the standard fix is salting: the big
    (left) side gets a per-row salt in ``[0, salts)``, the right side is
    replicated ``salts`` times, and the join key becomes
    ``(key..., salt)`` — the hot key's rows now spread over ``salts``
    tasks.  Results are identical to the plain join (every left row
    still meets every matching right row exactly once).  Cost: right
    side is scanned/shuffled ``salts`` times — use for dim-ish right
    sides too big to broadcast but far smaller than the left.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("reserved column name '__salt'")
    l_salted = left.withColumn(
        "__salt", (F.rand(seed) * salts).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = l_salted.join(r_replicated, on=[*on_cols, "__salt"], how=how)
    return out.drop("__salt")


def explain_shuffles(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed Final Plan
    (0 = co-located).  BroadcastExchange is excluded — a broadcast ships
    one small table, not a repartition of the data — as is the
    ``== Initial Plan ==`` section AQE appends (it duplicates every
    operator of the final plan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line
               and "ReusedExchange" not in line
               and "BroadcastExchange" not in line)
