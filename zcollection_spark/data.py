"""Test-data loaders for the driver's TPC-H-ish tables.

``/root/testdata/sf*/`` parquet files may carry ``timestamp[ns]`` columns
(e.g. ``events.ts``), which Spark refuses to read natively
(PARQUET_TYPE_ILLEGAL).  The loader reads them via
``spark.sql.legacy.parquet.nanosAsLong`` and converts to microsecond
timestamps by integer truncation — exactly what DuckDB does when it reads
the same files, so oracle comparisons stay bit-identical.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@functools.lru_cache(maxsize=128)
def _nanos_columns(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos:
        # truncating integer division ns → us, matching DuckDB's read
        df = df.withColumn(col, F.timestamp_micros(
            F.expr(f"`{col}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
