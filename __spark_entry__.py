"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship collection round-trip on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 plus the LLM-pipeline extras — see
``zcollection_spark/entry_queries.py`` for the registry and the oracle
design rules (decimal-exact aggregation, md5 hash parity, aliased columns).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: create a Date("D")
    collection from events, insert, pruned+projected query."""
    from zcollection_spark.session import configure
    from zcollection_spark import entry_queries

    configure(spark)
    return entry_queries.q_collection_query_prune(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zcollection_spark import entry_queries
    from zcollection_spark.session import configure

    registry = entry_queries.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in registry.items()}


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB twins; ``sf_dir`` (optional, defaults to the driver's
    sf0.01 comparison dir) parameterizes data-derived oracle literals."""
    from zcollection_spark import entry_queries
    return entry_queries.oracle_sql(sf_dir)
