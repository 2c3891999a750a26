"""Temporal operators + bucketed layout: as-of enrichment, interval
matching, keep-latest compaction, then a shuffle-free join via bucketing.

Run: ``python examples/ex_temporal_layout.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import zcollection_spark as zc
from zcollection_spark.data import load_table
from zcollection_spark.functions.asof import asof_join
from zcollection_spark.functions.dedup import dedup_keep_latest
from zcollection_spark.functions.interval import interval_join


def main() -> None:
    spark = zc.get_spark("ex-temporal")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events")

    # 1. as-of: every event enriched with the user's latest prior purchase
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts",
                         F.col("value").alias("last_purchase")))
    enriched = asof_join(ev.select("event_id", "user_id", "ts"),
                         purchases, on="ts", by="user_id",
                         tolerance=F.expr("INTERVAL 7 DAYS"))
    print("asof-enriched rows:", enriched.count())

    # 2. interval: purchases inside each user's daily view window
    windows = (ev.where(F.col("event_type") == "view")
               .groupBy("user_id",
                        F.date_trunc("day", "ts").alias("day_start"))
               .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")))
    inside = interval_join(
        ev.where(F.col("event_type") == "purchase")
          .select("event_id", "user_id", "ts"),
        windows, on="ts", start="lo", end="hi", by="user_id")
    print("purchases inside view windows:", inside.count())

    # 3. keep-latest: snapshot of each user's newest event per type
    latest = dedup_keep_latest(ev, keys=["user_id", "event_type"],
                               order_col="ts", tiebreak="event_id")
    print("latest-version snapshot rows:", latest.count())

    # 4. bucketed layout: one write, N shuffle-free downstream joins
    li = load_table(spark, sf, "lineitem") \
        .select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf, "orders") \
        .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority")
    zc.write_bucketed(li, "ex_li_b", key="l_orderkey", buckets=16)
    zc.write_bucketed(orders, "ex_ord_b", key="l_orderkey", buckets=16)
    joined = zc.bucketed_join(spark, "ex_li_b", "ex_ord_b",
                              on="l_orderkey")
    print("bucketed join rows:", joined.count(),
          "| shuffles:", zc.explain_shuffles(joined))
    spark.sql("DROP TABLE IF EXISTS ex_li_b")
    spark.sql("DROP TABLE IF EXISTS ex_ord_b")


if __name__ == "__main__":
    main()
