"""Bucketed-layout co-located joins (layout.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zcollection_spark.data import load_table
from zcollection_spark.layout import (bucketed_join, explain_shuffles,
                                      write_bucketed)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the Exchange count is meaningful."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


@pytest.fixture()
def bucketed_pair(spark):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders") \
        .select("o_orderkey", "o_custkey", "o_orderdate") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "t_lineitem_b", key="l_orderkey", buckets=8)
    write_bucketed(orders, "t_orders_b", key="l_orderkey", buckets=8)
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_join_no_shuffle(spark, bucketed_pair, no_broadcast):
    left, right = bucketed_pair
    joined = bucketed_join(spark, left, right, on="l_orderkey")
    joined.collect()
    assert explain_shuffles(joined) == 0


def test_unbucketed_join_shuffles(spark, no_broadcast):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem") \
        .select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders") \
        .selectExpr("o_orderkey AS l_orderkey", "o_custkey")
    joined = li.join(orders, on="l_orderkey")
    joined.collect()
    assert explain_shuffles(joined) >= 1


def test_bucketed_join_values_match(spark, bucketed_pair):
    left, right = bucketed_pair
    got = (bucketed_join(spark, left, right, on="l_orderkey")
           .agg(F.sum(F.col("l_extendedprice") *
                      (1 - F.col("l_discount"))).alias("rev"),
                F.count("*").alias("n")).collect()[0])
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    want = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .agg(F.sum(F.col("l_extendedprice") *
                       (1 - F.col("l_discount"))).alias("rev"),
                 F.count("*").alias("n")).collect()[0])
    assert got["n"] == want["n"]
    assert abs(float(got["rev"]) - float(want["rev"])) < 1e-6


def test_bucketed_aggregation_no_shuffle(spark, bucketed_pair, no_broadcast):
    """groupBy on the bucket key also rides the bucketed layout."""
    left, _ = bucketed_pair
    agg = (spark.table(left).groupBy("l_orderkey")
           .agg(F.sum("l_extendedprice").alias("s")))
    agg.collect()
    assert explain_shuffles(agg) == 0


def test_salted_join_matches_plain_join(spark, no_broadcast):
    from zcollection_spark.layout import salted_join
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem") \
        .select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders") \
        .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority")
    got = (salted_join(li, orders, on="l_orderkey", salts=8)
           .agg(F.count("*").alias("n"),
                F.sum("l_extendedprice").alias("s")).collect()[0])
    want = (li.join(orders, on="l_orderkey")
            .agg(F.count("*").alias("n"),
                 F.sum("l_extendedprice").alias("s")).collect()[0])
    assert got["n"] == want["n"]
    assert abs(float(got["s"]) - float(want["s"])) < 1e-6


def test_salted_join_left_keeps_unmatched(spark, no_broadcast):
    import pandas as pd
    from zcollection_spark.layout import salted_join
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "x": [10, 20]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "y": [9.0]}))
    out = {r["k"]: r["y"] for r in
           salted_join(left, right, on="k", salts=4, how="left").collect()}
    assert out[1] == 9.0 and out[2] is None
