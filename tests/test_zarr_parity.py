"""Zarr collection feature parity: merges, drop, map, immutables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import zcollection_spark as zc
from zcollection_spark.zarr3.collection import create_zarr_collection


@pytest.fixture()
def zdates(spark, tmp_path):
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-05", "2024-01-20", "2024-02-03",
                                "2024-02-15", "2024-03-01"]),
        "v": np.arange(5, dtype=np.float32)})
    schema = (zc.SchemaBuilder().add_dimension("time")
              .add_variable("time", "datetime64[us]", ("time",))
              .add_variable("v", "float32", ("time",)).build("time"))
    coll = create_zarr_collection(
        spark, str(tmp_path / "zd"), schema=schema, axis="time",
        partitioning=zc.Date(("time",), resolution="M"))
    coll.insert(spark.createDataFrame(
        pdf, schema=schema.with_partition_axis("time").to_struct_type()))
    return coll


def _result(coll):
    pdf = coll.query().toPandas()
    return list(zip(pdf["time"].dt.strftime("%Y-%m-%d"),
                    pdf["v"].astype(float)))


def _df(spark, times, values):
    pdf = pd.DataFrame({"time": pd.to_datetime(times),
                        "v": np.asarray(values, dtype=np.float32)})
    return spark.createDataFrame(pdf)


def test_zarr_merge_replace(spark, zdates):
    zdates.insert(_df(spark, ["2024-02-10"], [42.0]))
    assert _result(zdates) == [
        ("2024-01-05", 0.0), ("2024-01-20", 1.0),
        ("2024-02-10", 42.0), ("2024-03-01", 4.0)]


def test_zarr_merge_upsert(spark, zdates):
    zdates.insert(_df(spark, ["2024-02-15", "2024-04-10"], [99.0, 55.0]),
                  merge="upsert")
    assert _result(zdates) == [
        ("2024-01-05", 0.0), ("2024-01-20", 1.0), ("2024-02-03", 2.0),
        ("2024-02-15", 99.0), ("2024-03-01", 4.0), ("2024-04-10", 55.0)]


def test_zarr_merge_time_series(spark, zdates):
    zdates.insert(_df(spark, ["2024-02-01", "2024-02-20"], [10.0, 20.0]),
                  merge="time_series")
    assert _result(zdates) == [
        ("2024-01-05", 0.0), ("2024-01-20", 1.0), ("2024-02-01", 10.0),
        ("2024-02-20", 20.0), ("2024-03-01", 4.0)]


def test_zarr_drop_partitions(spark, zdates):
    dropped = zdates.drop_partitions(filters="month == 1")
    assert dropped == ["year=2024/month=1"]
    assert len(zdates.partitions()) == 2


def test_zarr_map(spark, zdates):
    def stats(pdf):
        return pd.DataFrame({"month": [int(pdf["month"].iloc[0])],
                             "n": [len(pdf)]})

    res = zdates.map(stats, "month long, n long")
    assert sorted((r["month"], r["n"]) for r in res.collect()) == [
        (1, 2), (2, 2), (3, 1)]


def test_zarr_immutable_attach(spark, tmp_path):
    pdf = pd.DataFrame({
        "num": np.array([0, 0, 1], dtype=np.int64),
        "value": np.array([1.0, 2.0, 3.0], dtype=np.float32),
        "static": [[10.0, 20.0, 30.0]] * 3})
    schema = (zc.SchemaBuilder().add_dimension("num")
              .add_dimension("x", size=3)
              .add_variable("num", "int64", ("num",))
              .add_variable("value", "float32", ("num",))
              .add_variable("static", "float32", ("x",)).build("num"))
    bound = schema.with_partition_axis("num")
    coll = create_zarr_collection(spark, str(tmp_path / "zi"),
                                  schema=schema, axis="num",
                                  partitioning=zc.Sequence(("num",)))
    coll.insert(spark.createDataFrame(pdf, schema=bound.to_struct_type()))
    out = coll.query().toPandas()
    assert "static" in out.columns
    for row in out["static"]:
        assert list(row) == [10.0, 20.0, 30.0]


def test_zarr_update(spark, zdates):
    def double(pdf):
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] * 2.0
        return pdf

    updated = zdates.update(double, filters="month == 2")
    assert updated == ["year=2024/month=2"]
    assert _result(zdates) == [
        ("2024-01-05", 0.0), ("2024-01-20", 1.0), ("2024-02-03", 4.0),
        ("2024-02-15", 6.0), ("2024-03-01", 4.0)]


def test_zarr_string_upsert_merge(spark, tmp_path):
    """Merge strategies work over string-bearing zarr collections."""
    import numpy as np
    import pandas as pd
    import zcollection_spark as zc
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder().add_dimension("num")
              .add_variable("num", "int64", ("num",))
              .add_variable("txt", "str", ("num",)).build("num"))
    coll = create_zarr_collection(spark, str(tmp_path / "zsu"),
                                  schema=schema, axis="num",
                                  partitioning=zc.GroupedSequence(
                                      ("num",), size=10))
    base = pd.DataFrame({"num": np.array([1, 2, 3], dtype=np.int64),
                         "txt": ["one", "two", "three"]})
    coll.insert(spark.createDataFrame(base, schema=schema.to_struct_type()))
    batch = pd.DataFrame({"num": np.array([2, 4], dtype=np.int64),
                          "txt": ["TWO", "four"]})
    coll.insert(spark.createDataFrame(batch, schema=schema.to_struct_type()),
                merge="upsert")
    got = {r["num"]: r["txt"] for r in coll.query().collect()}
    assert got == {1: "one", 2: "TWO", 3: "three", 4: "four"}


def test_zarr_columns_substring_of_partition_key(spark, tmp_path):
    """A requested column whose name CONTAINS a partition key as a
    substring ('year_total' vs derived key 'year') must not drag the key
    into the reader schema (regression: the schema built the wanted-set
    test on the raw comma-joined option string)."""
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-05", "2024-02-03"]),
        "year_total": np.array([1.0, 2.0], dtype=np.float32)})
    schema = (zc.SchemaBuilder().add_dimension("time")
              .add_variable("time", "datetime64[us]", ("time",))
              .add_variable("year_total", "float32", ("time",))
              .build("time"))
    coll = create_zarr_collection(
        spark, str(tmp_path / "zy"), schema=schema, axis="time",
        partitioning=zc.Date(("time",), resolution="M"))
    coll.insert(spark.createDataFrame(
        pdf, schema=schema.with_partition_axis("time").to_struct_type()))
    df = (spark.read.format("zarr3")
          .option("path", str(tmp_path / "zy"))
          .option("columns", "year_total").load())
    assert df.columns == ["year_total"]
    assert sorted(r["year_total"] for r in df.collect()) == [1.0, 2.0]
