"""Zarr v3 core + datasource + collection tests."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.zarr3.core import read_array, write_array
from zcollection_spark.zarr3.collection import (create_zarr_collection,
                                                open_zarr_collection)


# -- core ------------------------------------------------------------------

def test_core_roundtrip_2d_zstd(tmp_path):
    data = np.arange(1000, dtype=np.float32).reshape(100, 10)
    write_array(tmp_path / "a", data, chunk_shape=(30, 10))
    np.testing.assert_array_equal(read_array(tmp_path / "a"), data)
    doc = json.loads((tmp_path / "a" / "zarr.json").read_text())
    assert doc["zarr_format"] == 3 and doc["node_type"] == "array"
    assert doc["codecs"][0]["name"] == "bytes"
    assert doc["codecs"][1]["name"] == "zstd"
    # edge chunks stored full-size: 100 rows / 30-chunk → 4 chunk files
    assert len(list((tmp_path / "a" / "c").rglob("*"))) >= 4


def test_core_roundtrip_datetime(tmp_path):
    data = np.array(["2024-01-01T00:00:00.123456", "2024-02-03T04:05:06"],
                    dtype="datetime64[us]")
    write_array(tmp_path / "t", data)
    got = read_array(tmp_path / "t")
    assert got.dtype == np.dtype("datetime64[us]")
    np.testing.assert_array_equal(got, data)


def test_core_gzip_and_edge_chunks(tmp_path):
    data = np.arange(17, dtype=np.int64)
    write_array(tmp_path / "i", data, chunk_shape=(5,), codec="gzip")
    np.testing.assert_array_equal(read_array(tmp_path / "i"), data)


def test_core_missing_chunk_is_fill(tmp_path):
    data = np.arange(10, dtype=np.int32)
    write_array(tmp_path / "f", data, chunk_shape=(5,), fill_value=-1)
    # delete the second chunk → reads as fill
    (tmp_path / "f" / "c" / "1").unlink()
    got = read_array(tmp_path / "f")
    np.testing.assert_array_equal(got[:5], data[:5])
    assert (got[5:] == -1).all()


# -- collection through the datasource ------------------------------------

@pytest.fixture()
def zarr_events(spark, tmp_path):
    from zcollection_spark.data import load_table
    from zcollection_spark.schema import infer_schema
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "value")
    coll = create_zarr_collection(
        spark, str(tmp_path / "z"),
        schema=infer_schema(ev.schema, axis="ts"),
        axis="ts", partitioning=zc.Date(("ts",), resolution="D"))
    coll.insert(ev)
    return coll


def test_zarr_collection_roundtrip(spark, zarr_events):
    assert len(zarr_events.partitions()) == 30
    assert zarr_events.query().count() == 1000


def test_zarr_pruned_query(spark, zarr_events):
    df = zarr_events.query(filters="day in (3, 4, 5)")
    days = {r["d"] for r in
            df.selectExpr("day(ts) AS d").distinct().collect()}
    assert days == {3, 4, 5}


def test_zarr_projection(spark, zarr_events):
    df = zarr_events.query(variables=["event_id"])
    assert df.columns == ["event_id"]
    assert df.count() == 1000


def test_zarr_no_match_returns_none(spark, zarr_events):
    assert zarr_events.query(filters="day == 99") is None


def test_zarr_values_match_parquet_source(spark, zarr_events):
    from zcollection_spark.data import load_table
    src = (load_table(spark, "/root/testdata/sf0.001", "events")
           .select("event_id", "ts", "value").orderBy("event_id"))
    got = zarr_events.query().orderBy("event_id")
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in src.collect()]


def test_zarr_reopen(spark, zarr_events):
    coll = open_zarr_collection(spark, zarr_events.path)
    assert len(coll.partitions()) == 30
    # partition group attrs carry the stamped key
    doc = json.loads((Path(zarr_events.path) / coll.partitions()[0]
                      / "zarr.json").read_text())
    key = json.loads(doc["attributes"]["_zc_partition_key"])
    assert key == {"year": 2024, "month": 1, "day": 1}


def test_zarr_rejects_string_schema(spark, tmp_path):
    schema = (zc.SchemaBuilder().add_dimension("t")
              .add_variable("t", "int64", ("t",))
              .add_variable("s", "str", ("t",)).build())
    with pytest.raises(zc.SchemaError, match="string"):
        create_zarr_collection(spark, str(tmp_path / "zs"), schema=schema,
                               axis="t", partitioning=zc.Sequence(("t",)))


def test_zarr_2d_variable(spark, tmp_path):
    pdf = pd.DataFrame({
        "num": np.array([0, 0, 1, 1, 2, 2, 2], dtype=np.int64),
        "value": [list(r) for r in
                  np.arange(21, dtype=np.float32).reshape(7, 3)]})
    schema = (zc.SchemaBuilder().add_dimension("num")
              .add_dimension("x", size=3)
              .add_variable("num", "int64", ("num",))
              .add_variable("value", "float32", ("num", "x"))
              .build("num"))
    coll = create_zarr_collection(spark, str(tmp_path / "z2"),
                                  schema=schema, axis="num",
                                  partitioning=zc.Sequence(("num",)))
    coll.insert(spark.createDataFrame(pdf, schema=schema.to_struct_type()))
    out = coll.query().toPandas()
    got = np.array(out["value"].tolist(), dtype=np.float32)
    np.testing.assert_array_equal(
        got, np.arange(21, dtype=np.float32).reshape(7, 3))
