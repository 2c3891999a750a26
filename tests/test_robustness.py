"""Robustness: concurrent inserts, schema upgraders, empty inserts."""

import dataclasses
import threading

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.schema import (FORMAT_VERSION, register_upgrader,
                                      upgrade, _UPGRADERS)


def test_concurrent_inserts_distinct_partitions(spark, tmp_path,
                                                seq_schema):
    """Parallel inserts into DIFFERENT partitions both land (the
    reference's concurrent-insert test, test_async_and_dask.py)."""
    bound = seq_schema.with_partition_axis("num")
    coll = zc.create_collection(spark, str(tmp_path / "cc"),
                                schema=seq_schema, axis="num",
                                partitioning=zc.Sequence(("num",)))

    def make(nums):
        pdf = pd.DataFrame({
            "num": np.array(nums, dtype=np.int64),
            "value": [[1.0, 2.0, 3.0]] * len(nums),
            "static": [[10.0, 20.0, 30.0]] * len(nums)})
        return spark.createDataFrame(pdf, schema=bound.to_struct_type())

    errors = []

    def insert(nums):
        try:
            coll.insert(make(nums), merge="concat")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=insert, args=([n, n],))
               for n in (1, 2, 3, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert coll.partitions() == ["num=1", "num=2", "num=3", "num=4"]
    assert coll.query().count() == 8


def test_failed_insert_leaves_no_new_partitions_visible(spark,
                                                        seq_collection):
    """The reference's transactional-store contract, observably: a failed
    insert publishes nothing (``tests/test_icechunk.py:64`` — failed
    insert fully rolled back).  Here the catalog is the visibility gate:
    it is only updated after the write job succeeds, so partitions whose
    files half-landed are never listed or queried."""
    from pyspark.sql import functions as F

    before = seq_collection.partitions()

    @F.udf("array<float>")
    def boom(v):
        raise RuntimeError("mid-write failure")

    pdf = pd.DataFrame({
        "num": np.array([9, 9], dtype=np.int64),
        "value": [[1.0, 2.0, 3.0]] * 2,
        "static": [[10.0, 20.0, 30.0]] * 2})
    bad = (spark.createDataFrame(
        pdf, schema=seq_collection.schema.to_struct_type())
        .withColumn("value", boom("value")))
    # key derivation prunes `value`, so the failure fires inside the
    # write job itself, after partition dirs may have been created
    with pytest.raises(Exception):
        seq_collection.insert(bad)
    assert seq_collection.partitions() == before
    assert seq_collection.query(filters="num == 9") is None
    assert seq_collection.query().count() == 7


def test_empty_insert_is_noop(spark, seq_collection, seq_pdf):
    bound_schema = seq_collection.schema
    empty = spark.createDataFrame([], schema=bound_schema.to_struct_type())
    assert seq_collection.insert(empty) == []
    assert seq_collection.query().count() == 7


def test_schema_upgrader_chain():
    """Upgrader chain walks old documents forward
    (schema/versioning.py:19-66)."""
    try:
        register_upgrader(0)(
            lambda doc: {**doc, "format_version": FORMAT_VERSION,
                         "attrs": {**doc.get("attrs", {}),
                                   "upgraded": True}})
        doc = upgrade({"format_version": 0, "dimensions": [],
                       "variables": [], "attrs": {}})
        assert doc["format_version"] == FORMAT_VERSION
        assert doc["attrs"]["upgraded"] is True
    finally:
        _UPGRADERS.pop(0, None)


def test_upgrader_must_advance():
    try:
        register_upgrader(0)(lambda doc: doc)  # does not bump the version
        with pytest.raises(zc.FormatVersionError, match="advance"):
            upgrade({"format_version": 0})
    finally:
        _UPGRADERS.pop(0, None)


def test_missing_intermediate_upgrader():
    with pytest.raises(zc.FormatVersionError, match="no upgrader"):
        upgrade({"format_version": -1})


def test_aio_facade(spark, tmp_path, seq_schema, seq_pdf):
    """Async facade parity (reference aio.py:23-58): the sync API awaited
    off the event loop."""
    import asyncio
    from zcollection_spark import aio

    async def flow():
        bound = seq_schema.with_partition_axis("num")
        coll = await aio.create_collection(
            spark, str(tmp_path / "aio"), schema=seq_schema, axis="num",
            partitioning=zc.Sequence(("num",)))
        await aio.insert(coll, spark.createDataFrame(
            seq_pdf, schema=bound.to_struct_type()))
        df = await aio.query(coll, filters="num >= 1")
        return df.count()

    assert asyncio.run(flow()) == 5


def test_zarr_writer_double_write_idempotent(spark, tmp_path):
    """Writing the same batch twice through the raw zarr3 writer
    rewrites groups wholesale — no duplication, catalog stays exact."""
    import zcollection_spark as zc
    from zcollection_spark.data import load_table
    from zcollection_spark.schema import infer_schema
    from zcollection_spark.zarr3.collection import (create_zarr_collection,
                                                    open_zarr_collection)
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "value").where("day(ts) <= 3")
    coll = create_zarr_collection(
        spark, str(tmp_path / "dw"),
        schema=infer_schema(ev.schema, axis="ts"),
        axis="ts", partitioning=zc.Date(("ts",), resolution="D"))
    for _ in range(2):
        (ev.repartition("ts").write.format("zarr3")
         .option("path", coll.path).mode("append").save())
    reopened = open_zarr_collection(spark, coll.path)
    assert len(reopened.partitions()) == 3
    assert reopened.query().count() == ev.count()


def test_zarr_writer_missing_collection_rejected(spark, tmp_path):
    import pandas as pd
    from zcollection_spark.errors import CollectionNotFoundError
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException
    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises((CollectionNotFoundError, Py4JJavaError,
                        AnalysisException)):
        (df.write.format("zarr3")
         .option("path", str(tmp_path / "nope")).mode("append").save())


def test_read_row_ranges_unknown_partition_is_empty(spark, tmp_path):
    """Spans naming partitions that do not exist fail loudly (a stale
    index pointing at dropped partitions is a bug to surface, not to
    silently read as empty)."""
    import zcollection_spark as zc
    import pandas as pd
    import numpy as np
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder().add_dimension("num")
              .add_variable("num", "int64", ("num",))
              .build("num"))
    coll = create_zarr_collection(spark, str(tmp_path / "rr"),
                                  schema=schema, axis="num",
                                  partitioning=zc.Sequence(("num",)))
    coll.insert(spark.createDataFrame(
        pd.DataFrame({"num": np.array([1, 1], dtype=np.int64)}),
        schema=schema.to_struct_type()))
    with pytest.raises(Exception):
        coll.read_row_ranges({"num=99": [(0, 5)]}).collect()


def test_hadoopfs_text_roundtrip_via_jvm(spark, tmp_path):
    """HadoopFS metadata I/O must round-trip through the py4j bridge.

    py4j converts byte arrays BY VALUE, so the in-out ``stream.read(buf)``
    idiom silently yields NUL-filled garbage — catalogs and configs on any
    non-local scheme would always read as corrupt.  Regression for the
    IOUtils.toByteArray fix; ``file://`` exercises the same JVM path as
    s3a/gs/abfs."""
    from zcollection_spark.fs import HadoopFS
    fs = HadoopFS(spark)
    path = f"file://{tmp_path}/meta/_zcollection.json"
    payload = '{"k": "v", "unicode": "áé"}' * 100
    fs.write_text(path, payload)
    assert fs.exists(path)
    assert fs.read_text(path) == payload
    fs.mkdirs(f"file://{tmp_path}/meta/year=2024/month=1")
    fs.mkdirs(f"file://{tmp_path}/meta/year=2024/month=2")
    assert fs.list_partition_dirs(f"file://{tmp_path}/meta", 2) == [
        "year=2024/month=1", "year=2024/month=2"]


def test_catalog_add_on_corrupt_rebuilds_from_walk(spark, seq_collection,
                                                   seq_pdf, tmp_path):
    """``Catalog.add`` on a corrupt catalog must re-walk the store before
    merging — writing only the delta would produce a valid-but-incomplete
    catalog that hides every pre-existing partition from catalog readers
    until a manual repair."""
    cat_file = tmp_path / "seq" / "_catalog" / "state.json"
    cat_file.write_text("{broken")
    new = seq_pdf.copy()
    new["num"] = new["num"] + 10
    bound = seq_collection.schema.with_partition_axis("num")
    seq_collection.insert(
        spark.createDataFrame(new, schema=bound.to_struct_type()),
        merge="concat")
    # the catalog document itself (not the walk fallback) holds everything
    assert set(seq_collection._catalog.read()) == {
        "num=0", "num=1", "num=2", "num=10", "num=11", "num=12"}
