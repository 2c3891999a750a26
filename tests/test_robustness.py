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
