"""CDC streaming source over catalog generations (changes_stream.py).

The offset IS the catalog generation; micro-batches diff the current
document against per-generation snapshots, and replay re-reads the
immutable snapshot files — a restarted query resumes exactly, and a
GC'd diff base raises instead of silently emitting nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.changes_stream import (ChangesStreamReader,
                                              _diff_rows)
from zcollection_spark.errors import StoreError


def _mk(spark, path):
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    return zc.create_collection(
        spark, path, schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))


def _ins(spark, coll, nums):
    pdf = pd.DataFrame({
        "i": np.arange(len(nums), dtype=np.int64) + nums[0] * 100,
        "num": np.array(nums, dtype=np.int64)})
    coll.insert(spark.createDataFrame(
        pdf, schema=coll.schema.to_struct_type()))


# -- reader unit level ------------------------------------------------------


def test_reader_offsets_and_diffs(spark, tmp_path):
    coll = _mk(spark, str(tmp_path / "c"))
    g0 = coll.generation()
    reader = ChangesStreamReader(coll.path)
    assert reader.initialOffset() == {"generation": g0}

    _ins(spark, coll, [1, 2])
    rows, nxt = reader.read({"generation": g0})
    g1 = coll.generation()
    assert nxt == {"generation": g1}
    assert [(r[1], r[2]) for r in rows] == [("num=1", "added"),
                                            ("num=2", "added")]
    # no new commits: empty batch, offset unchanged
    rows2, nxt2 = reader.read(nxt)
    assert list(rows2) == [] and nxt2 == nxt

    _ins(spark, coll, [2, 3])  # replace num=2, add num=3
    rows3, nxt3 = reader.read(nxt)
    assert [(r[1], r[2]) for r in rows3] == [("num=2", "added"),
                                             ("num=3", "added")]
    # replay between committed offsets (restart): identical rows
    replay = list(reader.readBetweenOffsets(nxt, nxt3))
    assert [(r[1], r[2]) for r in replay] == [("num=2", "added"),
                                              ("num=3", "added")]

    coll.drop_partitions(filters="num == 1")
    rows4, _ = reader.read(nxt3)
    assert [(r[1], r[2]) for r in rows4] == [("num=1", "removed")]


def test_reader_raises_on_pruned_base(spark, tmp_path):
    coll = _mk(spark, str(tmp_path / "c"))
    g0 = coll.generation()
    _ins(spark, coll, [1])
    _ins(spark, coll, [2])
    coll._catalog.prune_history(keep_last=1)
    reader = ChangesStreamReader(coll.path)
    with pytest.raises(StoreError, match="not available"):
        reader.read({"generation": g0})


def test_diff_rows_stamps():
    base = {"generation": 2, "partitions": ["a=1", "a=2"]}
    cur = {"generation": 5, "partitions": ["a=2", "a=3"],
           "touched": {"a=2": 2, "a=3": 5}}
    rows = list(_diff_rows(base, cur, 2))
    # a=2 untouched since gen 2 -> not emitted; a=1 removed; a=3 added
    assert rows == [(5, "a=3", "added"), (5, "a=1", "removed")]


# -- end-to-end structured streaming ---------------------------------------


def test_stream_changes_end_to_end(spark, tmp_path):
    """availableNow micro-batches through a real streaming query with a
    checkpoint: first run streams insert A, the restarted run streams
    only insert B."""
    coll = _mk(spark, str(tmp_path / "c"))
    start = coll.generation()
    ckpt = str(tmp_path / "ckpt")

    _ins(spark, coll, [1, 2])

    def run(name):
        got = []

        def sink(batch_df, batch_id):
            got.extend((r.relpath, r.change)
                       for r in batch_df.collect())

        q = (zc.stream_changes(spark, coll.path,
                               starting_generation=start)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return set(got)

    assert run("chg1") == {("num=1", "added"), ("num=2", "added")}

    _ins(spark, coll, [3])
    # restart from the SAME checkpoint: only the new commit streams
    assert run("chg2") == {("num=3", "added")}


def test_reader_is_layout_agnostic_zarr3(spark, tmp_path):
    """The reader speaks to the catalog, not the data layout — zarr3
    collections stream the same events."""
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "z"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))
    reader = ChangesStreamReader(coll.path)
    start = reader.initialOffset()
    pdf = pd.DataFrame({"i": np.array([0, 1], dtype=np.int64),
                        "num": np.array([4, 5], dtype=np.int64)})
    coll.insert(spark.createDataFrame(
        pdf, schema=coll.schema.to_struct_type()))
    rows, _ = reader.read(start)
    assert [(r[1], r[2]) for r in rows] == [("num=4", "added"),
                                            ("num=5", "added")]
