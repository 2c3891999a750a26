"""Catalog commit generations and incremental partition diffs.

Every catalog commit carries a CAS-serialized ``generation`` counter, a
per-partition last-touched stamp, and an immutable per-generation
snapshot file (``_catalog/gen-NNN.json``).  ``Collection.changes(g)``
turns that into the incremental-consumption primitive: a downstream
pipeline remembers the generation it last processed and receives
exactly the partitions added/replaced/removed since — no full rescans,
no file-mtime heuristics.  No reference counterpart (the reference's
catalog is a single mutable list).
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.collection import catalog as catmod
from zcollection_spark.collection.catalog import Catalog
from zcollection_spark.errors import StoreError
from zcollection_spark.fs import LocalFS


def _mk(spark, path):
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    return zc.create_collection(
        spark, path, schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))


def _df(spark, coll, rows):
    pdf = pd.DataFrame({
        "i": np.arange(len(rows), dtype=np.int64) + rows[0][0] * 1000,
        "value": np.array([v for _, v in rows], dtype=np.float64),
        "num": np.array([n for n, _ in rows], dtype=np.int64)})
    return spark.createDataFrame(pdf, schema=coll.schema.to_struct_type())


def test_generation_increments_and_snapshots_exist(spark, tmp_path):
    coll = _mk(spark, str(tmp_path / "c"))
    g0 = coll.generation()           # create writes the empty catalog
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    g1 = coll.generation()
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g2 = coll.generation()
    assert g0 < g1 < g2
    assert coll._catalog.history()[-2:] == [g1, g2]
    snap = coll._catalog.read_at(g1)
    assert snap["partitions"] == ["num=1"]


def test_changes_added_replaced_removed(spark, tmp_path):
    coll = _mk(spark, str(tmp_path / "c"))
    coll.insert(_df(spark, coll, [(1, 1.0), (2, 2.0)]))
    g1 = coll.generation()
    # add num=3, replace num=2
    coll.insert(_df(spark, coll, [(2, 20.0), (3, 3.0)]))
    diff = coll.changes(g1)
    assert diff["added"] == ["num=2", "num=3"]   # replaced counts as added
    assert diff["removed"] == []
    # untouched num=1 is NOT in the diff
    coll.drop_partitions(filters="num == 1")
    diff2 = coll.changes(g1)
    assert diff2["removed"] == ["num=1"]
    assert coll.changes(coll.generation()) == {
        "added": [], "removed": [],
        "from": coll.generation(), "to": coll.generation()}


def test_changes_on_pruned_history_raises(spark, tmp_path):
    coll = _mk(spark, str(tmp_path / "c"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    g1 = coll.generation()
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    coll._catalog.prune_history(keep_last=1)
    with pytest.raises(StoreError, match="not available"):
        coll.changes(g1)
    # the current generation still answers (served from state)
    assert coll.changes(coll.generation())["added"] == []


def test_read_at_serves_state_when_snapshot_missing(tmp_path):
    """Crash window between the state PUT and the snapshot PUT: the
    newest generation must still be readable (from state)."""
    fs = LocalFS()
    cat = Catalog(fs, str(tmp_path / "store"))
    cat.add(["num=1"])
    gen = cat.generation()
    fs.delete(cat._gen_path(gen))  # simulate the crash
    doc = cat.read_at(gen)
    assert doc["partitions"] == ["num=1"]


def test_repair_stamps_everything_current(spark, tmp_path):
    """A catalog rebuild cannot know per-partition ages — consumers must
    reprocess everything rather than silently skip."""
    coll = _mk(spark, str(tmp_path / "c"))
    coll.insert(_df(spark, coll, [(1, 1.0), (2, 2.0)]))
    g1 = coll.generation()
    coll.repair_catalog()
    diff = coll.changes(g1)
    assert diff["added"] == ["num=1", "num=2"]


class _FreshLocks:
    def __getitem__(self, key):
        return threading.Lock()


def test_racing_writers_get_distinct_increasing_generations(
        tmp_path, monkeypatch):
    monkeypatch.setattr(catmod, "_LOCKS", _FreshLocks())
    root = str(tmp_path / "store")
    gens: list[int] = []
    lock = threading.Lock()

    def writer(tag: str):
        cat = Catalog(LocalFS(), root)
        for i in range(12):
            cat.add([f"num={tag}{i}"])
            with lock:
                gens.append(cat.generation())

    threads = [threading.Thread(target=writer, args=(t,)) for t in "ab"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    final = Catalog(LocalFS(), root)
    # 24 commits -> 24 distinct generations, every snapshot present
    assert final.generation() == 24
    assert final.history() == list(range(1, 25))


def test_zarr3_generation_parity(spark, tmp_path):
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "z"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))
    g0 = coll.generation()
    pdf = pd.DataFrame({"i": np.array([0], dtype=np.int64),
                        "value": np.array([1.0]),
                        "num": np.array([5], dtype=np.int64)})
    coll.insert(spark.createDataFrame(
        pdf, schema=coll.schema.to_struct_type()))
    assert coll.generation() > g0
    assert coll.changes(g0)["added"] == ["num=5"]
