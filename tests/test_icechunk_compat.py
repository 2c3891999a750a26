"""Icechunk format bridge: reference-written repos read back as Spark
DataFrames (zcollection_spark/icechunk_compat.py).

The round-trip tests write through the real icechunk+zarr libraries in
the reference's exact layout (partition groups + ``_zc_meta`` config
payloads, ``store/icechunk_store.py:36-72``) and are skipped where the
optional libs are absent; the translator / dtype-mapping / error-path
tests always run.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from zcollection_spark import icechunk_compat as ic
from zcollection_spark.errors import StoreError
from zcollection_spark.partitioning import Date, GroupedSequence, Sequence


# -- always-run: pure translation and the honesty contract -----------------

def test_translate_partitioning_reference_payloads():
    p = ic._translate_partitioning(
        {"name": "date", "variable": "ts", "resolution": "M",
         "dimension": "time"})
    assert isinstance(p, Date) and p.resolution == "M"
    assert p.variables == ("ts",)
    p = ic._translate_partitioning(
        {"name": "sequence", "variables": ["cycle", "pass"],
         "dimension": "num"})
    assert isinstance(p, Sequence) and p.keys == ("cycle", "pass")
    p = ic._translate_partitioning(
        {"name": "grouped-sequence", "variables": ["num"],
         "dimension": "num", "size": 10, "start": 0})
    assert isinstance(p, GroupedSequence) and p.size == 10
    with pytest.raises(StoreError, match="unknown reference"):
        ic._translate_partitioning({"name": "mystery"})


def test_spark_field_dtype_mapping():
    from pyspark.sql import types as T
    cases = [
        (np.arange(3, dtype=np.int64), T.LongType()),
        (np.arange(3, dtype=np.int32), T.IntegerType()),
        (np.arange(3, dtype=np.uint32), T.LongType()),
        (np.arange(3, dtype=np.float32), T.FloatType()),
        (np.arange(3, dtype=np.float64), T.DoubleType()),
        (np.array([True, False]), T.BooleanType()),
        (np.array(["a", "b"]), T.StringType()),
        (np.array(["2024-01-01"], dtype="datetime64[us]"),
         T.TimestampType()),
    ]
    for arr, expected in cases:
        assert ic._spark_field("x", arr).dataType == expected, arr.dtype
    nd = ic._spark_field("x", np.zeros((2, 3), dtype=np.float64))
    assert nd.dataType == T.ArrayType(T.DoubleType())


def test_to_pandas_col_shapes():
    assert list(ic._to_pandas_col(np.arange(3))) == [0, 1, 2]
    two = ic._to_pandas_col(np.arange(6).reshape(2, 3))
    assert two == [[0, 1, 2], [3, 4, 5]]
    ts = ic._to_pandas_col(np.array(["2024-01-01"], dtype="datetime64[s]"))
    assert ts.dtype == np.dtype("datetime64[us]")


def test_missing_libs_raise_clear_store_error(monkeypatch):
    import builtins
    real_import = builtins.__import__

    def no_icechunk(name, *a, **k):
        if name == "icechunk":
            raise ImportError("No module named 'icechunk'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_icechunk)
    with pytest.raises(StoreError, match="optional 'icechunk'"):
        ic._require_libs()


def test_strip_scheme():
    assert ic._strip_scheme("icechunk:///x/y") == "/x/y"
    assert ic._strip_scheme("/x/y") == "/x/y"


# -- round-trip against the real libraries (reference layout) --------------
# importorskip INSIDE the fixture so the pure tests above still run in
# environments without the optional libs

@pytest.fixture()
def ic_libs():
    icechunk = pytest.importorskip("icechunk")
    zarr = pytest.importorskip("zarr")
    return icechunk, zarr


def _reference_layout_repo(icechunk, zarr, root: str) -> None:
    """Write a 2-partition Sequence collection in the reference's
    icechunk layout: partition zarr groups + the ``_zc_meta``-routed
    root config (``store/icechunk_store.py:36-72``,
    ``io/partition.py:144-170``)."""
    storage = icechunk.local_filesystem_storage(root)
    repo = icechunk.Repository.open_or_create(storage)
    session = repo.writable_session("main")
    store = session.store
    zarr.create_group(store=store, overwrite=True)
    config = {
        "format_version": 1,
        "axis": "num",
        "partitioning": {"name": "sequence", "variables": ["num"],
                         "dimension": "num"},
        "catalog": {"enabled": False},
        "schema": {"dimensions": [], "variables": [], "groups": []},
    }
    meta = zarr.create_group(
        store=store, path=f"{ic.META_DIR}/_zcollection.json",
        overwrite=True,
        attributes={ic._PAYLOAD_ATTR: json.dumps(config)})
    assert meta is not None
    for num in (0, 1):
        grp = zarr.create_group(store=store, path=f"num={num}",
                                overwrite=True)
        n = 4
        a = grp.create_array(name="num", shape=(n,), dtype="int64")
        a[...] = np.full(n, num, dtype=np.int64)
        v = grp.create_array(name="value", shape=(n,), dtype="float64")
        v[...] = np.arange(n, dtype=np.float64) + 10 * num
        sub = grp.create_group(name="extra")
        s = sub.create_array(name="flag", shape=(n,), dtype="int32")
        s[...] = np.arange(n, dtype=np.int32)
    imm = zarr.create_group(store=store, path=ic.IMMUTABLE_DIR,
                            overwrite=True)
    st = imm.create_array(name="static", shape=(3,), dtype="float64")
    st[...] = np.array([1.5, 2.5, 3.5])
    session.commit("fixture")


def test_icechunk_roundtrip(spark, tmp_path, ic_libs):
    icechunk, zarr = ic_libs
    root = str(tmp_path / "repo")
    _reference_layout_repo(icechunk, zarr, root)
    coll = ic.open_icechunk_collection(spark, f"icechunk://{root}")
    assert coll.axis == "num"
    assert coll.partitions() == ["num=0", "num=1"]
    assert coll.partitions(filters="num == 1") == ["num=1"]
    out = coll.query()
    rows = out.orderBy("num", "value").collect()
    assert len(rows) == 8
    assert [r["value"] for r in rows[:4]] == [0.0, 1.0, 2.0, 3.0]
    assert [r["value"] for r in rows[4:]] == [10.0, 11.0, 12.0, 13.0]
    # nested group flattened to the path-mangled name
    assert rows[0]["extra/flag"] == 0
    # immutable variables attach as constant literals
    assert rows[0]["static"] == [1.5, 2.5, 3.5]
    # projection by short name
    proj = coll.query(variables=["value", "num"])
    assert sorted(proj.columns) == ["num", "static", "value"] or \
        sorted(proj.columns) == ["num", "value"]
    # no match -> None (quirk Q6 parity)
    assert coll.query(filters="num == 9") is None


def test_icechunk_history_and_time_travel(spark, tmp_path, ic_libs):
    icechunk, zarr = ic_libs
    root = str(tmp_path / "repo")
    _reference_layout_repo(icechunk, zarr, root)
    # a second commit adds a partition
    storage = icechunk.local_filesystem_storage(root)
    repo = icechunk.Repository.open(storage)
    session = repo.writable_session("main")
    grp = zarr.create_group(store=session.store, path="num=2",
                            overwrite=True)
    a = grp.create_array(name="num", shape=(2,), dtype="int64")
    a[...] = np.full(2, 2, dtype=np.int64)
    v = grp.create_array(name="value", shape=(2,), dtype="float64")
    v[...] = np.array([20.0, 21.0])
    sub = grp.create_group(name="extra")
    s = sub.create_array(name="flag", shape=(2,), dtype="int32")
    s[...] = np.zeros(2, dtype=np.int32)
    session.commit("add num=2")

    coll = ic.open_icechunk_collection(spark, root)
    hist = coll.history()
    assert hist[0]["message"] == "add num=2"
    assert coll.partitions() == ["num=0", "num=1", "num=2"]
    # read AS OF the fixture snapshot: the new partition is invisible
    fixture_snap = next(h["snapshot_id"] for h in hist
                        if h["message"] == "fixture")
    old = coll.at_snapshot(fixture_snap)
    assert old.partitions() == ["num=0", "num=1"]
    assert old.query().count() == 8


def test_open_collection_dispatches_icechunk_urls(spark, tmp_path):
    """open_collection('icechunk://...') routes to the bridge: with the
    optional libs absent that is the clear StoreError; with them, a
    CollectionNotFoundError for an empty dir (either way, the native
    path never sees the URL); mode='rw' is rejected before dispatch."""
    import zcollection_spark as zc
    from zcollection_spark.errors import (CollectionNotFoundError,
                                          ReadOnlyError)
    with pytest.raises((StoreError, CollectionNotFoundError)):
        zc.open_collection(spark, f"icechunk://{tmp_path}/nope")
    with pytest.raises(ReadOnlyError, match="read-only"):
        zc.open_collection(spark, f"icechunk://{tmp_path}/nope",
                           mode="rw")
