"""memory:// store + the store fixture matrix.

The reference runs every store-level fixture on memory × local
(``/root/reference/zcollection/tests/conftest.py:66-113``,
``store/memory.py:16``).  Spark executors are separate processes, so an
in-process memory store can honestly back only the METADATA surface —
config, catalog, staging protocol, partition walks — and that is
exactly the layer these fixtures parametrize across all three FS
implementations (LocalFS, MemoryFS, HadoopFS via file://).
"""

import uuid

import pytest

import zcollection_spark as zc
from zcollection_spark.collection import staging
from zcollection_spark.collection.catalog import Catalog
from zcollection_spark.fs import LocalFS, MemoryFS, fs_for


@pytest.fixture(params=["local", "memory", "hadoop"])
def store(request, tmp_path, spark):
    """(fs, root) across the store matrix; every root is unique."""
    if request.param == "local":
        return LocalFS(), str(tmp_path / "store")
    if request.param == "memory":
        return fs_for("memory://x"), f"memory://{uuid.uuid4().hex}/store"
    from zcollection_spark.fs import HadoopFS
    return HadoopFS(spark), f"file://{tmp_path}/store"


def test_fs_protocol_roundtrip(store):
    fs, root = store
    fs.write_text(f"{root}/a/_zcollection.json", '{"k": 1}')
    assert fs.exists(f"{root}/a/_zcollection.json")
    assert fs.read_text(f"{root}/a/_zcollection.json") == '{"k": 1}'
    fs.mkdirs(f"{root}/a/num=1")
    fs.mkdirs(f"{root}/a/num=2/sub=1")
    fs.mkdirs(f"{root}/a/_staging")  # hidden: excluded from walks
    assert fs.list_dirs(f"{root}/a") == ["_staging", "num=1", "num=2"]
    assert fs.list_partition_dirs(f"{root}/a", 1) == ["num=1", "num=2"]
    assert fs.list_partition_dirs(f"{root}/a", 2) == ["num=2/sub=1"]
    assert fs.rename(f"{root}/a/num=1", f"{root}/a/num=9")
    assert fs.list_partition_dirs(f"{root}/a", 1) == ["num=2", "num=9"]
    fs.delete(f"{root}/a")
    assert not fs.exists(f"{root}/a")
    assert fs.supports_atomic_rename(root) is True


def test_catalog_roundtrip_and_corrupt_fallback(store):
    fs, root = store
    cat = Catalog(fs, root, walk_depth=1)
    assert cat.read() is None
    cat.write(["num=1", "num=2"])
    assert cat.read() == ["num=1", "num=2"]
    cat.add(["num=3"])
    assert cat.read() == ["num=1", "num=2", "num=3"]
    # corrupt document reads as missing; add() falls back to a walk
    fs.write_text(f"{root}/_catalog/state.json", "{broken")
    assert cat.read() is None
    fs.mkdirs(f"{root}/num=1")
    fs.mkdirs(f"{root}/num=7")
    cat.add(["num=8"])
    assert cat.read() == ["num=1", "num=7", "num=8"]


def test_staging_publish_and_recover(store):
    """The full stage → intent → publish → recover protocol on every
    store implementation."""
    fs, root = store
    sid, staged = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged}/num=1")
    fs.write_text(f"{staged}/num=1/data", "v1")
    intent = staging.write_intent(fs, staged, mode="swap",
                                  relpaths=["num=1"])
    staging.apply_publish(fs, root, sid, staged, intent)
    assert fs.read_text(f"{root}/num=1/data") == "v1"
    assert not fs.exists(staged)

    # crashed-after-intent staging rolls forward; debris quarantines
    sid2, staged2 = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged2}/num=2")
    fs.write_text(f"{staged2}/num=2/data", "v2")
    staging.write_intent(fs, staged2, mode="swap", relpaths=["num=2"])
    fs.mkdirs(f"{root}/{staging.STAGING_RELPATH}/zombie/num=3")
    out = staging.recover(fs, root)
    assert out == {"published": [sid2], "quarantined": ["zombie"]}
    assert fs.read_text(f"{root}/num=2/data") == "v2"
    assert fs.exists(f"{root}/{staging.QUARANTINE_RELPATH}/zombie")
    assert fs.list_partition_dirs(root, 1) == ["num=1", "num=2"]


def test_collection_config_on_memory_store(spark, seq_schema):
    """create/open a collection rooted on memory:// — the config +
    catalog DDL path runs store-agnostic (bulk inserts need a
    Spark-reachable scheme and stay on local/file/object stores)."""
    root = f"memory://{uuid.uuid4().hex}/coll"
    coll = zc.create_collection(spark, root, schema=seq_schema,
                                axis="num",
                                partitioning=zc.Sequence(("num",)))
    assert isinstance(coll._fs, MemoryFS)
    assert coll.partitions() == []
    reopened = zc.open_collection(spark, root, mode="rw")
    assert reopened.schema.axis == "num"
    assert reopened.partitions() == []
    with pytest.raises(zc.CollectionExistsError):
        zc.create_collection(spark, root, schema=seq_schema, axis="num",
                             partitioning=zc.Sequence(("num",)))


def test_memory_fs_is_process_shared():
    """Two fs_for("memory://...") handles see the same namespace —
    the reference's shared-per-process memory store semantics."""
    a, b = fs_for("memory://shared"), fs_for("memory://shared")
    assert a is b
    key = f"memory://{uuid.uuid4().hex}/f"
    a.write_text(key, "x")
    assert b.read_text(key) == "x"


def test_cold_open_op_budget(spark, seq_collection, tmp_path, monkeypatch):
    """The scale claim behind the catalog: a cold open + partition list
    is O(1) GETs (config + catalog) and ZERO recursive LISTs; only a
    corrupt catalog falls back to a walk."""
    from zcollection_spark import fs as fsmod
    from zcollection_spark.fs import CountingFS

    probe = CountingFS(LocalFS())
    monkeypatch.setattr(fsmod, "fs_for", lambda p, s=None: probe)
    coll = zc.open_collection(spark, str(tmp_path / "seq"))
    parts = coll.partitions()
    assert parts == ["num=0", "num=1", "num=2"]
    assert 1 <= probe.counts["get"] <= 3
    assert probe.counts["list"] == 0

    (tmp_path / "seq" / "_catalog" / "state.json").write_text("{broken")
    probe.reset()
    coll2 = zc.open_collection(spark, str(tmp_path / "seq"))
    assert coll2.partitions() == parts
    assert probe.counts["list"] >= 1  # walk fallback engaged
