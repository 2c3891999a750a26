"""Fault-injection tests for the stage → intent → publish protocol.

The reference's transactional contract (a failed insert rolls back
completely, an interrupted one is repaired — ``/root/reference/
zcollection/store/icechunk_store.py:158-168``, ``tests/test_icechunk.py:64``)
is emulated here by staging + an intent file + idempotent renames
(``collection/staging.py``).  These tests kill the write at every
distinct protocol state, on BOTH layouts, and assert that ``recover``
(via ``repair_catalog``) converges to a consistent store:

- crash after the intent but before ANY publish rename → roll forward
- crash mid-publish (some partitions swapped, one parked-but-absent)
  → roll forward, no torn state after repair
- intent-less staging debris → quarantined, never resurrected by a walk
- append-mode crash → roll forward without duplicating rows
- every recovery is idempotent (a second repair changes nothing)
"""

import json

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.collection import staging


class CrashAfterRenames:
    """FS wrapper that dies once ``allowed`` publish renames completed.

    Only renames that touch ``_staging`` count (publish parking/moves);
    unrelated renames (immutable tmp files, catalog swaps) pass through.
    """

    def __init__(self, inner, allowed: int):
        self._inner = inner
        self._allowed = allowed
        self.publish_renames = 0

    def rename(self, src: str, dst: str) -> bool:
        if "_staging" in src or "_staging" in dst:
            if self.publish_renames >= self._allowed:
                raise RuntimeError("injected crash during publish")
            self.publish_renames += 1
        return self._inner.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _replacement(spark, schema, value: float) -> "pd.DataFrame":
    bound = schema.with_partition_axis("num")
    pdf = pd.DataFrame({
        "num": np.array([0, 0, 1, 1, 2, 2, 2], dtype=np.int64),
        "value": [[value] * 3] * 7,
        "static": [[10.0, 20.0, 30.0]] * 7,
    })
    return spark.createDataFrame(pdf, schema=bound.to_struct_type())


def _staged_ids(tmp_path) -> list[str]:
    root = tmp_path / "seq" / staging.STAGING_RELPATH
    return sorted(p.name for p in root.iterdir()) if root.is_dir() else []


@pytest.mark.parametrize("allowed_renames", [0, 1, 3])
def test_crash_mid_swap_publish_rolls_forward(spark, tmp_path,
                                              seq_collection, seq_schema,
                                              allowed_renames):
    """Kill the publish after k renames: k=0 is crash-right-after-intent,
    k=1 leaves partition num=0 PARKED (absent from the final tree — the
    documented swap window), k=3 leaves a torn old/new mix.  All states
    must roll forward to the fully-new store on repair."""
    coll = seq_collection
    real_fs = coll._fs
    coll._fs = CrashAfterRenames(real_fs, allowed_renames)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            coll.insert(_replacement(spark, seq_schema, 99.0))
    finally:
        coll._fs = real_fs

    # the intent landed before the crash: staged data is complete
    [sid] = _staged_ids(tmp_path)
    intent_file = (tmp_path / "seq" / staging.STAGING_RELPATH / sid
                   / staging.INTENT_NAME)
    assert intent_file.exists()
    intent = json.loads(intent_file.read_text())
    assert intent["mode"] == "swap"
    assert intent["relpaths"] == ["num=0", "num=1", "num=2"]

    repaired = coll.repair_catalog()
    assert repaired == ["num=0", "num=1", "num=2"]
    assert _staged_ids(tmp_path) == []  # staging cleaned up

    rows = coll.query().collect()
    assert len(rows) == 7
    # no torn state: EVERY row carries the new payload
    assert all(r["value"] == [99.0, 99.0, 99.0] for r in rows)

    # idempotent: a second repair is a no-op with the same outcome
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert coll.query().count() == 7


def test_crash_mid_append_publish_no_duplicates(spark, tmp_path,
                                                seq_collection, seq_schema):
    """Append-mode (concat) crash before any staged file moved: recover
    must move every file exactly once — re-publish after a partial move
    skips already-moved files (collision-free ``{id}-`` names)."""
    coll = seq_collection
    bound = seq_schema.with_partition_axis("num")
    extra = spark.createDataFrame(
        pd.DataFrame({"num": np.array([1, 1], dtype=np.int64),
                      "value": [[7.0] * 3] * 2,
                      "static": [[10.0, 20.0, 30.0]] * 2}),
        schema=bound.to_struct_type())
    real_fs = coll._fs
    coll._fs = CrashAfterRenames(real_fs, 0)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            coll.insert(extra, merge="concat")
    finally:
        coll._fs = real_fs

    [sid] = _staged_ids(tmp_path)
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert coll.query().count() == 9  # 7 original + 2 appended, no dups
    assert coll.query(filters="num == 1").count() == 4
    # the appended files carry the staging id prefix (collision-free)
    part_dir = tmp_path / "seq" / "num=1"
    assert any(p.name.startswith(f"{sid}-") for p in part_dir.iterdir())
    # double-publish safety: recovering again changes nothing
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert coll.query().count() == 9


def test_intentless_debris_is_quarantined_not_resurrected(spark, tmp_path,
                                                          seq_collection):
    """A write that died before its intent leaves uncommitted partial
    output.  It must be QUARANTINED — never merged into the store by a
    walk, never listed as a partition, and stable across repeat
    repairs."""
    coll = seq_collection
    debris = tmp_path / "seq" / staging.STAGING_RELPATH / "deadbeef" / "num=7"
    debris.mkdir(parents=True)
    (debris / "part-00000.parquet").write_bytes(b"partial garbage")

    # hidden prefix: invisible to partition walks even before repair
    assert "num=7" not in coll.partitions()
    assert coll.query(filters="num == 7") is None

    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    qdir = tmp_path / "seq" / staging.QUARANTINE_RELPATH / "deadbeef"
    assert (qdir / "num=7" / "part-00000.parquet").exists()
    assert not (tmp_path / "seq" / staging.STAGING_RELPATH
                / "deadbeef").exists()
    assert "num=7" not in coll.partitions()
    assert coll.query(filters="num == 7") is None

    # idempotent: repairing again neither errors nor resurrects
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert (qdir / "num=7" / "part-00000.parquet").exists()


def test_recover_reports_published_and_quarantined(tmp_path):
    """Protocol-level recover(): one staged-with-intent dir rolls
    forward, one intent-less dir is quarantined, in a single pass."""
    from zcollection_spark.fs import LocalFS
    fs = LocalFS()
    root = str(tmp_path / "store")

    # staged insert WITH intent (crashed before any rename)
    sid, staged = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged}/num=5")
    fs.write_text(f"{staged}/num=5/data.parquet", "payload")
    staging.write_intent(fs, staged, mode="swap", relpaths=["num=5"])
    # intent-less debris
    fs.mkdirs(f"{root}/{staging.STAGING_RELPATH}/zombie/num=6")

    out = staging.recover(fs, root)
    assert out == {"published": [sid], "quarantined": ["zombie"]}
    assert fs.read_text(f"{root}/num=5/data.parquet") == "payload"
    assert fs.exists(f"{root}/{staging.QUARANTINE_RELPATH}/zombie/num=6")
    # converged: second pass finds nothing to do
    assert staging.recover(fs, root) == {"published": [],
                                         "quarantined": []}


@pytest.mark.parametrize("allowed_renames", [0, 1, 3])
def test_zarr_layout_crash_mid_publish_rolls_forward(spark, tmp_path,
                                                     allowed_renames):
    """Same protocol states on the ZARR layout: executors stage zarr
    partition groups, publish renames them in; a crash at any point
    after the intent must roll forward via repair_catalog."""
    from zcollection_spark.zarr3.collection import create_zarr_collection

    schema = (zc.SchemaBuilder().add_dimension("num")
              .add_variable("num", "int64", ("num",))
              .add_variable("v", "float64", ("num",))
              .build("num"))
    coll = create_zarr_collection(spark, str(tmp_path / "z"),
                                  schema=schema, axis="num",
                                  partitioning=zc.Sequence(("num",)))
    first = pd.DataFrame({"num": np.array([0, 0, 1, 2], dtype=np.int64),
                          "v": [1.0, 1.0, 1.0, 1.0]})
    coll.insert(spark.createDataFrame(first, schema=schema.to_struct_type()))
    assert coll.query().count() == 4

    replacement = pd.DataFrame(
        {"num": np.array([0, 0, 1, 2], dtype=np.int64),
         "v": [2.0, 2.0, 2.0, 2.0]})
    real_fs = coll._fs
    coll._fs = CrashAfterRenames(real_fs, allowed_renames)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            coll.insert(spark.createDataFrame(
                replacement, schema=schema.to_struct_type()))
    finally:
        coll._fs = real_fs

    staging_root = tmp_path / "z" / staging.STAGING_RELPATH
    assert any(staging_root.iterdir())  # crash left staged state behind

    repaired = coll.repair_catalog()
    assert repaired == ["num=0", "num=1", "num=2"]
    rows = coll.query().collect()
    assert len(rows) == 4
    assert all(r["v"] == 2.0 for r in rows)  # fully new, no torn mix
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert coll.query().count() == 4


def test_publish_renames_run_in_parallel(tmp_path):
    """The publish loop must not be sequential in partition count: with a
    per-rename latency of ~15 ms and 24 partitions, a sequential publish
    needs >= 360 ms; the pooled publish must land well under that."""
    import time
    from zcollection_spark.fs import LocalFS

    class SlowFS(LocalFS):
        def rename(self, src, dst):
            time.sleep(0.015)
            return super().rename(src, dst)

    fs = SlowFS()
    root = str(tmp_path / "store")
    sid, staged = staging.new_staging_dir(fs, root)
    rels = [f"num={i}" for i in range(24)]
    for rel in rels:
        fs.mkdirs(f"{staged}/{rel}")
        fs.write_text(f"{staged}/{rel}/data.parquet", "x")
    intent = staging.write_intent(fs, staged, mode="swap", relpaths=rels)
    t0 = time.monotonic()
    staging.apply_publish(fs, root, sid, staged, intent)
    elapsed = time.monotonic() - t0
    assert all(fs.exists(f"{root}/{rel}/data.parquet") for rel in rels)
    # 24 renames x 15 ms sequential = 360 ms; the 16-way pool needs ~2
    # waves (~30 ms) + overhead.  300 ms keeps margin on a loaded host
    # while still cleanly rejecting the sequential shape.
    assert elapsed < 0.3, f"publish looks sequential: {elapsed:.3f}s"


def test_failed_publish_rename_raises_loudly(tmp_path):
    """A rename that reports failure (permissions, unexpected dst) must
    abort the publish with StoreError — not silently skip the partition
    while the commit proceeds.  Staging + intent survive for recover."""
    from zcollection_spark.errors import StoreError
    from zcollection_spark.fs import LocalFS

    class RefusingFS(LocalFS):
        def rename(self, src, dst):
            if "_staging" in src:
                return False  # simulate a silent FS-level failure
            return super().rename(src, dst)

    fs = RefusingFS()
    root = str(tmp_path / "store")
    sid, staged = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged}/num=1")
    fs.write_text(f"{staged}/num=1/data", "v1")
    intent = staging.write_intent(fs, staged, mode="swap",
                                  relpaths=["num=1"])
    with pytest.raises(StoreError, match="publish rename failed"):
        staging.apply_publish(fs, root, sid, staged, intent)
    # nothing committed, staged state intact for a later recover
    assert fs.exists(f"{staged}/num=1/data")
    assert not fs.exists(f"{root}/num=1")
    out = staging.recover(LocalFS(), root)  # healthy FS: rolls forward
    assert out["published"] == [sid]
    assert fs.read_text(f"{root}/num=1/data") == "v1"


def test_cleanup_deletes_intent_before_staging_dir(tmp_path):
    """Cleanup ordering is the convergence guarantee on object stores
    (recursive deletes are unordered there): the intent must be deleted
    FIRST, as its own atomic object delete, so a crash mid-cleanup
    leaves intent-less debris — never an intent whose staged manifest
    files are already gone."""
    from zcollection_spark.fs import LocalFS

    deletes: list[str] = []

    class RecordingFS(LocalFS):
        def delete(self, path):
            deletes.append(path)
            super().delete(path)

    fs = RecordingFS()
    root = str(tmp_path / "store")
    sid, staged = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged}/num=1")
    fs.write_text(f"{staged}/num=1/data.parquet", "v1")
    intent = staging.write_intent(fs, staged, mode="swap",
                                  relpaths=["num=1"])
    staging.apply_publish(fs, root, sid, staged, intent)
    staging_deletes = [p for p in deletes if staging.STAGING_RELPATH in p]
    assert staging_deletes[0].endswith(staging.INTENT_NAME)
    assert staging_deletes[1:] == [staged]


def test_crash_mid_cleanup_quarantines_not_republishes(tmp_path):
    """Crash between the intent delete and the staging-dir delete (the
    manifest-path hazard from ADVICE r4): the residue has no intent, so
    recover() must QUARANTINE it — re-running phase 1 would park the
    just-published generation and wedge repair forever."""
    from tests.test_nonlocal_store import ObjectStoreFS

    fs = ObjectStoreFS()
    root = str(tmp_path / "store")
    fs.write_text(f"{root}/num=1/f.parquet", "old")
    sid, staged = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged}/num=1")
    fs.write_text(f"{staged}/num=1/f.parquet", "new")
    intent = staging.write_intent(
        fs, staged, mode="swap", relpaths=["num=1"],
        manifests={"num=1": ["f.parquet"]})

    class CrashOnStagingDirDelete(ObjectStoreFS):
        def delete(self, path):
            if path.rstrip("/").endswith(sid):
                raise RuntimeError("injected crash during cleanup")
            super().delete(path)

    with pytest.raises(RuntimeError, match="injected crash during"):
        staging.apply_publish(CrashOnStagingDirDelete(), root, sid,
                              staged, intent)
    # intent already gone (deleted first); published data in place
    assert not fs.exists(f"{staged}/{staging.INTENT_NAME}")
    assert fs.read_text(f"{root}/num=1/f.parquet") == "new"

    out = staging.recover(fs, root)
    assert out == {"published": [], "quarantined": [sid]}
    # the new generation was NOT parked away by a spurious re-publish
    assert fs.read_text(f"{root}/num=1/f.parquet") == "new"
    assert staging.recover(fs, root) == {"published": [],
                                         "quarantined": []}


def test_quarantine_rename_refused_is_reported_unresolved(tmp_path):
    """An FS that refuses the quarantine rename must NOT be reported as
    quarantined (ADVICE r4): the debris stays visible as unresolved and
    recover() stays stable across repeats instead of lying."""
    from zcollection_spark.fs import LocalFS

    class NoQuarantineFS(LocalFS):
        def rename(self, src, dst):
            if staging.QUARANTINE_RELPATH in dst:
                return False
            return super().rename(src, dst)

    fs = NoQuarantineFS()
    root = str(tmp_path / "store")
    fs.mkdirs(f"{root}/{staging.STAGING_RELPATH}/zombie/num=6")
    out = staging.recover(fs, root)
    assert out["quarantined"] == []
    assert out["unresolved"] == ["zombie"]
    assert fs.exists(f"{root}/{staging.STAGING_RELPATH}/zombie")
    # stable: repeat reports the same, never crashes or double-moves
    assert staging.recover(fs, root)["unresolved"] == ["zombie"]


def test_quarantine_dst_collision_uses_unique_suffix(tmp_path):
    """A half-quarantined id from a prior crash leaves the destination
    occupied; recover() must fall back to a unique suffix instead of
    failing (or silently dropping) the debris."""
    from zcollection_spark.fs import LocalFS

    fs = LocalFS()
    root = str(tmp_path / "store")
    fs.mkdirs(f"{root}/{staging.STAGING_RELPATH}/zombie/num=6")
    fs.write_text(f"{root}/{staging.STAGING_RELPATH}/zombie/num=6/d", "x")
    # destination already occupied by a prior half-quarantine
    fs.mkdirs(f"{root}/{staging.QUARANTINE_RELPATH}/zombie/num=5")
    out = staging.recover(fs, root)
    assert out["quarantined"] == ["zombie"]
    assert not fs.exists(f"{root}/{staging.STAGING_RELPATH}/zombie")
    suffixed = [d for d in fs.list_dirs(f"{root}/{staging.QUARANTINE_RELPATH}")
                if d.startswith("zombie-")]
    assert len(suffixed) == 1
    assert fs.read_text(f"{root}/{staging.QUARANTINE_RELPATH}/"
                        f"{suffixed[0]}/num=6/d") == "x"


def test_crash_during_catalog_commit_converges(spark, tmp_path,
                                               seq_collection, seq_schema):
    """Crash AFTER all publish renames but DURING the catalog add: the
    staging dir (with intent) survives, and recovery re-publishes
    (no-op moves) + commits the catalog idempotently."""
    coll = seq_collection

    class BoomOnce:
        def __init__(self, inner):
            self._inner = inner
            self.fired = False

        def add(self, new, txn=None, stats=None, widen=False):
            if not self.fired:
                self.fired = True
                raise RuntimeError("injected catalog crash")
            return self._inner.add(new, txn=txn, stats=stats, widen=widen)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real_catalog = coll._catalog
    coll._catalog = BoomOnce(real_catalog)
    try:
        with pytest.raises(RuntimeError, match="injected catalog crash"):
            coll.insert(_replacement(spark, seq_schema, 42.0))
    finally:
        coll._catalog = real_catalog

    # data fully published (renames ran), catalog behind, staging kept
    assert _staged_ids(tmp_path) != []
    assert coll.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert _staged_ids(tmp_path) == []
    rows = coll.query().collect()
    assert len(rows) == 7
    assert all(r["value"] == [42.0, 42.0, 42.0] for r in rows)
