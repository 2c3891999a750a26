"""Conditional-write (compare-and-swap) metadata commits.

The catalog commit is the convergence point of every insert; when more
than one DRIVER (separate processes/hosts — think N concurrent ingest
jobs on a cluster) commits at once, a plain read-modify-write PUT loses
updates.  These tests pin the CAS layer at three levels:

- ``fs.write_if`` semantics per backend (create-only, stale-token
  conflict) — LocalFS lock-file CAS, MemoryFS in-lock CAS, S3FS native
  ``If-Match``/``If-None-Match`` conditional PUT against a real moto
  endpoint (the reference has no cross-writer catalog convergence at
  all — its catalog races last-wins, ``partitioning/catalog.py``).
- ``Catalog.add`` retry-merge: an interfering commit between the read
  and the conditional write must surface as a conflict, be re-read and
  re-merged — the union survives, nothing is lost.
- a genuine two-writer race (distinct per-writer locks, as across
  processes) over many rounds: the final catalog holds every partition
  both writers published.
"""

from __future__ import annotations

import json
import threading

import pytest

from zcollection_spark.collection import catalog as catmod
from zcollection_spark.collection.catalog import Catalog
from zcollection_spark.errors import CommitConflictError
from zcollection_spark.fs import LocalFS, MemoryFS

# ---------------------------------------------------------------------------
# fs.write_if contract, per backend
# ---------------------------------------------------------------------------


def _fs_cases(tmp_path):
    return [
        (LocalFS(), str(tmp_path / "local")),
        (MemoryFS(), "memory://cas"),
    ]


def test_write_if_create_and_update(tmp_path):
    for fs, root in _fs_cases(tmp_path):
        path = f"{root}/doc.json"
        assert fs.read_versioned(path) == (None, None)
        fs.write_if(path, "v1", None)  # create-only
        text, token = fs.read_versioned(path)
        assert text == "v1" and token is not None
        fs.write_if(path, "v2", token)  # conditional update
        text2, token2 = fs.read_versioned(path)
        assert text2 == "v2" and token2 != token


def test_write_if_conflicts(tmp_path):
    for fs, root in _fs_cases(tmp_path):
        path = f"{root}/doc.json"
        fs.write_if(path, "v1", None)
        _, token = fs.read_versioned(path)
        with pytest.raises(CommitConflictError):
            fs.write_if(path, "again", None)  # create-only on existing
        fs.write_if(path, "v2", token)
        with pytest.raises(CommitConflictError):
            fs.write_if(path, "v3", token)  # stale token
        assert fs.read_versioned(path)[0] == "v2"


def test_write_if_s3_native_conditional_put(s3_root):
    """S3: the CAS is a server-side conditional PUT — one API call, no
    lock objects in the bucket."""
    from zcollection_spark.fs import S3FS
    fs = S3FS()
    path = f"{s3_root}/doc.json"
    fs.write_if(path, "v1", None)
    text, etag = fs.read_versioned(path)
    assert text == "v1" and etag
    with pytest.raises(CommitConflictError):
        fs.write_if(path, "dup", None)
    fs.write_if(path, "v2", etag)
    with pytest.raises(CommitConflictError):
        fs.write_if(path, "v3", etag)  # stale ETag
    assert fs.read_versioned(path)[0] == "v2"
    # no lock debris next to the document
    assert fs.list_files(s3_root) == ["doc.json"]


def test_local_cas_breaks_stale_crashed_lock(tmp_path, monkeypatch):
    """A writer that crashed while holding the lock file must not wedge
    the store forever: past the TTL the next writer breaks the lock."""
    import zcollection_spark.fs as fsmod
    fs = LocalFS()
    path = str(tmp_path / "doc.json")
    fs.write_if(path, "v1", None)
    lock = f"{path}.__cas_lock__"
    open(lock, "w").close()
    import os
    old = os.stat(lock).st_mtime - 3600
    os.utime(lock, (old, old))  # crash an hour ago
    monkeypatch.setattr(fsmod, "_LOCK_TTL_S", 0.5)
    _, token = fs.read_versioned(path)
    fs.write_if(path, "v2", token)  # breaks the stale lock, commits
    assert fs.read_versioned(path)[0] == "v2"


# ---------------------------------------------------------------------------
# Catalog.add: retry-merge on conflict
# ---------------------------------------------------------------------------


class _InterferingFS(LocalFS):
    """Simulates another PROCESS committing between our read and our
    conditional write: the first ``write_if`` first lets a hidden writer
    land a commit, so the caller's token is stale."""

    def __init__(self, interfere_with: list[str]):
        self._pending = list(interfere_with)

    def write_if(self, path, data, token):
        if self._pending:
            doc = {"format_version": 1,
                   "partitions": sorted(self._pending),
                   "checksum": catmod._checksum(sorted(self._pending))}
            self._pending = []
            LocalFS.write_text(self, path, json.dumps(doc))
        return LocalFS.write_if(self, path, data, token)


def test_catalog_add_retries_and_merges_on_conflict(tmp_path):
    fs = _InterferingFS(["num=9"])
    cat = Catalog(fs, str(tmp_path / "store"))
    merged = cat.add(["num=1", "num=2"])
    # the interfering writer's partition survives the race
    assert merged == ["num=1", "num=2", "num=9"]
    assert cat.read() == ["num=1", "num=2", "num=9"]


def test_catalog_conflict_preserves_txn_ledger(tmp_path):
    """Two streaming apps committing concurrently must not lose each
    other's exactly-once ledger entries."""
    fs = _InterferingFS([])
    cat = Catalog(fs, str(tmp_path / "store"))
    cat.add(["num=1"], txn=("appA", 7))

    class _TxnInterferer(LocalFS):
        fired = False

        def write_if(self, path, data, token):
            if not _TxnInterferer.fired:
                _TxnInterferer.fired = True
                # another driver commits num=5 + its ledger entry via a
                # raw conditional write (same path, fresh token) — our
                # caller's token is now stale → conflict → retry
                text, tok = LocalFS.read_versioned(self, path)
                doc = json.loads(text)
                parts = sorted(set(doc["partitions"]) | {"num=5"})
                txn = dict(doc.get("txn", {}))
                txn["appB"] = 3
                doc.update(partitions=parts, txn=txn,
                           checksum=catmod._checksum(parts))
                LocalFS.write_if(self, path, json.dumps(doc), tok)
            return LocalFS.write_if(self, path, data, token)

    cat2 = Catalog(_TxnInterferer(), str(tmp_path / "store"))
    cat2.add(["num=2"], txn=("appA", 8))
    assert cat2.read() == ["num=1", "num=2", "num=5"]
    assert cat2.read_txn("appA") == 8
    assert cat2.read_txn("appB") == 3


def test_catalog_exhausted_retries_raise(tmp_path, monkeypatch):
    class _AlwaysConflict(LocalFS):
        def write_if(self, path, data, token):
            raise CommitConflictError(path)

    monkeypatch.setattr(catmod, "_CAS_RETRIES", 3)
    cat = Catalog(_AlwaysConflict(), str(tmp_path / "store"))
    with pytest.raises(CommitConflictError):
        cat.add(["num=1"])


# ---------------------------------------------------------------------------
# genuine two-writer race (cross-process simulation: per-writer locks)
# ---------------------------------------------------------------------------


class _FreshLocks:
    """Every access returns a fresh lock — removes the in-process
    serialization so the race is decided by CAS alone, exactly the
    cross-process situation."""

    def __getitem__(self, key):
        return threading.Lock()


def test_two_racing_writers_lose_nothing(tmp_path, monkeypatch):
    monkeypatch.setattr(catmod, "_LOCKS", _FreshLocks())
    root = str(tmp_path / "store")
    errors: list[Exception] = []

    def writer(tag: str):
        cat = Catalog(LocalFS(), root)  # own instance, own fs: a driver
        try:
            for i in range(20):
                cat.add([f"num={tag}{i}"])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in "ab"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    final = Catalog(LocalFS(), root).read()
    expect = sorted({f"num={t}{i}" for t in "ab" for i in range(20)})
    assert final == expect  # 40/40 — no lost update, no repair needed


def test_s3_head_propagates_non_404(s3_root, monkeypatch):
    """Only a 404 means 'absent'.  A throttle/5xx answered as missing
    would make recovery re-park a published generation and wedge the
    partition — transient faults must surface."""
    from botocore.exceptions import ClientError
    from zcollection_spark.fs import S3FS
    fs = S3FS()
    fs.write_text(f"{s3_root}/obj", "x")

    real = fs._client.head_object

    def flaky(Bucket, Key):
        raise ClientError(
            {"Error": {"Code": "SlowDown", "Message": "throttled"},
             "ResponseMetadata": {"HTTPStatusCode": 503}},
            "HeadObject")

    monkeypatch.setattr(fs._client, "head_object", flaky)
    with pytest.raises(ClientError):
        fs.exists_file(f"{s3_root}/obj")
    monkeypatch.setattr(fs._client, "head_object", real)
    assert fs.exists_file(f"{s3_root}/obj") is True
    assert fs.exists_file(f"{s3_root}/missing") is False


def test_catalog_write_is_cas_serialized_no_duplicate_generation(tmp_path):
    """ADVICE r5 (medium): the rebuild path (Catalog.write) must ride
    the same CAS loop as add/remove — an unconditional read-then-PUT
    racing a concurrent add could mint a DUPLICATE generation (both
    read gen N, both write N+1), overwriting the add's gen-(N+1)
    snapshot with a different document and corrupting changes() replay."""
    fs = _InterferingFS([])
    cat = Catalog(fs, str(tmp_path / "store"))
    cat.add(["num=1"])                       # gen 1

    class _AddInterferer(LocalFS):
        fired = False

        def write_if(self, path, data, token):
            if not _AddInterferer.fired:
                _AddInterferer.fired = True
                # a concurrent driver lands an add (gen 2) between the
                # rebuild's read and its conditional write (raw write —
                # a Catalog.add here would self-deadlock on the
                # in-process per-path lock the caller already holds)
                text, tok = LocalFS.read_versioned(self, path)
                doc = json.loads(text)
                parts = sorted(set(doc["partitions"]) | {"num=7"})
                gen = int(doc.get("generation", 0)) + 1
                doc.update(partitions=parts, generation=gen,
                           touched={"num=7": gen},
                           checksum=catmod._checksum(parts))
                LocalFS.write_if(self, path, json.dumps(doc), tok)
                LocalFS.write_text(
                    self,
                    str(tmp_path / "store" / "_catalog"
                        / f"gen-{gen:012d}.json"),
                    json.dumps(doc))
            return LocalFS.write_if(self, path, data, token)

    cat2 = Catalog(_AddInterferer(), str(tmp_path / "store"))
    cat2.write(["num=1", "num=3"])           # rebuild: replaces the list
    # the rebuild retried with a fresh token and took gen 3 — gen 2 is
    # still the interfering add's snapshot, not overwritten
    assert cat2.generation() == 3
    assert cat2.read() == ["num=1", "num=3"]
    assert cat2.read_at(2)["partitions"] == ["num=1", "num=7"]
    assert cat2.read_at(3)["partitions"] == ["num=1", "num=3"]
    # every partition restamped with the rebuild generation
    assert cat2.read_at(3)["touched"] == {"num=1": 3, "num=3": 3}
