"""Advisory exclusive-writer lease (collection/lease.py).

Mutual exclusion for cooperating producers, built on the same
conditional-write CAS as catalog commits: create-only acquire,
token-conditional takeover of expired leases, heartbeat renewal that
fails loudly after a takeover, owner-checked release.
"""

from __future__ import annotations

import json
import threading
import time

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.collection.lease import LEASE_RELPATH, WriterLease
from zcollection_spark.errors import LeaseHeldError
from zcollection_spark.fs import LocalFS, MemoryFS


def test_acquire_blocks_second_writer(tmp_path):
    for fs, root in ((LocalFS(), str(tmp_path / "a")),
                     (MemoryFS(), "memory://lease-a")):
        a = WriterLease(fs, root, ttl=60).acquire()
        with pytest.raises(LeaseHeldError, match="held by"):
            WriterLease(fs, root, ttl=60).acquire()
        a.release()
        WriterLease(fs, root, ttl=60).acquire()  # free again


def test_expired_lease_taken_over_once(tmp_path):
    fs = LocalFS()
    root = str(tmp_path / "b")
    stale = WriterLease(fs, root, ttl=0.01).acquire()
    time.sleep(0.05)
    b = WriterLease(fs, root, ttl=60).acquire()  # takeover
    # the old holder's renew must FAIL (its token is stale)
    with pytest.raises(LeaseHeldError, match="taken over"):
        stale.renew()
    # and its release must not delete the new holder's lease
    stale.release()
    assert json.loads(fs.read_text(f"{root}/{LEASE_RELPATH}"))[
        "owner"] == b.owner


def test_renew_extends(tmp_path):
    fs = LocalFS()
    root = str(tmp_path / "c")
    lease = WriterLease(fs, root, ttl=0.2).acquire()
    for _ in range(3):
        time.sleep(0.1)
        lease.renew()
    # still held (renewals kept it alive past 3x the original ttl)
    with pytest.raises(LeaseHeldError):
        WriterLease(fs, root, ttl=60).acquire()
    lease.release()


def test_takeover_race_single_winner(tmp_path):
    """N racers on one expired lease: exactly one wins, the rest get
    LeaseHeldError — the CAS on the lease token decides."""
    fs = LocalFS()
    root = str(tmp_path / "d")
    WriterLease(fs, root, ttl=0.01).acquire()
    time.sleep(0.05)
    wins, losses = [], []

    def racer(i):
        try:
            wins.append(WriterLease(fs, root, ttl=60).acquire())
        except LeaseHeldError:
            losses.append(i)

    threads = [threading.Thread(target=racer, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(losses) == 5


def test_collection_context_manager(spark, seq_collection):
    with seq_collection.exclusive_writer(ttl=60):
        with pytest.raises(LeaseHeldError):
            seq_collection.exclusive_writer(ttl=60).acquire()
        pdf = pd.DataFrame({
            "num": np.array([9], dtype=np.int64),
            "value": [[1.0, 2.0, 3.0]],
            "static": [[10.0, 20.0, 30.0]]})
        seq_collection.insert(spark.createDataFrame(
            pdf, schema=seq_collection.schema.to_struct_type()))
    # released on exit
    seq_collection.exclusive_writer(ttl=60).acquire().release()


def test_lease_on_s3_native_cas(s3_root):
    from zcollection_spark.fs import S3FS
    fs = S3FS()
    a = WriterLease(fs, s3_root, ttl=60).acquire()
    with pytest.raises(LeaseHeldError):
        WriterLease(fs, s3_root, ttl=60).acquire()
    a.renew()
    a.release()
    WriterLease(fs, s3_root, ttl=60).acquire()


def test_zarr3_exclusive_writer_parity(spark, tmp_path):
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "z"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))
    with coll.exclusive_writer(ttl=60):
        with pytest.raises(LeaseHeldError):
            coll.exclusive_writer(ttl=60).acquire()
        pdf = pd.DataFrame({"i": np.array([0], dtype=np.int64),
                            "num": np.array([1], dtype=np.int64)})
        coll.insert(spark.createDataFrame(
            pdf, schema=coll.schema.to_struct_type()))
    coll.exclusive_writer(ttl=60).acquire().release()
