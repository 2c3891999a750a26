"""Concurrent-writer semantics of the staged publish protocol.

The staging docstring claims writer isolation via unique staging ids
and last-publish-wins per partition, with the catalog converging to the
union of published partitions.  These tests PIN that behavior — first
with a deterministic protocol-level interleaving, then with two real
threads racing ``Collection.insert`` end-to-end.

Semantics pinned (and documented in staging.py):

- each partition is wholly one writer's generation after both publishes
  (per-partition atomicity — never a row-level mix),
- across partitions the outcome may be torn between writers (readers
  that need one snapshot gate on the catalog generation),
- a publish that loses a rename race fails LOUDLY with its staging +
  intent intact, and ``repair_catalog`` rolls it forward (making the
  loser win the affected partitions — still a single generation each).

Catalog-commit convergence across writers is CAS-guaranteed (versioned
read + conditional write, ``Catalog._commit_rmw``) — the commit-level
races, including cross-process ones, are pinned in test_cas.py.
"""

import threading

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.collection import staging
from zcollection_spark.errors import StoreError
from zcollection_spark.fs import LocalFS


def _seq_df(spark, schema, nums, value):
    bound = schema.with_partition_axis("num")
    pdf = pd.DataFrame({
        "num": np.array(nums, dtype=np.int64),
        "value": [[value] * 3] * len(nums),
        "static": [[10.0, 20.0, 30.0]] * len(nums)})
    return spark.createDataFrame(pdf, schema=bound.to_struct_type())


def test_two_staged_publishes_deterministic_interleaving(tmp_path):
    """A and B stage overlapping partitions; whoever PUBLISHES a
    partition last owns it.  The catalog ends as the union."""
    fs = LocalFS()
    root = str(tmp_path / "store")

    sid_a, staged_a = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged_a}/num=1")
    fs.write_text(f"{staged_a}/num=1/data", "A1")
    fs.mkdirs(f"{staged_a}/num=2")
    fs.write_text(f"{staged_a}/num=2/data", "A2")
    intent_a = staging.write_intent(fs, staged_a, mode="swap",
                                    relpaths=["num=1", "num=2"])

    sid_b, staged_b = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged_b}/num=1")
    fs.write_text(f"{staged_b}/num=1/data", "B1")
    intent_b = staging.write_intent(fs, staged_b, mode="swap",
                                    relpaths=["num=1"])

    staging.apply_publish(fs, root, sid_a, staged_a, intent_a)
    staging.apply_publish(fs, root, sid_b, staged_b, intent_b)

    # B published num=1 last → B owns it; num=2 stays A's
    assert fs.read_text(f"{root}/num=1/data") == "B1"
    assert fs.read_text(f"{root}/num=2/data") == "A2"
    # no staging debris, nothing for recover to do
    assert staging.recover(fs, root) == {"published": [],
                                         "quarantined": []}


def test_publish_rename_race_loser_fails_loudly_then_recovers(tmp_path):
    """The precise race: A and B both passed the dst-exists check, A
    renames first, B's rename hits an occupied dst → B must raise
    StoreError (never silently skip), and recover() rolls B forward —
    B ends up owning the partition, still one whole generation."""
    fs = LocalFS()
    root = str(tmp_path / "store")

    sid_a, staged_a = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged_a}/num=1")
    fs.write_text(f"{staged_a}/num=1/data", "A")
    intent_a = staging.write_intent(fs, staged_a, mode="swap",
                                    relpaths=["num=1"])
    sid_b, staged_b = staging.new_staging_dir(fs, root)
    fs.mkdirs(f"{staged_b}/num=1")
    fs.write_text(f"{staged_b}/num=1/data", "B")
    intent_b = staging.write_intent(fs, staged_b, mode="swap",
                                    relpaths=["num=1"])

    class RaceFS(LocalFS):
        """Sneaks A's publish in right before B's final rename."""

        def __init__(self):
            self.armed = True

        def rename(self, src, dst):
            if self.armed and src == f"{staged_b}/num=1":
                self.armed = False
                staging.apply_publish(fs, root, sid_a, staged_a,
                                      intent_a)
            return super().rename(src, dst)

    with pytest.raises(StoreError, match="publish rename failed"):
        staging.apply_publish(RaceFS(), root, sid_b, staged_b, intent_b)
    # B's staging + intent survive; roll-forward makes B the owner
    out = staging.recover(fs, root)
    assert out["published"] == [sid_b]
    assert fs.read_text(f"{root}/num=1/data") == "B"
    assert staging.recover(fs, root) == {"published": [],
                                         "quarantined": []}


def test_threaded_collection_inserts_converge(spark, tmp_path,
                                              seq_schema):
    """Two real threads race ``insert`` on the same partitions.  After
    repair, every partition is wholly ONE writer's generation, the
    catalog matches the store, and row counts are a single generation's
    (no union of both, no partial partition)."""
    path = str(tmp_path / "cc")
    coll_a = zc.create_collection(spark, path, schema=seq_schema,
                                  axis="num",
                                  partitioning=zc.Sequence(("num",)))
    coll_b = zc.open_collection(spark, path, mode="rw")

    barrier = threading.Barrier(2)
    failures: list[Exception] = []

    def worker(coll, value):
        try:
            barrier.wait(timeout=60)
            coll.insert(_seq_df(spark, seq_schema, [0, 0, 1, 2], value))
        except Exception as exc:  # raced loser may fail loudly
            failures.append(exc)

    threads = [threading.Thread(target=worker, args=(coll_a, 5.0)),
               threading.Thread(target=worker, args=(coll_b, 9.0))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    # a loser failing loudly is allowed; silent corruption is not
    assert len(failures) <= 1, failures
    if failures:
        assert isinstance(failures[0], (StoreError, RuntimeError)), \
            failures

    assert coll_a.repair_catalog() == ["num=0", "num=1", "num=2"]
    rows = coll_a.query().collect()
    assert len(rows) == 4  # one generation's row count, never a union
    by_part: dict = {}
    for row in rows:
        by_part.setdefault(row["num"], set()).add(tuple(row["value"]))
    for num, values in by_part.items():
        assert len(values) == 1, f"mixed generations in num={num}"
        assert values.pop() in {(5.0, 5.0, 5.0), (9.0, 9.0, 9.0)}
    # catalog agrees with the store and repair stays idempotent
    assert coll_a.repair_catalog() == ["num=0", "num=1", "num=2"]
    assert coll_a.query().count() == 4
