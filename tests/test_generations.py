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


def test_history_ledger_describes_each_commit(spark, tmp_path):
    """Collection.history: one row per generation, newest first, with
    exactly what that commit added/replaced/removed — and the streaming
    txn ledger rides along."""
    coll = _mk(spark, str(tmp_path / "h"))
    coll.insert(_df(spark, coll, [(1, 1.0), (2, 2.0)]))
    coll.insert(_df(spark, coll, [(2, 9.0)]), merge="replace")
    coll.insert(_df(spark, coll, [(3, 3.0)]),
                txn=("app-x", 7))
    coll.drop_partitions(filters="num == 1")

    hist = coll.history()
    gens = [h["generation"] for h in hist]
    assert gens == sorted(gens, reverse=True)

    by_gen = {h["generation"]: h for h in hist}
    g0 = min(gens)                       # create: the empty catalog
    assert by_gen[g0]["added"] == [] and by_gen[g0]["n_partitions"] == 0
    assert by_gen[g0 + 1]["added"] == ["num=1", "num=2"]
    assert by_gen[g0 + 2]["added"] == ["num=2"]     # replacement
    assert by_gen[g0 + 3]["added"] == ["num=3"]
    assert by_gen[g0 + 3]["txn"] == {"app-x": 7}
    drop = by_gen[g0 + 4]
    assert drop["added"] == [] and drop["removed"] == ["num=1"]
    assert drop["n_partitions"] == 2

    # limit caps the ledger from the newest end
    assert [h["generation"] for h in coll.history(limit=2)] \
        == gens[:2]
    # limit=0 would slice [-0:] == everything — rejected loudly
    import pytest
    with pytest.raises(ValueError, match="limit"):
        coll.history(limit=0)
    with pytest.raises(ValueError, match="limit"):
        coll.history(limit=-1)


def test_history_cli_and_zarr_parity(spark, tmp_path, capsys):
    """The CLI surface prints the same ledger; ZarrCollection exposes
    the identical API (shared catalog machinery)."""
    import json as _json
    from zcollection_spark.cli import main as cli_main
    coll = _mk(spark, str(tmp_path / "hc"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    rc = cli_main(["history", str(tmp_path / "hc"), "--limit", "3"])
    assert rc == 0
    rows = _json.loads(capsys.readouterr().out)
    assert rows[0]["added"] == ["num=1"]

    from zcollection_spark.schema import infer_schema
    from zcollection_spark.zarr3.collection import create_zarr_collection
    ev = _df(spark, coll, [(1, 1.0)])
    zcoll = create_zarr_collection(
        spark, str(tmp_path / "hz"),
        schema=infer_schema(ev.schema, axis="i"), axis="i",
        partitioning=zc.Sequence(("num",)))
    zcoll.insert(ev)
    zhist = zcoll.history()
    assert zhist[0]["added"] == ["num=1"]


# ---------------------------------------------------------------------------
# time-travel reads (query/partitions at_generation) — VERSION AS OF
# ---------------------------------------------------------------------------


def test_query_at_generation_append_only_history(spark, tmp_path):
    """The batch complement of changes(): an append-only history is
    exactly reconstructable at every retained generation, and the
    current read is unaffected."""
    coll = _mk(spark, str(tmp_path / "tt"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    g1 = coll.generation()
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g2 = coll.generation()
    coll.insert(_df(spark, coll, [(3, 3.0)]))
    g3 = coll.generation()
    assert coll.partitions(at_generation=g2) == ["num=1", "num=2"]
    rows = coll.query(at_generation=g2).select("num").collect()
    assert sorted(r.num for r in rows) == [1, 2]
    # key filters compose with the historical partition list
    only = coll.query(filters="num == 1", at_generation=g2).collect()
    assert len(only) == 1 and only[0].value == 1.0
    # earliest and current generations both reconstruct
    assert [r.num for r in
            coll.query(at_generation=g1).select("num").collect()] == [1]
    assert coll.partitions(at_generation=g3) == ["num=1", "num=2",
                                                 "num=3"]
    # the present-day read is untouched by any of the above
    assert sorted(r.num for r in
                  coll.query().select("num").collect()) == [1, 2, 3]


def test_query_at_generation_refuses_rewritten_partition(spark,
                                                         tmp_path):
    """Partition dirs are mutable: once a gen-N partition is
    republished, gen N cannot be reconstructed — the read must raise,
    never silently mix generations (the soundness gate)."""
    coll = _mk(spark, str(tmp_path / "tt2"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g2 = coll.generation()
    # default merge REPLACES partition num=1 -> its touched stamp bumps
    coll.insert(_df(spark, coll, [(1, 9.0)]))
    with pytest.raises(ValueError, match="republished or dropped"):
        coll.query(at_generation=g2)
    with pytest.raises(ValueError, match="republished or dropped"):
        coll.partitions(at_generation=g2)
    # a generation at/after the rewrite is reconstructable again
    now = coll.generation()
    vals = {r.num: r.value for r in
            coll.query(at_generation=now).collect()}
    assert vals == {1: 9.0, 2: 2.0}


def test_query_at_generation_refuses_after_drop_and_prune(spark,
                                                          tmp_path):
    coll = _mk(spark, str(tmp_path / "tt3"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g2 = coll.generation()
    coll.drop_partitions(filters="num == 1")
    with pytest.raises(ValueError, match="republished or dropped"):
        coll.query(at_generation=g2)
    # the surviving partition still reconstructs at the current gen
    assert coll.partitions(at_generation=coll.generation()) == ["num=2"]
    # pruned snapshot -> loud unavailability, mirroring changes()
    coll.insert(_df(spark, coll, [(3, 3.0)]))
    coll._catalog.prune_history(keep_last=1)
    with pytest.raises(ValueError, match="not available"):
        coll.query(at_generation=g2)


def test_zarr_query_at_generation_parity(spark, tmp_path):
    """The zarr layout shares the staleness gate: append-only history
    reconstructs (via a pushed key predicate over the historical
    partition set), a replaced partition refuses."""
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "ztt"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))

    def ins(num, vals):
        pdf = pd.DataFrame({
            "i": np.arange(len(vals), dtype=np.int64) + num * 100,
            "value": np.array(vals, dtype=np.float64),
            "num": np.full(len(vals), num, dtype=np.int64)})
        coll.insert(spark.createDataFrame(
            pdf, schema=coll.schema.to_struct_type()))

    ins(1, [1.0]); ins(2, [2.0])
    g2 = coll.generation()
    ins(3, [3.0])
    assert coll.partitions(at_generation=g2) == ["num=1", "num=2"]
    assert sorted(r.num for r in
                  coll.query(at_generation=g2).collect()) == [1, 2]
    assert sorted(r.num for r in coll.query().collect()) == [1, 2, 3]
    ins(1, [9.0])   # replace num=1 -> gen g2 is gone
    with pytest.raises(ValueError, match="republished or dropped"):
        coll.query(at_generation=g2)


def test_time_travel_where_verifies_snapshot_once(spark, tmp_path,
                                                  monkeypatch):
    """r10-advice regression: a where-clause time-travel query used to
    fetch + staleness-verify the gen-N snapshot TWICE (once for the
    partition list, once for zone stats) — two extra catalog GETs per
    query on object stores.  Both layouts must verify exactly once."""
    from zcollection_spark.zarr3.collection import create_zarr_collection
    calls = []
    # count the shared resolution core: verify/resolve_snapshot_readable
    # and both layouts' query paths all land in _snapshot_sources
    real = catmod._snapshot_sources

    def counting(catalog, generation):
        calls.append(generation)
        return real(catalog, generation)

    monkeypatch.setattr(catmod, "_snapshot_sources", counting)

    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = zc.create_collection(
        spark, str(tmp_path / "once"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)), stats_columns=["value"])
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g = coll.generation()
    calls.clear()
    rows = coll.query(where="value >= 1.5", at_generation=g).collect()
    assert [r.num for r in rows] == [2]
    assert len(calls) == 1, calls

    zcoll = create_zarr_collection(
        spark, str(tmp_path / "zonce"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)), stats_columns=["value"])
    zcoll.insert(_df(spark, zcoll, [(1, 1.0)]))
    zcoll.insert(_df(spark, zcoll, [(2, 2.0)]))
    zg = zcoll.generation()
    calls.clear()
    zrows = zcoll.query(where="value >= 1.5", at_generation=zg).collect()
    assert [r.num for r in zrows] == [2]
    assert len(calls) == 1, calls


def test_zarr_filterless_query_after_filtered(spark, tmp_path):
    """Regression: the cached zarr base scan shares ONE reader whose
    pushed-filter state is only reset when a query pushes filters — a
    filterless query planned after a filtered one must NOT inherit the
    previous pruning (found via time-travel, but reproducible with a
    plain key filter)."""
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("value", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "zreset"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))
    pdf = pd.DataFrame({
        "i": np.arange(3, dtype=np.int64),
        "value": np.array([1.0, 2.0, 3.0]),
        "num": np.array([1, 2, 3], dtype=np.int64)})
    coll.insert(spark.createDataFrame(
        pdf, schema=coll.schema.to_struct_type()))
    assert sorted(r.num for r in coll.query().collect()) == [1, 2, 3]
    assert sorted(r.num for r in
                  coll.query(filters="num in (1, 2)").collect()) == [1, 2]
    # the poisoned read: same generation, no filters
    assert sorted(r.num for r in coll.query().collect()) == [1, 2, 3]


def test_changes_between_two_generations(spark, tmp_path):
    """Bounded diffs replay a historical window exactly, whatever was
    committed after it — the CDC complement of at_generation reads."""
    from zcollection_spark.errors import StoreError
    coll = _mk(spark, str(tmp_path / "cw"))
    coll.insert(_df(spark, coll, [(1, 1.0)]))
    g1 = coll.generation()
    coll.insert(_df(spark, coll, [(2, 2.0)]))
    g2 = coll.generation()
    coll.insert(_df(spark, coll, [(1, 9.0)]))   # replace num=1
    g3 = coll.generation()
    coll.insert(_df(spark, coll, [(3, 3.0)]))
    # the g1->g2 window saw exactly num=2 arrive, regardless of the
    # replace and the append that came later
    assert coll.changes(g1, g2) == {"added": ["num=2"], "removed": [],
                                    "from": g1, "to": g2}
    # the g2->g3 window saw only the num=1 replacement
    assert coll.changes(g2, g3) == {"added": ["num=1"], "removed": [],
                                    "from": g2, "to": g3}
    # identical endpoints -> empty; reversed endpoints -> loud
    assert coll.changes(g2, g2)["added"] == []
    with pytest.raises(ValueError, match="newer than"):
        coll.changes(g3, g1)
    # a pruned target raises like a pruned base does
    with pytest.raises(StoreError, match="not available"):
        coll.changes(g1, 999)
    # the open-ended form keeps its resync contract for unknown/future
    # generations (incremental consumers branch on StoreError)
    with pytest.raises(StoreError, match="resync"):
        coll.changes(999)


def test_changes_between_two_generations_zarr_parity(spark, tmp_path):
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder().add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "zcw"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)))

    def ins(num):
        pdf = pd.DataFrame({"i": np.array([num], dtype=np.int64),
                            "num": np.array([num], dtype=np.int64)})
        coll.insert(spark.createDataFrame(
            pdf, schema=coll.schema.to_struct_type()))

    ins(1)
    g1 = coll.generation()
    ins(2)
    g2 = coll.generation()
    ins(3)
    assert coll.changes(g1, g2)["added"] == ["num=2"]
    with pytest.raises(ValueError, match="newer than"):
        coll.changes(coll.generation(), g1)


def test_zone_keys_predicate_exact_past_multikey_cap(spark, tmp_path):
    """Past the 512-partition multi-key planning cap the PRUNING caller
    may drop the predicate (rows re-filter below), but the TIME-TRAVEL
    caller must get an exact composite-key isin — None there would
    silently leak post-snapshot partitions into a historical read."""
    from zcollection_spark.zarr3.collection import create_zarr_collection
    schema = (zc.SchemaBuilder().add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("ts", "datetime64[ns]", ("i",))
              .build())
    coll = create_zarr_collection(
        spark, str(tmp_path / "zk"), schema=schema, axis="i",
        partitioning=zc.Date(("ts",), resolution="D"))
    rels = [f"year={2000 + y}/month={m}/day={d}"
            for y in range(2) for m in range(1, 13)
            for d in range(1, 27)]          # 624 relpaths, 3 keys
    assert len(rels) > 512
    assert coll._zone_keys_predicate(rels) is None          # pruning
    pred = coll._zone_keys_predicate(rels, exact=True)      # time-travel
    assert pred is not None
    probe = spark.createDataFrame(
        [(2000, 1, 1), (2001, 12, 26), (2000, 1, 28), (2002, 1, 1)],
        "year int, month int, day int")
    got = sorted(tuple(r) for r in probe.where(pred).collect())
    # day=28 and year=2002 fall outside the set; the two members match
    assert got == [(2000, 1, 1), (2001, 12, 26)]
