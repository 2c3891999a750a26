"""Range-clustered file layout (``cluster_by=``): within-partition
physical ordering by hot filter columns, so parquet row-group pruning
skips inside partitions (zone maps prune ACROSS partitions, clustering
prunes WITHIN — the Delta/Iceberg clusterBy/sort-order layer,
re-expressed as a task-local sort the partitioned write needs anyway)."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pytest

import zcollection_spark as zc
from zcollection_spark.errors import SchemaError


def _schema():
    return (zc.SchemaBuilder()
            .add_dimension("i")
            .add_variable("i", "int64", ("i",))
            .add_variable("value", "float64", ("i",))
            .add_variable("num", "int64", ("i",))
            .build())


def _data(spark, coll, n=400, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "value": rng.permutation(n).astype(np.float64),
        "num": np.repeat(np.arange(4, dtype=np.int64), n // 4)})
    return spark.createDataFrame(pdf, schema=coll.schema.to_struct_type())


def test_clustered_write_roundtrip_and_physical_order(spark, tmp_path):
    coll = zc.create_collection(
        spark, str(tmp_path / "c"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)), cluster_by=["value"])
    df = _data(spark, coll)
    coll.insert(df)
    # reopen: cluster_by survives the root config round-trip
    re = zc.open_collection(spark, str(tmp_path / "c"), mode="r")
    assert re.cluster_by == ["value"]
    # logical results identical to an unclustered collection
    plain = zc.create_collection(
        spark, str(tmp_path / "p"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)))
    plain.insert(_data(spark, plain))
    got = sorted((r.i, r.num, r.value) for r in coll.query().collect())
    want = sorted((r.i, r.num, r.value) for r in plain.query().collect())
    assert got == want
    # physical contract: every data file is sorted by the cluster col —
    # the property that makes parquet row-group min/max disjoint
    files = glob.glob(str(tmp_path / "c" / "num=*" / "*.parquet"))
    assert files
    for f in files:
        vals = pd.read_parquet(f)["value"].to_numpy()
        assert (np.diff(vals) >= 0).all(), f
    # and the unclustered twin is NOT sorted (the test would otherwise
    # prove nothing)
    pfiles = glob.glob(str(tmp_path / "p" / "num=*" / "*.parquet"))
    unsorted = any(
        (np.diff(pd.read_parquet(f)["value"].to_numpy()) < 0).any()
        for f in pfiles)
    assert unsorted


def test_clustered_filters_and_where_still_exact(spark, tmp_path):
    coll = zc.create_collection(
        spark, str(tmp_path / "f"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)),
        stats_columns=["value"], cluster_by=["value"])
    coll.insert(_data(spark, coll))
    got = sorted(r.i for r in coll.query(
        filters="num == 2", where="value < 50").collect())
    want = sorted(r.i for r in coll.query().where(
        "num = 2 AND value < 50").collect())
    assert got == want and got


def test_cluster_by_rejects_partition_key_and_unknown(spark, tmp_path):
    with pytest.raises(SchemaError, match="already a partitioning"):
        zc.create_collection(
            spark, str(tmp_path / "x1"), schema=_schema(), axis="i",
            partitioning=zc.Sequence(("num",)), cluster_by=["num"])
    with pytest.raises(SchemaError, match="not a partitioned"):
        zc.create_collection(
            spark, str(tmp_path / "x2"), schema=_schema(), axis="i",
            partitioning=zc.Sequence(("num",)), cluster_by=["nope"])


def test_cluster_order_survives_merge_paths(spark, tmp_path):
    """upsert/concat rewrites go through the same _write_tree — the
    clustered order must hold after a merge republish too."""
    coll = zc.create_collection(
        spark, str(tmp_path / "m"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)), cluster_by=["value"])
    coll.insert(_data(spark, coll, seed=1))
    coll.insert(_data(spark, coll, seed=2), merge="upsert")
    files = glob.glob(str(tmp_path / "m" / "num=*" / "*.parquet"))
    assert files
    for f in files:
        vals = pd.read_parquet(f)["value"].to_numpy()
        assert (np.diff(vals) >= 0).all(), f


def test_cli_inspect_shows_cluster_by(spark, tmp_path, capsys):
    import json

    from zcollection_spark import cli
    coll = zc.create_collection(
        spark, str(tmp_path / "ci"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)), cluster_by=["value"])
    coll.insert(_data(spark, coll, n=40))
    assert cli.main(["inspect", coll.path]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cluster_by"] == ["value"]
