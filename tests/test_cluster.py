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


def _schema_xy(chunks=2000):
    return (zc.SchemaBuilder()
            .add_dimension("i", chunks=chunks)
            .add_variable("i", "int64", ("i",))
            .add_variable("x", "int64", ("i",))
            .add_variable("y", "int64", ("i",))
            .add_variable("num", "int64", ("i",))
            .build())


def _data_xy(spark, coll, n=40_000, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 100_000, n).astype(np.int64),
        "y": rng.integers(0, 100_000, n).astype(np.int64),
        "num": np.zeros(n, dtype=np.int64)})
    return spark.createDataFrame(pdf, schema=coll.schema.to_struct_type())


def _overlap_fraction(files, col, lo, hi):
    """Fraction of parquet files whose [min,max] of ``col`` intersects
    [lo, hi] — the footer-stat skip a scan gets for free."""
    import pyarrow.parquet as pq
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(c for c in range(md.num_columns)
                   if md.row_group(0).column(c).path_in_schema == col)
        st = [md.row_group(g).column(idx).statistics
              for g in range(md.num_row_groups)]
        if any(s.min <= hi and s.max >= lo for s in st):
            hit += 1
    return hit / len(files)


def test_zorder_bounds_every_cluster_column(spark, tmp_path):
    """A Z-curve layout must prune on the TRAILING cluster column too —
    the property lexicographic range clustering cannot have."""
    zcoll = zc.create_collection(
        spark, str(tmp_path / "z"), schema=_schema_xy(), axis="i",
        partitioning=zc.Sequence(("num",)),
        cluster_by=["x", "y"], cluster_mode="zorder")
    zcoll.insert(_data_xy(spark, zcoll))
    rcoll = zc.create_collection(
        spark, str(tmp_path / "r"), schema=_schema_xy(), axis="i",
        partitioning=zc.Sequence(("num",)), cluster_by=["x", "y"])
    rcoll.insert(_data_xy(spark, rcoll))
    zfiles = glob.glob(str(tmp_path / "z" / "num=0" / "*.parquet"))
    rfiles = glob.glob(str(tmp_path / "r" / "num=0" / "*.parquet"))
    assert len(zfiles) > 4 and len(rfiles) > 4
    lo, hi = 40_000, 45_000                       # 5% of the y domain
    z_y = _overlap_fraction(zfiles, "y", lo, hi)
    r_y = _overlap_fraction(rfiles, "y", lo, hi)
    # range mode: y spans everything inside each x run -> ~every file
    # overlaps; zorder bounds y per file
    assert r_y > 0.9, r_y
    assert z_y <= 0.7, (z_y, r_y)
    # and zorder still prunes on x as well (bounded, not perfect)
    z_x = _overlap_fraction(zfiles, "x", lo, hi)
    assert z_x <= 0.7, z_x
    # logical results identical across modes
    got = sorted(r.i for r in zcoll.query().where(
        f"y >= {lo} AND y <= {hi}").collect())
    want = sorted(r.i for r in rcoll.query().where(
        f"y >= {lo} AND y <= {hi}").collect())
    assert got == want and got
    # mode survives the config round-trip
    assert zc.open_collection(spark, str(tmp_path / "z")) \
        .cluster_mode == "zorder"


def test_zorder_validation(spark, tmp_path):
    with pytest.raises(SchemaError, match="at least two"):
        zc.create_collection(
            spark, str(tmp_path / "v1"), schema=_schema_xy(), axis="i",
            partitioning=zc.Sequence(("num",)),
            cluster_by=["x"], cluster_mode="zorder")
    with pytest.raises(SchemaError, match="must be 'range' or 'zorder'"):
        zc.create_collection(
            spark, str(tmp_path / "v2"), schema=_schema_xy(), axis="i",
            partitioning=zc.Sequence(("num",)),
            cluster_by=["x", "y"], cluster_mode="hilbert")
    with pytest.raises(SchemaError, match="has no effect"):
        zc.create_collection(
            spark, str(tmp_path / "v3"), schema=_schema_xy(), axis="i",
            partitioning=zc.Sequence(("num",)), cluster_mode="zorder")


def test_compact_preserves_cluster_order(spark, tmp_path):
    """compact() is the maintenance op a clustered collection WILL run;
    its rewrite must re-apply the cluster sort, not silently destroy
    the layout (it bypasses _write_tree, so this needs its own pin)."""
    coll = zc.create_collection(
        spark, str(tmp_path / "cc"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)), cluster_by=["value"])
    # two concat batches -> 2+ files per partition -> compactable
    coll.insert(_data(spark, coll, seed=3))
    coll.insert(_data(spark, coll, seed=4), merge="concat")
    report = coll.compact()
    assert report                       # something was compacted
    files = glob.glob(str(tmp_path / "cc" / "num=*" / "*.parquet"))
    assert files
    for f in files:
        vals = pd.read_parquet(f)["value"].to_numpy()
        assert (np.diff(vals) >= 0).all(), f


def test_zorder_interleave_is_bijective(spark):
    """Property: the interleaved z-value losslessly encodes the bucket
    tuple — de-interleaving the bits recovers every bucket exactly
    (so sorting by z never conflates distinct cells)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zcollection_spark.collection.cluster import zorder_column

    import pyspark.sql.functions as F

    # evaluate the EXACT production expression once over a grid of
    # corner + random bucket pairs, then de-interleave in python
    pairs = [(0, 0), (0, 65535), (65535, 0), (65535, 65535),
             (1, 2), (32768, 32767), (12345, 54321), (99, 64000)]
    bounds = {"a": (0.0, 65535.0), "b": (0.0, 65535.0)}
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pairs], "a double, b double")
    z = [r[0] for r in df.select(
        zorder_column(["a", "b"], bounds).alias("z")).collect()]

    def deinterleave(v, n, bits):
        out = [0] * n
        for i in range(bits):
            for j in range(n):
                out[j] |= ((v >> (i * n + j)) & 1) << i
        return tuple(out)

    for (a, b), zv in zip(pairs, z):
        assert 0 <= zv < (1 << 63)
        assert deinterleave(zv, 2, 16) == (a, b), (a, b, zv)

    @given(st.integers(0, 65535), st.integers(0, 65535))
    @settings(max_examples=200, deadline=None)
    def roundtrip(a, b):
        # pure-python replay of the expression's bit plan
        v = 0
        for i in range(16):
            v |= ((a >> i) & 1) << (i * 2)
            v |= ((b >> i) & 1) << (i * 2 + 1)
        assert deinterleave(v, 2, 16) == (a, b)

    roundtrip()


def test_zorder_handles_nulls_and_constant_columns(spark, tmp_path):
    """Nulls and constant cluster columns land in bucket 0 — the write
    must not crash and every row must survive the round-trip."""
    import pyspark.sql.types as T

    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("x", "float64", ("i",))
              .add_variable("y", "float64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = zc.create_collection(
        spark, str(tmp_path / "n"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)),
        cluster_by=["x", "y"], cluster_mode="zorder")
    rows = [(0, None, 7.0, 0), (1, 1.5, 7.0, 0), (2, None, 7.0, 0),
            (3, 9.9, 7.0, 0)]                   # y constant, x has nulls
    df = spark.createDataFrame(rows, schema=coll.schema.to_struct_type())
    coll.insert(df)
    got = sorted((r.i, r.x) for r in coll.query().collect())
    assert [i for i, _ in got] == [0, 1, 2, 3]
    assert got[0][1] is None and got[2][1] is None


def test_add_variable_preserves_optional_root_config(spark, tmp_path):
    """Regression (found in r12 review): add_variable rewrote the root
    config WITHOUT the optional fields, so schema evolution silently
    disabled zone maps, blooms and clustering on the next open."""
    coll = zc.create_collection(
        spark, str(tmp_path / "ev"), schema=_schema(), axis="i",
        partitioning=zc.Sequence(("num",)),
        stats_columns=["value"], bloom_columns=["i"], bloom_bits=2048,
        cluster_by=["value"])
    coll.insert(_data(spark, coll, n=40))
    coll.add_variable("extra", "float64", fill_value=0.0)
    re = zc.open_collection(spark, str(tmp_path / "ev"))
    assert re.stats_columns == ["value"]
    assert re.bloom_columns == ["i"] and re.bloom_bits == 2048
    assert re.cluster_by == ["value"] and re.cluster_mode == "range"
    assert "extra" in re.schema.variable_map
    # zorder variant keeps its mode too
    z = zc.create_collection(
        spark, str(tmp_path / "ez"), schema=_schema_xy(), axis="i",
        partitioning=zc.Sequence(("num",)),
        cluster_by=["x", "y"], cluster_mode="zorder")
    z.insert(_data_xy(spark, z, n=50))
    z.add_variable("extra", "float64", fill_value=0.0)
    assert zc.open_collection(
        spark, str(tmp_path / "ez")).cluster_mode == "zorder"


def test_zorder_temp_column_never_clobbers_user_variable(spark, tmp_path):
    """r12 advice: the Z-value used to live in a hard-coded '__zorder'
    temp column — a schema variable literally named '__zorder' would be
    silently overwritten by the curve value and dropped from every
    written partition.  The temp name must dodge user columns."""
    schema = (zc.SchemaBuilder()
              .add_dimension("i")
              .add_variable("i", "int64", ("i",))
              .add_variable("x", "int64", ("i",))
              .add_variable("y", "int64", ("i",))
              .add_variable("__zorder", "int64", ("i",))
              .add_variable("num", "int64", ("i",))
              .build())
    coll = zc.create_collection(
        spark, str(tmp_path / "guard"), schema=schema, axis="i",
        partitioning=zc.Sequence(("num",)),
        cluster_by=["x", "y"], cluster_mode="zorder")
    n = 64
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 1000, n).astype(np.int64),
        "y": rng.integers(0, 1000, n).astype(np.int64),
        "__zorder": np.arange(n, dtype=np.int64) * 7,
        "num": np.zeros(n, dtype=np.int64)})
    coll.insert(spark.createDataFrame(
        pdf, schema=coll.schema.to_struct_type()))
    got = {r.i: r["__zorder"]
           for r in coll.query().select("i", "__zorder").collect()}
    assert got == {int(k): int(k) * 7 for k in range(n)}
