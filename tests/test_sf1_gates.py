"""sf1-scale gates (skipped when the make_scale output is absent).

The prefix-filtered AllPairs path and the shared-shingle self-join must
be answer-identical at REAL scale, not just on the toy corpora the fast
suite uses — the r11 crossover grid (SCALING.md) showed the two paths
trade places with boilerplate frequency, so the override flag
(``prefix_filter=``) is a knob operators will actually flip; identical
answers in both directions is the contract that makes it safe to flip.
"""

from __future__ import annotations

from pathlib import Path

import pytest

SF1 = Path("/root/repo/.scale/sf1")

pytestmark = pytest.mark.skipif(
    not (SF1 / "documents.parquet").exists(),
    reason="sf1 scale data not generated (tools/make_scale.py)")


def test_jaccard_override_flag_identical_both_directions_sf1(spark):
    """prefix_filter=True and =False return the same pair set at sf1
    over the UNBOUNDED vocabulary (max_df=None — exactly the regime the
    auto-switch targets)."""
    from zcollection_spark.data import load_table
    from zcollection_spark.functions.dedup import (
        ngram_jaccard_pairs, unpersist_intermediates)
    docs = load_table(spark, str(SF1), "documents")
    results = {}
    for pf in (True, False):
        pairs = ngram_jaccard_pairs(docs, id_col="doc_id",
                                    text_col="text", shingle_size=5,
                                    threshold=0.5, max_df=None,
                                    prefix_filter=pf)
        results[pf] = {(r.id_a, r.id_b, round(r.jaccard, 9))
                       for r in pairs.collect()}
        unpersist_intermediates(pairs)
        spark.catalog.clearCache()
    assert results[True] == results[False]
    assert len(results[True]) > 100   # sf1 really has near-dup mass


def test_retention_pinned_read_bit_identical_at_sf1(spark, tmp_path):
    """r12 gate for the r11 retention surface: pin → republish → the
    pinned VERSION-AS-OF read is bit-identical at sf1 row counts, and
    the retained-union read costs at most a small constant over the
    plain (no-republish) time-travel read — the union adds one scan,
    never a join or an extra exchange (plan pinned in test_plans)."""
    import time

    import zcollection_spark as zc
    from pyspark.sql import functions as F
    from zcollection_spark.data import load_table
    from zcollection_spark.schema import infer_schema

    events = load_table(spark, str(SF1), "events")
    sub = events.where(F.month("ts") == 1)
    coll = zc.create_collection(
        spark, str(tmp_path / "ev"),
        schema=infer_schema(events.schema, axis="ts"),
        axis="ts", partitioning=zc.Date(("ts",), resolution="D"))
    coll.insert(sub)
    gen = coll.generation()
    base = coll.query(at_generation=gen)
    want_rows = base.count()
    want_sum = base.agg(F.sum("value")).collect()[0][0]
    # warm plain time-travel read (pre-republish: all-live resolution)
    for _ in range(2):
        coll.query(at_generation=gen).count()
    t0 = time.perf_counter()
    coll.query(at_generation=gen).count()
    plain_sec = time.perf_counter() - t0
    coll.pin_generation(gen)
    # republish a third of the partitions with poisoned values
    coll.insert(sub.where(F.dayofmonth("ts") <= 10)
                .withColumn("value", F.lit(0.0)))
    pinned = coll.query(at_generation=gen)
    assert pinned.count() == want_rows
    got_sum = pinned.agg(F.sum("value")).collect()[0][0]
    assert got_sum == pytest.approx(want_sum, rel=0, abs=1e-9)
    # live read sees the poison (the republish really happened)
    live_sum = coll.query().agg(F.sum("value")).collect()[0][0]
    assert live_sum != pytest.approx(want_sum, rel=0, abs=1e-9)
    # retained-union read: small constant over the plain read
    for _ in range(2):
        coll.query(at_generation=gen).count()
    t0 = time.perf_counter()
    coll.query(at_generation=gen).count()
    union_sec = time.perf_counter() - t0
    assert union_sec < plain_sec + 1.0, (union_sec, plain_sec)


def test_clustered_layout_identical_and_sorted_at_sf1(spark, tmp_path):
    """r12 gate for the r12 cluster_by surface: at sf1 row counts the
    clustered collection answers a range predicate identically to the
    raw table, and every partition file really is value-sorted (the
    property that makes row-group pruning effective at 100 TB)."""
    import glob

    import numpy as np
    import pandas as pd
    import zcollection_spark as zc
    from pyspark.sql import functions as F
    from zcollection_spark.data import load_table
    from zcollection_spark.schema import infer_schema

    events = load_table(spark, str(SF1), "events") \
        .select("event_id", "ts", "value").where(F.month("ts") == 1)
    coll = zc.create_collection(
        spark, str(tmp_path / "cl"),
        schema=infer_schema(events.schema, axis="ts"),
        axis="ts", partitioning=zc.Date(("ts",), resolution="D"),
        stats_columns=["value"], cluster_by=["value"])
    coll.insert(events)
    got = coll.query(where="value >= 40.0 and value < 60.0") \
        .agg(F.count("*").alias("n"),
             F.sum("event_id").alias("s")).collect()[0]
    want = events.where("value >= 40.0 and value < 60.0") \
        .agg(F.count("*").alias("n"),
             F.sum("event_id").alias("s")).collect()[0]
    assert (got.n, got.s) == (want.n, want.s) and got.n > 0
    files = glob.glob(str(tmp_path / "cl" / "year=*/month=*/day=*/*.parquet"))
    assert files
    for f in files:
        vals = pd.read_parquet(f)["value"].to_numpy()
        assert (np.diff(vals) >= 0).all(), f


def test_zorder_beats_range_on_trailing_column_at_sf1(spark, tmp_path):
    """r13 gate for the r12 zorder surface (r12 verdict task 4): at sf1
    row counts a Z-ordered layout must (a) answer a two-predicate
    workload bit-identically to the range-clustered twin, and (b) skip
    MORE row groups on the TRAILING cluster column — the property
    lexicographic range clustering cannot have, and the reason zorder
    exists at 100 TB.  Measured skip ratios land in SCALING.md."""
    import glob

    import pyarrow.parquet as pq
    import zcollection_spark as zc
    from pyspark.sql import functions as F
    from zcollection_spark.data import load_table
    from zcollection_spark.schema import infer_schema

    events = load_table(spark, str(SF1), "events") \
        .select("event_id", "ts", "user_id", "value")
    # chunks=8000 -> maxRecordsPerFile: ~10 files per monthly partition
    # at sf1, so the layouts expose real row-group/file granularity
    schema = (zc.SchemaBuilder()
              .add_dimension("ts", chunks=8000)
              .add_variable("event_id", "int64", ("ts",))
              .add_variable("ts", "datetime64[us]", ("ts",))
              .add_variable("user_id", "int64", ("ts",))
              .add_variable("value", "float64", ("ts",))
              .build("ts"))
    colls = {}
    for mode, name in (("zorder", "z"), ("range", "r")):
        coll = zc.create_collection(
            spark, str(tmp_path / name), schema=schema,
            axis="ts", partitioning=zc.Date(("ts",), resolution="M"),
            cluster_by=["user_id", "value"], cluster_mode=mode)
        coll.insert(events)
        colls[mode] = coll

    def rg_overlap(root, col, lo, hi):
        """Fraction of row groups whose [min,max] of ``col`` intersects
        [lo, hi] — the parquet footer-stat skip a scan gets for free."""
        hit = total = 0
        for f in glob.glob(str(root / "year=*/month=*/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(c for c in range(md.num_columns)
                       if md.row_group(0).column(c).path_in_schema == col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        assert total > 20, total     # sf1 really produced many row groups
        return hit / total

    lo, hi = 100.0, 128.0            # ~5% of the value domain
    z_skip = rg_overlap(tmp_path / "z", "value", lo, hi)
    r_skip = rg_overlap(tmp_path / "r", "value", lo, hi)
    # range mode: value spans everything inside each user_id run ->
    # ~every row group overlaps; zorder bounds value per row group
    assert r_skip > 0.9, r_skip
    assert z_skip < 0.75 * r_skip, (z_skip, r_skip)
    # two-predicate workload: bit-identical across modes and vs raw
    pred = (f"user_id >= 2000 and user_id < 4000 "
            f"and value >= {lo} and value <= {hi}")
    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"), F.sum("event_id").alias("s"),
        F.round(F.sum("value"), 6).alias("v")).collect()[0]
    got_z = agg(colls["zorder"].query(where=pred))
    got_r = agg(colls["range"].query(where=pred))
    want = agg(events.where(pred))
    assert tuple(got_z) == tuple(got_r) == tuple(want) and want.n > 0
    print(f"\nsf1 zorder gate: row-group overlap on trailing column "
          f"value∈[{lo},{hi}]: zorder={z_skip:.3f} range={r_skip:.3f}")
