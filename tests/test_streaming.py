"""Structured Streaming surfaces: windowed counts, collection stream,
stateful applyInPandasWithState."""

from pyspark.sql import functions as F

from zcollection_spark.data import load_table
from zcollection_spark.streaming import (hourly_event_counts,
                                         read_collection_stream,
                                         stateful_user_totals,
                                         stream_events,
                                         write_stream_to_collection)

SF = "/root/testdata/sf0.001"


def test_hourly_counts_match_batch(spark):
    streamed = hourly_event_counts(spark, SF)
    batch = (load_table(spark, SF, "events")
             .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
             .agg(F.count(F.lit(1)).alias("n")))
    s = {(r["window_start"], r["n"]) for r in streamed.collect()}
    b = {(r["window_start"], r["n"]) for r in batch.collect()}
    assert s == b


def test_stateful_totals_match_batch(spark):
    streamed = stateful_user_totals(spark, SF)
    batch = (load_table(spark, SF, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 6).alias("total_value")))
    s = {(r["user_id"], r["n_events"]) for r in streamed.collect()}
    b = {(r["user_id"], r["n_events"]) for r in batch.collect()}
    assert s == b


def test_stream_ingest_into_collection(spark, tmp_path):
    """availableNow stream of the events table lands in a Date-partitioned
    collection via the batch insert path (merge semantics, catalog)."""
    import zcollection_spark as zc
    from zcollection_spark.schema import infer_schema

    batch = load_table(spark, SF, "events")
    coll = zc.create_collection(
        spark, str(tmp_path / "ingest"),
        schema=infer_schema(batch.schema, axis="ts"), axis="ts",
        partitioning=zc.Date(("ts",), resolution="D"))
    q = write_stream_to_collection(
        stream_events(spark, SF), coll, merge="upsert",
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert coll.query().count() == batch.count()
    # ingested rows are partition-pruned like any batch insert
    assert coll.query(filters="day == 5").count() == \
        batch.where(F.dayofmonth("ts") == 5).count()


def test_collection_stream_reads_partitions(spark, seq_collection):
    sdf = read_collection_stream(spark, seq_collection)
    assert sdf.isStreaming
    query = (sdf.writeStream.format("memory").queryName("coll_stream")
             .outputMode("append").trigger(availableNow=True).start())
    query.awaitTermination()
    out = spark.table("coll_stream")
    assert out.count() == 7
    assert "num" in out.columns and "_row_idx" not in out.columns


def test_streaming_dedup_collapses_replayed_rows(spark):
    from zcollection_spark.streaming import deduped_events
    out = deduped_events(spark, "/root/testdata/sf0.001")
    # the source is unioned with itself (2000 arrivals) -> 1000 uniques
    assert out.count() == 1000
    assert out.select("event_id").distinct().count() == 1000


def test_stream_ingest_into_zarr_collection(spark, tmp_path):
    """The foreachBatch sink is storage-agnostic: a zarr collection's
    insert works identically (ZarrCollection duck-types Collection)."""
    import zcollection_spark as zc
    from zcollection_spark.schema import infer_schema
    from zcollection_spark.zarr3.collection import create_zarr_collection

    batch = load_table(spark, SF, "events") \
        .select("event_id", "ts", "value")
    coll = create_zarr_collection(
        spark, str(tmp_path / "zingest"),
        schema=infer_schema(batch.schema, axis="ts"), axis="ts",
        partitioning=zc.Date(("ts",), resolution="D"))
    q = write_stream_to_collection(
        stream_events(spark, SF).select("event_id", "ts", "value"),
        coll, checkpoint_dir=str(tmp_path / "zckpt"))
    q.awaitTermination()
    assert coll.query().count() == batch.count()
    assert coll.query(filters="day == 5").count() == \
        batch.where(F.dayofmonth("ts") == 5).count()


def test_batch_sink_exactly_once_replay_skip(spark, tmp_path, seq_schema):
    """A replayed micro-batch (same batch_id) must be a no-op even with
    merge='concat' — the txn version commits atomically with the
    catalog, Delta-sink style."""
    import numpy as np
    import pandas as pd
    import zcollection_spark as zc
    from zcollection_spark.streaming import make_batch_sink

    coll = zc.create_collection(spark, str(tmp_path / "eo"),
                                schema=seq_schema, axis="num",
                                partitioning=zc.Sequence(("num",)))
    bound = seq_schema.with_partition_axis("num")

    def batch(nums):
        pdf = pd.DataFrame({
            "num": np.array(nums, dtype=np.int64),
            "value": [[1.0, 2.0, 3.0]] * len(nums),
            "static": [[10.0, 20.0, 30.0]] * len(nums)})
        return spark.createDataFrame(pdf, schema=bound.to_struct_type())

    sink = make_batch_sink(coll, merge="concat", app_id="ingest-a")
    sink(batch([1, 1]), 0)
    assert coll.query().count() == 2
    sink(batch([1, 1]), 0)  # replay of batch 0: must be skipped
    assert coll.query().count() == 2
    assert coll.txn_version("ingest-a") == 0
    sink(batch([2]), 1)  # the next batch applies
    assert coll.query().count() == 3
    assert coll.txn_version("ingest-a") == 1
    # an unrelated app has its own ledger
    assert coll.txn_version("other") == -1


def test_txn_survives_crash_and_roll_forward(spark, tmp_path, seq_schema):
    """Crash after the intent: repair rolls the batch forward AND
    commits its txn version, so the stream's replay of that batch is
    skipped — exactly-once across the crash."""
    import numpy as np
    import pandas as pd
    import pytest
    import zcollection_spark as zc
    from zcollection_spark.streaming import make_batch_sink
    from tests.test_staging_recovery import CrashAfterRenames

    coll = zc.create_collection(spark, str(tmp_path / "eoc"),
                                schema=seq_schema, axis="num",
                                partitioning=zc.Sequence(("num",)))
    bound = seq_schema.with_partition_axis("num")
    pdf = pd.DataFrame({
        "num": np.array([5, 5], dtype=np.int64),
        "value": [[1.0, 2.0, 3.0]] * 2,
        "static": [[10.0, 20.0, 30.0]] * 2})
    df = spark.createDataFrame(pdf, schema=bound.to_struct_type())

    sink = make_batch_sink(coll, merge="concat", app_id="ingest-b")
    real_fs = coll._fs
    coll._fs = CrashAfterRenames(real_fs, 0)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            sink(df, 0)
    finally:
        coll._fs = real_fs

    assert coll.txn_version("ingest-b") == -1  # not committed yet
    coll.repair_catalog()  # roll forward WITH the intent's txn
    assert coll.query().count() == 2
    assert coll.txn_version("ingest-b") == 0
    sink(df, 0)  # stream restart replays batch 0: must skip
    assert coll.query().count() == 2
    # catalog rebuild (walk) preserves the ledger
    coll.repair_catalog()
    assert coll.txn_version("ingest-b") == 0


def test_cli_repair_commits_pending_stream_txn(spark, tmp_path,
                                               seq_schema, capsys):
    """Operator-driven repair (`cli verify --repair`) must commit the
    rolled-forward batch's txn version too — otherwise the stream's
    replay double-applies after a CLI repair."""
    import numpy as np
    import pandas as pd
    import pytest
    import zcollection_spark as zc
    from zcollection_spark import cli
    from zcollection_spark.streaming import make_batch_sink
    from tests.test_staging_recovery import CrashAfterRenames

    coll = zc.create_collection(spark, str(tmp_path / "clitxn"),
                                schema=seq_schema, axis="num",
                                partitioning=zc.Sequence(("num",)))
    bound = seq_schema.with_partition_axis("num")
    pdf = pd.DataFrame({
        "num": np.array([3, 3], dtype=np.int64),
        "value": [[1.0, 2.0, 3.0]] * 2,
        "static": [[10.0, 20.0, 30.0]] * 2})
    df = spark.createDataFrame(pdf, schema=bound.to_struct_type())

    sink = make_batch_sink(coll, merge="concat", app_id="ingest-cli")
    real_fs = coll._fs
    coll._fs = CrashAfterRenames(real_fs, 0)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            sink(df, 0)
    finally:
        coll._fs = real_fs

    assert cli.main(["verify", coll.path, "--repair"]) == 0
    capsys.readouterr()
    assert coll.query().count() == 2
    assert coll.txn_version("ingest-cli") == 0  # txn committed by repair
    sink(df, 0)  # stream replay after the CLI repair: must skip
    assert coll.query().count() == 2
