"""Structured Streaming surface.

The reference has no streaming (SURVEY §2: "no streaming"); this module is
part of the beyond-parity scope: a collection's partition directory tree IS
a valid streaming file source, so continuous ingestion pipelines get
watermarked windowed aggregation for free.

Two entry points:

- :func:`stream_events` — stream the driver testdata ``events`` table
  (handles the nanos-timestamp parquet the same way ``data.load_table``
  does);
- :func:`Collection`-level: ``read_collection_stream`` streams new files
  appearing under a collection root with the collection's schema.

Both are demonstrated with availableNow triggers (bounded, testable); in
production the same code runs unbounded with watermarks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .collection.collection import Collection, ROW_IDX
from .data import _nanos_columns


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet (schema must be explicit for
    streaming sources; nanos timestamps read as long + converted)."""
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    nanos = set(_nanos_columns(path))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # static schema matching the driver tables
    fields = [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType() if "ts" in nanos
                      else T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
    sdf = (spark.readStream.schema(T.StructType(fields))
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir.rstrip("/")))
    if "ts" in nanos:
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregation, run to completion with an
    availableNow trigger and returned as a static DataFrame.

    The plan is the canonical streaming shape: event-time window + count;
    with an unbounded source you'd add ``withWatermark("ts", "1 hour")``
    and an append sink.
    """
    sdf = stream_events(spark, sf_dir)
    counts = (sdf.groupBy(F.window("ts", "1 hour").alias("w"))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("window_start"), "n"))
    sink = f"zcs_stream_{uuid.uuid4().hex[:8]}"
    # streaming state-store cost is per shuffle partition (a store instance
    # each); a bounded ~10³-key aggregation wants a handful, not 32.
    # The conf is captured at stream START, so scope the override to it.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (counts.writeStream.format("memory").queryName(sink)
                 .outputMode("complete").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


def deduped_events(spark: SparkSession, sf_dir: str,
                   watermark: str = "2 hours") -> DataFrame:
    """Streaming deduplication: ``dropDuplicatesWithinWatermark`` keeps
    the first arrival per ``event_id`` and expires its dedup state once
    the watermark passes — bounded state on an unbounded stream (replayed
    or duplicated ingest rows collapse).  Run to completion with an
    availableNow trigger the result equals one copy of the source —
    batch DISTINCT is the oracle."""
    sdf = stream_events(spark, sf_dir) \
        .select("event_id", "ts", "user_id", "value")
    # union the source with itself: a simulated replayed ingest where
    # every row arrives twice — the dedup state collapses the copies
    doubled = sdf.unionByName(sdf).withWatermark("ts", watermark)
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    sink = f"zcs_dedup_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (deduped.writeStream.format("memory").queryName(sink)
                 .outputMode("append").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running (n_events, total_value) accumulator.

    The state survives across micro-batches (GroupState); with an
    unbounded source this is the building block for custom sessionization
    / dedup-by-key operators the built-in window aggs can't express.  Run
    here with availableNow so tests observe the final state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    sdf = stream_events(spark, sf_dir)

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 6)]})

    out = (sdf.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, "
                         "total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
    sink = f"zcs_state_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (out.writeStream.format("memory").queryName(sink)
                 .outputMode("update").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # update-mode sink may hold one row per user per batch — keep the last
    result = spark.table(sink)
    from pyspark.sql import Window
    win = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (result.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") == 1).drop("__rn"))


def make_batch_sink(collection: Collection, *, merge: str | None,
                    app_id: str):
    """The foreachBatch sink: a TRANSACTIONAL insert per micro-batch.

    Exactly-once ingestion on the Delta-sink pattern re-expressed on the
    collection catalog: the (app_id, batch_id) transaction rides in the
    staging intent and commits in the same atomic catalog PUT as the
    partition list, so

    - a batch that committed is skipped on replay (its version is in
      the catalog's txn ledger) — even with ``merge="concat"``;
    - a batch that crashed after the intent rolls FORWARD with its txn
      via ``repair_catalog``, then replays as a skip;
    - a batch that crashed before the intent left nothing visible and
      simply re-runs.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if collection.txn_version(app_id) >= batch_id:
            return  # replayed, already committed: exactly-once skip
        if not batch_df.isEmpty():
            collection.insert(batch_df, merge=merge,
                              txn=(app_id, batch_id))

    return _sink


def write_stream_to_collection(stream_df: DataFrame,
                               collection: Collection, *,
                               merge: str | None = None,
                               checkpoint_dir: str | None = None,
                               available_now: bool = True,
                               app_id: str | None = None):
    """Continuous ingestion into a collection via ``foreachBatch``.

    Each micro-batch runs the exact batch-path ``insert`` (one shuffle on
    the partition keys, then the chosen merge strategy), so late or
    replayed data gets the collection's upsert/time_series semantics
    rather than blind appends.  Delivery is EXACTLY-ONCE per micro-batch:
    see :func:`make_batch_sink` (txn versions in the catalog commit).
    ``app_id`` identifies the stream in the txn ledger and must be stable
    across restarts — it defaults to a hash of the checkpoint dir.  The
    default checkpoint dir is DETERMINISTIC (derived from the collection
    path), so exactly-once holds across restarts with everything
    defaulted; run MULTIPLE concurrent streams into one collection only
    with explicit per-stream ``checkpoint_dir``/``app_id`` (they would
    otherwise collide on the same checkpoint state).

    Returns the started ``StreamingQuery`` — callers own
    ``awaitTermination``/``stop``.
    """
    import hashlib

    checkpoint_dir = checkpoint_dir or (
        f"{collection.path}/_checkpoints/ingest")
    app_id = app_id or ("stream-" + hashlib.sha256(
        checkpoint_dir.encode()).hexdigest()[:12])
    sink = make_batch_sink(collection, merge=merge, app_id=app_id)
    writer = (stream_df.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_collection_stream(spark: SparkSession,
                           collection: Collection) -> DataFrame:
    """Stream a collection: new partition files are picked up as they
    land.  Schema = collection schema + partition keys; ``_row_idx``
    dropped."""
    struct = T.StructType(
        [f for f in collection.schema.to_struct_type().fields
         if not collection.schema.variable_map[f.name].immutable])
    struct = struct.add(ROW_IDX, T.IntegerType())
    for kname in collection.partitioning.keys:
        if kname not in struct.fieldNames():
            struct = struct.add(kname, T.IntegerType())
    sdf = (spark.readStream.schema(struct)
           .option("basePath", collection.path)
           .parquet(collection.path))
    return sdf.drop(ROW_IDX)
