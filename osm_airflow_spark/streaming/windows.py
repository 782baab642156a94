"""Streaming time-window operators (SURVEY.md §7.6 design note, made
runnable).

The reference sidesteps streams with weekly full rebuilds
(/root/reference/osm_etl.py:45-46); real OSM publishes minutely diff
replication, and the engine's time-window operators are written so
the same expressions run incrementally: ``F.window`` and
``F.session_window`` are streaming-native, batch F1-dedup becomes
``dropDuplicatesWithinWatermark``.

These builders take any streaming DataFrame with (ts, user_id,
event_type, value) columns — tests drive them from a file source over
the events fixture and assert parity with the batch results, which is
the actual contract: one set of window semantics, two execution modes.

Scale notes: watermarks bound state (without one, windowed streaming
state grows forever); session windows shuffle by the session key the
same as batch; sink-side, ``foreachBatch`` + idempotent dated-
partition writes gives exactly-once into the same snapshot layout the
batch path uses (io.write_snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Default stream schema when no file exists yet to probe: the fixture
# generator's current native-µs shape. A standing query must be able to
# start against an empty watch directory (the normal file-stream deploy
# order: start the stream, then files arrive) — ADVICE r4.
DEFAULT_EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_schema(spark: SparkSession, dir_glob: str, glob: str | None) -> T.StructType:
    """Probe the static files' actual schema with a batch reader so
    the stream declares whatever physical type the fixture shipped
    (ns-as-long vs native µs — the fixture has flipped between rounds;
    hardcoding one broke parity by 1000× in r3). Schema-only: no scan.

    When the watch directory is empty or absent there is nothing to
    probe; fall back to ``DEFAULT_EVENTS_STREAM_SCHEMA`` so a standing
    query can start before the first file arrives (ADVICE r4 — the
    probe is an override for when files exist, not a startup gate)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    try:
        return reader.parquet(dir_glob).schema
    except Exception:  # UNABLE_TO_INFER_SCHEMA / PATH_NOT_FOUND
        return DEFAULT_EVENTS_STREAM_SCHEMA


def read_events_stream(
    spark: SparkSession,
    dir_glob: str,
    glob: str | None = "events.parquet",
    max_files_per_trigger: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """File-based streaming source over event parquet (the test rig;
    production swaps in Kafka with the same downstream plan).

    The stream schema is probed from the files themselves and the ts
    column normalized by the SAME expression as the batch loader
    (io.normalize_events_ts) — one conversion contract, two execution
    modes, so a fixture dtype flip cannot desynchronize them.
    ``max_files_per_trigger`` bounds each micro-batch to N files (in
    modification-time order) — how the rig replays multi-batch
    arrival sequences deterministically (late-data proofs)."""
    from osm_airflow_spark.io import normalize_events_ts

    raw = spark.readStream.schema(
        schema if schema is not None else events_stream_schema(spark, dir_glob, glob)
    )
    if glob:
        raw = raw.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    # watermarks demand TIMESTAMP (ltz) — EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on NTZ. Session TZ is pinned UTC by the registry wrapper, so the
    # ntz→ltz cast is value-preserving and batch/stream windows align.
    return normalize_events_ts(raw.parquet(dir_glob)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """I1, streaming: same F.window expression as the batch operator,
    plus a watermark so state for closed hours is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """I2, streaming: 1 h window / 15 min slide."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """I3, streaming: native session_window replaces the batch
    gap-and-island composition — same sessions, state-managed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_bound"),
            "user_id",
            "n_events",
        )
    )


def interval_join_streams(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "2 hours",
    join_window: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: pair each
    'click' with the same user's 'view' that happened at most
    ``join_window`` earlier (the attribution join). Both sides carry
    watermarks and the join predicate bounds event time in BOTH
    directions, so Spark can size the state store and expire rows —
    the required shape for an unbounded stream-stream join (state is
    O(watermark window), not O(stream)).

    Parity: the same function applied to two batch DataFrames
    produces the batch interval join — tested against it."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {join_window}")),
    ).select("c_user", "click_id", "click_ts", "view_id", "view_ts")


def dedup_latest_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """F1, streaming: bounded-state dedup — the snapshot 'latest
    version per id' semantic under continuous arrival."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming plan to completion over the available files
    (test/smoke path: memory sink + processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode("complete" if stream_df.isStreaming else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def write_snapshot_stream(
    stream_df: DataFrame, out_dir: str, snapshot_date: str, checkpoint_dir: str
):
    """Exactly-once publish: foreachBatch + idempotent overwrite of
    the batch's dated partition. A replayed micro-batch rewrites the
    same partition with the same rows — the sink-side half of
    end-to-end exactly-once (the source half is the checkpoint)."""
    from osm_airflow_spark.io import write_snapshot

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        write_snapshot(
            batch_df.withColumn("_epoch", F.lit(epoch_id)),
            out_dir,
            snapshot_date,
            mode="overwrite",
        )

    return (
        stream_df.writeStream.foreachBatch(publish)
        .outputMode("complete")  # snapshot = the whole aggregate, not
        # just watermark-finalized windows (append would hold back the
        # open tail until the watermark passes it)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merge_diff_stream(
    change_stream: DataFrame,
    snapshot_path: str,
    key: str,
    checkpoint_dir: str,
):
    """Incremental publish: apply each micro-batch of element changes
    to the persisted snapshot via plans.merge.apply_diff — the
    streaming form of OSM minutely-diff ingestion (replaces the
    reference's weekly full rebuild end to end). Each batch is one
    anti-join + union against the current snapshot, rewritten
    atomically; the checkpoint makes replays idempotent because
    re-applying a change batch to the already-merged snapshot is a
    no-op for modifies/deletes and an overwrite-by-key for creates."""
    from osm_airflow_spark.plans.merge import apply_diff

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            base = spark.read.parquet(snapshot_path)
        except Exception:  # first batch: no snapshot yet
            base = batch_df.sparkSession.createDataFrame([], batch_df.drop("change_op").schema)
        merged = apply_diff(base, batch_df, key).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(snapshot_path)

    return (
        change_stream.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_with_dims(
    events: DataFrame, users: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static dimension enrichment: the streaming fact joins a
    batch dimension table — Spark re-plans the static side per
    micro-batch (so a slowly-refreshed dim parquet is picked up
    without restarting the query), and the join itself is stateless:
    no watermark bookkeeping on the dim side, broadcast when small.
    This is the streaming twin of join_broadcast (D2) and the
    standard enrichment hop in front of every windowed aggregate.

    The aggregate downstream keeps the watermark so its state still
    evicts; per-(segment, window) counts mirror the batch oracle in
    tests."""
    enriched = events.withWatermark("ts", watermark).join(
        F.broadcast(users), "user_id"
    )
    return (
        enriched.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("segment")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "segment", "n_events"
        )
    )
