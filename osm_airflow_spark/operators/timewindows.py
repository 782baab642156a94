"""Time-window aggregations, batch form (SURVEY.md §2.I).

The reference is pure batch on a weekly cadence
(/root/reference/osm_etl.py:45-46); these operators are the batch
expression of its time semantics over the ``events`` fixture, written
so the identical logic ports to Structured Streaming (see
streaming/windows.py): ``F.window``/``F.session_window`` work in both
modes, and the gap-and-island session fallback is the pre-3.2 batch
equivalent.

Scale notes: tumbling/sliding windows are plain group-bys on a
derived key — partial aggregation applies, so shuffle volume is one
row per (window, group). A sliding window duplicates each row
duration/slide times *before* the shuffle; keep that ratio small or
aggregate per-slide first and roll up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@query(
    "win_time_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_time_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 — fixed non-overlapping buckets (the batch form of the
    DAG's weekly cadence, osm_etl.py:45). ``F.window`` aligns starts
    to the epoch, same as time_bucket."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "win_time_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events, (VALUES (0),(1),(2),(3)) AS slides(k)
    GROUP BY 1
    """,
)
def win_time_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 — overlapping buckets: 1 h window sliding every 15 min.
    Each event lands in exactly duration/slide = 4 windows; the
    oracle generates the same 4 slides arithmetically."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "win_time_session",
    oracle="""
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, session_id
    """,
)
def win_time_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 — gap-based sessions (30 min inactivity closes a session).
    Batch gap-and-island: lag → new-session flag → cumulative sum =
    session id. The streaming port replaces all of it with
    ``F.session_window(ts, '30 minutes')`` (streaming/windows.py).
    One shuffle on user_id shared by both windows."""
    e = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w_order)
    with_flag = e.withColumn(
        "is_new", F.when(gap <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1))
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("is_new").over(w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ).drop("session_id").select("user_id", "session_start", "session_end", "n_events", "sum_value")


@query(
    "win_dedup_time_window",
    oracle="""
    SELECT user_id, event_type, bucket, event_id, ts
    FROM (
      SELECT user_id, event_type,
             epoch_us(ts) // 600000000 AS bucket,
             event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, epoch_us(ts) // 600000000
               ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def win_dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 (extension) — time-bucketed dedup: first event per (user,
    type) per 10-minute tumbling bucket — the batch twin of streaming
    dropDuplicatesWithinWatermark (test_streaming), and the standard
    retry/double-fire collapse in event pipelines. The bucket is
    exact integer microseconds div 600e6 (no float epoch), so both
    engines bucket identically; the per-(key, bucket) row_number
    plans as WindowGroupLimit — map-side first-row capping, state
    O(groups), never a global sort. ``div`` is true 64-bit integer
    division (truncation toward zero, same as DuckDB's ``//``) — no
    double-rounding hazard at bucket boundaries."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(cast(ts as timestamp)) div 600000000")
    df = ev.select("user_id", "event_type", bucket.alias("bucket"), "event_id", "ts")
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy("ts", "event_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "win_time_weekly_aligned",
    oracle="""
    SELECT time_bucket(INTERVAL '7 days', ts, TIMESTAMP '2024-01-01')
             AS week_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def win_time_weekly_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext I6 — weekly tumbling buckets aligned to MONDAY. The trap
    this key exists to pin: ``F.window(ts, '7 days')`` aligns buckets
    to the Unix epoch, and 1970-01-01 was a THURSDAY — every naive
    weekly rollup is silently Thursday-to-Thursday. The fix is the
    ``startTime`` offset (epoch + 4 days = the first Monday,
    1970-01-05); the oracle states the same alignment as an explicit
    time_bucket origin (2024-01-01, a Monday). Same one-shuffle
    partial-aggregation plan as I1."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "7 days", "7 days", "4 days").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("week_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )
