"""Streaming/batch parity: the same window semantics must produce the
same aggregates whether the events table arrives as a batch scan or
through a streaming source (SURVEY.md §7.6)."""

import pytest
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_events
from osm_airflow_spark.streaming.windows import (
    read_events_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def _run(stream_df, name):
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_batch_ts_canary(spark, sf_dir, stream_events):
    """Fixture-dtype canary: the streaming source and the batch loader
    must see the SAME event times (min/max µs-exact). Guards against a
    fixture physical-type flip re-desynchronizing the two readers (the
    r3 regression: stream hardcoded ns-as-long, fixture moved to µs,
    every streamed event landed in 1970)."""
    _run(
        stream_events.groupBy().agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ),
        "t_canary",
    )
    got = spark.sql("SELECT * FROM t_canary").head()
    want = load_events(spark, sf_dir).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).head()
    assert (got["lo"], got["hi"]) == (want["lo"], want["hi"])
    assert got["lo"].year >= 2000  # not 1970: conversion regime is right


def test_watermark_drops_late_events(spark, tmp_path):
    """Watermark semantics proof: events arriving in a LATER
    micro-batch, with event time older than the advanced watermark,
    must not be counted — neither by merging into an already-emitted
    window nor by opening a long-dead one. Live query, true
    sequential arrival:

      batch 1: 10:05 view (window 10:00) + 13:30 view → watermark
               advances to 12:30 (1 h delay)
      batch 2: 10:10 view (same window) + 05:00 view (own window) —
               both below the watermark → dropped

    Append mode emits only closed windows, so the sink must hold
    exactly the 10:00 window with count 1 (a leaked same-window late
    event would make it 2; a leaked far-late event would add an
    05:00 row; broken eviction would emit nothing).

    Deliberately a LIVE query with two processAllAvailable() rounds,
    not Trigger.AvailableNow: measured on this build, an
    AvailableNow replay applies NO late-row filtering between its
    planned batches (both late events above get counted), so
    late-data replay correctness requires a standing query — relied
    on by merge_diff_stream and any recovery runbook."""
    import datetime as dt
    import glob as globmod
    import shutil

    watch = tmp_path / "late_events"
    watch.mkdir()

    def drop_file(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, watch / name)

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    drop_file(
        [(1, t("2024-05-01 10:05:00"), 7, "view"),
         (2, t("2024-05-01 13:30:00"), 7, "view")],
        "batch1.parquet",
    )
    stream = read_events_stream(spark, str(watch), glob=None)
    q = (
        tumbling_counts(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    q.processAllAvailable()
    drop_file(
        [(3, t("2024-05-01 10:10:00"), 7, "view"),
         (4, t("2024-05-01 05:00:00"), 7, "view")],
        "batch2.parquet",
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM t_late").collect()
    emitted = {
        (r["window_start"].isoformat(), r["event_type"]): r["n_events"] for r in rows
    }
    assert emitted == {("2024-05-01T10:00:00", "view"): 1}, emitted


def test_checkpoint_recovery_resumes_state_exactly_once(spark, tmp_path):
    """Restart-recovery proof against a durable (parquet) sink: a new
    query started from the SAME checkpoint must restore aggregation
    state and must not re-read consumed files. Window 10:00 collects
    2 events before the stop (still open — watermark hasn't passed),
    1 more plus a watermark-advancing event after the restart; the
    recovered query closes the window at exactly 3. State lost
    without replay → 1; consumed files double-read on top of kept
    state → 5. (The memory sink refuses checkpoint recovery — this is
    the production-shaped path.)"""
    import datetime as dt
    import glob as globmod
    import shutil

    watch = tmp_path / "rec_events"
    watch.mkdir()
    cp = str(tmp_path / "rec_ckpt")
    out = str(tmp_path / "rec_out")

    def drop_file(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, watch / name)

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    drop_file(
        [(1, t("2024-05-01 10:05:00"), 7, "view"),
         (2, t("2024-05-01 10:20:00"), 8, "view")],
        "batch1.parquet",
    )

    def start():
        stream = read_events_stream(spark, str(watch), glob=None)
        return (
            tumbling_counts(stream, watermark="1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()

    drop_file(
        [(3, t("2024-05-01 10:40:00"), 9, "view"),
         (4, t("2024-05-01 13:30:00"), 9, "view")],  # advances watermark
        "batch2.parquet",
    )
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    got = {
        r["window_start"].isoformat(): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {"2024-05-01T10:00:00": 3}, got


def test_tumbling_parity(spark, sf_dir, stream_events):
    _run(tumbling_counts(stream_events), "t_tumble")
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = {
        (r["ws"], r["event_type"]): r["n"]
        for r in load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert streamed == batch


def test_sliding_parity(spark, sf_dir, stream_events):
    _run(sliding_counts(stream_events), "t_slide")
    streamed = {
        r["window_start"]: r["n_events"] for r in spark.sql("SELECT * FROM t_slide").collect()
    }
    batch = {
        r["ws"]: r["n"]
        for r in load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    assert streamed == batch


def test_session_total_events_conserved(spark, sf_dir, stream_events):
    _run(session_counts(stream_events), "t_sess")
    streamed_total = spark.sql("SELECT SUM(n_events) AS s FROM t_sess").collect()[0]["s"]
    assert streamed_total == load_events(spark, sf_dir).count()


def test_stateful_user_profiles(spark, sf_dir, stream_events):
    from osm_airflow_spark.io import load_events
    from osm_airflow_spark.streaming.stateful import user_profiles

    q = (
        user_profiles(stream_events.select("user_id", "ts", "value"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_profiles")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # one final profile row per user; totals match batch aggregation
    prof = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n FROM t_profiles GROUP BY user_id"
        ).collect()
    }
    from pyspark.sql import functions as F

    batch = {
        r["user_id"]: r["n"]
        for r in load_events(spark, sf_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {u: r["n"] for u, r in prof.items()} == batch


def test_foreachbatch_snapshot_sink(spark, sf_dir, stream_events):
    import tempfile

    from osm_airflow_spark.io import load_events, read_snapshot
    from osm_airflow_spark.streaming.windows import tumbling_counts, write_snapshot_stream

    with tempfile.TemporaryDirectory() as d:
        q = write_snapshot_stream(
            tumbling_counts(stream_events), f"{d}/out", "2024-07-25", f"{d}/ckpt"
        )
        q.awaitTermination(120)
        back = read_snapshot(spark, f"{d}/out", "2024-07-25")
        batch_total = load_events(spark, sf_dir).count()
        streamed_total = back.agg({"n_events": "sum"}).collect()[0][0]
        assert streamed_total == batch_total


def test_airflow_dag_module_imports_without_airflow():
    import importlib.util, pathlib

    path = pathlib.Path(__file__).parent.parent / "dags" / "osm_spark_dag.py"
    spec = importlib.util.spec_from_file_location("osm_spark_dag", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # no airflow in image → import-gated path
    assert mod.REGIONS and mod.SNAPSHOT_DATE


def test_dedup_stream_drops_cross_file_duplicates(spark, sf_dir, tmp_path):
    import shutil

    from osm_airflow_spark.streaming.windows import dedup_latest_stream, read_events_stream

    # the same events file twice in one source dir = every event duplicated
    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "dups"
    d.mkdir()
    shutil.copy(src, d / "events.parquet")
    shutil.copy(src, d / "more-events.parquet")
    # glob=None: match both copies (default glob is events.parquet only)
    stream = read_events_stream(spark, str(d), glob=None)
    q = (
        dedup_latest_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_unique = spark.read.parquet(src).count()
    got = spark.sql("SELECT COUNT(DISTINCT event_id) AS n, COUNT(*) AS total FROM t_dedup").collect()[0]
    assert got["n"] == n_unique
    assert got["total"] == n_unique  # duplicates dropped, not just distinct-counted


def test_merge_diff_stream_applies_changes(spark, tmp_path):
    """Streamed change batches update the persisted snapshot via the
    incremental merge (no full rebuild)."""
    import json

    from osm_airflow_spark.streaming.windows import merge_diff_stream

    snap = str(tmp_path / "snapshot")
    spark.createDataFrame(
        [(1, "cafe"), (2, "pub")], "node_id long, amenity string"
    ).write.parquet(snap)

    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    rows = [
        {"node_id": 2, "amenity": "restaurant", "change_op": "modify"},
        {"node_id": 3, "amenity": "bank", "change_op": "create"},
        {"node_id": 1, "amenity": None, "change_op": "delete"},
    ]
    (changes_dir / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = spark.readStream.schema("node_id long, amenity string, change_op string").json(
        str(changes_dir)
    )
    q = merge_diff_stream(stream, snap, "node_id", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    final = {r["node_id"]: r["amenity"] for r in spark.read.parquet(snap).collect()}
    assert final == {2: "restaurant", 3: "bank"}


def test_stream_stream_interval_join_parity(spark, sf_dir, stream_events):
    """Stream-stream attribution join (click ← view within 30 min)
    must equal the identical interval join run as a batch query.
    Append mode: bounded-state joins emit finalized rows only."""
    from osm_airflow_spark.streaming.windows import interval_join_streams

    clicks_s = stream_events.where(F.col("event_type") == "click")
    views_s = stream_events.where(F.col("event_type") == "view")
    q = (
        interval_join_streams(clicks_s, views_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssjoin")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r["click_id"], r["view_id"])
        for r in spark.sql("SELECT * FROM t_ssjoin").collect()
    }

    ev = load_events(spark, sf_dir)
    batch = {
        (r["click_id"], r["view_id"])
        for r in interval_join_streams(
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "view"),
        ).collect()
    }
    assert len(batch) > 0
    assert streamed == batch


def test_transform_with_state_parity_or_env_gate(spark, sf_dir, stream_events):
    """Spark-4 transformWithStateInPandas twin of user_profiles: when
    the runtime can execute state-v2 (needs the protobuf wheel for
    the state-server protocol), its final per-user profile must match
    the applyInPandasWithState implementation; without the wheel the
    plan must still build and the test records the env gate."""
    import pytest as _pytest

    from osm_airflow_spark.streaming.stateful import user_profiles, user_profiles_tws

    assert user_profiles_tws is not None  # API present in PySpark 4.x
    out = user_profiles_tws(stream_events)  # plan builds
    assert set(out.schema.fieldNames()) == {
        "user_id", "n_events", "sum_value", "last_seen_us"
    }
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip(
            "state-v2 runtime needs the protobuf wheel (absent in image); "
            "plan construction verified above"
        )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_tws")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    new_api = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            "SELECT * FROM t_tws QUALIFY ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) = 1"
        ).collect()
    }
    q2 = (
        user_profiles(stream_events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_aips")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    old_api = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            "SELECT * FROM t_aips QUALIFY ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) = 1"
        ).collect()
    }
    assert new_api == old_api


def test_drop_duplicates_within_watermark_parity(spark, sf_dir, stream_events):
    """Streaming dedup: the same event file unioned with itself (every
    row duplicated) deduped by event_id via
    dropDuplicatesWithinWatermark must reproduce the batch distinct
    count. The watermark bounds the dedup state — at 100 TB the state
    store holds only ids within the lateness horizon, not the whole
    history (unlike plain dropDuplicates on a stream, which grows
    without bound)."""
    doubled = stream_events.union(stream_events)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_wm")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT COUNT(*) AS n FROM t_dedup_wm").head()["n"]
    batch = load_events(spark, sf_dir).select("event_id").distinct().count()
    assert streamed == batch


def test_stream_static_enrichment_parity(spark, sf_dir, stream_events):
    """Stream-static join: events enriched with a derived user
    dimension (user_id % 4 segment buckets) then windowed — must
    match the identical batch computation. The dim side is a plain
    batch DataFrame: stateless join, no dim-side watermark."""
    from osm_airflow_spark.streaming.windows import enrich_stream_with_dims

    users = (
        load_events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 4).cast("string"))
    )
    q = (
        enrich_stream_with_dims(stream_events, users)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_enrich")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r["window_start"], r["segment"]): r["n_events"]
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    }
    ev = load_events(spark, sf_dir)
    batch = {
        (r["ws"], r["segment"]): r["n"]
        for r in ev.join(users, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "segment", F.col("n"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_osm_changes_streaming_source_exactly_once(spark, tmp_path):
    """The osm_changes streaming data source (Python DataSource API):
    numbered change files become micro-batches by sequence offset —
    batch 1 sees only the files present at start, newly arrived files
    arrive in the next batch exactly once, and composing with
    apply_diff via foreachBatch maintains a snapshot incrementally
    (the upgrade path from the reference's weekly full rebuild)."""
    import pandas as pd

    from osm_airflow_spark.sources.changes_datasource import register_changes_source

    register_changes_source(spark)
    watch = tmp_path / "changes"
    watch.mkdir()

    def drop(seq, rows):
        pd.DataFrame(
            rows, columns=["node_id", "lat", "lon", "tags", "change_op", "change_ts"]
        ).to_parquet(watch / f"{seq:09d}.parquet", index=False)

    t = pd.Timestamp
    drop(1, [(1, 52.5, 13.4, {"amenity": "cafe"}, "create", t("2024-05-01 10:00:00")),
             (2, 48.9, 2.35, {}, "create", t("2024-05-01 10:00:01"))])

    seen = []
    stream = (
        spark.readStream.format("osm_changes").option("path", str(watch)).load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, epoch: seen.append(sorted(
            (r["node_id"], r["change_op"], (r["tags"] or {}).get("amenity"))
            for r in df.collect()
        )))
        .start()
    )
    q.processAllAvailable()
    drop(2, [(1, 52.5, 13.4, {"amenity": "bar"}, "modify", t("2024-05-01 10:05:00")),
             (3, 40.7, -74.0, {}, "create", t("2024-05-01 10:05:01"))])
    q.processAllAvailable()
    q.stop()

    flat = [r for batch in seen if batch for r in batch]
    assert flat.count((1, "create", "cafe")) == 1  # no replay
    assert flat.count((1, "modify", "bar")) == 1
    assert len(flat) == 4
    first_nonempty = next(b for b in seen if b)
    assert {r[0] for r in first_nonempty} == {1, 2}  # file 2 NOT in batch 1


def test_changes_stream_maintains_snapshot_incrementally(spark, tmp_path):
    """The full upgrade path from the reference's weekly rebuild:
    osm_changes stream → foreachBatch(apply_diff) → persisted
    snapshot. After two change batches the snapshot holds exactly the
    type-1 merged state (create applied, modify applied once, delete
    gone) — no full rebuild anywhere."""
    import pandas as pd

    from osm_airflow_spark.plans.merge import apply_diff
    from osm_airflow_spark.sources.changes_datasource import register_changes_source

    register_changes_source(spark)
    watch = tmp_path / "feed"
    watch.mkdir()
    snap_dir = str(tmp_path / "snapshot")

    spark.createDataFrame(
        [(1, 52.5, 13.4, {"amenity": "cafe"}), (2, 48.9, 2.35, {})],
        "node_id long, lat double, lon double, tags map<string,string>",
    ).write.mode("overwrite").parquet(snap_dir)

    def drop(seq, rows):
        pd.DataFrame(
            rows, columns=["node_id", "lat", "lon", "tags", "change_op", "change_ts"]
        ).to_parquet(watch / f"{seq:09d}.parquet", index=False)

    def apply_batch(batch_df, epoch_id):
        if not batch_df.take(1):
            return
        snapshot = batch_df.sparkSession.read.parquet(snap_dir)
        merged = apply_diff(snapshot, batch_df, "node_id")
        # overwrite-in-place via a staged write (parquet can't read+
        # overwrite the same path in one job)
        staged = f"{snap_dir}_stage_{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(snap_dir)
        shutil.move(staged, snap_dir)

    t = pd.Timestamp
    stream = (
        spark.readStream.format("osm_changes").option("path", str(watch)).load()
    )
    q = stream.writeStream.foreachBatch(apply_batch).start()
    drop(1, [(3, 40.7, -74.0, {"amenity": "bank"}, "create", t("2024-05-01 10:00:00"))])
    q.processAllAvailable()
    drop(2, [(1, 52.5, 13.4, {"amenity": "bar"}, "modify", t("2024-05-01 10:05:00")),
             (2, None, None, None, "delete", t("2024-05-01 10:05:01"))])
    q.processAllAvailable()
    q.stop()

    final = {r["node_id"]: r for r in spark.read.parquet(snap_dir).collect()}
    assert set(final) == {1, 3}  # node 2 deleted
    assert final[1]["tags"] == {"amenity": "bar"}  # modify applied
    assert final[3]["tags"] == {"amenity": "bank"}  # create applied


def test_stream_starts_against_empty_watch_dir(spark, tmp_path):
    """A standing query must start BEFORE the first file arrives (the
    normal file-stream deployment order). The schema probe falls back
    to the static default on an empty/absent dir instead of failing
    with UNABLE_TO_INFER_SCHEMA (ADVICE r4); rows that arrive after
    start flow through with correct types."""
    import datetime as dt
    import glob as globmod
    import shutil

    from osm_airflow_spark.streaming.windows import read_events_stream, tumbling_counts

    watch = tmp_path / "empty_watch"
    watch.mkdir()
    stream = read_events_stream(spark, str(watch), glob=None)
    q = (
        tumbling_counts(stream, watermark="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_empty_start")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM t_empty_start").count() == 0

    rows = [
        (1, dt.datetime.fromisoformat("2024-05-01 10:05:00"), 7, "view", 1.0, "{}"),
        (2, dt.datetime.fromisoformat("2024-05-01 10:20:00"), 8, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    stage = str(tmp_path / "stage_empty_start")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.copy(globmod.glob(f"{stage}/part-*.parquet")[0], watch / "b1.parquet")
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT event_type, n_events FROM t_empty_start").collect()
    assert [(r["event_type"], r["n_events"]) for r in out] == [("view", 2)]


def test_changes_source_maps_columns_by_name(spark, tmp_path):
    """A change file whose physical column order differs from the
    declared schema must still assign fields correctly (by name, not
    position — ADVICE r4: positional zip silently swapped lat/lon)."""
    import pandas as pd

    from osm_airflow_spark.sources.changes_datasource import register_changes_source

    register_changes_source(spark)
    watch = tmp_path / "reordered_changes"
    watch.mkdir()
    t = pd.Timestamp
    # deliberately scrambled column order + an extra column to ignore
    pd.DataFrame(
        {
            "change_ts": [t("2024-05-01 10:00:00")],
            "lon": [13.4],
            "lat": [52.5],
            "change_op": ["create"],
            "extra": ["ignored"],
            "node_id": [42],
            "tags": [{"amenity": "cafe"}],
        }
    ).to_parquet(watch / "000000001.parquet", index=False)

    seen = []
    stream = spark.readStream.format("osm_changes").option("path", str(watch)).load()
    q = stream.writeStream.foreachBatch(
        lambda df, _e: seen.extend(df.collect())
    ).start()
    q.processAllAvailable()
    q.stop()
    assert len(seen) == 1
    r = seen[0]
    assert (r["node_id"], r["lat"], r["lon"], r["change_op"]) == (42, 52.5, 13.4, "create")
    assert r["tags"] == {"amenity": "cafe"}


def test_changes_source_missing_column_raises(spark, tmp_path):
    """A change file lacking a declared column must error loudly, not
    misassign (ADVICE r4)."""
    import pandas as pd

    from osm_airflow_spark.sources.changes_datasource import register_changes_source

    register_changes_source(spark)
    watch = tmp_path / "missing_col_changes"
    watch.mkdir()
    pd.DataFrame(
        {"node_id": [1], "lat": [0.0], "lon": [0.0]}  # no change_op/ts/tags
    ).to_parquet(watch / "000000001.parquet", index=False)

    stream = spark.readStream.format("osm_changes").option("path", str(watch)).load()
    q = stream.writeStream.format("noop").start()
    import pytest as _pytest

    with _pytest.raises(Exception, match="lacks declared columns"):
        q.processAllAvailable()
    q.stop()


def test_dedup_ingest_stream_equals_batch_exact_dedup(spark, sf_dir, tmp_path):
    """Streamed corpus ingest (three chunks with planted cross-chunk
    and within-chunk duplicates, one micro-batch per file) must land
    the same corpus as the K1 batch dedup run over the full union —
    first-arrival survivor equals min-doc_id survivor because chunks
    arrive in doc_id order."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.dedup import dedup_ingest_stream

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src = tmp_path / "incoming"
    src.mkdir()
    # chunk 0: doc_id < 100; chunk 1: 100-299 plus DUPLICATED text of
    # chunk 0 docs (new ids 10000+); chunk 2: the rest plus an exact
    # within-chunk duplicate pair
    c0 = docs.where(F.col("doc_id") < 100)
    dup_of_c0 = c0.limit(5).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    c1 = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 300)).unionByName(
        dup_of_c0
    )
    within_dup = docs.where(F.col("doc_id") == 300).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    c2 = docs.where(F.col("doc_id") >= 300).unionByName(within_dup)
    for i, c in enumerate((c0, c1, c2)):
        c.coalesce(1).write.parquet(str(src / f"chunk{i}.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/*.parquet")
    )
    q = dedup_ingest_stream(
        stream,
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    union_all = c0.unionByName(c1).unionByName(c2)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    expected = sorted(
        r.doc_id
        for r in union_all.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
        .collect()
    )
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "corpus")).select("doc_id").collect()
    )
    assert got == expected
    # index holds exactly one digest per accepted doc
    assert spark.read.parquet(str(tmp_path / "index")).distinct().count() == len(got)


def test_dedup_ingest_stream_damaged_index_fails_batch(spark, sf_dir, tmp_path):
    """An index dir that EXISTS but is unreadable (e.g. left empty by
    a failed write) must FAIL the batch, not be treated as
    first-batch — that would silently admit duplicates (r6 advice:
    only PATH_NOT_FOUND means 'no index yet')."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.dedup import dedup_ingest_stream

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src = tmp_path / "incoming"
    src.mkdir()
    docs.where(F.col("doc_id") < 50).coalesce(1).write.parquet(
        str(src / "chunk0.parquet")
    )
    index_dir = tmp_path / "index"
    index_dir.mkdir()  # exists, but no parquet inside → unreadable

    stream = spark.readStream.schema(docs.schema).parquet(str(src) + "/*/*.parquet")
    q = dedup_ingest_stream(
        stream,
        index_dir=str(index_dir),
        out_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    with _pytest.raises(Exception, match="(?i)unable_to_infer_schema|unable to infer"):
        q.processAllAvailable()
    q.stop()


def test_posting_stats_ingest_equals_batch_stats(spark, sf_dir, tmp_path):
    """Three-chunk streamed ingest of the documents table must land
    posting stats whose MERGE equals a direct batch computation:
    per-word df/tf for the BM25 query vocabulary, and the corpus
    scalars (N, avgdl) that llm_bm25_topk's inline aggregate
    computes — the incremental path and the one-shot path agree
    exactly (all-integer partials, summation merge)."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        posting_stats_ingest_stream,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tmp_path / "incoming"
    src.mkdir()
    bounds = [(0, 100), (100, 300), (300, 10**9)]
    for i, (lo, hi) in enumerate(bounds):
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(str(src / f"chunk{i}.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/*.parquet")
    )
    q = posting_stats_ingest_stream(
        stream,
        stats_dir=str(tmp_path / "stats"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    words, corpus = read_posting_stats(spark, str(tmp_path / "stats"))
    got = {
        r["word"]: (r["df"], r["tf"])
        for r in words.where(
            F.col("word").isin("table", "spark", "merge")
        ).collect()
    }
    toks = F.split("text", " ")
    expected = {
        r["word"]: (r["df"], r["tf"])
        for r in docs.select("doc_id", F.explode(toks).alias("word"))
        .where(F.col("word").isin("table", "spark", "merge"))
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("tf"))
        .collect()
    }
    assert got == expected
    crow = corpus.first()
    brow = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).cast("long").alias("s")
    ).first()
    assert (crow["n_docs"], crow["sum_dl"]) == (brow["n"], brow["s"])
    # three epochs landed as three partitions — the idempotence unit
    import os as _os

    epochs = [
        d
        for d in _os.listdir(str(tmp_path / "stats" / "words"))
        if d.startswith("epoch=")
    ]
    assert len(epochs) == 3


def test_posting_stats_replay_is_idempotent(spark, sf_dir, tmp_path):
    """The exactly-once claim, exercised: replaying an epoch (the
    restart-after-half-finished-foreachBatch path) overwrites its own
    partition instead of double-appending, so the merged stats are
    unchanged — and a replay that arrives with DIFFERENT content for
    the same epoch (retry after partial upstream change) leaves the
    LAST write, never a mixture."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        ingest_posting_batch,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") < 200)
    b1 = docs.where(F.col("doc_id") >= 200)
    stats = str(tmp_path / "stats")
    ingest_posting_batch(b0, 0, stats)
    ingest_posting_batch(b1, 1, stats)

    def snapshot():
        words, corpus = read_posting_stats(spark, stats)
        w = sorted(tuple(r) for r in words.collect())
        c = corpus.first()
        return w, (c["n_docs"], c["sum_dl"])

    before = snapshot()
    ingest_posting_batch(b1, 1, stats)  # exact replay of epoch 1
    assert snapshot() == before
    # replay epoch 1 with a subset (simulated partial retry): the
    # epoch partition is REPLACED, not mixed
    ingest_posting_batch(b1.limit(50), 1, stats)
    words, corpus = read_posting_stats(spark, stats)
    assert corpus.first()["n_docs"] == b0.count() + 50


def test_posting_stats_compaction_preserves_merge_and_future_ingest(
    spark, sf_dir, tmp_path
):
    """Epoch compaction folds the partial history into the reserved
    epoch -1 without changing the merged stats, and a LATER epoch
    still ingests cleanly into the compacted layout (the property
    the generic io.compact_snapshot would break by flattening the
    partitioning)."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        compact_posting_stats,
        ingest_posting_batch,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = str(tmp_path / "stats")
    for e, (lo, hi) in enumerate([(0, 100), (100, 300), (300, 400)]):
        ingest_posting_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), e, stats
        )

    def snapshot():
        words, corpus = read_posting_stats(spark, stats)
        return (
            sorted(tuple(r) for r in words.collect()),
            tuple(corpus.first()),
        )

    before = snapshot()
    report = compact_posting_stats(spark, stats)
    assert snapshot() == before
    assert report["words_files_after"] <= report["words_files_before"]
    import os as _os

    assert _os.listdir(f"{stats}/words").count("epoch=-1") == 1 or any(
        d == "epoch=-1" for d in _os.listdir(f"{stats}/words")
    )
    # a later epoch lands cleanly in the compacted layout
    late = docs.where(F.col("doc_id") >= 400)
    ingest_posting_batch(late, 9, stats)
    _, corpus = read_posting_stats(spark, stats)
    assert corpus.first()["n_docs"] == docs.count()


def test_compact_swap_is_crash_recoverable(spark, sf_dir, tmp_path, monkeypatch):
    """r9 ADVICE fix: the r8 compaction rmtree'd the live stats dir
    BEFORE moving the staged merge in — a crash in that window lost
    everything. The swap is now rename-aside -> rename-in -> delete:
    simulate a crash at the final delete and assert the stats stay
    fully readable and merged, then assert the next compaction sweeps
    the leftover."""
    import os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        compact_posting_stats,
        ingest_posting_batch,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = str(tmp_path / "stats")
    ingest_posting_batch(docs.where(F.col("doc_id") < 200), 0, stats)
    ingest_posting_batch(docs.where(F.col("doc_id") >= 200), 1, stats)

    def snapshot():
        words, corpus = read_posting_stats(spark, stats)
        return (
            sorted(tuple(r) for r in words.collect()),
            tuple(corpus.first()),
        )

    before = snapshot()

    real_rmtree = _shutil.rmtree
    died = []

    def dying_rmtree(path, *a, **kw):
        if str(path).endswith("_compact_old") and not died:
            died.append(path)
            raise OSError("simulated crash before the old copy was deleted")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(_shutil, "rmtree", dying_rmtree)
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated crash"):
        compact_posting_stats(spark, stats)
    # the live stats never vanished: still readable, still merged
    assert snapshot() == before
    assert os.path.exists(f"{stats}/words_compact_old")  # recoverable copy
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)
    report = compact_posting_stats(spark, stats)          # sweeps leftover
    assert snapshot() == before
    assert not os.path.exists(f"{stats}/words_compact_old")
    assert not os.path.exists(f"{stats}/corpus_compact_old")
    assert report["words_files_after"] <= report["words_files_before"]


def test_bm25_from_index_matches_inline_key(spark, sf_dir, tmp_path):
    """r9: BM25 scored FROM the incrementally-maintained posting-stats
    index must be BIT-IDENTICAL to the inline llm_bm25_topk path on
    the same corpus — the 100 TB serving shape the key's docstring
    promises. Stats built across two epochs (so the merge is real),
    compared unrounded per doc, plus the top-20 surface key."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        bm25_from_index,
        bm25_scored,
        ingest_posting_batch,
    )
    from osm_airflow_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = str(tmp_path / "stats")
    ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 0), 0, stats)
    ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 1), 1, stats)

    inline = {r["doc_id"]: r["bm25"] for r in bm25_scored(spark, sf_dir).collect()}
    indexed = {
        r["doc_id"]: r["bm25"] for r in bm25_from_index(docs, stats).collect()
    }
    assert indexed == inline  # exact doubles, every document

    top_inline = [tuple(r) for r in QUERIES["llm_bm25_topk"](spark, sf_dir).collect()]
    top_indexed = [
        tuple(r)
        for r in bm25_from_index(docs, stats)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
        .collect()
    ]
    assert top_indexed == top_inline

    # a term absent from the index scores df=0, same as inline
    absent = bm25_from_index(docs, stats, terms=("zzz_never_seen",)).collect()
    assert all(r["bm25"] == 0.0 for r in absent)


def test_compact_swap_recovers_mid_rename_crash(spark, sf_dir, tmp_path):
    """r9 review finding: a crash BETWEEN the two renames (live dir
    already moved aside, staged merge not yet moved in) left the
    stats dir missing and every read — including compaction's own
    first read — wedged. The compactor must now restore the aside
    copy on entry and complete normally."""
    import os

    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        compact_posting_stats,
        ingest_posting_batch,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = str(tmp_path / "stats")
    ingest_posting_batch(docs.where(F.col("doc_id") < 200), 0, stats)
    ingest_posting_batch(docs.where(F.col("doc_id") >= 200), 1, stats)

    def snapshot():
        words, corpus = read_posting_stats(spark, stats)
        return (
            sorted(tuple(r) for r in words.collect()),
            tuple(corpus.first()),
        )

    before = snapshot()
    # simulate the mid-rename crash state: live dir renamed aside,
    # staged merge never moved in
    os.rename(f"{stats}/words", f"{stats}/words_compact_old")
    report = compact_posting_stats(spark, stats)  # must self-heal
    assert snapshot() == before
    assert not os.path.exists(f"{stats}/words_compact_old")
    assert report["words_files_after"] <= report["words_files_before"]


def test_divergence_from_index_matches_batch_key(spark, sf_dir, tmp_path):
    """r9: the index-backed drift monitor is BIT-IDENTICAL to the
    batch llm_corpus_divergence key in the case where they measure
    the same quantity — index holding exactly the corpus, batch being
    one source (then p, q, m and every rounded term coincide). Also:
    a disjoint-vocabulary batch scores near ln 2, and a batch equal
    to the whole corpus scores ~0."""
    import math

    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.text import (
        divergence_from_index,
        ingest_posting_batch,
    )
    from osm_airflow_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    stats = str(tmp_path / "stats")
    ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 0), 0, stats)
    ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 1), 1, stats)

    batch_key = {
        r["source"]: (r["n_tokens"], r["js_divergence"])
        for r in QUERIES["llm_corpus_divergence"](spark, sf_dir).collect()
    }
    for source in list(batch_key)[:3]:
        got = divergence_from_index(
            docs.where(F.col("source") == source), stats
        ).first()
        assert (got["n_tokens"], got["js_divergence"]) == batch_key[source]

    whole = divergence_from_index(docs, stats).first()
    assert abs(whole["js_divergence"]) < 1e-9

    alien = spark.createDataFrame(
        [(1, "zzq yyx wwv " * 50)], "doc_id long, text string"
    )
    far = divergence_from_index(alien, stats).first()
    assert far["js_divergence"] > 0.6  # near ln 2 = 0.693


def test_cusum_monitor_stream_parity_with_batch_closed_form(spark, tmp_path):
    """Streaming CUSUM (per-key recursion state) vs the batch key's
    prefix-sum/running-min closed form on the SAME planted 40-day
    level-shift series, mu/sigma fed from the batch stats: the final
    streamed max_cusum/peak/breach must agree to float tolerance
    (the stream sums sequential doubles where the batch uses decimal
    cumulatives; identical order, so ulps not bits). Days arrive in
    four whole-day micro-batch files to honor the alignment
    contract, with a restart-free single pass per file order."""
    import json

    from osm_airflow_spark.registry import all_queries
    from osm_airflow_spark.streaming.stateful import cusum_monitor_stream

    # planted series: 30 flat days then a sustained 10-day shift
    days = [
        (f"2024-01-{d+1:02d}" if d < 31 else f"2024-02-{d-30:02d}",
         10.0 if d < 30 else 100.0)
        for d in range(40)
    ]
    # events fixture for the batch key (one event per day)
    ev_rows = [
        (i, 1, "purchase", x, 1_704_067_200_000_000 + i * 86_400_000_000)
        for i, (_, x) in enumerate(days)
    ]
    from pyspark.sql import functions as F

    spark.createDataFrame(
        ev_rows,
        "event_id long, user_id long, event_type string, value double, us long",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    batch = all_queries()["pipeline_cusum_changepoint"](
        spark, str(tmp_path)
    ).collect()[0]

    # daily-aggregate stream: 4 files x 10 whole days
    src = tmp_path / "daily"
    src.mkdir()
    import os

    for i in range(4):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for day, x in days[i * 10 : (i + 1) * 10]:
                f.write(json.dumps(
                    {"event_type": "purchase", "day": day, "x": x}) + "\n")
        # same-mtime files can be picked out of order (measured on the
        # running-distinct twin); arrival order is the contract
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("event_type string, day string, x double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    params = {
        "purchase": (
            batch["mu"], 0.5 * batch["sigma"], 4.0 * batch["sigma"]
        )
    }
    q = (
        cusum_monitor_stream(stream, params)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_cusum")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = spark.sql(
        "SELECT * FROM t_cusum ORDER BY n_days DESC LIMIT 1"
    ).collect()[0]
    assert final["n_days"] == 40
    assert abs(final["max_cusum"] - batch["max_cusum"]) <= 1e-9 * max(
        1.0, abs(batch["max_cusum"])
    )
    assert final["peak_day"] == batch["peak_day"]
    assert bool(final["breached"]) is bool(batch["breached"]) is True


def test_running_distinct_stream_parity_with_batch_window(spark, tmp_path):
    """Streaming running-distinct (per-user seen-type-set state) vs
    the batch window key on the SAME multi-user event history, fed as
    three time-chunked micro-batch files: every (user, event) row
    must carry the IDENTICAL integer count — exact parity, no
    tolerance. Cross-batch dedup is the point: a type seen in
    chunk 0 must not increment again in chunk 2."""
    import json

    from pyspark.sql import functions as F

    from osm_airflow_spark.registry import all_queries
    from osm_airflow_spark.streaming.stateful import running_distinct_stream

    seqs = {
        1: ["A", "B", "A", "C", "B", "D", "A", "E", "C", "F"],
        2: ["X", "X", "X", "Y", "X", "Y", "Z", "X", "Y", "Z"],
    }
    rows = []
    eid = 0
    for step in range(10):
        for user, seq in seqs.items():
            rows.append(
                (eid, user, seq[step], 1.0,
                 1_704_067_200_000_000 + step * 3_600_000_000)
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, us long",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    batch = {
        (r["user_id"], r["event_id"]): r["distinct_types_so_far"]
        for r in all_queries()["win_running_distinct"](
            spark, str(tmp_path)
        ).collect()
    }

    src = tmp_path / "stream"
    src.mkdir()
    # three whole-time-step chunks: steps 0-3, 4-6, 7-9. The file
    # source orders same-mtime files arbitrarily (observed: chunk2
    # before chunk1), so pin strictly increasing mtimes — arrival
    # order IS the contract under test.
    import os

    bounds = [(0, 4), (4, 7), (7, 10)]
    for i, (lo, hi) in enumerate(bounds):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for eid_, user, etype, _, us in rows:
                step = (us - 1_704_067_200_000_000) // 3_600_000_000
                if lo <= step < hi:
                    f.write(json.dumps(
                        {"event_id": eid_, "user_id": user,
                         "event_type": etype, "ts_us": us}) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
        )
    )
    q = (
        running_distinct_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_rdist")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r["user_id"], r["event_id"]): r["distinct_types_so_far"]
        for r in spark.sql("SELECT * FROM t_rdist").collect()
    }
    assert streamed == batch
    assert streamed[(1, rows[-2][0])] == 6  # user 1 ends at 6 types
    assert streamed[(2, rows[-1][0])] == 3  # user 2 ends at 3 types


def test_near_dedup_ingest_stream_parity_with_batch(spark, sf_dir, tmp_path):
    """VERDICT r9 #5 — streaming K2: a 3-chunk ingest with planted
    within-chunk AND cross-batch near-duplicates must emit exactly
    the pair set the batch llm_dedup_near path (minhash_lsh_pairs)
    finds over the unioned corpus, with identical est_jaccard values.
    Pair discovery is order-independent (the later-arriving doc finds
    the pair: new x new within its batch, new x seen via the band
    index), so this holds for any chunk arrival order."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.dedup import (
        minhash_lsh_pairs,
        near_dedup_ingest_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def near_variant(src, id_offset):
        # drop the first word: a high-Jaccard (not exact) duplicate
        return src.select(
            (F.col("doc_id") + id_offset).alias("doc_id"),
            F.expr("concat_ws(' ', slice(split(text, ' '), 2, 100000))").alias(
                "text"
            ),
        )

    c0 = docs.where(F.col("doc_id") < 100)
    # chunk 1: fresh docs + near-dups OF CHUNK 0 (cross-batch)
    c1 = (
        docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
        .unionByName(near_variant(c0.where(F.col("doc_id") < 5), 10000))
    )
    # chunk 2: fresh docs + an exact cross-batch copy of a chunk-0 doc
    # + a within-chunk near-dup pair (base and variant both in c2)
    c2_base = docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    c2 = (
        c2_base.unionByName(c0.where(F.col("doc_id") == 7).select(
            (F.col("doc_id") + 20000).alias("doc_id"), "text"))
        .unionByName(near_variant(c2_base.where(F.col("doc_id") == 200), 30000))
    )
    src = tmp_path / "incoming"
    src.mkdir()
    for i, c in enumerate((c0, c1, c2)):
        c.coalesce(1).write.parquet(str(src / f"chunk{i}.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/*.parquet")
    )
    q = near_dedup_ingest_stream(
        stream,
        index_dir=str(tmp_path / "bands"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    # availableNow terminates on its own; on a slow box a timeout must
    # fail HERE, not as a confusing set-diff over a partial pairs dir.
    assert q.awaitTermination(180), "ingest stream did not finish in 180s"

    got = {
        (r["doc_a"], r["doc_b"]): round(r["est_jaccard"], 9)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    union_all = c0.unionByName(c1).unionByName(c2)
    want = {
        (r["doc_a"], r["doc_b"]): round(r["est_jaccard"], 9)
        for r in minhash_lsh_pairs(union_all).collect()
    }
    assert got == want
    # the plant worked: at least one CROSS-batch near (not exact) pair
    assert any(b >= 10000 and w < 1.0 for (a, b), w in want.items()), want
    # and the exact cross-batch copy was found too
    assert any(b == 20007 for (a, b) in want), sorted(want)


def test_sprt_monitor_stream_exact_parity_with_batch(spark, tmp_path):
    """Streaming SPRT (frozen-decision state) vs the batch key on the
    SAME planted four-regime series, fed as four whole-day micro-batch
    files: decision, decision day, counts and LLR must match EXACTLY —
    the scaled-integer LLR has no accumulation error to hide behind.
    Also pins the stop-rule: a decided type's counts freeze even
    though later chunks keep arriving."""
    import datetime
    import json
    import os

    from osm_airflow_spark.registry import all_queries
    from osm_airflow_spark.streaming.stateful import sprt_monitor_stream
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    daily = []
    for d in range(20):
        ts = datetime.datetime(2024, 3, 1) + datetime.timedelta(days=d)
        day = ts.date().isoformat()
        mix = [("hot", 20, 0), ("cold", 0, 20), ("drift", 5, 5), ("flat", 11, 9)]
        for typ, s, f in mix:
            daily.append({"event_type": typ, "day": day, "s": s, "f": f})
            for _ in range(s):
                rows.append((eid, ts, 1, typ, 99.0, "{}"))
                eid += 1
            for _ in range(f):
                rows.append((eid, ts, 1, typ, 1.0, "{}"))
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    batch = {
        r["event_type"]: r
        for r in all_queries()["pipeline_sprt"](spark, str(tmp_path)).collect()
    }

    src = tmp_path / "daily"
    src.mkdir()
    per_chunk = 4 * 5  # 5 days x 4 types per file
    for i in range(4):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for row in daily[i * per_chunk : (i + 1) * per_chunk]:
                f.write(json.dumps(row) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("event_type string, day string, s long, f long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sprt_monitor_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sprt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {
        r["event_type"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY event_type"
            " ORDER BY n_seen DESC) rk FROM t_sprt) WHERE rk = 1"
        ).collect()
    }
    assert set(final) == set(batch)
    for typ, b in batch.items():
        s = final[typ]
        assert s["decision"] == b["decision"], typ
        assert s["day_decided"] == b["day_decided"], typ
        assert s["n_seen"] == b["n_seen"], typ
        assert s["n_success"] == b["n_success"], typ
        assert s["llr"] == b["llr"], typ  # exact — integer LLR


def test_sprt_monitor_stream_day_monotone_on_replayed_earlier_batch(spark, tmp_path):
    """ADVICE r11 fix: for an undecided type the 'continue' row used to
    report the CURRENT micro-batch's max(day), so a late/replayed batch
    carrying only earlier days made the dashboard day REGRESS. The
    max-day-seen now persists in state: feed days 10–14 first, then a
    replayed chunk of days 5–9 — every emitted row must report day 14
    while the counts keep accumulating."""
    import json
    import os

    from osm_airflow_spark.streaming.stateful import sprt_monitor_stream

    src = tmp_path / "daily"
    src.mkdir()
    chunks = [
        [{"event_type": "drift", "day": f"2024-03-{d:02d}", "s": 5, "f": 5} for d in range(10, 15)],
        [{"event_type": "drift", "day": f"2024-03-{d:02d}", "s": 5, "f": 5} for d in range(5, 10)],
    ]
    for i, chunk in enumerate(chunks):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for row in chunk:
                f.write(json.dumps(row) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("event_type string, day string, s long, f long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sprt_monitor_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sprt_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM t_sprt_replay ORDER BY n_seen").collect()
    assert len(rows) == 2  # one 'continue' row per micro-batch
    assert [r["n_seen"] for r in rows] == [50, 100]
    assert all(r["decision"] == "continue" for r in rows)
    # the replayed-earlier-days batch must NOT regress the day
    assert [r["day_decided"] for r in rows] == ["2024-03-14", "2024-03-14"]


def test_page_hinkley_stream_exact_parity_with_batch(spark, tmp_path):
    """Streaming Page-Hinkley vs the batch key on the sf0.001 events
    fixture, fed as three day-ordered micro-batch files: n_days,
    ph_max and peak_day must match EXACTLY per event type — the walk
    is integer micros end to end and the one rational (the running
    mean) uses the same IEEE division + half-away round."""
    import json
    import os

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.registry import all_queries
    from osm_airflow_spark.streaming.stateful import page_hinkley_stream
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        r["event_type"]: r
        for r in all_queries()["pipeline_page_hinkley"](
            spark, sf_dir
        ).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_format(
                F.date_trunc("day", F.col("ts")).cast("date"), "yyyy-MM-dd"
            ).alias("day"),
        )
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(18,6)")) * 1_000_000
            ).cast("long").alias("xm")
        )
        .orderBy("day", "event_type")
        .collect()
    )
    days = sorted({r["day"] for r in daily})
    cuts = [days[: len(days) // 3], days[len(days) // 3 : 2 * len(days) // 3],
            days[2 * len(days) // 3 :]]
    src = tmp_path / "daily"
    src.mkdir()
    for i, chunk_days in enumerate(cuts):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for r in daily:
                if r["day"] in chunk_days:
                    f.write(json.dumps(
                        {"event_type": r["event_type"], "day": r["day"],
                         "xm": r["xm"]}) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("event_type string, day string, xm long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        page_hinkley_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_ph")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {
        r["event_type"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY"
            " event_type ORDER BY n_days DESC) rk FROM t_ph) WHERE rk = 1"
        ).collect()
    }
    assert set(final) == set(batch)
    for typ, b in batch.items():
        s = final[typ]
        assert s["n_days"] == b["n_days"], typ
        assert s["ph_max"] == b["ph_max"], typ  # exact — integer micros
        assert s["peak_day"] == b["peak_day"], typ


def test_page_hinkley_stream_skips_replayed_earlier_day(spark, tmp_path):
    """The walk is order-defined: a micro-batch carrying a day at or
    before the persisted max-day is SKIPPED (replay idempotence), so
    n_days and the statistic are unchanged."""
    import json
    import os

    from osm_airflow_spark.streaming.stateful import page_hinkley_stream

    src = tmp_path / "daily"
    src.mkdir()
    chunks = [
        [{"event_type": "a", "day": "2024-01-01", "xm": 1_000_000},
         {"event_type": "a", "day": "2024-01-02", "xm": 9_000_000}],
        [{"event_type": "a", "day": "2024-01-02", "xm": 9_000_000},
         {"event_type": "a", "day": "2024-01-01", "xm": 1_000_000}],
        [{"event_type": "a", "day": "2024-01-03", "xm": 2_000_000}],
    ]
    for i, chunk in enumerate(chunks):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for row in chunk:
                f.write(json.dumps(row) + "\n")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("event_type string, day string, xm long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        page_hinkley_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_ph_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM t_ph_replay ORDER BY n_days DESC LIMIT 1"
    ).collect()
    assert rows[0]["n_days"] == 3  # the replayed chunk added nothing
    # walk: means 1, 5, 4 -> devs 0, +4, -2 -> m 0, 4, 2; rmin 0;
    # ph 0, 4, 2 -> peak 4.0 on day 2
    assert rows[0]["ph_max"] == 4.0
    assert rows[0]["peak_day"] == "2024-01-02"


def _late_event_fixture(tmp_path):
    """Two strictly-mtime-ordered micro-batch files with one planted
    LATE row: batch 0 reaches 20:00 (watermark 19:00 at 1 h delay);
    batch 1 carries a 15:00 row with a never-seen event type Z plus an
    on-time 21:00 row."""
    import json
    import os

    def us(h):
        return 1_704_067_200_000_000 + h * 3_600_000_000

    chunks = [
        [
            {"event_id": 0, "user_id": 1, "event_type": "A", "ts_us": us(10)},
            {"event_id": 1, "user_id": 1, "event_type": "B", "ts_us": us(12)},
            {"event_id": 2, "user_id": 1, "event_type": "C", "ts_us": us(20)},
        ],
        [
            {"event_id": 3, "user_id": 1, "event_type": "Z", "ts_us": us(15)},
            {"event_id": 4, "user_id": 1, "event_type": "D", "ts_us": us(21)},
        ],
    ]
    src = tmp_path / "stream"
    src.mkdir()
    for i, chunk in enumerate(chunks):
        path = src / f"chunk{i}.json"
        with open(path, "w") as f:
            for row in chunk:
                f.write(json.dumps(row) + "\n")
        os.utime(path, (1_700_000_000 + i * 10,) * 2)
    return str(src)


def _late_fixture_stream(spark, src):
    return (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
        )
        .withWatermark("ts", "1 hour")
    )


def _run_distinct_stream(spark, src, ckpt, name, guard):
    from osm_airflow_spark.streaming.stateful import running_distinct_stream

    stream = _late_fixture_stream(spark, src)
    q = (
        running_distinct_stream(
            stream, late_delay_seconds=3600 if guard else None
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        r["event_id"]: r["distinct_types_so_far"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_watermark_does_not_filter_stateful_op_input_measured(spark, tmp_path):
    """MEASURED platform semantics (r13, the SCALE ledger entry): an
    upstream withWatermark does NOT filter late rows into
    applyInPandasWithState — the 15:00 row arrives after the
    watermark advanced to 19:00 and still reaches the state function
    (true for NoTimeout AND EventTimeTimeout; Spark's automatic late
    filtering covers aggregations/dedup/joins only, and the windowed
    -agg eviction IS proven by test_watermark_drops_late_events).
    Pinned so nobody designs a stateful operator assuming the engine
    guards it."""
    src = _late_event_fixture(tmp_path)
    got = _run_distinct_stream(
        spark, src, str(tmp_path / "ckpt"), "t_wm_unguarded", guard=False
    )
    # the late Z row WAS processed: D lands as the 5th distinct type
    assert got == {0: 1, 1: 2, 2: 3, 3: 4, 4: 5}


def test_inline_late_guard_evicts_late_rows_in_stateful_op(spark, tmp_path):
    """VERDICT r12 #6 — the documented late-data design for custom
    stateful operators, executed: running_distinct_stream's inline
    late guard (per-key high-water mark, batch-delayed exactly like
    an engine watermark) drops the planted 15:00 row — no output row
    for it, no state poisoning (D is the 4th distinct type, not the
    5th) — while the on-time 21:00 row passes. The guard must be
    INLINE because Spark rejects chaining a second
    applyInPandasWithState (late_row_filter) in the same query —
    measured, see the standalone test below."""
    src = _late_event_fixture(tmp_path)
    got = _run_distinct_stream(
        spark, src, str(tmp_path / "ckpt2"), "t_wm_guarded", guard=True
    )
    assert got == {0: 1, 1: 2, 2: 3, 4: 4}


def test_late_row_filter_standalone_evicts_and_chaining_is_rejected(
    spark, tmp_path
):
    """late_row_filter as an ingest-edge operator in its OWN query:
    the planted late row is evicted before the sink while everything
    on time passes untouched; and the platform constraint that forced
    the inline-guard design is pinned — composing late_row_filter
    with a second stateful operator in one query must raise
    'Multiple applyInPandasWithStates are not supported'."""
    from pyspark.sql.utils import AnalysisException

    from osm_airflow_spark.streaming.stateful import (
        late_row_filter,
        running_distinct_stream,
    )

    src = _late_event_fixture(tmp_path)
    stream = _late_fixture_stream(spark, src)
    q = (
        late_row_filter(stream, key="user_id", delay_seconds=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_filter")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM t_late_filter").collect()
    )
    assert kept == [0, 1, 2, 4]  # the 15:00 row (id 3) evicted

    with pytest.raises(AnalysisException, match="[Mm]ultiple.*[Ss]tate"):
        running_distinct_stream(
            late_row_filter(stream, key="user_id", delay_seconds=3600)
        ).writeStream.format("memory").queryName("t_chain").option(
            "checkpointLocation", str(tmp_path / "ckpt4")
        ).start()


def test_heavy_hitters_stream_exact_and_bounded(spark, tmp_path):
    """Space-Saving contracts over a 3-chunk replay: (1) EXACTNESS —
    with k >= distinct users, every est_count equals the exact batch
    groupBy count with max_err 0, accumulated ACROSS micro-batches;
    (2) BOUNDS under pressure — with k=2 over a skewed 6-user stream
    the hot user is tracked, true <= est <= true + max_err, and any
    user with true count > n_seen/k is present in the final
    snapshot."""
    import json
    import os

    from pyspark.sql import functions as F

    from osm_airflow_spark.streaming.stateful import heavy_hitters_stream

    # stream: type 'hot' — user 7 dominates (12 events), users
    # 1..5 get 2 each; type 'cold' — users 1,2 get 3/1
    plan = [("hot", 7)] * 12 + [
        ("hot", u) for u in (1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    ] + [("cold", 1)] * 3 + [("cold", 2)]
    rows = []
    for i, (etype, uid) in enumerate(plan):
        rows.append(
            {"event_id": i, "user_id": uid, "event_type": etype,
             "ts_us": 1_704_067_200_000_000 + i * 60_000_000}
        )

    def feed(sub, op):
        src = tmp_path / sub
        src.mkdir()
        bounds = [(0, 9), (9, 18), (18, len(rows))]
        for ci, (lo, hi) in enumerate(bounds):
            p = src / f"chunk{ci}.json"
            with open(p, "w") as f:
                for r in rows[lo:hi]:
                    f.write(json.dumps(r) + "\n")
            os.utime(p, (1_700_000_000 + ci * 10,) * 2)
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .select(
                "event_id", "user_id", "event_type",
                F.timestamp_micros(F.col("ts_us")).alias("ts"),
            )
        )
        name = f"t_hh_{sub}"
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sub}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(f"SELECT * FROM {name}").collect()

    # (1) exactness with roomy k
    out = feed("roomy", lambda s: heavy_hitters_stream(s, k=8))
    latest_us = {}
    for r in out:
        latest_us[r["event_type"]] = max(
            latest_us.get(r["event_type"], 0), r["batch_hi_us"]
        )
    final = {
        (r["event_type"], r["user_id"]): r
        for r in out
        if r["batch_hi_us"] == latest_us[r["event_type"]]
    }
    true = {}
    for etype, uid in plan:
        true[(etype, uid)] = true.get((etype, uid), 0) + 1
    assert {kk: v["est_count"] for kk, v in final.items()} == true
    assert all(v["max_err"] == 0 for v in final.values())
    assert final[("hot", 7)]["n_seen"] == 22

    # (2) bounds under pressure
    out2 = feed("tight", lambda s: heavy_hitters_stream(s, k=2))
    latest2 = max(
        r["batch_hi_us"] for r in out2 if r["event_type"] == "hot"
    )
    snap = {
        r["user_id"]: r
        for r in out2
        if r["event_type"] == "hot" and r["batch_hi_us"] == latest2
    }
    assert len(snap) == 2
    assert 7 in snap  # true 12 > n_seen/k = 11 -> guaranteed tracked
    for uid, r in snap.items():
        t = true.get(("hot", uid), 0)
        assert t <= r["est_count"] <= t + r["max_err"]
    assert snap[7]["n_seen"] == 22


def test_bottomk_sample_stream_equals_batch_and_accumulates(spark, tmp_path):
    """Bottom-k determinism contracts over a 3-chunk replay: after
    EVERY micro-batch, each type's snapshot EXACTLY equals the batch
    bottom-k (xxhash64(event_id), event_id) over the stream prefix
    seen so far — the replay-stability/mergeability contract — and
    with k >= the type's volume the final sample is the whole type.
    n_seen accumulates across batches."""
    import json
    import os

    from pyspark.sql import functions as F

    from osm_airflow_spark.streaming.stateful import bottomk_sample_stream

    plan = [("hot", u % 5) for u in range(20)] + [("cold", 9)] * 3
    rows = []
    for i, (etype, uid) in enumerate(plan):
        rows.append(
            {"event_id": i * 11 + 3, "user_id": uid, "event_type": etype,
             "ts_us": 1_704_067_200_000_000 + i * 60_000_000}
        )

    src = tmp_path / "src"
    src.mkdir()
    bounds = [(0, 8), (8, 16), (16, len(rows))]
    for ci, (lo, hi) in enumerate(bounds):
        p = src / f"chunk{ci}.json"
        with open(p, "w") as f:
            for r in rows[lo:hi]:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + ci * 10,) * 2)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
        )
    )
    q = (
        bottomk_sample_stream(stream, k=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_bottomk")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM t_bottomk").collect()

    # batch twin per prefix: bottom-4 by (xxhash64(event_id), event_id)
    def batch_bottomk(prefix_rows, etype, k=4):
        sub = [r for r in prefix_rows if r["event_type"] == etype]
        if not sub:
            return []
        df = spark.createDataFrame(
            [(r["event_id"], r["user_id"]) for r in sub],
            "event_id long, user_id long",
        ).select("*", F.xxhash64("event_id").alias("h"))
        return sorted(
            (r["h"], r["event_id"], r["user_id"])
            for r in df.orderBy("h", "event_id").limit(k).collect()
        )

    prefixes = {}
    for ci, (lo, hi) in enumerate(bounds):
        hi_us = 1_704_067_200_000_000 + (hi - 1) * 60_000_000
        prefixes[hi_us] = rows[:hi]
    by_batch = {}
    for r in out:
        by_batch.setdefault((r["event_type"], r["batch_hi_us"]), []).append(r)
    assert by_batch  # every chunk produced snapshots
    for (etype, hi_us), snap in by_batch.items():
        # the batch stamp is the max ts of rows of ANY type in that
        # micro-batch for this group's rows; locate the prefix by
        # scanning known chunk-end stamps >= this stamp
        prefix = None
        for end_us in sorted(prefixes):
            if hi_us <= end_us:
                prefix = prefixes[end_us]
                break
        assert prefix is not None
        got = sorted((r["h"], r["event_id"], r["user_id"]) for r in snap)
        assert got == batch_bottomk(prefix, etype)
        n_true = sum(1 for r in prefix if r["event_type"] == etype)
        assert all(r["n_seen"] == n_true for r in snap)

    # roomy k: the final cold sample IS all 3 cold events
    cold_final = [
        r for r in out if r["event_type"] == "cold"
        and r["batch_hi_us"] == max(
            x["batch_hi_us"] for x in out if x["event_type"] == "cold"
        )
    ]
    assert len(cold_final) == 3
