"""Streaming, end to end on one page.

The reference rebuilds its database weekly from a full extract
(osm_etl.py:45); this engine replaces that with real incremental
maintenance. This script demonstrates the whole streaming surface,
runnable as-is (it synthesizes its own change feed and event files
into a temp dir):

  1. an OSM-replication-shaped change stream
     (``spark.readStream.format("osm_changes")``) applied to a
     persisted snapshot via ``foreachBatch(apply_diff)`` — the
     minutely-diff upgrade path;
  2. watermarked tumbling-window aggregation over a file event
     stream, with the batch twin printed beside it;
  3. streaming corpus-ingest dedup against a persisted digest index.

    python examples/streaming_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.llm.dedup import dedup_ingest_stream
from osm_airflow_spark.plans.merge import apply_diff
from osm_airflow_spark.session import get_spark
from osm_airflow_spark.sources.changes_datasource import register_changes_source


def incremental_snapshot(spark, root: str) -> None:
    print("== 1. change stream -> incrementally maintained snapshot")
    register_changes_source(spark)
    watch = os.path.join(root, "feed")
    os.makedirs(watch)
    snap = os.path.join(root, "snapshot")
    spark.createDataFrame(
        [(1, 52.5, 13.4, {"amenity": "cafe"}), (2, 48.9, 2.35, {})],
        "node_id long, lat double, lon double, tags map<string,string>",
    ).write.parquet(snap)

    def apply_batch(batch_df, epoch_id):
        if not batch_df.take(1):
            return
        merged = apply_diff(batch_df.sparkSession.read.parquet(snap), batch_df, "node_id")
        staged = f"{snap}_stage_{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        shutil.rmtree(snap)
        shutil.move(staged, snap)

    stream = spark.readStream.format("osm_changes").option("path", watch).load()
    q = stream.writeStream.foreachBatch(apply_batch).start()
    t = pd.Timestamp
    pd.DataFrame(
        [(3, 40.7, -74.0, {"amenity": "bank"}, "create", t("2024-05-01 10:00:00")),
         (2, None, None, None, "delete", t("2024-05-01 10:00:01"))],
        columns=["node_id", "lat", "lon", "tags", "change_op", "change_ts"],
    ).to_parquet(os.path.join(watch, "000000001.parquet"), index=False)
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(snap).orderBy("node_id").show()


def windowed_stream(spark, sf_dir: str, root: str) -> None:
    print("== 2. watermarked tumbling window (stream vs batch twin)")
    from osm_airflow_spark.streaming.windows import read_events_stream

    watch = os.path.join(root, "events")
    os.makedirs(watch)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(watch, "events.parquet"))
    stream = read_events_stream(spark, watch)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("hourly")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM hourly").collect()[0]["n"]
    n_batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    print(f"   stream windows: {n_stream}  batch twin: {n_batch}")
    print(
        "   (append mode emits a window only once the watermark passes"
        " it — the final watermark's open windows stay unemitted at"
        " stream end, so the stream count trails the batch twin by the"
        " last hour's windows; tests/test_streaming.py pins this)"
    )


def streaming_dedup(spark, sf_dir: str, root: str) -> None:
    print("== 3. streaming corpus-ingest dedup")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    incoming = os.path.join(root, "incoming")
    os.makedirs(incoming)
    docs.coalesce(1).write.parquet(os.path.join(incoming, "batch0.parquet"))
    # second batch: the same content again — must all be dropped
    docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars").coalesce(1).write.parquet(os.path.join(incoming, "batch1.parquet"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(incoming + "/*/*.parquet")
    )
    q = dedup_ingest_stream(
        stream,
        index_dir=os.path.join(root, "index"),
        out_dir=os.path.join(root, "corpus"),
        checkpoint_dir=os.path.join(root, "ckpt"),
    ).start()
    q.awaitTermination(120)
    n_in = docs.count() * 2
    n_out = spark.read.parquet(os.path.join(root, "corpus")).count()
    print(f"   ingested {n_in} docs -> corpus holds {n_out} (duplicates dropped)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-quickstart")
    with tempfile.TemporaryDirectory() as root:
        incremental_snapshot(spark, root)
        windowed_stream(spark, sf_dir, root)
        streaming_dedup(spark, sf_dir, root)


if __name__ == "__main__":
    main()
