"""Sources and sinks (SURVEY.md §2.B).

Reference behaviors re-expressed Spark-first:

* B1 PBF scan (osm_etl.py:54-56): the reference downloads a ``.pbf``
  and lets osm2pgsql stream it. Spark has no PBF datasource; the
  engine's contract is elements-as-Parquet (one-time PBF→Parquet
  ingest happens outside the query path — see sources/pbf.py).
* B2 Parquet scan (TESTDATA.md): ``spark.read.parquet`` — columnar,
  predicate pushdown + column pruning reach the scan for free.
* B3 JDBC publish (README.md:70,76): ``df.write.format("jdbc")``.
* B4/B5 dated snapshot artifact (osm_etl.py:88-91): the ``pg_dump``
  file whose name embeds ``pgosm_date`` becomes a Parquet write
  partitioned by the snapshot date — reload-able, prunable.

Scale notes (100 TB): scans are split by Parquet row-groups across
executors (``spark.sql.files.maxPartitionBytes``); snapshot writes
partition by date+region so downstream queries prune both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """B2 — scan one fixture/layer table (self-describing Parquet)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the events table, normalizing its ns-precision timestamp.

    Spark's Parquet reader rejects INT64 TIMESTAMP(NANOS) outright
    (PARQUET_TYPE_ILLEGAL); the engine reads nanos as long and
    truncates to microseconds — exactly what DuckDB/PostgreSQL do
    with ns inputs, so oracle values agree. The conversion is one
    JVM-side integer division: no Python, no extra pass.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def write_snapshot(
    df: DataFrame,
    out_dir: str,
    snapshot_date: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """B4/B5 — dated snapshot artifact.

    The reference serializes the whole DB into
    ``osm-postetl-{pgosm_date}.sql`` (osm_etl.py:88-91). Here the
    same artifact is a Parquet dataset partitioned by
    ``pgosm_date`` (+ optional region), so each weekly run lands in
    its own partition and readers prune to one consistent snapshot.
    """
    (
        df.withColumn("pgosm_date", F.lit(snapshot_date))
        .write.mode(mode)
        # dynamic: overwrite replaces only the partitions this write
        # touches — a week-2 publish must not clobber week 1's
        # snapshot (static overwrite truncates the whole out_dir)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pgosm_date", *partition_cols)
        .parquet(out_dir)
    )


def write_clustered(
    df: DataFrame,
    out_dir: str,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster-sorted parquet publish: range-partition by the cluster
    key, then sort within each partition before writing.

    Why it matters at 100 TB: parquet stores min/max statistics per
    row group. When rows arrive sorted, each row group covers a
    NARROW key range, so a point/range predicate prunes most row
    groups at scan time without any index — the poor man's z-order.
    An unsorted write scatters every key across every row group and
    min/max stats prune nothing (verified by the row-group-stats
    tightness test in tests/test_sources.py). Same trick is what
    makes the geohash layout contract in SCALE.md actually prune."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(out_dir)
    )


def read_snapshot(spark: SparkSession, out_dir: str, snapshot_date: str) -> DataFrame:
    """Read back one dated snapshot; partition pruning keeps the scan
    to a single date directory."""
    return spark.read.parquet(out_dir).where(F.col("pgosm_date") == snapshot_date)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
    num_partitions: int | None = None,
) -> None:
    """B3 — publish a layer table to a serving database.

    Spark-side stand-in for the reference's COPY-into-PostGIS load
    (README.md:70,76,93). ``num_partitions`` bounds concurrent DB
    connections — at scale, coalesce before JDBC so a 1000-executor
    job doesn't open 1000 connections.
    """
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
