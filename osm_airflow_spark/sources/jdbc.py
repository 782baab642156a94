"""B3 — JDBC source/sink (SURVEY.md §2.B row B3).

The reference's terminal store is PostgreSQL/PostGIS — the delegate
bulk-loads with COPY and the dump is re-loaded into the "real"
database (/root/reference/README.md:70,76; osm_etl.py:88-91). The
engine publishes the same way via Spark's JDBC writer (io.write_jdbc)
and can *read* a serving table back for reconciliation.

Proven end-to-end (r8) against the EMBEDDED DERBY that Spark
bundles for its metastore (derby-10.16.x in pyspark/jars — the
"no driver jar in the sandbox" assumption of earlier rounds was
wrong): tests/test_sources.py round-trips write_jdbc → read_jdbc
including nulls, append mode, and the range-partitioned parallel
read. A PostGIS target stays env-blocked (no server), but the JDBC
path itself — type mapping, partitioned scan, bounded connections —
is exercised for real.

Scale notes: always read with (partitionColumn, lowerBound,
upperBound, numPartitions) — an unpartitioned JDBC read is one
executor pulling the whole table through one connection. Writes
coalesce to a bounded connection count (io.write_jdbc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 16,
    properties: dict | None = None,
) -> DataFrame:
    """Range-partitioned JDBC scan: numPartitions parallel readers,
    each with a WHERE range on partition_column."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
