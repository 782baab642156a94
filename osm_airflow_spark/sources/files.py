"""File-format connectors beyond Parquet (SURVEY.md §2.B
completeness): CSV, JSON-lines, and ORC read/write with explicit
schemas (schema inference is a dev-only convenience — §1.3's
fixed-schema rule applies to every format).

Scale notes: CSV/JSON are row formats — no column pruning, no
predicate pushdown, no min/max stats; they are ingest formats, not
query formats. The engine's pattern is convert-once: land raw files,
rewrite to Parquet partitioned by the query keys, query the Parquet
(the same move the PBF design makes, sources/pbf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def convert_to_parquet(
    df: DataFrame, out_path: str, partition_cols: tuple[str, ...] = (), mode: str = "overwrite"
) -> None:
    """The convert-once step: any row-format ingest lands as
    partitioned Parquet before queries touch it."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32, sort_col: str | None = None
) -> None:
    """Bucketed, sorted managed table: the zero-shuffle join layout.

    Two tables bucketed on the same key with the same bucket count
    join without any Exchange — each task reads matching buckets.
    This is the 100 TB answer for the recurring big⋈big joins
    (lineitem⋈orders; OSM way-refs⋈nodes): pay the shuffle once at
    write time, never at query time."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
