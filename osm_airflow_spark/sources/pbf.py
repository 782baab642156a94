"""B1 — OSM PBF ingestion (complete, dependency-free).

The reference never parses PBF itself: it downloads a geofabrik
extract and lets osm2pgsql (C++) stream it
(/root/reference/osm_etl.py:54-56, README.md:97). For a Spark-native
engine the idiomatic split is:

1. **Ingest once** (this module): PBF → three element tables
   (nodes / ways / relations, schemas per SURVEY.md §1.1). PBF is a
   blocked format (~8k-element Blob blocks), so the scalable ingest
   is: list the blob offsets on the driver (header-only scan, bytes
   ∝ block count), parallelize the offset ranges, decode each block
   in an executor task (`mapInPandas` over an offset DataFrame),
   write Parquet partitioned by element type + region.
2. **Query forever after** on the columnar element tables — every
   operator in the engine works on those.

No protobuf wheel exists in this image, so the block decoder is a
pure-Python wire-format reader (sources/pbf_wire.py) — the protobuf
encoding and the OSM PBF messages are both small public specs. A
planet file (~70 GB) is ~80k independent blobs: the unit of
parallelism is the blob, and decode throughput scales linearly with
executors. pbf_wire.write_pbf is the matching sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from osm_airflow_spark.sources import pbf_wire

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("way_id", T.LongType(), False),
        T.StructField("node_refs", T.ArrayType(T.LongType()), True),  # ordered
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.LongType(), False),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("mtype", T.StringType()),
                        T.StructField("ref", T.LongType()),
                        T.StructField("role", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_KIND_SCHEMA = {"nodes": NODE_SCHEMA, "ways": WAY_SCHEMA, "relations": RELATION_SCHEMA}
_KIND_COLS = {
    "nodes": ["node_id", "lat", "lon", "tags"],
    "ways": ["way_id", "node_refs", "tags"],
    "relations": ["rel_id", "members", "tags"],
}


def decode_blob(blob_bytes: bytes) -> dict:
    """Decode one PBF Blob into element row dicts (pure function —
    runs on executors). See pbf_wire for the wire-level decode."""
    return pbf_wire.decode_blob(blob_bytes)


def _offsets_df(spark: SparkSession, pbf_path: str) -> DataFrame:
    offsets = [
        (pbf_path, start, length)
        for (start, length, blob_type) in pbf_wire.scan_blob_offsets(pbf_path)
        if blob_type == "OSMData"
    ]
    n_part = max(1, min(len(offsets), spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        offsets, "path string, start long, length long"
    ).repartition(n_part)


def _decode_kind(kind: str):
    cols = _KIND_COLS[kind]

    def decode_partition(iterator):
        import pandas as pd  # noqa: PLC0415

        for pdf in iterator:
            rows = []
            for path, start, length in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(start)
                    rows.extend(decode_blob(fh.read(length)).get(kind, []))
            yield pd.DataFrame(
                [[r[c] for c in cols] for r in rows], columns=cols
            )

    return decode_partition


def read_pbf(spark: SparkSession, pbf_path: str) -> dict[str, DataFrame]:
    """PBF → {nodes, ways, relations} DataFrames, parallel by blob
    offset. Each executor task opens the file at its own offsets —
    no driver-side decode, no full-file broadcast."""
    offsets = _offsets_df(spark, pbf_path)
    return {
        kind: offsets.mapInPandas(_decode_kind(kind), _KIND_SCHEMA[kind])
        for kind in ("nodes", "ways", "relations")
    }


def ingest_pbf(
    spark: SparkSession, pbf_path: str, out_dir: str, region: str
) -> dict[str, str]:
    """PBF → element Parquet, the ingest-once step. At planet scale
    (~70 GB PBF / ~80k blobs) this is embarrassingly parallel; the
    parquet layout (type dir + region partition) is what SCALE.md's
    layout contract expects downstream."""
    paths = {}
    for kind, df in read_pbf(spark, pbf_path).items():
        path = f"{out_dir}/{kind}/region={region}"
        df.write.mode("overwrite").parquet(path)
        paths[kind] = path
    return paths
