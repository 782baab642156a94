"""Multimodal columns (SURVEY.md §2.K row K6).

Image/audio/video payloads ride through the engine as opaque
``BinaryType`` columns with a typed metadata struct beside them —
exactly the WKB-geometry pattern from SURVEY §1.4: the engine never
interprets the bytes in the relational layer; decode/feature-extract
runs as Arrow-batched ``mapInPandas`` at the edges.

The container has no image/audio decoders, so ``decode_image`` is a
clearly-marked stub and the query path uses a deterministic fake
feature extractor — the Spark-side plumbing (binary columns, schema,
batch iteration, partition sizing) is real and oracle-checked.

Scale notes: binary payloads dominate row size — set
``spark.sql.files.maxPartitionBytes`` so a partition holds O(100)
payloads, not O(100k); never groupBy a payload column (hash the
bytes first: md5/sha2 are defined on binary); metadata-only queries
must prune the payload column at the scan (columnar formats make
that free — verified by ReadSchema in the plan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
            True,
        ),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to a pixel array.

    STUB: real decoding needs PIL/opencv, not present in this
    container. The mapInPandas plumbing around it is real; swap this
    one function when a decoder wheel is available.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not in this container; "
        "fake_features() is the deterministic stand-in used by the "
        "query path"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a feature extractor: byte-level
    statistics (length, mean byte value, first/last byte). Same shape
    as a real embedding hop: bytes in, fixed-width float vector out."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(sum(payload)) / len(payload),
        float(payload[0]),
        float(payload[-1]),
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches; each batch maps payload
    bytes → feature vectors without materializing the partition. This
    is the decode/resize/frame-sample template: replace fake_features
    with the real kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(fake_features),
                }
            )

    return media.mapInPandas(
        batches, "media_id long, n_bytes long, features array<double>"
    )


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque
    payload with typed metadata (no binary fixture exists — the
    pattern, not the codec, is what's exercised)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           'text/plain' AS mime
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — multimodal column plumbing: binary payload + typed
    metadata, hashed and measured without ever decoding (payload
    identity via sha2-on-binary — the dedup key for media at 100 TB)."""
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.col("meta.mime").alias("mime"),
    )


@query("mm_feature_extract")  # rows-only: mapInPandas feature path
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — the decode/feature-extract hop as Arrow-batched
    mapInPandas (deterministic fake kernel; see decode_image stub)."""
    media = documents_as_media(spark, sf_dir)
    return extract_features(media)


def frame_sample(media: DataFrame, chunk_bytes: int = 64, every_nth: int = 4) -> DataFrame:
    """Frame-sampling template for video-like payloads: slice the
    binary into fixed-size chunks ('frames'), keep every nth — the
    batch shape of video preprocessing (decode is stubbed like
    decode_image; the chunk arithmetic, schema, and Arrow batching
    are the real deliverable). Runs as one mapInPandas pass; output
    rows = sampled frames, each carrying (media_id, frame_idx,
    frame_bytes)."""

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                n_frames = max(1, (len(raw) + chunk_bytes - 1) // chunk_bytes)
                for idx in range(0, n_frames, every_nth):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(raw[idx * chunk_bytes : (idx + 1) * chunk_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, frame_idx int, frame_bytes binary"
    )


@query("mm_frame_sample")  # rows-only: mapInPandas sampling path
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — every-nth-frame sampling over binary payloads (video
    preprocessing shape), aggregated to per-media frame counts."""
    media = documents_as_media(spark, sf_dir)
    frames = frame_sample(media)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum(F.octet_length("frame_bytes")).alias("sampled_bytes"),
    )
