"""Multimodal columns (SURVEY.md §2.K row K6).

Image/audio/video payloads ride through the engine as opaque
``BinaryType`` columns with a typed metadata struct beside them —
exactly the WKB-geometry pattern from SURVEY §1.4: the engine never
interprets the bytes in the relational layer; decode/feature-extract
runs as Arrow-batched ``mapInPandas`` at the edges.

The container has no codec wheels (PIL/opencv), so ``decode_image``
implements the header-parseable formats natively (binary PPM/PGM,
uncompressed 24/32-bit BMP) and raises on entropy-coded formats
(JPEG/PNG need a real codec); undecodable payloads fall back to a
deterministic byte-statistics kernel so a mixed corpus runs in one
pass. The Spark-side plumbing (binary columns, schema, Arrow batch
iteration, partition sizing) is identical for both kernels.

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
from pyspark.sql import DataFrame, SparkSession, Window
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


def _ppm_tokens(payload: bytes, n: int, start: int = 2) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a PNM
    header, honoring ``#`` comments; returns (values, offset just past
    the single whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i : i + 1]
        if c == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            if j == i:
                raise ValueError(f"bad PNM header byte {c!r}")
            vals.append(int(payload[i:j]))
            i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an (h, w, 3) uint8 numpy array.

    Dependency-free decoders for the formats a header parse can
    handle without a codec library (no PIL/opencv wheel in this
    container): binary PPM (P6) / PGM (P5, expanded to 3 channels)
    and uncompressed bottom-up 24/32-bit BI_RGB BMP (row padding to 4
    bytes, BGR(A)→RGB). Anything else (JPEG/PNG/...) raises
    ValueError — entropy-coded formats genuinely need a codec; swap
    this kernel when one is available. The mapInPandas plumbing
    around it is format-agnostic either way."""
    import numpy as np

    if payload[:2] in (b"P6", b"P5"):
        gray = payload[:2] == b"P5"
        n_dims = 2 if gray else 3
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if not (0 < maxval < 256):
            raise ValueError(f"unsupported PNM maxval {maxval} (16-bit PNM)")
        need = w * h * (1 if gray else 3)
        raster = payload[off : off + need]
        if len(raster) < need:
            raise ValueError("truncated PNM raster")
        px = np.frombuffer(raster, dtype=np.uint8)
        if gray:
            return np.repeat(px.reshape(h, w, 1), 3, axis=2)
        return px.reshape(h, w, 3)

    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
        top_down = h < 0
        h = abs(h)
        bytes_pp = bpp // 8
        stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
        need = stride * h
        raster = payload[data_off : data_off + need]
        if len(raster) < need:
            raise ValueError("truncated BMP raster")
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
        if not top_down:
            px = px[::-1]  # BMP stores bottom-up by default
        return px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped

    raise ValueError(
        f"undecodable payload (magic {payload[:2]!r}): only PPM/PGM/BMP "
        "decode without a codec library"
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


def image_features(payload: bytes) -> list[float]:
    """Real decode→features hop for decodable payloads: width,
    height, per-channel means, luminance std — the fixed-width vector
    a downstream dedup/similarity stage consumes. Same contract as
    fake_features: bytes in, list[float] out, no partition state."""
    import numpy as np

    px = decode_image(payload).astype(np.float64)
    lum = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    return [
        float(px.shape[1]),
        float(px.shape[0]),
        float(px[:, :, 0].mean()),
        float(px[:, :, 1].mean()),
        float(px[:, :, 2].mean()),
        float(lum.std()),
    ]


def looks_like_image(payload: bytes) -> bool:
    """Strict structural sniff run BEFORE committing to the pixel
    path. A 2-byte magic alone is not enough: arbitrary text starting
    with ``BM``/``P5``/``P6`` can parse as small plausible dimensions
    and silently yield garbage pixel features. So validate the whole
    header against the payload length: PNM must have sane dims/maxval
    and a raster that fills the remaining bytes (±8 slack for a
    trailing newline); BMP must have planes==1, a known header size,
    BI_RGB 24/32bpp, and a raster that fits inside the payload."""
    if not payload or len(payload) < 12:
        return False
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        try:
            (w, h, maxval), off = _ppm_tokens(payload, 3)
        except ValueError:
            return False
        if not (0 < w and 0 < h and 0 < maxval < 256):
            return False
        need = w * h * (1 if magic == b"P5" else 3)
        remaining = len(payload) - off
        return need <= remaining <= need + 8
    if magic == b"BM":
        if len(payload) < 54:
            return False
        data_off = int.from_bytes(payload[10:14], "little")
        hdr_size = int.from_bytes(payload[14:18], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        planes = int.from_bytes(payload[26:28], "little")
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if planes != 1 or compression != 0 or bpp not in (24, 32):
            return False
        if hdr_size not in (40, 52, 56, 108, 124) or data_off < 14 + hdr_size:
            return False
        if w <= 0 or h == 0:
            return False
        stride = (w * (bpp // 8) + 3) & ~3
        return data_off + stride * h <= len(payload)
    return False


def media_features(payload: bytes) -> list[float]:
    """Kernel dispatch: structurally-validated image payload → real
    pixel features; anything else → byte-level stats. One total
    function so a mixed corpus (images + text + undecodable blobs)
    runs in one pass. The ``looks_like_image`` precondition (not just
    the 2-byte magic) keeps text that happens to start with an image
    magic on the byte-stats path."""
    if payload and looks_like_image(payload):
        try:
            return image_features(payload)
        except ValueError:
            pass  # malformed/exotic variant: fall through to byte stats
    return fake_features(payload)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches; each batch maps payload
    bytes → feature vectors without materializing the partition.
    Decodable payloads (PPM/PGM/BMP) go through the real
    bytes→pixels→features kernel; the rest get byte statistics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(media_features),
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


@query(
    "mm_feature_extract",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS n,
             list_sum(list_transform(string_split(text, ''),
                                     c -> unicode(c))) AS s
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(n AS BIGINT) AS n_bytes,
           4 AS n_features,
           concat_ws(',',
             CAST(n AS BIGINT) * 1048576,
             CAST(floor((CAST(s AS DOUBLE) / n) * 1048576) AS BIGINT),
             CAST(unicode(text[1:1]) AS BIGINT) * 1048576,
             CAST(unicode(text[n:n]) AS BIGINT) * 1048576) AS features_q20
    FROM b
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — the decode/feature-extract hop as Arrow-batched
    mapInPandas (media_features dispatch: real PPM/PGM/BMP decode,
    byte-stats fallback for undecodable payloads like this fixture's
    text).

    SQL-oracled (round 8 — the contract change the r7 window
    promised), via Q20 fixed-point emission: each feature leaves the
    kernel as floor(f * 2^20). For the fixture's byte-stats path the
    features are [len, sum/len, first, last] over payload bytes —
    len/first/last are exact small ints, and the mean is ONE
    correctly-rounded IEEE division of exact ints (identical double
    in numpy-free Python and DuckDB), so multiplying by the power of
    two 2^20 is exact and floor is bit-deterministic — no 6-dp
    rounding-boundary exposure at all (the ROUND_AUDITED discipline:
    exact emission beats round()-of-derived-double). DuckDB
    re-derives the same bytes from the text column (ASCII fixture:
    char code == payload byte). Library callers keep the array-typed
    ``extract_features``; the query's digest projection exists
    because the driver's harness sorts every column to hash the
    result and a raw ``array<double>`` is unsortable there (r4
    failure: unhashable ndarray)."""
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.size("features").alias("n_features"),
        F.array_join(
            F.transform(
                "features",
                lambda x: F.floor(x * 1048576).cast("long").cast("string"),
            ),
            ",",
        ).alias("features_q20"),
    )


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


@query(
    "mm_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n,
             GREATEST(1, (octet_length(encode(text)) + 63) // 64) AS n_frames
      FROM documents
    )
    SELECT media_id,
           CAST((n_frames + 3) // 4 AS BIGINT) AS n_sampled_frames,
           CAST(CASE WHEN (n_frames - 1) % 4 = 0
                     THEN ((n_frames + 3) // 4 - 1) * 64
                          + (n - 64 * (n_frames - 1))
                     ELSE ((n_frames + 3) // 4) * 64 END
                AS BIGINT) AS sampled_bytes
    FROM m
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — every-nth-frame sampling over binary payloads (video
    preprocessing shape), aggregated to per-media frame counts.

    SQL-oracled (round 6, VERDICT r5 item 5): the chunk arithmetic is
    closed-form over payload length — frames = ceil(n/64), sampled =
    every 4th, only the LAST frame can be short and it contributes
    only when its index ≡ 0 (mod 4) — so DuckDB proves the kernel's
    output from octet_length alone, no binary slicing needed."""
    media = documents_as_media(spark, sf_dir)
    frames = frame_sample(media)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum(F.octet_length("frame_bytes")).alias("sampled_bytes"),
    )


def audio_rms(media: DataFrame, window: int = 64) -> DataFrame:
    """Windowed RMS over PCM16-LE mono payloads — the audio analog of
    ``resize_media``: one Arrow-batched mapInPandas pass, binary in,
    fixed-width scalars out (media_id, window_idx, n_samples, rms).
    The kernel is a REAL int16 little-endian parser (numpy
    ``<i2`` — sign handling pinned by a unit test with negative
    samples); a trailing partial window is dropped, odd trailing
    bytes ignored. RMS per window is sqrt(mean(sample²)): the integer
    square-sum is exact, window=64 is a power of two so the mean
    division is exact, and sqrt is one correctly-rounded IEEE op —
    bit-identical across engines, no tolerance needed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"media_id": [], "window_idx": [], "n_samples": [], "rms": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                for wi in range(len(samples) // window):
                    chunk = samples[wi * window : (wi + 1) * window]
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["n_samples"].append(window)
                    out["rms"].append(
                        float(np.round(np.sqrt(np.mean(chunk * chunk)), 6))
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, window_idx int, n_samples int, rms double"
    )


@query(
    "mm_audio_rms",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id, rpad(text, 512, 'x') AS t FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    samp AS (
      SELECT media_id, wi,
             ascii(substr(t, (wi * 64 + j) * 2 + 1, 1))
             + 256 * ascii(substr(t, (wi * 64 + j) * 2 + 2, 1)) AS sample
      FROM s, generate_series(0, 3) AS gw(wi), generate_series(0, 63) AS gj(j)
    ),
    agg AS (
      SELECT media_id, wi,
             SUM(CAST(sample AS BIGINT) * sample) AS ss, COUNT(*) AS n
      FROM samp GROUP BY 1, 2
    )
    SELECT media_id, CAST(wi AS INT) AS window_idx,
           CAST(n AS INT) AS n_samples, ROUND(SQRT(ss / n), 6) AS rms
    FROM agg
    """,
)
def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — the AUDIO modality hop, completing the image/video/audio
    triple: synthesize a 512-byte PCM16-LE payload per document
    IN-COLUMN (the first 512 text bytes, x-padded — same narrow
    column map as mm_image_resize), then the Arrow-batched kernel
    parses int16 samples and emits per-64-sample-window RMS — the
    loudness profile an audio-curation pipeline computes for
    silence/clipping screens before feature extraction. The fixture's
    ASCII bytes make every sample positive; the kernel's int16 SIGN
    path is pinned by a unit test with hand-packed negative samples
    (tests/test_llm.py). DuckDB re-derives each sample from character
    codes (low + 256·high) and proves all four windows' RMS exactly —
    exact integer square-sums, power-of-two mean, one IEEE sqrt."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.substring(F.encode(F.rpad("text", 512, "x"), "utf-8"), 1, 512)
    media = (
        # char-positions-vs-bytes contract: ASCII-only, both engines
        # (same guard and rationale as mm_image_resize)
        d.where(F.octet_length("text") == F.length("text"))
        .select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    )
    return audio_rms(media, window=64)


def resize_image(px: "object", out_w: int, out_h: int) -> "object":
    """Nearest-neighbor resize of an (h, w, c) array to (out_h,
    out_w, c) — pure index arithmetic (the standard pre-embedding
    normalization hop; bilinear/bicubic belong to a codec library,
    nearest needs none). Source pixel for output row r is
    floor(r * h / out_h) — exact integer math, no float sampling
    grid, so the result is bit-deterministic."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return px[rows][:, cols]



def _decode_or_none(raw: bytes) -> "object":
    """Shared guard-then-decode for mapInPandas kernels: returns the
    pixel array, or None for anything that doesn't look like / parse
    as an image — a mixed corpus must never die on one bad blob. One
    definition so the guard/decode contract can't drift between
    kernels (r9 self-review: resize and ahash carried verbatim
    copies)."""
    if not looks_like_image(raw):
        return None
    try:
        return decode_image(raw)
    except ValueError:
        return None


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode → resize over binary payloads as one Arrow-batched
    mapInPandas pass: each decodable payload becomes one row of
    resize provenance (source dims, output dims, integer pixel-sum
    checksum of the resized raster); undecodable payloads pass
    through flagged rather than erroring the batch — a mixed corpus
    must never die on one bad blob."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "src_w": [], "src_h": [],
                "out_w": [], "out_h": [], "decoded": [], "px_checksum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                px = _decode_or_none(raw)
                if px is None:
                    out["src_w"].append(0)
                    out["src_h"].append(0)
                    out["decoded"].append(False)
                    out["px_checksum"].append(0)
                else:
                    small = resize_image(px, out_w, out_h)
                    out["src_w"].append(px.shape[1])
                    out["src_h"].append(px.shape[0])
                    out["decoded"].append(True)
                    out["px_checksum"].append(int(small.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        "media_id long, src_w int, src_h int, out_w int, out_h int,"
        " decoded boolean, px_checksum long",
    )


@query(
    "mm_image_resize",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id, rpad(text, 256, 'x') AS t FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    px AS (
      SELECT media_id,
             SUM(ascii(substr(t, r * 32 + c * 2 + 1, 1))) AS gray_sum
      FROM s, generate_series(0, 7) AS gr(r), generate_series(0, 7) AS gc(c)
      GROUP BY media_id
    )
    SELECT media_id,
           CAST(16 AS INTEGER) AS src_w, CAST(16 AS INTEGER) AS src_h,
           CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
           TRUE AS decoded,
           CAST(3 * gray_sum AS BIGINT) AS px_checksum
    FROM px
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — the decode→resize hop with REAL pixels end-to-end: the
    fixture has no image files, so the plan first materializes a
    valid 16x16 binary PGM per document IN-COLUMN (header + the first
    256 text bytes as raster — concat on BinaryType, no Python), then
    the mapInPandas kernel decodes it with the real PPM/PGM decoder
    and nearest-neighbor-resizes to 8x8. Exercises the full
    binary-in/binary-parse/array-out plumbing the resize stage needs
    at 100 TB: payload synthesis is a narrow column map, the kernel
    is Arrow-batched, output is fixed-width scalars (dims + integer
    pixel checksum — canonicalization-safe by construction)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(b"P5 16 16 255\n"),
        F.substring(F.encode(F.rpad("text", 256, "x"), "utf-8"), 1, 256),
    )
    media = (
        # The oracle rebuilds the raster from CHARACTER positions while
        # this kernel consumes BYTES — identical only for single-byte
        # text, so both engines filter to ASCII docs (every fixture doc
        # today; the guard pins the contract instead of a docstring).
        d.where(F.octet_length("text") == F.length("text"))
        .select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    )
    return resize_media(media, out_w=8, out_h=8)


def keyframe_select(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Decode-free keyframe selection over binary payloads — the
    heuristic video pipelines run before the expensive decode hop:
    slice the payload into fixed-size frames and pick the frame with
    the highest byte-value spread as the representative. One
    Arrow-batched mapInPandas pass (binary in, fixed-width scalars
    out), the audio_rms scale shape.

    The spread metric is the EXACT integer variance numerator
    n*Sum(x^2) - (Sum(x))^2 over the frame's bytes (n = frame_bytes;
    only FULL frames compete, so the metric is scale-comparable);
    argmax ties break to the lowest frame index. Every decision is
    integer arithmetic — bit-identical in any engine, which is what
    makes the key SQL-oracled rather than rows-only. Media shorter
    than one full frame produce no row (nothing to select)."""

    def batches(it):
        import numpy as np

        for pdf in it:
            out = {
                "media_id": [], "n_frames": [],
                "key_frame_idx": [], "key_metric": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                n_frames = len(raw) // frame_bytes
                if n_frames == 0:
                    continue
                arr = np.frombuffer(
                    raw[: n_frames * frame_bytes], dtype=np.uint8
                ).astype(np.int64).reshape(n_frames, frame_bytes)
                s = arr.sum(axis=1)
                s2 = (arr * arr).sum(axis=1)
                metric = frame_bytes * s2 - s * s
                best = int(np.argmax(metric))  # first max: lowest idx
                out["media_id"].append(mid)
                out["n_frames"].append(n_frames)
                out["key_frame_idx"].append(best)
                out["key_metric"].append(int(metric[best]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        "media_id long, n_frames int, key_frame_idx int, key_metric long",
    )


@query(
    "mm_keyframe_select",
    oracle="""
    WITH codes AS (
      SELECT doc_id AS media_id,
             list_transform(string_split(text, ''), c -> unicode(c)) AS cs,
             length(text) // 64 AS n_frames
      FROM documents
      WHERE length(text) // 64 >= 1
    ),
    metrics AS (
      SELECT media_id, n_frames,
             list_transform(range(0, n_frames), f ->
               64 * list_sum(list_transform(cs[f*64+1:f*64+64], x -> x * x))
               - list_sum(cs[f*64+1:f*64+64])
                 * list_sum(cs[f*64+1:f*64+64])) AS m
      FROM codes
    )
    SELECT media_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST(list_position(m, list_max(m)) - 1 AS INT) AS key_frame_idx,
           CAST(list_max(m) AS BIGINT) AS key_metric
    FROM metrics
    """,
)
def mm_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 extension (r8) — keyframe selection, hash-checked: the
    decode-free representative-frame heuristic over every media
    payload with at least one full 64-byte frame. DuckDB re-derives
    the byte matrix from the text column (ASCII fixture: char code ==
    payload byte — the mm_binary_meta contract) and replays the same
    integer argmax; the kernel's numpy path is int64-exact (max
    metric 64 * 64 * 121^2 ~ 6e7, no overflow anywhere). Ties break
    to the lowest frame index in both engines (np.argmax first-max ==
    list_position first-occurrence)."""
    media = documents_as_media(spark, sf_dir)
    return keyframe_select(media)


def shot_boundaries(
    media: DataFrame, frame_bytes: int = 64, threshold: int = 1900
) -> DataFrame:
    """Decode-free shot-boundary (scene-change) detection over binary
    payloads — the other half of the video frame-sampling pair beside
    ``keyframe_select``: slice the payload into fixed-size frames and
    flag every adjacent-frame transition whose byte-level SAD (sum of
    absolute differences — the classic shot-cut metric) reaches the
    threshold. Real video pipelines run exactly this on decoded luma
    planes before choosing which shots to sample frames from; here
    the plumbing runs on the raw bytes so the whole path (schema,
    batching, exact integer metric) is testable without codecs.

    One Arrow-batched mapInPandas pass; the SAD is EXACT int64
    (max 255 * frame_bytes per pair — no overflow), so boundaries are
    bit-identical in any engine and the key is SQL-oracled. Emits one
    row per boundary: the 0-based index of the frame that OPENS the
    new shot (1..n_frames-1) and its SAD. Media with fewer than two
    full frames emit nothing."""

    def batches(it):
        import numpy as np

        for pdf in it:
            out = {"media_id": [], "boundary_idx": [], "sad": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                n_frames = len(raw) // frame_bytes
                if n_frames < 2:
                    continue
                arr = np.frombuffer(
                    raw[: n_frames * frame_bytes], dtype=np.uint8
                ).astype(np.int64).reshape(n_frames, frame_bytes)
                sad = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
                for i in np.nonzero(sad >= threshold)[0]:
                    out["media_id"].append(mid)
                    out["boundary_idx"].append(int(i) + 1)
                    out["sad"].append(int(sad[i]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, boundary_idx int, sad long"
    )


@query(
    "mm_shot_boundaries",
    oracle="""
    WITH codes AS (
      SELECT doc_id AS media_id,
             list_transform(string_split(text, ''), c -> unicode(c)) AS cs,
             length(text) // 64 AS nf
      FROM documents
      WHERE length(text) // 64 >= 2
    ),
    sads AS (
      SELECT media_id, f,
             list_sum(list_transform(range(1, 65), i ->
               abs(cs[(f-1)*64+i] - cs[f*64+i]))) AS sad
      FROM codes, UNNEST(range(1, nf)) t(f)
    )
    SELECT media_id, CAST(f AS INT) AS boundary_idx, CAST(sad AS BIGINT) AS sad
    FROM sads WHERE sad >= 1900
    """,
)
def mm_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 extension (r9) — shot-boundary detection, hash-checked:
    adjacent-frame SAD over every media payload with at least two
    full 64-byte frames, boundaries at SAD >= 1900 (between the
    fixture's median ~1810 and p90 ~2064, so the threshold genuinely
    discriminates). DuckDB re-derives the byte matrix from the text
    column (ASCII fixture: char code == payload byte — the
    mm_binary_meta contract) and replays the identical integer SAD;
    every decision is exact int64, so the boundary set hash-compares.
    Completes the decode-free video pair: shot_boundaries says WHERE
    the cuts are, keyframe_select says WHICH frame represents each
    span."""
    media = documents_as_media(spark, sf_dir)
    return shot_boundaries(media)


def ahash_media(media: DataFrame, side: int = 8) -> DataFrame:
    """Decode → resize → AVERAGE HASH over binary payloads as one
    Arrow-batched mapInPandas pass: each decodable image becomes a
    64-bit perceptual fingerprint (bit r·8+c = 1 iff the resized
    gray pixel is ≥ the image mean), emitted as a '0'/'1' string so
    no engine ever wrestles a sign bit. The threshold compare is
    kept in integers (64·px ≥ Σpx — no mean division), so the hash
    is bit-deterministic. Undecodable payloads pass through flagged,
    never erroring the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = side * side
        for pdf in it:
            out = {"media_id": [], "decoded": [], "ahash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                out["media_id"].append(mid)
                px = _decode_or_none(raw)
                if px is None:
                    out["decoded"].append(False)
                    out["ahash"].append("")
                    continue
                gray = resize_image(px, side, side)[:, :, 0]
                flat = [int(g) for g in gray.reshape(-1)]
                total = sum(flat)
                out["decoded"].append(True)
                out["ahash"].append(
                    "".join("1" if n * g >= total else "0" for g in flat)
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, decoded boolean, ahash string"
    )


# aHash candidate-pair derivation, shared between the mm_image_ahash
# surface key and mm_dedup_cluster's component build — one CTE text so
# the two oracles can never drift from each other.
AHASH_PAIRS_SQL_CTE = """
    s AS (
      SELECT doc_id, rpad(text, 256, 'x') AS t FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    px AS (
      SELECT doc_id, r * 8 + c AS bit_idx,
             ascii(substr(t, r * 32 + c * 2 + 1, 1)) AS g
      FROM s, generate_series(0, 7) AS gr(r), generate_series(0, 7) AS gc(c)
    ),
    tot AS (SELECT doc_id, SUM(g) AS sg FROM px GROUP BY doc_id),
    bands AS (
      SELECT px.doc_id, bit_idx // 16 AS band,
             SUM(CASE WHEN 64 * g >= sg THEN 1 ELSE 0 END
                 * (1 << (15 - (bit_idx % 16)))) AS bv
      FROM px JOIN tot USING (doc_id)
      GROUP BY px.doc_id, bit_idx // 16
    ),
    wide AS (
      SELECT doc_id,
             MAX(CASE WHEN band = 0 THEN bv END) AS b0,
             MAX(CASE WHEN band = 1 THEN bv END) AS b1,
             MAX(CASE WHEN band = 2 THEN bv END) AS b2,
             MAX(CASE WHEN band = 3 THEN bv END) AS b3
      FROM bands GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
             a.b0 AS ab0, a.b1 AS ab1, a.b2 AS ab2, a.b3 AS ab3,
             b.b0 AS bb0, b.b1 AS bb1, b.b2 AS bb2, b.b3 AS bb3
      FROM bands ba
      JOIN bands bb ON ba.band = bb.band AND ba.bv = bb.bv
                    AND ba.doc_id < bb.doc_id
      JOIN wide a ON a.doc_id = ba.doc_id
      JOIN wide b ON b.doc_id = bb.doc_id
    ),
    apairs AS (
      SELECT d1, d2,
             bit_count(xor(ab0, bb0)) + bit_count(xor(ab1, bb1))
               + bit_count(xor(ab2, bb2)) + bit_count(xor(ab3, bb3))
               AS hamming
      FROM cand
      WHERE bit_count(xor(ab0, bb0)) + bit_count(xor(ab1, bb1))
            + bit_count(xor(ab2, bb2)) + bit_count(xor(ab3, bb3)) <= 3
    )
"""


@query(
    "mm_image_ahash",
    oracle=f"""
    WITH {AHASH_PAIRS_SQL_CTE}
    SELECT d1 AS media_id_1, d2 AS media_id_2,
           CAST(hamming AS BIGINT) AS hamming
    FROM apairs
    """,
)
def ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — PERCEPTUAL NEAR-DUP over images: aHash
    (average hash) fingerprints from the real decode→resize path,
    then Hamming-≤3 pairs found BANDED, never all-pairs — the image
    twin of the MinHash/SimHash text dedup family (near-identical
    thumbnails, re-encoded logos, padded crops collapse to hashes a
    few bits apart). Same synthesized 16×16 PGM payloads as
    mm_image_resize (real bytes through the real decoder; the ASCII
    guard pins the byte-vs-char contract with the oracle).

    Scale: the 64-bit hash splits into 4×16-bit bands; by pigeonhole
    any pair within Hamming 3 shares an intact band, so candidates
    come from 4 band equi-joins (bucketable on the band value — the
    LSH shape) and only candidates pay the exact 64-position
    Hamming. Band buckets of exact-duplicate images are the one skew
    source — the same bucket-cap policy as the MinHash key applies
    when corpus dup groups are unbounded. The hash table is
    checkpointed: both join sides read it, and this build never
    reuses exchange subtrees."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(b"P5 16 16 255\n"),
        F.substring(F.encode(F.rpad("text", 256, "x"), "utf-8"), 1, 256),
    )
    media = d.where(F.octet_length("text") == F.length("text")).select(
        F.col("doc_id").alias("media_id"), payload.alias("payload")
    )
    hashes = (
        ahash_media(media)
        .where(F.col("decoded"))
        .select(
            "media_id",
            *[
                F.conv(F.substring("ahash", i * 16 + 1, 16), 2, 10)
                .cast("long")
                .alias(f"b{i}")
                for i in range(4)
            ],
        )
        .localCheckpoint(eager=True)  # both band-join sides
    )

    def banded(side: str) -> DataFrame:
        # (band, band-value) are the JOIN KEYS — the shuffle hashes
        # on the 16-bit band content, so candidates co-locate and
        # non-colliding docs never pair (joining on band alone would
        # be a per-band self-cross). The full 4-int hash rides along
        # so the Hamming needs no second lookup; distance is 4 int
        # XOR+popcounts, not 128 substrings (measured: the substring
        # form spent 80 s on sf0.1's 1.5 M candidate rows — text
        # images skew bright, so the all-ones band bucket alone held
        # 1.5 k docs; the integer form runs the same candidates in
        # seconds).
        return hashes.select(
            F.col("media_id").alias(f"id_{side}"),
            *[F.col(f"b{i}").alias(f"b{i}_{side}") for i in range(4)],
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        ).select(
            f"id_{side}",
            *[f"b{i}_{side}" for i in range(4)],
            "band",
            F.when(F.col("band") == 0, F.col(f"b0_{side}"))
            .when(F.col("band") == 1, F.col(f"b1_{side}"))
            .when(F.col("band") == 2, F.col(f"b2_{side}"))
            .otherwise(F.col(f"b3_{side}"))
            .alias("bv"),
        )

    cand = (
        banded("a")
        .join(banded("b"), ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("media_id_1"),
            F.col("id_b").alias("media_id_2"),
            *[F.col(f"b{i}_a") for i in range(4)],
            *[F.col(f"b{i}_b") for i in range(4)],
        )
        .distinct()
    )
    ham = sum(
        F.bit_count(F.col(f"b{i}_a").bitwiseXOR(F.col(f"b{i}_b")))
        for i in range(4)
    )
    return (
        cand.select(
            "media_id_1", "media_id_2", ham.cast("long").alias("hamming")
        )
        .where(F.col("hamming") <= 3)
    )


@query(
    "mm_dedup_cluster",
    oracle=f"""
    WITH RECURSIVE {AHASH_PAIRS_SQL_CTE},
    und AS (
      SELECT d1 AS a, d2 AS b FROM apairs
      UNION SELECT d2, d1 FROM apairs
    ),
    nodes AS (SELECT DISTINCT a AS v FROM und),
    walk AS (
      SELECT v, v AS root FROM nodes
      UNION
      SELECT u.b, w.root FROM walk w JOIN und u ON u.a = w.v
    ),
    cc AS (SELECT v, MIN(root) AS comp FROM walk GROUP BY v),
    members AS (
      SELECT d.doc_id, cc.comp, d.n_chars
      FROM documents d JOIN cc ON cc.v = d.doc_id
    ),
    ranked AS (
      SELECT doc_id, comp, n_chars,
             row_number() OVER (PARTITION BY comp
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM members
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(comp AS BIGINT) AS cluster_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT),
           CAST(n_chars AS BIGINT)
    FROM documents WHERE doc_id NOT IN (SELECT v FROM cc)
    """,
)
def mm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — the multimodal dedup pipeline END-TO-END:
    aHash Hamming-≤3 pairs (ahash_pairs) → connected components →
    one BEST representative per near-dup image cluster (largest
    n_chars, then lowest id — the quality-ranked survivor rule of
    llm_dedup_cluster_best), singletons passing through as their own
    clusters. Unlike the MinHash cluster key (rows-only — LSH
    candidates defy a SQL twin), the aHash pair set is itself
    oracle-exact, so the WHOLE pipeline is hash-checked: DuckDB
    replays the components as a recursive-CTE reachability closure
    (the graph_connected_components precedent) and the survivor pick
    as a window.

    Scale: pairs are banded (never all-pairs); label propagation
    with pointer doubling shuffles the shrinking edge list only;
    survivor selection is one window over cluster-bounded
    partitions; undecodable / non-ASCII docs never enter the graph
    and exit as singletons. The pair set is checkpointed — edge
    building reads it twice (src∪dst) and this build never reuses
    exchange subtrees."""
    from osm_airflow_spark.llm.dedup import cluster_pairs

    pairs = ahash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    clusters = cluster_pairs(pairs, "media_id_1", "media_id_2")
    d = load_table(spark, sf_dir, "documents")
    members = d.join(clusters, "doc_id").select(
        "doc_id", "cluster_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    survivors = (
        members.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc_id").alias("media_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )
    singles = d.join(clusters, "doc_id", "left_anti").select(
        F.col("doc_id").alias("media_id"),
        F.col("doc_id").alias("cluster_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    return survivors.unionByName(singles)


def audio_mcr(media: DataFrame, window: int = 64) -> DataFrame:
    """Windowed MEAN-CROSSING rate over PCM16-LE mono payloads — the
    periodicity/noisiness screen beside ``audio_rms``'s loudness
    (classic ZCR, but against the window mean rather than zero: the
    fixture-synthesized samples are all-positive, and real pipelines
    de-bias against DC offset anyway). Same kernel shape as
    audio_rms: Arrow-batched mapInPandas, binary in, scalars out.
    All-integer decision rule: sample s_j crosses iff
    (w·s_j − S)·(w·s_{j+1} − S) < 0 with S the window sum — exact
    int64 (|w·s| ≤ 64·32767 ≈ 2·10⁶, products ≤ 4·10¹² ≪ 2^63), so
    the count and the one-division rate are bit-deterministic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"media_id": [], "window_idx": [], "n_crossings": [], "mcr": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                for wi in range(len(samples) // window):
                    chunk = samples[wi * window : (wi + 1) * window]
                    d = window * chunk - int(chunk.sum())
                    n_cross = int(np.count_nonzero(d[:-1] * d[1:] < 0))
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["n_crossings"].append(n_cross)
                    out["mcr"].append(n_cross / (window - 1))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, window_idx int, n_crossings int, mcr double"
    )


def audio_peaks(media: DataFrame, window: int = 64) -> DataFrame:
    """Windowed PEAK DETECTION over PCM16-LE mono payloads: strict
    local maxima (s_{j-1} < s_j > s_{j+1}) per window, their density
    over the window's interior positions, and the loudest sample —
    the onset/percussiveness screen completing the audio triple
    (rms = loudness, mcr = noisiness, peaks = transient density).
    Same Arrow-batched mapInPandas kernel shape; the decision rule is
    pure integer comparison, so counts/max are exact and the density
    is one agreed division."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                "media_id": [], "window_idx": [], "n_peaks": [],
                "peak_density": [], "max_sample": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                for wi in range(len(samples) // window):
                    c = samples[wi * window : (wi + 1) * window]
                    inner = c[1:-1]
                    peaks = int(
                        np.count_nonzero((inner > c[:-2]) & (inner > c[2:]))
                    )
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["n_peaks"].append(peaks)
                    out["peak_density"].append(peaks / (window - 2))
                    out["max_sample"].append(int(c.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        "media_id long, window_idx int, n_peaks int, peak_density double,"
        " max_sample long",
    )


@query(
    "mm_audio_zcr",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id, rpad(text, 512, 'x') AS t FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    samp AS (
      SELECT media_id, wi, j,
             ascii(substr(t, (wi * 64 + j) * 2 + 1, 1))
             + 256 * ascii(substr(t, (wi * 64 + j) * 2 + 2, 1)) AS sample
      FROM s, generate_series(0, 3) AS gw(wi), generate_series(0, 63) AS gj(j)
    ),
    win AS (
      SELECT media_id, wi, CAST(SUM(sample) AS BIGINT) AS ssum
      FROM samp GROUP BY 1, 2
    ),
    d AS (
      SELECT a.media_id, a.wi, a.j,
             64 * CAST(a.sample AS BIGINT) - w.ssum AS da,
             64 * CAST(b.sample AS BIGINT) - w.ssum AS db
      FROM samp a
      JOIN samp b ON b.media_id = a.media_id AND b.wi = a.wi AND b.j = a.j + 1
      JOIN win w ON w.media_id = a.media_id AND w.wi = a.wi
    ),
    c AS (
      SELECT media_id, wi,
             CAST(SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS INT)
               AS n_crossings
      FROM d GROUP BY 1, 2
    )
    SELECT media_id, CAST(wi AS INT) AS window_idx, n_crossings,
           CAST(n_crossings AS DOUBLE) / 63 AS mcr
    FROM c
    """,
)
def mm_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — audio MEAN-CROSSING rate per 64-sample window: the second
    audio-curation statistic beside mm_audio_rms (loudness says
    "silence or clipping", crossing rate says "tone or noise").
    Same in-column PCM16-LE synthesis and ASCII guard as the RMS key;
    DuckDB re-derives each sample from character codes and replays the
    all-integer crossing rule (64·s_j − S sign products — exact
    BIGINTs), so counts match exactly and the rate is one agreed
    division. ZCR proper would be degenerate here (fixture samples
    are all positive); crossing the WINDOW MEAN is both non-trivial
    on the fixture and the de-biased form real pipelines use. Scale:
    narrow map end to end — the kernel is mapInPandas over whatever
    partitioning the corpus has, output O(windows)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.substring(F.encode(F.rpad("text", 512, "x"), "utf-8"), 1, 512)
    media = (
        d.where(F.octet_length("text") == F.length("text"))
        .select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    )
    return audio_mcr(media, window=64)


@query(
    "mm_audio_peaks",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id, rpad(text, 512, 'x') AS t FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    samp AS (
      SELECT media_id, wi, j,
             CAST(ascii(substr(t, (wi * 64 + j) * 2 + 1, 1))
                  + 256 * ascii(substr(t, (wi * 64 + j) * 2 + 2, 1))
                  AS BIGINT) AS sample
      FROM s, generate_series(0, 3) AS gw(wi), generate_series(0, 63) AS gj(j)
    ),
    tri AS (
      SELECT b.media_id, b.wi,
             CASE WHEN b.sample > a.sample AND b.sample > c.sample
                  THEN 1 ELSE 0 END AS is_peak
      FROM samp b
      JOIN samp a ON a.media_id = b.media_id AND a.wi = b.wi
                 AND a.j = b.j - 1
      JOIN samp c ON c.media_id = b.media_id AND c.wi = b.wi
                 AND c.j = b.j + 1
    ),
    pk AS (
      SELECT media_id, wi, CAST(SUM(is_peak) AS INT) AS n_peaks
      FROM tri GROUP BY 1, 2
    ),
    mx AS (
      SELECT media_id, wi, CAST(MAX(sample) AS BIGINT) AS max_sample
      FROM samp GROUP BY 1, 2
    )
    SELECT p.media_id, CAST(p.wi AS INT) AS window_idx, p.n_peaks,
           CAST(p.n_peaks AS DOUBLE) / 62 AS peak_density,
           m.max_sample
    FROM pk p JOIN mx m ON m.media_id = p.media_id AND m.wi = p.wi
    """,
)
def mm_audio_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — audio PEAK DENSITY per 64-sample window: strict local
    maxima counted over the window interior, plus the loudest sample
    — the transient/onset statistic completing the audio-curation
    triple (rms loudness, mcr noisiness, peak density
    percussiveness). Same in-column PCM16-LE synthesis and ASCII
    guard as the RMS/ZCR keys; DuckDB re-derives each sample from
    character codes and replays the pure integer-comparison rule, so
    counts and maxima match exactly and the density is one agreed
    division by the interior size 62.

    Scale: the Spark side is the Arrow-batched ``audio_peaks``
    mapInPandas kernel — narrow map end to end, output O(windows)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.substring(F.encode(F.rpad("text", 512, "x"), "utf-8"), 1, 512)
    media = (
        d.where(F.octet_length("text") == F.length("text"))
        .select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    )
    return audio_peaks(media, window=64)
