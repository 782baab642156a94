"""Source/sink round-trips and the bucketed-join layout proof."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_airflow_spark.sources.files import (
    convert_to_parquet,
    read_csv,
    read_jsonl,
    write_bucketed,
    write_csv,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", -0.5), (4, None, 0.0)], SCHEMA
    )


def test_csv_roundtrip(spark, sample):
    with tempfile.TemporaryDirectory() as d:
        write_csv(sample, f"{d}/out")
        back = read_csv(spark, f"{d}/out", SCHEMA)
        assert sorted(back.collect()) == sorted(sample.collect())


def test_jsonl_roundtrip(spark, sample):
    with tempfile.TemporaryDirectory() as d:
        write_jsonl(sample, f"{d}/out")
        back = read_jsonl(spark, f"{d}/out", SCHEMA)
        assert sorted(back.collect()) == sorted(sample.collect())


def test_orc_roundtrip(spark, sample):
    """ORC is the one columnar alternative Spark ships natively —
    round-trip exactness incl. nulls (schema carried by the format,
    unlike CSV/JSONL)."""
    from osm_airflow_spark.sources.files import read_orc, write_orc

    with tempfile.TemporaryDirectory() as d:
        write_orc(sample, f"{d}/out")
        back = read_orc(spark, f"{d}/out")
        assert back.schema == sample.schema
        assert sorted(back.collect()) == sorted(sample.collect())


def test_convert_to_parquet_partitions(spark, sample):
    with tempfile.TemporaryDirectory() as d:
        convert_to_parquet(sample.withColumn("part", F.col("k") % 2), f"{d}/pq", ("part",))
        back = spark.read.parquet(f"{d}/pq")
        assert back.count() == 4
        # partition pruning: only one directory scanned
        pruned = back.where(F.col("part") == 0)
        assert pruned.count() == 2


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key → SortMergeJoin with zero
    Exchange in the plan: the write-time shuffle replaces every
    query-time shuffle."""
    import io
    from contextlib import redirect_stdout

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "orders_b", "o_custkey", 8, "o_custkey")
    write_bucketed(customer, "customer_b", "c_custkey", 8, "c_custkey")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_snapshot_overwrite_preserves_other_dates(spark, tmp_path):
    """Dynamic partition overwrite: re-publishing one snapshot date
    must not clobber previously published dates."""
    from osm_airflow_spark.io import read_snapshot, write_snapshot

    out = str(tmp_path / "snaps")
    week1 = spark.createDataFrame([(1, "a")], "id long, v string")
    week2 = spark.createDataFrame([(2, "b")], "id long, v string")
    write_snapshot(week1, out, "2024-07-18")
    write_snapshot(week2, out, "2024-07-25")
    # re-publish week 2 (idempotent retry)
    write_snapshot(week2, out, "2024-07-25")
    assert read_snapshot(spark, out, "2024-07-18").count() == 1  # survived
    assert read_snapshot(spark, out, "2024-07-25").count() == 1  # replaced, not duplicated


# --- PBF decoder (pure-Python wire format) --------------------------

SAMPLE_NODES = [
    {"node_id": 1, "lat": 52.5200000, "lon": 13.4050000, "tags": {"amenity": "cafe"}},
    {"node_id": 2, "lat": 52.5201000, "lon": 13.4051000, "tags": {}},
    {"node_id": 3, "lat": 52.5202000, "lon": 13.4052000, "tags": {"name": "x", "amenity": "pub"}},
    {"node_id": 10, "lat": -33.8688000, "lon": 151.2093000, "tags": {}},
]
SAMPLE_WAYS = [
    {"way_id": 100, "node_refs": [1, 2, 3], "tags": {"highway": "primary"}},
    {"way_id": 101, "node_refs": [3, 2, 1, 3], "tags": {"building": "yes"}},
]
SAMPLE_RELATIONS = [
    {
        "rel_id": 200,
        "members": [
            {"mtype": "way", "ref": 101, "role": "outer"},
            {"mtype": "node", "ref": 10, "role": "admin_centre"},
        ],
        "tags": {"type": "multipolygon"},
    },
]


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    from osm_airflow_spark.sources.pbf_wire import write_pbf

    path = str(tmp_path_factory.mktemp("pbf") / "sample.osm.pbf")
    write_pbf(path, SAMPLE_NODES, SAMPLE_WAYS, SAMPLE_RELATIONS, nodes_per_block=3)
    return path


def test_pbf_wire_varint_zigzag_roundtrip():
    from osm_airflow_spark.sources.pbf_wire import (
        decode_varint,
        encode_varint,
        zigzag_decode,
        zigzag_encode,
    )

    for n in [0, 1, 127, 128, 300, 2**35, 2**63 - 1]:
        assert decode_varint(encode_varint(n), 0)[0] == n
    for n in [0, -1, 1, -64, 63, -(2**62), 2**62]:
        assert zigzag_decode(zigzag_encode(n)) == n


def test_pbf_blob_decode_roundtrip(pbf_file):
    """Every element written survives the encode → frame → zlib →
    decode trip bit-exactly (coords at the format's 1e-7° grid)."""
    from osm_airflow_spark.sources.pbf_wire import decode_blob, scan_blob_offsets

    offsets = scan_blob_offsets(pbf_file)
    assert [t for (_, _, t) in offsets][0] == "OSMHeader"
    decoded = {"nodes": [], "ways": [], "relations": []}
    with open(pbf_file, "rb") as fh:
        for start, length, blob_type in offsets:
            if blob_type != "OSMData":
                continue
            fh.seek(start)
            out = decode_blob(fh.read(length))
            for k in decoded:
                decoded[k].extend(out[k])

    assert [n["node_id"] for n in decoded["nodes"]] == [1, 2, 3, 10]
    berlin = decoded["nodes"][0]
    assert abs(berlin["lat"] - 52.52) < 1e-7 and abs(berlin["lon"] - 13.405) < 1e-7
    assert berlin["tags"] == {"amenity": "cafe"}
    assert decoded["nodes"][2]["tags"] == {"name": "x", "amenity": "pub"}
    assert decoded["ways"][0]["node_refs"] == [1, 2, 3]  # delta-coded refs
    assert decoded["ways"][1]["node_refs"] == [3, 2, 1, 3]
    rel = decoded["relations"][0]
    assert rel["members"][0] == {"mtype": "way", "ref": 101, "role": "outer"}
    assert rel["tags"] == {"type": "multipolygon"}


def test_pbf_single_pass_union_decode(spark, pbf_file):
    """read_pbf_elements decodes each blob ONCE and emits all kinds
    from that pass (the 3x-decode fix): one action over the union
    sees every element with its kind discriminator."""
    from osm_airflow_spark.sources.pbf import read_pbf_elements

    union = read_pbf_elements(spark, pbf_file)
    counts = {r["kind"]: r["n"] for r in union.groupBy("kind").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"node": 4, "way": 2, "relation": 1}


def test_pbf_decode_rejects_malformed_input(pbf_file):
    """Untrusted-input bounds: truncated blobs, lying raw_size, and
    decompression bombs all surface as descriptive ValueError — never
    a raw IndexError or an uncapped zlib.decompress."""
    import zlib

    import pytest as _pytest

    from osm_airflow_spark.sources.pbf_wire import (
        MAX_BLOB_RAW,
        decode_blob,
        encode_field,
        scan_blob_offsets,
    )

    offsets = scan_blob_offsets(pbf_file)
    start, length, _ = next(o for o in offsets if o[2] == "OSMData")
    with open(pbf_file, "rb") as fh:
        fh.seek(start)
        good = fh.read(length)

    with _pytest.raises(ValueError):
        decode_blob(good[: length // 2])  # truncated mid-message

    # raw_size that contradicts the actual inflated size
    payload = zlib.compress(b"x" * 100)
    lying = encode_field(2, 0, 50) + encode_field(3, 2, payload)
    with _pytest.raises(ValueError, match="raw_size|cap"):
        decode_blob(lying)

    # decompression bomb: declares a legal raw_size but inflates past it
    bomb = encode_field(2, 0, 1024) + encode_field(
        3, 2, zlib.compress(b"\0" * (4 * 1024 * 1024))
    )
    with _pytest.raises(ValueError, match="cap|raw_size"):
        decode_blob(bomb)

    # declared raw_size beyond the spec's 32MB hard cap
    too_big = encode_field(2, 0, MAX_BLOB_RAW + 1) + encode_field(
        3, 2, zlib.compress(b"")
    )
    with _pytest.raises(ValueError, match="spec cap"):
        decode_blob(too_big)

    # truncated zlib stream in a raw_size-LESS blob: decompressobj
    # returns partial data without raising, so only the eof check
    # stops it surfacing as a confusing downstream protobuf error
    truncated_stream = zlib.compress(b"y" * 1000)[:-10]
    no_raw_size = encode_field(3, 2, truncated_stream)
    with _pytest.raises(ValueError, match="truncated zlib"):
        decode_blob(no_raw_size)


def test_pbf_scan_rejects_truncated_file(tmp_path, pbf_file):
    import pytest as _pytest

    from osm_airflow_spark.sources.pbf_wire import scan_blob_offsets

    with open(pbf_file, "rb") as fh:
        data = fh.read()
    bad = tmp_path / "trunc.osm.pbf"
    bad.write_bytes(data[: len(data) - (len(data) - 8)])  # 8 bytes: inside header
    with _pytest.raises(ValueError):
        scan_blob_offsets(str(bad))


def test_pbf_spark_ingest_and_assembly(spark, pbf_file, tmp_path):
    """The full B1 path: blob-offset fan-out → executor decode →
    element DataFrames → way-geometry assembly (the reference's
    osm2pgsql step, README.md:80), end to end on a real .pbf."""
    from osm_airflow_spark.plans.osm import assemble_way_lines
    from osm_airflow_spark.sources.pbf import ingest_pbf, read_pbf

    dfs = read_pbf(spark, pbf_file)
    assert dfs["nodes"].count() == 4
    assert dfs["ways"].count() == 2
    assert dfs["relations"].count() == 1

    assembled = assemble_way_lines(
        dfs["ways"].select("way_id", "node_refs", "tags"), dfs["nodes"]
    )
    rows = {r["way_id"]: r for r in assembled.collect()}
    assert len(rows[100]["line"]) == 3
    assert abs(rows[100]["bbox_south"] - 52.52) < 1e-6
    assert len(rows[101]["line"]) == 4  # closed ring

    out = ingest_pbf(spark, pbf_file, str(tmp_path / "elements"), region="test")
    back = spark.read.parquet(out["nodes"])
    assert back.count() == 4 and "tags" in back.columns
    # staging union is an intermediate, not a deliverable: it must be
    # cleaned up after the typed writes land (it doubles ingest
    # storage at planet scale if left behind)
    assert not (tmp_path / "elements" / "_staged_elements").exists()


def test_clustered_write_tightens_row_group_stats(spark, sf_dir, tmp_path):
    """write_clustered must produce row groups whose min/max key
    ranges are narrow (disjoint-ish), so parquet stat pruning works;
    an unsorted write scatters the key across every row group. We
    assert the mean per-row-group key span shrinks by >5x."""
    import pyarrow.parquet as pq

    from osm_airflow_spark.io import load_table, write_clustered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    clustered_dir = str(tmp_path / "clustered")
    scattered_dir = str(tmp_path / "scattered")
    write_clustered(li, clustered_dir, ("l_orderkey",), n_files=16)
    li.repartition(16).write.mode("overwrite").parquet(scattered_dir)

    def mean_span(d):
        import glob

        spans, total = [], 0
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(0)
                assert col.path_in_schema == "l_orderkey"
                st = col.statistics
                spans.append(st.max - st.min)
                total += 1
        return sum(spans) / total

    clustered_span = mean_span(clustered_dir)
    scattered_span = mean_span(scattered_dir)
    assert clustered_span * 5 < scattered_span, (clustered_span, scattered_span)

    # and the data survives intact
    assert spark.read.parquet(clustered_dir).count() == li.count()


def test_dag_ingest_and_transform_callables_end_to_end(spark, tmp_path):
    """The DAG's task callables, run directly (no Airflow): generated
    region .pbf → ingest_region (element parquet) → transform_region
    (highway layer, dated geohash-partitioned snapshot) — the full
    reference pipeline shape (osm_etl.py:40-93) on the engine."""
    import importlib.util
    import pathlib

    from osm_airflow_spark.sources.pbf_wire import write_pbf

    path = pathlib.Path(__file__).parent.parent / "dags" / "osm_spark_dag.py"
    spec = importlib.util.spec_from_file_location("osm_spark_dag_e2e", path)
    dag_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dag_mod)

    data_dir = str(tmp_path)
    highway_nodes = [
        {"node_id": i, "lat": 40.0 + i * 1e-4, "lon": -105.0 + i * 1e-4, "tags": {}}
        for i in range(1, 6)
    ]
    ways = [
        {
            "way_id": 900,
            "node_refs": [1, 2, 3, 4, 5],
            "tags": {"highway": "primary", "name": "main st", "maxspeed": "45"},
        },
        {"way_id": 901, "node_refs": [1, 2], "tags": {"waterway": "river"}},
    ]
    write_pbf(f"{data_dir}/testregion.osm.pbf", highway_nodes, ways, [])

    dag_mod.ingest_region("test", "testregion", data_dir)
    dag_mod.transform_region("test", "testregion", "2024-07-25", data_dir)

    layer = spark.read.parquet(f"{data_dir}/layers/highway")
    rows = layer.collect()
    assert len(rows) == 1  # waterway routed out of the highway layer
    r = rows[0]
    assert r["way_id"] == 900 and r["highway"] == "primary" and r["maxspeed"] == 45
    assert r["geohash"] is not None and str(r["pgosm_date"]) == "2024-07-25"


def test_zorder_write_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order must beat a random layout in BOTH dimensions at once —
    1-D sort is tight on its sort key only; Morton buys locality on
    each axis simultaneously."""
    import glob

    import pyarrow.parquet as pq

    from osm_airflow_spark.io import load_table, write_zordered

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    z_dir = str(tmp_path / "zorder")
    r_dir = str(tmp_path / "random")
    write_zordered(li, z_dir, "l_orderkey", "l_partkey", n_files=16)
    li.repartition(16).write.mode("overwrite").parquet(r_dir)

    def mean_spans(d):
        spans = {"l_orderkey": [], "l_partkey": []}
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                row_group = meta.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    st = col.statistics
                    spans[col.path_in_schema].append(st.max - st.min)
        return {k: sum(v) / len(v) for k, v in spans.items()}

    z, r = mean_spans(z_dir), mean_spans(r_dir)
    assert z["l_orderkey"] * 2 < r["l_orderkey"], (z, r)
    assert z["l_partkey"] * 2 < r["l_partkey"], (z, r)
    assert spark.read.parquet(z_dir).count() == li.count()


def test_pbf_python_datasource_matches_function_reader(spark, pbf_file):
    """The osm_pbf Data Source (Spark 4 Python DataSource API) must
    return exactly the rows the function-style reader returns: same
    union schema, same elements, one partition per OSMData blob."""
    from osm_airflow_spark.sources.pbf import read_pbf_elements
    from osm_airflow_spark.sources.pbf_datasource import register_pbf_source

    register_pbf_source(spark)
    via_source = spark.read.format("osm_pbf").load(pbf_file)
    via_fn = read_pbf_elements(spark, pbf_file)
    assert via_source.schema == via_fn.schema

    def canon(df):
        return sorted(
            (r["kind"], r["elem_id"], r["lat"], r["lon"],
             tuple(r["node_refs"] or []),
             tuple(map(tuple, r["members"] or [])),
             tuple(sorted((r["tags"] or {}).items())))
            for r in df.collect()
        )

    assert canon(via_source) == canon(via_fn)
    counts = {
        r["kind"]: r["n"]
        for r in via_source.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"node": 4, "way": 2, "relation": 1}


@pytest.mark.parametrize("which", ["roundtrip", "dense10k"])
def test_pbf_decoder_survives_fuzzed_corruption(pbf_file, which):
    """Adversarial-robustness floor for the wire decoder (the
    component a real geofabrik extract would hit first): random
    single-byte corruptions and truncations of a valid file must
    produce either a successful decode (mutation hit a don't-care
    byte) or a clean Python exception — never a hang, a negative
    allocation, or an interpreter-level crash. Deterministic seed so
    failures reproduce. Parametrized over the self-encoded roundtrip
    file AND the 10k-node independent dense fixture (r8) — the dense
    block's 2-byte string indices and long delta chains corrupt into
    shapes the small file cannot produce."""
    if which == "dense10k":
        pbf_file = os.path.join(
            os.path.dirname(__file__), "fixtures", "golden_dense_10k.osm.pbf"
        )
    import random
    import struct
    import zlib

    from osm_airflow_spark.sources.pbf_wire import (
        decode_blob,
        scan_blob_offsets,
    )

    raw = open(pbf_file, "rb").read()
    rng = random.Random(1234)
    acceptable = (ValueError, KeyError, IndexError, EOFError, struct.error, zlib.error)

    def drive(buf: bytes) -> None:
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".osm.pbf")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(buf)
            for start, length, blob_type in scan_blob_offsets(path):
                if blob_type == "OSMData":
                    decode_blob(buf[start : start + length])
        finally:
            os.unlink(path)

    survived = 0
    for _ in range(150):
        mutated = bytearray(raw)
        mutated[rng.randrange(len(raw))] = rng.randrange(256)
        try:
            drive(bytes(mutated))
            survived += 1
        except acceptable:
            pass
    for cut in range(1, 40):
        try:
            drive(raw[: len(raw) - cut])
            survived += 1
        except acceptable:
            pass
    # some mutations must be harmless (string-table bytes etc.) —
    # if EVERY mutation raised, the guard set is suspiciously strict
    assert survived > 0


def test_compact_snapshot_merges_small_files_preserving_content(spark, sf_dir, tmp_path):
    """32 tiny append files compact to 4 with identical content, and
    a clustered compaction restores sorted row-group stats (every
    output file covers a disjoint key range)."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import compact_snapshot, load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    path = str(tmp_path / "accreted")
    # simulate micro-batch appends: 8 writes x 4 files
    for i in range(8):
        c.where(F.col("c_custkey") % 8 == i).repartition(4).write.mode(
            "append"
        ).parquet(path)
    before = sorted(r.c_custkey for r in spark.read.parquet(path).collect())

    stats = compact_snapshot(spark, path, target_files=4)
    assert stats["files_before"] >= 32
    assert stats["files_after"] <= 4
    after = sorted(r.c_custkey for r in spark.read.parquet(path).collect())
    assert after == before

    # clustered recompaction: per-file key ranges must be disjoint
    compact_snapshot(spark, path, target_files=4, cluster_cols=("c_custkey",))
    ranges = []
    for f in spark.read.parquet(path).inputFiles():
        r = spark.read.parquet(f.replace("file:", "")).agg(
            F.min("c_custkey"), F.max("c_custkey")
        ).collect()[0]
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, stats-prunable


def test_snapshot_schema_evolution_across_dates(spark, sf_dir, tmp_path):
    """Layers evolve: a later snapshot adds a column (flex style
    promotes a new tag). mergeSchema reads the union — old partitions
    surface NULL for the new column, per-partition reads see their
    own schema, and the dated-partition layout keeps both snapshots
    independently consistent."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table, read_snapshot, write_snapshot

    base = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    path = str(tmp_path / "layer")
    write_snapshot(base, path, "2024-01-01")
    evolved = base.withColumn("population", F.col("n_nationkey") * 1000)
    write_snapshot(evolved, path, "2024-01-08")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "population" in merged.columns
    old = merged.where(F.col("pgosm_date") == "2024-01-01")
    new = merged.where(F.col("pgosm_date") == "2024-01-08")
    assert old.where(F.col("population").isNotNull()).count() == 0
    assert new.where(F.col("population").isNull()).count() == 0
    # dated reads still serve each snapshot's own shape
    assert "population" not in read_snapshot(spark, path, "2024-01-01").columns or (
        read_snapshot(spark, path, "2024-01-01")
        .where(F.col("population").isNotNull())
        .count()
        == 0
    )
    assert read_snapshot(spark, path, "2024-01-08").count() == base.count()


# --- independent golden fixture (VERDICT r5 item 7) -----------------

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDEN_PBF = os.path.join(GOLDEN_DIR, "golden_1000.osm.pbf")
GOLDEN_JSON = os.path.join(GOLDEN_DIR, "golden_1000.expected.json")


def test_wire_known_answer_vectors_from_protobuf_spec():
    """Anchor BOTH wire implementations (pbf_wire and the independent
    golden generator) to the protobuf docs' published values, so a
    symmetric encode/decode bug has nowhere to hide."""
    import tools.make_golden_pbf as golden
    from osm_airflow_spark.sources.pbf_wire import (
        decode_varint,
        encode_varint,
        zigzag_decode,
        zigzag_encode,
    )

    # varint worked examples from the protobuf encoding docs
    for n, wire in [(1, b"\x01"), (150, b"\x96\x01"), (300, b"\xac\x02")]:
        assert encode_varint(n) == wire
        assert golden.uv(n) == wire
        assert decode_varint(wire, 0)[0] == n
    # zigzag table from the protobuf encoding docs
    for orig, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3),
                      (2147483647, 4294967294), (-2147483648, 4294967295)]:
        assert zigzag_encode(orig) == enc
        assert golden.zz(orig) == enc
        assert zigzag_decode(enc) == orig
    # negative int64 varint is 10 bytes of two's complement
    assert encode_varint(-1) == b"\xff" * 9 + b"\x01"
    assert golden.uv(-1) == b"\xff" * 9 + b"\x01"


def test_golden_fixture_is_reproducible():
    """The checked-in golden bytes match a fresh run of the generator
    — guards the fixture against silent drift/corruption."""
    import tools.make_golden_pbf as golden

    header_block = golden.ld(4, b"OsmSchema-V0.6") + golden.ld(4, b"DenseNodes")
    a, _ = golden.block_a()
    b, _ = golden.block_b()
    c, _, _ = golden.block_c()
    fresh = (
        golden.fileblock("OSMHeader", header_block, compress=True)
        + golden.fileblock("OSMData", a, compress=True)
        + golden.fileblock("OSMData", b, compress=False)
        + golden.fileblock("OSMData", c, compress=True)
    )
    with open(GOLDEN_PBF, "rb") as fh:
        assert fh.read() == fresh


def test_golden_fixture_decodes_exactly():
    """The repo decoder run over bytes it did NOT produce must yield
    exactly the independently-computed element list: 1000 elements,
    coords/tags/refs/members bit-exact. Covers: raw + zlib blobs,
    granularity=50, NEGATIVE lon_offset (int64, not zigzag — a real
    decoder bug the symmetric round-trip tests could never catch),
    date_granularity skip, plain + dense nodes, negative ref deltas,
    all member types, UTF-8 tags, decoy string-table entries."""
    import json as _json

    from osm_airflow_spark.sources.pbf_wire import decode_blob, scan_blob_offsets

    with open(GOLDEN_JSON) as fh:
        expected = _json.load(fh)
    offsets = scan_blob_offsets(GOLDEN_PBF)
    assert [t for (_, _, t) in offsets] == [
        "OSMHeader", "OSMData", "OSMData", "OSMData"
    ]
    got = {"nodes": [], "ways": [], "relations": []}
    with open(GOLDEN_PBF, "rb") as fh:
        for start, length, blob_type in offsets:
            if blob_type != "OSMData":
                continue
            fh.seek(start)
            decoded = decode_blob(fh.read(length))
            for k in got:
                got[k] += decoded[k]
    assert len(got["nodes"]) == 900
    assert len(got["ways"]) == 80
    assert len(got["relations"]) == 20
    assert got == expected  # exact: same float arithmetic both sides


def test_golden_fixture_through_spark_reader(spark):
    """The distributed ingest path (offsets scan → per-blob decode on
    executors) over the independent golden file."""
    from osm_airflow_spark.sources.pbf import read_pbf

    tables = read_pbf(spark, GOLDEN_PBF)
    assert tables["nodes"].count() == 900
    assert tables["ways"].count() == 80
    assert tables["relations"].count() == 20
    # spot-check the negative-offset block landed at real coordinates
    row = tables["nodes"].where(F.col("node_id") == 10300).collect()[0]
    assert row["lat"] == 1e-9 * (1_000_000 + 50 * -90_000)
    assert row["lon"] == 1e-9 * (-500_000 + 50 * 160_000)


GOLDEN_DENSE_PBF = os.path.join(GOLDEN_DIR, "golden_dense_10k.osm.pbf")
GOLDEN_DENSE_JSON = os.path.join(GOLDEN_DIR, "golden_dense_10k.expected.json")


def test_golden_dense_fixture_is_reproducible():
    """The checked-in 10k-node dense fixture matches a fresh run of
    the independent generator."""
    import tools.make_golden_pbf as golden

    header_block = golden.ld(4, b"OsmSchema-V0.6") + golden.ld(4, b"DenseNodes")
    d, _ = golden.block_d()
    fresh = golden.fileblock(
        "OSMHeader", header_block, compress=True
    ) + golden.fileblock("OSMData", d, compress=True)
    with open(GOLDEN_DENSE_PBF, "rb") as fh:
        assert fh.read() == fresh


def test_golden_dense_block_decodes_exactly():
    """r7 verdict item 5: a >8k-node dense block crosses the
    string-table / delta-coding edge cases golden_1000 (600-node max
    block) never reaches — 300-entry string table (keys_vals indices
    need 2-byte varints), PERMUTED node ids (6,660 of 9,999 id deltas
    negative: the spec allows unsorted DenseNodes and an
    ascending-id assumption only breaks here), hemisphere-sweeping
    coordinates with sign-flipping zigzag deltas at granularity=25
    with nonzero offsets. 10,000 nodes decoded bit-exact against the
    independently-computed expectation."""
    import json as _json

    from osm_airflow_spark.sources.pbf_wire import decode_blob, scan_blob_offsets

    with open(GOLDEN_DENSE_JSON) as fh:
        expected = _json.load(fh)
    offsets = scan_blob_offsets(GOLDEN_DENSE_PBF)
    assert [t for (_, _, t) in offsets] == ["OSMHeader", "OSMData"]
    got = []
    with open(GOLDEN_DENSE_PBF, "rb") as fh:
        for start, length, blob_type in offsets:
            if blob_type != "OSMData":
                continue
            fh.seek(start)
            got += decode_blob(fh.read(length))["nodes"]
    assert len(got) == 10_000
    assert got == expected["nodes"]  # exact: same float arithmetic


def test_golden_pbf_composed_pipeline_snapshot_hash(spark, tmp_path):
    """r7 verdict item 4: the reference's WHOLE pipeline composed
    from wire format to published artifact — read_pbf(golden_1000) →
    promote_tags → assemble_way_lines → write_snapshot →
    read_snapshot — with the published snapshot's content pinned by
    sha256. Decoder-level parity (the three tests above) proves each
    stage; this proves the COMPOSITION: schema hand-offs between
    stages, tag promotion running on decoded maps, geometry assembly
    resolving decoded refs against decoded coords, and the dated
    publish round-tripping all of it. Canonicalization: rows sorted,
    doubles rendered at fixed decimal(16,9) scale (nano-degree
    precision — exact for the golden arithmetic), residual tag maps
    rendered as sorted k=v lists."""
    import hashlib

    from osm_airflow_spark.io import read_snapshot, write_snapshot
    from osm_airflow_spark.plans.osm import assemble_way_lines, promote_tags
    from osm_airflow_spark.sources.pbf import read_pbf

    tables = read_pbf(spark, GOLDEN_PBF)
    nodes = promote_tags(tables["nodes"], {"amenity": "string"})
    ways = promote_tags(tables["ways"], {"highway": "string"})
    assembled = assemble_way_lines(
        tables["ways"].select("way_id", "tags", "node_refs"),
        tables["nodes"],
    )

    def dec(col):
        return F.col(col).cast("decimal(16,9)").cast("string")

    def coords(field: str):
        return F.array_join(
            F.transform(
                "line",
                lambda s: s.getField(field).cast("decimal(16,9)").cast("string"),
            ),
            ",",
        )

    ways_pub = assembled.join(
        ways.select("way_id", "highway"), "way_id"
    ).select(
        "way_id",
        "highway",
        F.size("line").alias("n_points"),
        coords("lon").alias("lons"),
        coords("lat").alias("lats"),
        dec("bbox_west").alias("bw"),
        dec("bbox_south").alias("bs"),
        dec("bbox_east").alias("be"),
        dec("bbox_north").alias("bn"),
    )
    residual = F.array_join(
        F.transform(
            F.array_sort(F.map_entries("residual_tags")),
            lambda e: F.concat_ws("=", e.getField("key"), e.getField("value")),
        ),
        ";",
    )
    nodes_pub = nodes.select(
        "node_id",
        "amenity",
        dec("lat").alias("lat"),
        dec("lon").alias("lon"),
        residual.alias("residual"),
    )
    out = str(tmp_path)
    write_snapshot(ways_pub, os.path.join(out, "ways"), "2024-02-01")
    write_snapshot(nodes_pub, os.path.join(out, "nodes"), "2024-02-01")

    def digest(df, cols):
        rows = sorted(
            "|".join("" if r[c] is None else str(r[c]) for c in cols)
            for r in df.collect()
        )
        return hashlib.sha256("\n".join(rows).encode("utf-8")).hexdigest()

    ways_back = read_snapshot(spark, os.path.join(out, "ways"), "2024-02-01")
    nodes_back = read_snapshot(spark, os.path.join(out, "nodes"), "2024-02-01")
    assert ways_back.count() == 80 and nodes_back.count() == 900
    ways_hash = digest(
        ways_back,
        ["way_id", "highway", "n_points", "lons", "lats", "bw", "bs", "be", "bn"],
    )
    nodes_hash = digest(
        nodes_back, ["node_id", "amenity", "lat", "lon", "residual"]
    )
    assert ways_hash == WAYS_SNAPSHOT_SHA256, ways_hash
    assert nodes_hash == NODES_SNAPSHOT_SHA256, nodes_hash


# Pinned content hashes of the composed golden publish (the e2e
# output contract — regenerate deliberately, never incidentally).
WAYS_SNAPSHOT_SHA256 = "1989c3459e52d29b03f8836f1a6fe96ac9713dc176f58216f90553c1e93f15b1"
NODES_SNAPSHOT_SHA256 = "5c5b8c759a5b95eef881b2d5cf0f6bbee9c561342e72209961f8f4dad135104c"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_REAL_PBF"),
    reason="set SPARK_GRAFT_REAL_PBF=/path/to/extract.osm.pbf to run "
    "the real-extract validation (no network in this sandbox)",
)
def test_real_extract_hook(spark):
    """Downloadable-fixture hook: point SPARK_GRAFT_REAL_PBF at any
    real .osm.pbf (e.g. a Geofabrik extract) and the full reader runs
    structural invariants over it."""
    from osm_airflow_spark.sources.pbf import read_pbf

    path = os.environ["SPARK_GRAFT_REAL_PBF"]
    tables = read_pbf(spark, path)
    nodes = tables["nodes"]
    n = nodes.count()
    assert n > 0
    assert nodes.select("node_id").distinct().count() == n
    bad = nodes.where(
        (F.col("lat") < -90) | (F.col("lat") > 90)
        | (F.col("lon") < -180) | (F.col("lon") > 180)
    ).count()
    assert bad == 0
    assert tables["ways"].where(F.size("node_refs") < 1).count() == 0


def test_dag_full_graph_runs_without_scheduler(spark, tmp_path):
    """run_local executes the WHOLE task graph (3-region fan-out →
    per-region chains in parallel threads → publish gate) with no
    Airflow — upgrading DAG validation from callable-level to
    graph-level. All four regions ingest the same golden fixture, so
    every region produces IDENTICAL geohash cells: the exact
    dynamic-partition-overwrite clobber scenario — without region in
    the snapshot partition spec, the last region's publish silently
    wipes the others' rows from every shared (date, geohash)
    partition. Also proves per-region retry idempotence: re-running
    one region's transform leaves the other regions' rows intact."""
    import importlib.util
    import pathlib
    import shutil

    path = pathlib.Path(__file__).parent.parent / "dags" / "osm_spark_dag.py"
    spec = importlib.util.spec_from_file_location("osm_spark_dag_graph", path)
    dag_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dag_mod)

    regions = [
        {"region": "north-america/us", "subregion": sub}
        for sub in ("colorado", "oregon")
    ] + [{"region": "europe", "subregion": "spain"}]
    for r in regions:
        shutil.copy(GOLDEN_PBF, f"{tmp_path}/{r['subregion']}.osm.pbf")

    done = dag_mod.run_local(str(tmp_path), regions=regions)
    assert done == ["colorado", "oregon", "spain"]

    layer = spark.read.parquet(f"{tmp_path}/layers/highway")
    per_region = {
        r["region"]: r["n"]
        for r in layer.groupBy("region").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # golden block C: 40 even-j ways carry highway=residential
    assert per_region == {"colorado": 40, "oregon": 40, "spain": 40}

    # retry one region's transform: its partitions overwrite in place,
    # the other regions (sharing every geohash cell) must survive
    dag_mod.transform_region(
        "north-america/us", "oregon", dag_mod.SNAPSHOT_DATE, str(tmp_path)
    )
    layer2 = spark.read.parquet(f"{tmp_path}/layers/highway")
    per_region2 = {
        r["region"]: r["n"]
        for r in layer2.groupBy("region").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_region2 == per_region


def test_dag_publish_gate_reports_failed_regions(spark, tmp_path):
    """The publish gate must survive individual chain failures and
    report exactly which regions failed while successful regions'
    dated partitions stay published (idempotent re-run completes
    them) — pool.map semantics would re-raise the first error and
    report nothing."""
    import importlib.util
    import pathlib
    import shutil

    path = pathlib.Path(__file__).parent.parent / "dags" / "osm_spark_dag.py"
    spec = importlib.util.spec_from_file_location("osm_spark_dag_gate", path)
    dag_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dag_mod)

    regions = [
        {"region": "north-america/us", "subregion": "colorado"},
        {"region": "europe", "subregion": "spain"},
    ]
    # only colorado's extract exists; spain's chain must fail
    shutil.copy(GOLDEN_PBF, f"{tmp_path}/colorado.osm.pbf")

    with pytest.raises(RuntimeError) as exc:
        dag_mod.run_local(str(tmp_path), regions=regions, max_workers=2)
    assert "spain" in str(exc.value) and "colorado" not in str(exc.value).split(
        "published"
    )[0].replace("1/2", "")
    # the successful region's publish survived the gate failure
    layer = spark.read.parquet(f"{tmp_path}/layers/highway")
    assert layer.where(F.col("region") == "colorado").count() == 40


def test_jdbc_roundtrip_against_embedded_derby(spark, sf_dir, tmp_path):
    """B3 end-to-end, for real (r8): Spark bundles Derby for its
    metastore, so the JDBC sink/source can be proven without any
    external server — the 'no driver jar' env-block of earlier
    rounds was a wrong assumption. Covers: overwrite publish with
    nulls, append accumulation, and the range-partitioned parallel
    read returning exactly the published rows (the discipline an
    unpartitioned JDBC read would silently violate at scale)."""
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import write_jdbc
    from osm_airflow_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/servingdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    layer = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .where(F.col("c_custkey") <= 100)
    )
    write_jdbc(layer, url, "customers", mode="overwrite",
               properties=props, num_partitions=1)
    hi = layer.agg(F.max("c_custkey")).first()[0]
    back = read_jdbc(
        spark, url, "customers", "c_custkey", 0, int(hi) + 1,
        num_partitions=4, properties=props,
    )
    assert back.rdd.getNumPartitions() == 4  # genuinely parallel scan
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, layer.collect())
    )
    # append mode accumulates (the weekly re-publish shape)
    write_jdbc(layer.limit(10), url, "customers", mode="append",
               properties=props, num_partitions=1)
    n = read_jdbc(
        spark, url, "customers", "c_custkey", 0, int(hi) + 1,
        num_partitions=2, properties=props,
    ).count()
    assert n == layer.count() + 10


def test_adversarial_pbf_every_real_world_variant(spark, tmp_path):
    """VERDICT r9 #2 — the maximal-adversarial fixture: one file
    exercising every encoding variant real planet extracts use that
    the golden fixtures don't (full HeaderBlock with 2-byte field
    keys, DenseInfo, per-element Info, LocationsOnWays, changesets
    group, unknown fields of all four wire types, mixed group kinds,
    an empty group, coordinate corners, 2^40 ref deltas, a zero-member
    relation, a >16 MB blob with 3-byte string indices, and a zlib
    blob without raw_size). Decoded through the full Spark read_pbf
    path; counts and every element pinned against the independent
    generator's expectations."""
    import tools.make_adversarial_pbf as adv

    from osm_airflow_spark.sources.pbf import read_pbf

    path = str(tmp_path / "adversarial.osm.pbf")
    expected = adv.build(path)

    tables = read_pbf(spark, path)
    nodes = sorted(
        (
            {"node_id": r["node_id"], "lat": r["lat"], "lon": r["lon"],
             "tags": dict(r["tags"] or {})}
            for r in tables["nodes"].collect()
        ),
        key=lambda r: r["node_id"],
    )
    want_nodes = sorted(expected["nodes"], key=lambda r: r["node_id"])
    assert len(nodes) == len(want_nodes) == 2057
    assert nodes == want_nodes  # exact floats: decoder association

    ways = {r["way_id"]: r for r in tables["ways"].collect()}
    assert set(ways) == {50_001, 50_002}
    # the 2^40 delta accumulated exactly; LocationsOnWays NOT
    # mistaken for refs
    assert list(ways[50_001]["node_refs"]) == [
        1, 1 + (1 << 40), 1 + (1 << 40) - (1 << 39), 2
    ]
    assert list(ways[50_002]["node_refs"]) == [40_001, 40_002, 40_003]

    rels = {r["rel_id"]: r for r in tables["relations"].collect()}
    assert set(rels) == {60_001, 60_002}
    assert [
        (m["mtype"], m["ref"], m["role"]) for m in rels[60_001]["members"]
    ] == [("node", 40_001, "outer"), ("way", 50_001, "")]
    assert list(rels[60_002]["members"]) == []

    # the big blob really is past the 16 MB SHOULD bound
    big, _ = adv.block_16mb()
    assert len(big) > 16 * 1024 * 1024


def test_pbf_header_required_features_validated(spark, tmp_path):
    """A file declaring a required feature this decoder does not
    implement (HistoricalInformation: deleted elements would silently
    read as live) must be REFUSED at the header, before any fan-out;
    supported headers decode to their declared metadata."""
    import pytest as _pytest

    import tools.make_adversarial_pbf as adv

    from osm_airflow_spark.sources import pbf_wire
    from osm_airflow_spark.sources.pbf import read_pbf

    hist = str(tmp_path / "history.osm.pbf")
    adv.build_history_file(hist)
    with _pytest.raises(ValueError, match="HistoricalInformation"):
        read_pbf(spark, hist)["nodes"].count()

    ok = str(tmp_path / "ok.osm.pbf")
    adv.build(ok)
    offsets = pbf_wire.scan_blob_offsets(ok)
    start, length, blob_type = offsets[0]
    assert blob_type == "OSMHeader"
    with open(ok, "rb") as fh:
        fh.seek(start)
        hdr = pbf_wire.decode_header(fh.read(length))
    assert hdr["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert hdr["optional_features"] == ["Sort.Type_then_ID"]
    assert hdr["writingprogram"] == "adversarial-generator"


def test_postgres_ddl_type_mapping(spark):
    """VERDICT r9 #6 — the Postgres dialect layer, no server needed:
    DDL comes from Spark's OWN PostgresDialect (the mapping the JDBC
    writer consults at connect time), with jsonb/geometry overrides
    for what Spark can't express. Pins the full scalar mapping
    including timestamptz (Spark timestamps are instants) and the
    publish-prep serialization of map columns."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from osm_airflow_spark.sources.jdbc import (
        postgres_ddl,
        postgres_type,
        prepare_for_postgres,
    )

    assert postgres_type(spark, "bigint") == "BIGINT"
    assert postgres_type(spark, "int") == "INTEGER"
    assert postgres_type(spark, "double") == "FLOAT8"
    assert postgres_type(spark, "float") == "FLOAT4"
    assert postgres_type(spark, "string") == "TEXT"
    assert postgres_type(spark, "boolean") == "BOOLEAN"
    assert postgres_type(spark, "timestamp") == "TIMESTAMP WITH TIME ZONE"
    assert postgres_type(spark, "date") == "DATE"
    assert postgres_type(spark, "binary") == "BYTEA"
    assert postgres_type(spark, "decimal(18,6)") == "NUMERIC(18,6)"
    assert postgres_type(spark, "array<string>") == "TEXT[]"
    assert postgres_type(spark, "array<double>") == "FLOAT8[]"
    with pytest.raises(ValueError, match="override"):
        postgres_type(spark, "map<string,string>")

    schema = T.StructType(
        [
            T.StructField("node_id", T.LongType(), False),
            T.StructField("lat", T.DoubleType(), True),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("geom", T.BinaryType(), True),
            T.StructField("updated", T.TimestampType(), True),
        ]
    )
    df = spark.createDataFrame([], schema)
    ddl = postgres_ddl(
        df,
        "osm.nodes",
        overrides={"tags": "JSONB", "geom": "geometry(Point,4326)"},
        primary_key="node_id",
    )
    assert ddl == (
        "CREATE TABLE osm.nodes (\n"
        '  "node_id" BIGINT NOT NULL,\n'
        '  "lat" FLOAT8,\n'
        '  "tags" JSONB,\n'
        '  "geom" geometry(Point,4326),\n'
        '  "updated" TIMESTAMP WITH TIME ZONE,\n'
        '  PRIMARY KEY ("node_id")\n'
        ")"
    )

    rows = spark.createDataFrame(
        [(1, 2.5, {"amenity": "cafe"}, bytearray(b"\x01\x02"), None)], schema
    )
    prepped = prepare_for_postgres(rows, geometry_cols=("geom",))
    assert dict(prepped.dtypes)["tags"] == "string"
    got = prepped.first()
    assert got["tags"] == '{"amenity":"cafe"}'
    assert bytes(got["geom"]) == b"\x01\x02"
    # non-WKB geometry column is refused
    with pytest.raises(ValueError, match="WKB"):
        prepare_for_postgres(rows.withColumn("geom", F.lit("notbytes")),
                             geometry_cols=("geom",))


def test_pbf_missing_osmheader_refused(tmp_path):
    """r10 ADVICE: a crafted file with NO OSMHeader blob (the spec
    requires the first fileblock to be one) must be refused at
    planning time — otherwise required_features validation is
    silently skipped and the file ingested unvalidated."""
    from osm_airflow_spark.sources import pbf_wire

    block = pbf_wire.encode_primitive_block(
        nodes=[{"node_id": 1, "lat": 1.0, "lon": 2.0, "tags": {}}]
    )
    headerless = str(tmp_path / "headerless.osm.pbf")
    with open(headerless, "wb") as fh:
        fh.write(pbf_wire.encode_fileblock(block, "OSMData"))
    with pytest.raises(ValueError, match="OSMHeader"):
        pbf_wire.validated_data_offsets(headerless)

    # zero fileblocks at all: equally refused, not [] silently
    empty = str(tmp_path / "empty.osm.pbf")
    open(empty, "wb").close()
    with pytest.raises(ValueError, match="OSMHeader"):
        pbf_wire.validated_data_offsets(empty)

    # data-before-header also violates the first-block rule
    swapped = str(tmp_path / "swapped.osm.pbf")
    with open(swapped, "wb") as fh:
        fh.write(pbf_wire.encode_fileblock(block, "OSMData"))
        fh.write(pbf_wire.encode_fileblock(
            pbf_wire.encode_primitive_block(), "OSMHeader"))
    with pytest.raises(ValueError, match="OSMHeader"):
        pbf_wire.validated_data_offsets(swapped)


def test_dense_volume_file_decodes_exactly(spark, tmp_path):
    """Volume-proof generator contract (r14, tools/make_dense_pbf.py):
    the dense-planet file's advertised element counts are what the
    full Spark fan-out decodes; node ids are globally unique across
    blobs (the per-blob first-delta re-prefix really does advance the
    base), way refs resolve to in-file node ids, and the ~10% tag
    density survives the columnar per-blob emission path."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.make_dense_pbf import build

    from osm_airflow_spark.sources.pbf import read_pbf_elements

    path = str(tmp_path / "dense.osm.pbf")
    facts = build(path, target_mb=8)
    assert facts["blobs"] >= 4

    union = read_pbf_elements(spark, path)
    counts = dict(union.groupBy("kind").count().collect())
    assert counts["node"] == facts["nodes"]
    assert counts["way"] == facts["ways"]

    nodes = union.where("kind = 'node'")
    stats = nodes.agg(
        F.countDistinct("elem_id").alias("uniq"),
        F.count(F.when(F.size("tags") > 0, 1)).alias("tagged"),
        F.min("lat").alias("lat_lo"),
        F.max("lat").alias("lat_hi"),
    ).first()
    assert stats["uniq"] == facts["nodes"]  # no id reuse across blobs
    assert stats["tagged"] == facts["nodes"] // 10
    assert 40.0 < stats["lat_lo"] < stats["lat_hi"] < 50.0

    # every way ref points at a decoded node (anti-join is empty)
    refs = union.where("kind = 'way'").select(
        F.explode("node_refs").alias("ref")
    )
    dangling = refs.join(
        nodes.select(F.col("elem_id").alias("ref")), "ref", "left_anti"
    ).count()
    assert dangling == 0


def test_columnar_decode_identical_to_dict_decode(tmp_path):
    """decode_blob_columnar (the Arrow-bound hot path) must agree
    with decode_blob bit-for-bit — including float coordinates (the
    int64 → float64 conversion is the same IEEE op in numpy and
    CPython) and tag dicts — across the maximal-adversarial file
    (DenseInfo, unknown fields, coordinate corners, 2^40 deltas, the
    >16 MB blob, zlib-without-raw_size) and a dense-volume file."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tools.make_adversarial_pbf as adv
    from tools.make_dense_pbf import build

    from osm_airflow_spark.sources import pbf_wire

    adv_path = str(tmp_path / "adv.osm.pbf")
    adv.build(adv_path)
    dense_path = str(tmp_path / "dense.osm.pbf")
    build(dense_path, target_mb=4)

    def flatten(chunks):
        out = {"nodes": [], "ways": [], "relations": []}
        for kind, payload in chunks:
            if kind == "dense":
                ids = payload["node_id"].tolist()
                lats = payload["lat"].tolist()
                lons = payload["lon"].tolist()
                out["nodes"].extend(
                    {
                        "node_id": ids[i],
                        "lat": lats[i],
                        "lon": lons[i],
                        "tags": payload["tags"][i],
                    }
                    for i in range(len(ids))
                )
            elif kind == "nodes":
                out["nodes"].extend(payload)
            elif kind == "ways":
                out["ways"].extend(payload)
            else:
                out["relations"].extend(payload)
        return out

    for path in (adv_path, dense_path):
        with open(path, "rb") as fh:
            for s, l in pbf_wire.validated_data_offsets(path):
                fh.seek(s)
                blob = fh.read(l)
                assert pbf_wire.decode_blob(blob) == flatten(
                    pbf_wire.decode_blob_columnar(blob)
                ), (path, s)
