"""Source/sink round-trips and the bucketed-join layout proof."""

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
