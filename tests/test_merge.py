"""Incremental merge semantics: type-1 diff application, SCD2
version history, and as-of reads over it."""

import pytest
from pyspark.sql import functions as F

from osm_airflow_spark.plans.merge import apply_diff, scd2_merge, snapshot_as_of


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "cafe", 1), (2, "pub", 1), (3, "shop", 1)],
        "node_id long, amenity string, version int",
    )


def test_apply_diff_create_modify_delete(spark, base):
    changes = spark.createDataFrame(
        [
            (2, "restaurant", 2, "modify"),
            (3, None, 0, "delete"),
            (4, "bank", 1, "create"),
        ],
        "node_id long, amenity string, version int, change_op string",
    )
    out = {r["node_id"]: r for r in apply_diff(base, changes, "node_id").collect()}
    assert set(out) == {1, 2, 4}  # 3 deleted
    assert out[1]["amenity"] == "cafe"  # untouched survives
    assert out[2]["amenity"] == "restaurant" and out[2]["version"] == 2
    assert out[4]["amenity"] == "bank"


def test_apply_diff_idempotent_on_empty_batch(spark, base):
    empty = spark.createDataFrame([], "node_id long, amenity string, version int, change_op string")
    assert sorted(apply_diff(base, empty, "node_id").collect()) == sorted(base.collect())


def test_scd2_merge_and_asof_reads(spark):
    t = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    history = spark.createDataFrame(
        [(1, "cafe", "2024-01-01", None), (2, "pub", "2024-01-01", None)],
        "node_id long, amenity string, valid_from string, valid_to string",
    ).select(
        "node_id",
        "amenity",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [(1, "restaurant", "2024-06-01", "modify"), (2, None, "2024-06-01", "delete")],
        "node_id long, amenity string, change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))

    merged = scd2_merge(history, changes, "node_id")
    assert merged.count() == 3  # two closed versions + one new open

    before = {r["node_id"]: r["amenity"] for r in snapshot_as_of(merged, "2024-03-01").collect()}
    after = {r["node_id"]: r["amenity"] for r in snapshot_as_of(merged, "2024-07-01").collect()}
    assert before == {1: "cafe", 2: "pub"}
    assert after == {1: "restaurant"}  # node 2 deleted, node 1 renamed
