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


def test_scd2_sequential_batches(spark):
    """Two change batches applied in sequence: history grows, each
    as-of cut is consistent."""
    from pyspark.sql import functions as F

    history = spark.createDataFrame(
        [(1, "v1", "2024-01-01", None)],
        "node_id long, amenity string, valid_from string, valid_to string",
    ).select(
        "node_id",
        "amenity",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "node_id long, amenity string, change_ts string, change_op string"
        ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))

    h1 = scd2_merge(history, batch([(1, "v2", "2024-02-01", "modify")]), "node_id")
    h2 = scd2_merge(h1, batch([(1, "v3", "2024-03-01", "modify")]), "node_id")
    assert h2.count() == 3  # three versions of node 1
    for ts, expect in [("2024-01-15", "v1"), ("2024-02-15", "v2"), ("2024-03-15", "v3")]:
        got = snapshot_as_of(h2, ts).collect()
        assert len(got) == 1 and got[0]["amenity"] == expect, ts


def test_apply_diff_delete_then_recreate(spark, base):
    from pyspark.sql import functions as F  # noqa: F401

    deleted = apply_diff(
        base,
        spark.createDataFrame(
            [(1, None, 0, "delete")], "node_id long, amenity string, version int, change_op string"
        ),
        "node_id",
    )
    recreated = apply_diff(
        deleted,
        spark.createDataFrame(
            [(1, "cafe-new", 2, "create")],
            "node_id long, amenity string, version int, change_op string",
        ),
        "node_id",
    )
    rows = {r["node_id"]: r for r in recreated.collect()}
    assert rows[1]["amenity"] == "cafe-new" and rows[1]["version"] == 2
    assert len(rows) == 3
