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


def test_apply_diff_collapses_multi_change_batch(spark, base):
    """N same-key changes in one batch must land as ONE outcome (the
    latest by change_ts), not N appended rows."""
    changes = spark.createDataFrame(
        [
            (4, "bank", 1, "2024-01-01", "create"),
            (4, "atm", 2, "2024-01-02", "modify"),
            (2, "bar", 2, "2024-01-01", "modify"),
            (2, None, 0, "2024-01-02", "delete"),
        ],
        "node_id long, amenity string, version int, change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    out = {r["node_id"]: r for r in apply_diff(base, changes, "node_id").collect()}
    assert set(out) == {1, 3, 4}  # 2 created-then-... no: 2 modified then deleted
    assert out[4]["amenity"] == "atm" and out[4]["version"] == 2  # latest wins, once


def test_apply_diff_same_ts_delete_wins(spark, base):
    changes = spark.createDataFrame(
        [
            (2, "bar", 2, "2024-01-01", "modify"),
            (2, None, 0, "2024-01-01", "delete"),
        ],
        "node_id long, amenity string, version int, change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    out = {r["node_id"] for r in apply_diff(base, changes, "node_id").collect()}
    assert out == {1, 3}  # tie at same ts: delete outranks modify


def test_scd2_multi_change_batch_single_close_and_open(spark):
    history = spark.createDataFrame(
        [(1, "v1", "2024-01-01", None)],
        "node_id long, amenity string, valid_from string, valid_to string",
    ).select(
        "node_id",
        "amenity",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [(1, "v2", "2024-02-01", "modify"), (1, "v3", "2024-03-01", "modify")],
        "node_id long, amenity string, change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    merged = scd2_merge(history, changes, "node_id")
    rows = merged.collect()
    assert len(rows) == 2  # one closed v1 + ONE open v3, not three
    open_rows = [r for r in rows if r["valid_to"] is None]
    assert len(open_rows) == 1 and open_rows[0]["amenity"] == "v3"


def test_scd2_out_of_order_change_never_inverts_interval(spark):
    history = spark.createDataFrame(
        [(1, "v1", "2024-06-01", None)],
        "node_id long, amenity string, valid_from string, valid_to string",
    ).select(
        "node_id",
        "amenity",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    # change_ts BEFORE the open version's valid_from
    changes = spark.createDataFrame(
        [(1, "v0", "2024-01-01", "modify")],
        "node_id long, amenity string, change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    merged = scd2_merge(history, changes, "node_id")
    for r in merged.collect():
        if r["valid_to"] is not None:
            assert r["valid_to"] >= r["valid_from"], r


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


def test_apply_diff_with_tags_map_payload(spark, base):
    """OSM change feeds carry tags map<string,string>; Spark refuses
    to hash maps, so the payload tiebreak must canonicalize them
    (array_sort(map_entries)) instead of crashing at analysis time
    (DATATYPE_MISMATCH.HASH_MAP_TYPE — the r3 advice finding)."""
    base_tagged = base.withColumn(
        "tags", F.create_map(F.lit("amenity"), F.col("amenity"))
    )
    changes = spark.createDataFrame(
        [
            (2, "restaurant", 2, {"amenity": "restaurant", "cuisine": "thai"}, "2024-01-01", "modify"),
            (2, "bar", 3, {"amenity": "bar"}, "2024-01-02", "modify"),
            (4, "bank", 1, {"amenity": "bank"}, "2024-01-01", "create"),
        ],
        "node_id long, amenity string, version int, tags map<string,string>, "
        "change_ts string, change_op string",
    ).withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    out = {r["node_id"]: r for r in apply_diff(base_tagged, changes, "node_id").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2]["amenity"] == "bar" and out[2]["tags"] == {"amenity": "bar"}
    assert out[4]["tags"] == {"amenity": "bank"}


def test_latest_change_tiebreak_total_order_with_map(spark):
    """Two same-key changes tying on (ts, op) but differing only in a
    MAP payload must still pick ONE partition-independent survivor."""
    from osm_airflow_spark.plans.merge import latest_change_per_key

    rows = [
        (1, {"name": "a"}, "2024-01-01", "modify"),
        (1, {"name": "b"}, "2024-01-01", "modify"),
    ]
    schema = "node_id long, tags map<string,string>, change_ts string, change_op string"
    one = (
        spark.createDataFrame(rows, schema)
        .withColumn("change_ts", F.col("change_ts").cast("timestamp"))
    )
    got = [
        latest_change_per_key(one.repartition(n, "node_id"), "node_id").collect()
        for n in (1, 7)
    ]
    assert len(got[0]) == 1
    assert got[0][0]["tags"] == got[1][0]["tags"]  # partition-independent


def test_snapshot_diff_roundtrip_apply(spark):
    """snapshot_diff(old, new) fed back through apply_diff(old, ...)
    must reproduce `new` exactly — the CDC bootstrap contract. Also:
    rows equal in both snapshots must not appear in the feed, and
    null↔value transitions are visible modifies."""
    from osm_airflow_spark.plans.merge import apply_diff, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "id long, val string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, None), (5, "e")], "id long, val string"
    )
    feed = snapshot_diff(old, new, "id", ["val"])
    by_op = {r["id"]: r["change_op"] for r in feed.collect()}
    assert by_op == {1: "delete", 3: "modify", 4: "modify", 5: "create"}, by_op

    changes = feed.select(
        "id", F.col("_new_val").alias("val"), F.col("change_op")
    )
    rebuilt = apply_diff(old, changes, "id")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
