"""Incremental snapshot merge (ROADMAP item 4; SURVEY.md §7.6).

The reference rebuilds everything weekly (osm_etl.py:45-46); real OSM
publishes minutely diffs of (create / modify / delete) element
versions. These ops apply such a change batch to a snapshot without a
full rebuild — the MERGE INTO emulation from the public Spark
playbook (anti-join + union; no Delta/Iceberg jars needed):

* ``apply_diff`` — type-1 merge: the new snapshot keeps every
  unchanged row, replaces modified rows, drops deletes, adds creates.
* ``scd2_merge`` — type-2 history: instead of overwriting, close the
  old version's validity interval and append the new one, so
  time-travel queries (as-of join D9 on valid_from) see any past
  state.

Scale notes: both are one anti-join + one union on the key — shuffle
per merged batch is O(batch + touched keys), not O(snapshot). With
both sides bucketed by id the anti-join is Exchange-free. Deletes are
tombstones in the change feed, never scans of the base.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_COL = "change_op"  # 'create' | 'modify' | 'delete'


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hashable(name: str, dt: T.DataType) -> Column:
    """A deterministic, hash-safe stand-in for a payload column.

    Spark refuses to hash MapType (DATATYPE_MISMATCH.HASH_MAP_TYPE)
    because map equality ignores entry order — and OSM change feeds
    always carry one (tags map<string,string>). Canonicalize a
    top-level map to its entries sorted by key; for the rare payload
    with a map nested deeper, fall back to the JSON serialization,
    which is stable for any given stored row (the tiebreak only needs
    the same row to hash the same regardless of partitioning)."""
    c = F.col(name)
    if isinstance(dt, T.MapType):
        return F.array_sort(F.map_entries(c))
    if _contains_map(dt):
        return F.to_json(c)
    return c


def latest_change_per_key(
    changes: DataFrame, key: str, change_ts: str = "change_ts"
) -> DataFrame:
    """Collapse a change batch to ONE row per key: the latest by
    ``change_ts``, tie-broken deterministically (delete > modify >
    create at the same timestamp — a delete is the strongest claim,
    and any total order beats a partition-dependent one). Two
    same-key changes tying on (ts, op) can still differ in payload,
    so a content hash over the remaining columns closes the order to
    a total one — the surviving row never depends on partitioning."""
    op_rank = (
        F.when(F.col(CHANGE_COL) == "delete", 3)
        .when(F.col(CHANGE_COL) == "modify", 2)
        .otherwise(1)
    )
    payload_fields = [
        f for f in changes.schema.fields
        if f.name not in (key, change_ts, CHANGE_COL)
    ]
    payload_tiebreak = (
        F.xxhash64(*[_hashable(f.name, f.dataType) for f in payload_fields])
        if payload_fields
        else F.lit(0)
    )
    w = Window.partitionBy(key).orderBy(
        F.col(change_ts).desc(), op_rank.desc(), F.col(CHANGE_COL), payload_tiebreak
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_diff(
    snapshot: DataFrame, changes: DataFrame, key: str, change_ts: str = "change_ts"
) -> DataFrame:
    """Type-1 merge: latest state only.

    ``changes`` carries the full new row plus a ``change_op`` column.
    The batch is first collapsed to the latest change per key, so a
    key that is created and then modified within one batch lands as
    exactly one new row (and create-then-delete lands as nothing).
    Rows in the base whose key appears in the batch are superseded
    (anti-join); creates/modifies append their new version; deletes
    contribute nothing."""
    if change_ts in changes.columns:
        changes = latest_change_per_key(changes, key, change_ts)
        if change_ts not in snapshot.columns:
            changes = changes.drop(change_ts)
    survivors = snapshot.join(changes.select(key), key, "left_anti")
    additions = changes.where(F.col(CHANGE_COL) != "delete").drop(CHANGE_COL)
    return survivors.unionByName(additions)


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 merge: full version history with validity intervals.

    ``history`` rows carry [valid_from, valid_to) with open versions
    at valid_to = NULL. For each changed key: the open version closes
    at the change timestamp; creates/modifies append a new open
    version starting there. Deletes only close.

    The as-of join (D9 pattern) over (key, valid_from) then answers
    "the element as of time T" for any T — the relational form of
    running a query against an old pgosm_date snapshot.

    Batch hygiene: the batch is collapsed to the LATEST change per
    key first (``latest_change_per_key``) — otherwise N same-key
    changes fan out every history row N times and append N open
    versions. Out-of-order guard: a change whose timestamp is not
    after the open version's ``valid_from`` closes it at
    ``valid_from`` (zero-length interval) rather than inverting it,
    and the new version starts at the same clamped instant — history
    never contains valid_to < valid_from."""
    changes = latest_change_per_key(changes, key, change_ts)
    changed_keys = changes.select(key, F.col(change_ts).alias("_close_ts"))
    closed = (
        history.join(changed_keys, key, "left")
        .withColumn(
            valid_to,
            F.when(
                F.col(valid_to).isNull() & F.col("_close_ts").isNotNull(),
                F.greatest(F.col("_close_ts"), F.col(valid_from)),
            ).otherwise(F.col(valid_to)),
        )
        .drop("_close_ts")
    )
    open_starts = history.where(F.col(valid_to).isNull()).groupBy(key).agg(
        F.max(valid_from).alias("_open_from")
    )
    new_versions = (
        changes.where(F.col(CHANGE_COL) != "delete")
        .drop(CHANGE_COL)
        .join(open_starts, key, "left")
        .withColumn(
            valid_from,
            F.greatest(F.col(change_ts), F.coalesce(F.col("_open_from"), F.col(change_ts))),
        )
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .drop(change_ts, "_open_from")
    )
    return closed.unionByName(new_versions)


def snapshot_as_of(history: DataFrame, ts, valid_from: str = "valid_from", valid_to: str = "valid_to") -> DataFrame:
    """Read one consistent historical state out of an SCD2 table:
    versions whose interval covers ``ts`` (the query-side of the
    pgosm_date pinning semantics, osm_etl.py:13)."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col(valid_from) <= t) & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    ).drop(valid_from, valid_to)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """CDC extraction — the inverse of ``apply_diff``: given two full
    snapshots, emit the minimal change feed (create / modify /
    delete) that turns ``old`` into ``new``. This is how a pipeline
    without an upstream change log bootstraps incremental processing
    (diff week N vs N+1, then switch to applying diffs — exactly the
    upgrade path away from the reference's weekly full rebuild,
    osm_etl.py:45-46).

    One full outer join on the key; rows equal on all
    ``compare_cols`` drop out, so the feed is O(changes), not
    O(snapshot). With both snapshots bucketed by key the join is
    Exchange-free. Null-safe comparison (``eqNullSafe``) keeps NULL
    → value and value → NULL transitions visible as modifies."""
    # explicit presence markers: a present row may hold NULLs in every
    # compared column, so presence must never be inferred from values
    o = old.select(
        F.col(key),
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key),
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    j = o.join(n, key, "full_outer")
    old_present = F.col("_old_present").isNotNull()
    new_present = F.col("_new_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    op = (
        F.when(~old_present, F.lit("create"))
        .when(~new_present, F.lit("delete"))
        .otherwise(F.lit("modify"))
    )
    return (
        j.withColumn(CHANGE_COL, op)
        .where(~old_present | ~new_present | ~same)
        .drop("_old_present", "_new_present")
    )
