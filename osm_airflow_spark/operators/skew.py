"""Skew mitigation utilities (SURVEY.md §4 'skew handling').

The reference never handles skew — but at planet scale OSM is
pathologically skewed (dense urban areas: one relation with 10⁵
members, one node referenced by 10⁴ ways). AQE's skew-join splitting
(on by default in session.py) handles most cases at runtime; salting
is the explicit fallback for aggregations and for joins whose skew
AQE can't see (e.g. after a UDF).

``salted_join``: replicate the small side R times, scatter the big
side's hot keys across R salt buckets — the hot key's rows spread
over R tasks instead of one straggler.
``salted_agg_count``: two-phase aggregation — partial per (key,
salt), final per key. Works for any commutative-associative
aggregate; the decimal-sum pattern keeps it exact for doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt derived from the row content
    (xxhash64 of all columns mod R) — no rand(), so retries and
    speculative tasks see identical salts."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def replicate_with_salts(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Small-side replication: one copy per salt value."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: Column, n_salts: int = 8
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side: big rows get
    a content-derived salt, the small side is replicated across all
    salts, and the join key becomes (key, salt). Output equals the
    plain join (verified by tests); cost is n_salts× the small side —
    use only when a specific key set is hot."""
    b = with_salt(big, n_salts)
    s = replicate_with_salts(small, n_salts)
    return b.join(s, on & (b["_salt"] == s["_salt"])).drop("_salt")


def salted_agg_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase count for a skewed grouping key: partial count per
    (key, salt) — spreading a hot key over n_salts tasks — then final
    sum per key. Same result as a direct groupBy (Spark's own partial
    aggregation usually suffices; this is the explicit form for
    post-UDF pipelines where map-side combine is unavailable)."""
    return (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 32,
    bytes_per_row: int = 64,
    top_k: int = 5,
) -> dict:
    """Measure a join/agg key's skew and recommend AQE thresholds —
    the r8 skew-bench policy (SCALE.md round-8 ledger) as runnable
    code instead of prose.

    One aggregation pass: per-key counts → top-k shares plus the
    hashed-partition row distribution those keys imply. Returns the
    measured facts and the two knobs the bench showed matter:

    * ``skewedPartitionThresholdInBytes`` ~ 2x the estimated median
      partition (AQE's 256 MB absolute default silently misses hot
      partitions smaller than that — measured), and
    * ``advisoryPartitionSizeInBytes`` ~ the estimated median, so a
      flagged partition splits into median-sized chunks.

    ``bytes_per_row`` should be the COMPRESSED map-output estimate —
    AQE sees compressed bytes, and a hot key's self-similar rows
    compress harder than mixed data (also measured; when in doubt,
    measure one shuffle and divide). The estimate feeds config, not
    correctness: wrong by 2x just means the threshold is 2x off,
    which still beats the 256 MB default by an order of magnitude at
    these sizes. Top-k shares also tell you whether salting is even
    needed: a top key under ~2/n_partitions cannot dominate any
    partition."""
    total = df.count()
    top = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(key_col))
        .limit(top_k)
        .collect()
    )
    top_keys = [
        {"key": r[key_col], "rows": r["n"], "share": r["n"] / max(total, 1)}
        for r in top
    ]
    median_rows = max(total // max(n_partitions, 1), 1)
    hot_rows = (top_keys[0]["rows"] if top_keys else 0) + median_rows
    median_bytes = median_rows * bytes_per_row
    return {
        "total_rows": total,
        "top_keys": top_keys,
        "est_median_partition_rows": median_rows,
        "est_hot_partition_rows": hot_rows,
        "row_skew_ratio": round(hot_rows / median_rows, 1),
        "recommend": {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
                2 * median_bytes
            ),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(median_bytes),
            "salting_warranted": bool(
                top_keys and top_keys[0]["share"] > 2.0 / max(n_partitions, 1)
            ),
        },
    }


def apply_skew_policy(
    spark,
    df: DataFrame,
    key_col: str,
    n_partitions: int | None = None,
    bytes_per_row: int = 64,
) -> dict:
    """Close the loop from measurement to config (r9 — the SCALE.md
    round-8 ledger's policy as a one-call opt-in): run ``skew_report``
    on the join/agg input and SET the recommended AQE thresholds on
    the session, so skew-join splitting actually fires for this
    workload's partition sizes instead of AQE's 256 MB absolute
    default (which the planted-hot-key bench showed silently misses
    every hot partition at these scales — SKEWBENCH.json: naive
    40.6 s bimodal straggler vs 9.8 s once AQE can see the skew).

    Both confs are runtime-settable, so this composes with any
    externally-built session (same contract as configure_runtime).
    Deliberately an OPT-IN per workload, not a get_spark default: the
    right threshold is a function of THIS input's row width and key
    distribution, and a global default would re-create the
    one-size-fits-all miss it exists to fix. Returns the full report
    (with ``applied: True`` and the conf values) for logging.

    If the report says the top key cannot dominate a partition
    (``salting_warranted`` False and skew ratio ~1), the thresholds
    are still safe to apply — they only change WHEN AQE splits, never
    results (equivalence pinned in
    tests/test_operators.py::test_apply_skew_policy_sets_confs_and_preserves_results).
    """
    if n_partitions is None:  # explicit 0 is a caller bug, not a default
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    report = skew_report(
        df,
        key_col,
        n_partitions=n_partitions,
        bytes_per_row=bytes_per_row,
    )
    rec = report["recommend"]
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        rec["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"],
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        rec["spark.sql.adaptive.advisoryPartitionSizeInBytes"],
    )
    report["applied"] = True
    return report
