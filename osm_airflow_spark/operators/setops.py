"""Sorts, limits, set operations (SURVEY.md §2.G).

The reference's two TaskGroups load US-states and EU-countries output
into one shared ``osm`` database (/root/reference/osm_etl.py:69-90) —
a union; its dated snapshots (osm_etl.py:13) make intersect/except
the natural change-detection queries between runs.

Scale notes: global sort range-partitions (sampled boundaries), so
it stays parallel; top-k plans as TakeOrderedAndProject (per-partition
heap + driver merge of k rows — no global sort at all). Set ops with
dedup shuffle on the full row; prefer UNION ALL + later dedup-by-key
when rows are wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@query(
    "sort_global",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — global total-order sort (deterministic dump artifacts,
    osm_etl.py:88-91). Range-partitioned: each partition holds a key
    range, sorted locally — parallel even at 100 TB."""
    s = load_table(spark, sf_dir, "supplier")
    return s.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — top-k of a sorted result. Spark plans
    TakeOrderedAndProject: per-partition heaps of k, merged on the
    driver — no full sort, no full shuffle. Tiebreak on the key makes
    the cut deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_linestatus FROM lineitem WHERE l_linestatus = 'F'
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity, l_linestatus FROM lineitem WHERE l_linestatus = 'O'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — positional union (US ∪ EU outputs into one dataset,
    osm_etl.py:69-90). Pure concatenation of partitions: no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_linestatus"
    )
    return li.where(F.col("l_linestatus") == "F").union(li.where(F.col("l_linestatus") == "O"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 — union with duplicate elimination (same element arriving
    from overlapping extracts). UNION's dedup makes the two branches
    algebraically one: distinct(σ_F(t) ⊎ σ_O(t)) = distinct(σ_{F∨O}(t)),
    so the engine plan reads the table ONCE with a pushed IN filter
    instead of two scans feeding a Union (r14, guide §2.4 — this
    build never shares scan subtrees, so the two-branch form really
    paid the scan twice; the oracle keeps the UNION spelling)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderstatus").isin("F", "O"))
        .select("o_custkey", "o_orderpriority")
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 — rows present in both snapshots (customers active in both
    eras — change detection between pgosm_dates, osm_etl.py:13)."""
    o = load_table(spark, sf_dir, "orders")
    before = o.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    after = o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return before.intersect(after)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 — multiset difference between snapshots (customers with
    more early-era orders than late-era ones keep the surplus —
    EXCEPT ALL preserves multiplicities, matching ``exceptAll``)."""
    o = load_table(spark, sf_dir, "orders")
    early = o.where(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    late = o.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return early.exceptAll(late)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5b — multiset intersection: each customer appears
    min(urgent-orders, normal-orders) times — the multiplicity-aware
    twin of G5's INTERSECT (a customer with 3 urgent and 2 normal
    orders shows twice). ``intersectAll`` plans as a count-compare
    aggregation, one shuffle per side on the compared row."""
    o = load_table(spark, sf_dir, "orders")
    hot = o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    cold = o.where(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    return hot.intersectAll(cold)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6b — multiset difference, completing the bag-semantics trio
    (UNION ALL / INTERSECT ALL / EXCEPT ALL): each customer appears
    max(urgent-orders − normal-orders, 0) times. ``exceptAll`` plans
    like ``intersectAll``: tag each side ±1, sum multiplicities per
    row value, replicate the positive remainder — one shuffle per
    side on the compared row, no join explosion; multiplicities ride
    as counts, never materialized duplicates, so a hot key costs a
    bigint not a row storm."""
    o = load_table(spark, sf_dir, "orders")
    hot = o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    cold = o.where(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    return hot.exceptAll(cold)


@query(
    "set_drop_duplicates",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def set_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — key-subset dedup. ``dropDuplicates(subset)`` keeps an
    arbitrary survivor per key — partition-dependent — so the
    deterministic form is: project to the key columns then full-row
    distinct (when survivors matter, use F1's window dedup with an
    explicit tiebreak instead)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").dropDuplicates()


@query(
    "set_symmetric_diff",
    oracle="""
    WITH early AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ),
    late AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT o_custkey, 'early_only' AS side FROM early
    WHERE o_custkey NOT IN (SELECT o_custkey FROM late)
    UNION ALL
    SELECT o_custkey, 'late_only' AS side FROM late
    WHERE o_custkey NOT IN (SELECT o_custkey FROM early)
    """,
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-family completion — SYMMETRIC DIFFERENCE with side
    attribution: customers active in exactly ONE era (early-only
    churned before 1996, late-only are new) — the churn/acquisition
    split a plain EXCEPT hides (set_except keeps only one direction
    and loses which). Tagged UNION of two anti-joins.

    Determinism: pure set membership on exact keys — no arithmetic
    at all; the side tag is a literal.

    Scale: two DISTINCT projections of the same scan (this build
    re-executes shared subtrees — the exchange-reuse ledger — but
    each leg prunes to one column + the pushed date filter), then two
    LEFT ANTI hash joins on the key; at 100 TB both anti-joins
    shuffle on o_custkey once and AQE broadcasts whichever era set
    is small."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01").cast("timestamp")
    early = (
        o.where(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    )
    late = (
        o.where(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    )
    return (
        early.join(late, "o_custkey", "left_anti")
        .select("o_custkey", F.lit("early_only").alias("side"))
        .unionAll(
            late.join(early, "o_custkey", "left_anti").select(
                "o_custkey", F.lit("late_only").alias("side")
            )
        )
    )
