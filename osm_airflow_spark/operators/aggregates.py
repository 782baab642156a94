"""Aggregation operators (SURVEY.md §2.E).

The reference's delegate builds per-layer tables and stats so the
loaded DB is "amenable to efficient querying"
(/root/reference/README.md:70,93). E3 (ordered positional collect) is
the signature OSM semantic: assembling a way's geometry means
collecting member node coordinates *in node_refs order*
(README.md:80) — re-expressed as ``array_sort(collect_list(struct))``
so the result is deterministic under any partitioning.

Scale notes: group-bys are partial+final automatically (map-side
combine), so shuffle volume is one row per (partition, group), not
per input row. Rollup/cube/grouping-sets expand grouping keys before
the shuffle — at 100 TB prefer explicit grouping sets over full cube
when only some combinations are needed. Ordered collect shuffles the
full payload by design; bucket the table by the collect key at write
time to turn it into a zero-shuffle local sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import dsum, query, sql_dsum


@query(
    "agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — hash group-by with sum/avg/min/max/count (TPC-H Q1 shape:
    the per-class feature stats workload)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_disc_price"),
        (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_disc"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_value,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — global (no-group) aggregate: table-wide totals."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_value"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "agg_collect_ordered",
    oracle="""
    SELECT l_orderkey,
           array_to_string(
             list(CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR)
                  ORDER BY l_linenumber, l_quantity), ',') AS qty_seq
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — ordered positional collect: the way-geometry assembly
    semantic (collect member values in node_refs order,
    README.md:80). ``collect_list`` order is partition-dependent, so
    we sort (pos, val) structs *inside* the array — deterministic
    under any shuffle — then strip the position. (l_orderkey,
    l_linenumber) is not unique in the fixture, so the value itself
    is the tiebreak, mirrored in the oracle's ORDER BY. The ordered
    sequence is exposed as a comma-joined fixed-scale string — same
    element order, but scalar-typed so any hash/canonicalize layer
    can compare it (arrays-of-double are not hashable downstream)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("l_linenumber"), F.col("l_quantity")))
            ).alias("pairs")
        )
        .select(
            "l_orderkey",
            F.array_join(
                F.transform(
                    F.col("pairs"),
                    lambda s: s.getField("l_quantity").cast("decimal(18,6)").cast("string"),
                ),
                ",",
            ).alias("qty_seq"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — exact distinct counts per group (expands then dedups
    internally; at 100 TB prefer E5's sketch when exactness is not
    required)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("agg_approx_distinct")  # rows-only: HLL estimate is impl-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — HyperLogLog distinct estimate: the 100 TB path for
    cardinality (fixed sketch memory, one pass, mergeable across
    partitions). Estimates are engine-specific → rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — hierarchical subtotals region → nation → grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — all grouping combinations of two dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — explicit grouping-set list (cheaper than CUBE when only
    named combinations are needed — less pre-shuffle row expansion)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('CASE WHEN l_discount > 0.05 THEN l_extendedprice END')} AS high_disc_price,
           {sql_dsum('CASE WHEN l_discount <= 0.05 THEN l_extendedprice END')} AS low_disc_price,
           COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 — filtered/conditional aggregates (pivot-style measures)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))).alias(
            "high_disc_price"
        ),
        dsum(F.when(F.col("l_discount") <= 0.05, F.col("l_extendedprice"))).alias(
            "low_disc_price"
        ),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("n_bulk"),
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F",
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 — pivot with a pinned value list (implicit value discovery
    is a full extra scan AND non-deterministic column order — always
    pass explicit values, SURVEY.md §7.3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 (extension) — exact interpolated percentiles per group
    (Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    linear-interpolation definition — verified bit-exact). At 100 TB
    exact percentile sorts each group; switch to
    ``approx_percentile`` (t-digest sketch, mergeable, fixed memory)
    when estimates suffice."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 (extension) — unpivot/melt wide measures into (measure,
    value) rows — the inverse of E10's pivot, via ``stack`` inside
    codegen (row expansion, no shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (measure, value)",
    )


@query("agg_approx_percentile")  # rows-only: t-digest estimate is impl-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 (extension) — sketch-based percentile: the 100 TB twin of
    agg_percentile (exact sort-based quantiles don't scale to 10¹²
    rows; the t-digest sketch is one pass, fixed memory, mergeable
    across partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 (extension) — distinct-set collect per group (the tag-value
    vocabulary per element class). collect_set order is partition-
    dependent → always array_sort before exposing; the sorted set is
    emitted comma-joined so the output schema stays scalar."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_qty,
           (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1) AS var_qty,
           sqrt((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15 (extension) — mean/variance/stddev from one-pass sufficient
    statistics (Σx, Σx², n as DECIMAL sums → cast double → identical
    IEEE arithmetic in both engines). The built-in var_samp/stddev
    use engine-specific streaming algorithms whose low bits differ —
    deriving the moments from exact sums is both hash-stable AND the
    mergeable 100 TB form (partials combine by adding the three
    statistics; that is what partial aggregation already does)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    grouped = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(18,6)")).cast("double").alias("_s"),
        F.sum((q * q).cast("decimal(24,6)")).cast("double").alias("_s2"),
    )
    var = (F.col("_s2") - F.col("_s") * F.col("_s") / F.col("n")) / (F.col("n") - 1)
    return grouped.select(
        "l_returnflag",
        "n",
        (F.col("_s") / F.col("n")).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16 (extension) — incremental aggregate maintenance via
    mergeable partial states. The query computes the SAME answer as
    a full groupBy, but the engine path is the incremental-refresh
    one: partial states (count, exact decimal sum, min, max) are
    built separately over the "already materialized" slice (orders
    before 1997) and the "new batch" (1997+), then merged by a
    second aggregation — exactly how a 100 TB nightly pipeline
    avoids rescanning history: store the per-group state, fold each
    new partition in, finalize avg/metrics at read time. Every state
    chosen is an algebraic (commutative-monoid) aggregate, so merge
    order — and therefore partitioning — cannot change the result;
    avg is derived at finalize, never merged. The oracle is the full
    recompute, proving state-merge ≡ recompute."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sum"),
            F.min("o_orderdate").alias("_min"),
            F.max("o_orderdate").alias("_max"),
        )

    states = partial(o.where(F.col("o_orderdate") < cut)).unionByName(
        partial(o.where(F.col("o_orderdate") >= cut))
    )
    merged = states.groupBy("o_orderpriority").agg(
        F.sum("_n").alias("n_orders"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("first_order"),
        F.max("_max").alias("last_order"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("_sum").cast("double").alias("total_price"),
        (F.col("_sum").cast("double") / F.col("n_orders")).alias("avg_price"),
        "first_order",
        "last_order",
    )


@query("agg_hll_partial_merge")  # rows-only: sketch estimates have no SQL twin
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17 (extension) — mergeable HyperLogLog sketches (Apache
    DataSketches via Spark's hll_* functions): per-(type, day)
    sketches of distinct users are built independently, then merged
    per type — the cardinality twin of agg_incremental_merge's exact
    states, and THE pattern for distinct-counting at 100 TB: store
    tiny per-partition sketches, merge on read; never re-scan, never
    shuffle raw ids twice. HLL register merge is max() — associative
    and order-independent — so merging daily sketches is
    bit-identical to one direct build over the month (asserted
    in-query as merge_equals_direct, and pytest-asserted with an
    error bound vs the exact count).

    Output stays scalar: estimates + exact + the equality flag."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "est_direct"
        ),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        F.col("est_merged").cast("long").alias("est_users"),
        F.col("exact_users"),
        (F.col("est_merged") == F.col("est_direct")).alias("merge_equals_direct"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT user_id, event_type AS top_event_type, n
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 (extension) — per-group mode (most frequent value) with a
    total-order tie-break (count DESC, then the value itself — never
    the partition-dependent built-in ``mode``). Count then top-1:
    the window is per-user over ≤5 candidate rows and plans as
    WindowGroupLimit; shuffle carries (group, value) pairs once."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "n")
    )


@query(
    "agg_corr_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(
           (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice
                                     AS DECIMAL(28,4))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
           / sqrt(COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity
                                           AS DECIMAL(24,4))) AS DOUBLE)
                  - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
           / sqrt(COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice
                                           AS DECIMAL(28,4))) AS DOUBLE)
                  - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)),
                 9) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19 (extension) — Pearson correlation from exact decimal
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²), same recipe as
    agg_stats_moments: the built-in ``corr`` accumulates in floating
    point whose partial-merge order varies with partitioning, so it
    is NOT cross-engine (or even cross-partitioning) hash-stable;
    the six decimal sums are exact and mergeable, and the final
    double expression is one deterministic evaluation per group.
    This is also the incremental form — the six statistics fold per
    batch like agg_incremental_merge's states."""
    li = load_table(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_sy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(28,4)")
        ).alias("_sxy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,4)")
        ).alias("_sxx"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,4)")
        ).alias("_syy"),
    )
    n = F.col("n")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    # rounded to 9 dp: DuckDB may contract a*b-c into a fused
    # multiply-add, which differs from Spark's separate ops by one
    # ulp — far below any statistical meaning, so round it away
    corr = F.round(
        (n * sxy - sx * sy)
        / F.sqrt(n * sxx - sx * sx)
        / F.sqrt(n * syy - sy * sy),
        9,
    )
    return grp.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@query(
    "agg_countmin_sketch",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    cells AS (
      SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || word), 1, 8))
                   ::BIGINT % 256 AS bucket,
             COUNT(*) AS cnt
      FROM words, (SELECT unnest([0, 1, 2, 3]) AS j) rows_
      GROUP BY j, bucket
    ),
    probes AS (
      SELECT unnest(['table', 'spark', 'merge', 'window', 'zz-absent'])
               AS word
    ),
    probe_cells AS (
      SELECT p.word, r.j,
             ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' || p.word), 1, 8))
               ::BIGINT % 256 AS bucket
      FROM probes p, (SELECT unnest([0, 1, 2, 3]) AS j) r
    ),
    est AS (
      SELECT pc.word, MIN(COALESCE(c.cnt, 0)) AS cm_est
      FROM probe_cells pc
      LEFT JOIN cells c ON c.j = pc.j AND c.bucket = pc.bucket
      GROUP BY pc.word
    ),
    truth AS (
      SELECT p.word,
             (SELECT COUNT(*) FROM words w WHERE w.word = p.word) AS true_cnt
      FROM probes p
    )
    SELECT t.word, CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(e.cm_est AS BIGINT) AS cm_est
    FROM truth t JOIN est e USING (word)
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext E20 (r8) — COUNT-MIN SKETCH (Cormode & Muthukrishnan
    2005): the fixed-memory heavy-hitters/point-frequency sketch
    beside HLL (distincts) and approx_percentile (quantiles). d=4
    rows x w=256 buckets over the corpus word stream; a word's
    estimate is the MIN of its d counters — always >= the true count
    (one-sided error, pytest-asserted), within eN/w with probability
    1-1/2^d.

    Unlike HLL (agg_hll_partial_merge, rows-only — library sketch
    internals have no SQL twin), count-min is FULLY SQL-oracled: the
    hash family is md5-derived (the llm_sample_weighted recipe —
    exact-int bucket in both engines), so every counter is a
    deterministic exact integer and even the estimates hash-compare.
    The query emits five probe words (the BM25 vocabulary, a midweight
    word, and an absent word) with (true_cnt, cm_est).

    Scale/merge shape: building the sketch is ONE groupBy over
    (row, bucket) — 1024 cells regardless of corpus size (the whole
    point); partial sketches from different partitions/batches merge
    by cell-wise SUM (linearity), which is exactly what Spark's
    partial aggregation already does under this groupBy — the
    mergeability is the plan, not extra code. Probing is a broadcast
    join of d.probe rows against the tiny cell table."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))

    def bucket(word_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), word_col)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 256
        )

    rows_ = F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j")
    cells = (
        words.select("word", rows_)
        .select("j", bucket(F.col("word")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe_words = ["table", "spark", "merge", "window", "zz-absent"]
    probes = spark.createDataFrame([(w,) for w in probe_words], "word string")
    probe_cells = probes.select("word", rows_).select(
        "word", "j", bucket(F.col("word")).alias("bucket")
    )
    est = (
        probe_cells.join(cells, ["j", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )
    truth = (
        probes.join(words.groupBy("word").agg(F.count(F.lit(1)).alias("true_cnt")),
                    "word", "left")
        .select("word", F.coalesce(F.col("true_cnt"), F.lit(0)).alias("true_cnt"))
    )
    return truth.join(est, "word").select("word", "true_cnt", "cm_est")


# ---------------------------------------------------------------------------
# r9 sketches: KMV-style distinct estimation and a Bloom membership
# filter, both with md5-derived hash families so every number is an
# exact integer (or a shared IEEE tree over exact integers) in BOTH
# engines — fully SQL-oracled, unlike the library HLL.
# ---------------------------------------------------------------------------

_KMV_K = 16
_KMV_SCALE = "CAST(1152921504606846976 AS DOUBLE)"  # 2^60, exact int literal


def _kmv_oracle() -> str:
    mins = ",\n             ".join(
        f"MIN(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':{i}'), 1, 15))"
        f"::BIGINT) AS m{i}"
        for i in range(_KMV_K)
    )
    usum = "\n                 + ".join(
        f"(CAST(m{i} AS DOUBLE) + 0.5) / {_KMV_SCALE}" for i in range(_KMV_K)
    )
    return f"""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT user_id) AS exact_distinct,
             {mins}
      FROM events
      GROUP BY ROLLUP (event_type)
    ),
    est AS (
      SELECT event_type, n_rows, exact_distinct,
             ({_KMV_K - 1}.0 / ({usum})) - 1.0 AS kmv
      FROM g
    )
    SELECT event_type,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           kmv AS kmv_estimate,
           (kmv - exact_distinct) / exact_distinct AS rel_err
    FROM est
    """


@query("agg_kmv_distinct", oracle=_kmv_oracle())
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext E21 (r9) — distinct-count SKETCH via k independent minimum
    hashes (the MinCount / k×minwise estimator, Lumbroso 2010; the
    deterministic cousin of agg_approx_distinct's HLL): each of k=16
    md5-derived 60-bit hashes maps users into (0,1), the per-group
    MIN of each behaves as Beta(1,n)≈Exp(n), and S = Σ mins is
    ≈Gamma(k, 1/(n+1)), so n̂ = (k−1)/S − 1 (the unbiased inverse of
    a Gamma scale). Relative error ~1/√(k−2) ≈ 27% at k=16 — the
    test pins a 3-sigma band, and the key emits the EXACT distinct
    beside the estimate so the error is visible, not trusted.

    Mergeability IS the demonstration: the sketch state is 16 MIN
    aggregates, so Spark's map-side partial aggregation merges
    partial sketches cell-wise for free, and the ROLLUP total row is
    literally the UNION sketch of the per-type sketches — merged by
    the same MINs, no extra pass, no special code. That is the whole
    KMV contract at 100 TB: per-partition/per-day sketches union by
    element-wise min.

    Determinism: hash values are exact 60-bit ints (15 md5 hex chars
    — the llm_sample_weighted/countmin recipe); (min+0.5)/2^60 and
    the k-term literal-order sum are a shared IEEE tree; the
    estimator and rel_err are emitted unrounded. COUNT(DISTINCT) per
    group is exact in both engines."""
    e = load_table(spark, sf_dir, "events")

    def h(i: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("user_id").cast("string"), F.lit(f":{i}"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    g = e.rollup("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("exact_distinct"),
        *[F.min(h(i)).alias(f"m{i}") for i in range(_KMV_K)],
    )
    scale = F.lit(2**60).cast("double")
    usum = (F.col("m0").cast("double") + 0.5) / scale
    for i in range(1, _KMV_K):
        usum = usum + (F.col(f"m{i}").cast("double") + 0.5) / scale
    kmv = (F.lit(float(_KMV_K - 1)) / usum) - 1.0
    return g.select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        kmv.alias("kmv_estimate"),
        ((kmv - F.col("exact_distinct")) / F.col("exact_distinct")).alias(
            "rel_err"
        ),
    )


_BLOOM_M = 4096
_BLOOM_J = 3


def _bloom_pos_sql(uid: str, j: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({uid} AS VARCHAR) || '#' || {j}), 1, 8))"
        f"::BIGINT % {_BLOOM_M}"
    )


@query(
    "agg_bloom_probe",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    bits AS (
      SELECT DISTINCT {_bloom_pos_sql('user_id', 'j')} AS pos
      FROM members, (SELECT unnest([0, 1, 2]) AS j) r
    ),
    users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS is_member
      FROM events GROUP BY user_id
    ),
    probe_pos AS (
      SELECT u.user_id, u.is_member,
             {_bloom_pos_sql('u.user_id', 'r.j')} AS pos
      FROM users u, (SELECT unnest([0, 1, 2]) AS j) r
    ),
    probe AS (
      SELECT p.user_id, p.is_member,
             SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS matched
      FROM probe_pos p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY p.user_id, p.is_member
    ),
    stats AS (
      SELECT COUNT(*) AS n_probed,
             SUM(is_member) AS n_members,
             SUM(CASE WHEN matched = {_BLOOM_J} THEN 1 ELSE 0 END) AS n_hits,
             SUM(CASE WHEN matched = {_BLOOM_J} AND is_member = 0
                      THEN 1 ELSE 0 END) AS n_false_pos
      FROM probe
    ),
    nb AS (SELECT COUNT(*) AS n_set_bits FROM bits)
    SELECT {_BLOOM_M} AS m_bits,
           {_BLOOM_J} AS k_hashes,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_set_bits AS BIGINT) AS n_set_bits,
           CAST(n_probed AS BIGINT) AS n_probed,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_false_pos AS BIGINT) AS n_false_pos,
           CASE WHEN n_probed > n_members
                THEN CAST(n_false_pos AS DOUBLE) / (n_probed - n_members)
                END AS fp_rate,
           (CAST(n_set_bits AS DOUBLE) / {_BLOOM_M})
             * (CAST(n_set_bits AS DOUBLE) / {_BLOOM_M})
             * (CAST(n_set_bits AS DOUBLE) / {_BLOOM_M}) AS predicted_fp
    FROM stats, nb
    """,
)
def agg_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext E22 (r9) — BLOOM FILTER build + probe as a relational op
    (Bloom 1970; the shape behind Spark's own runtime bloom-filter
    join pruning, here made inspectable): the 'purchase' users set a
    m=4096-bit filter through j=3 md5-derived positions; EVERY user
    is then probed, and the key reports hits, false positives, the
    measured false-positive rate, and the textbook prediction
    (n_set_bits/m)^j to compare against. No false negatives by
    construction — the test asserts every member hits.

    Relational form: the 'bitmap' is just the DISTINCT position set
    (≤m rows — bounded by the filter size, not the data), so the
    probe is a broadcast LEFT join of probe-positions against it and
    a matched==j count per user. Build state is m-bounded and
    positions are set-union mergeable (DISTINCT of a union — partial
    aggregation does it), which is the 100 TB contract: per-batch
    filters OR together. Probing N users costs one N×j-row broadcast
    join, no shuffle of the events corpus beyond the two
    aggregates.

    Determinism: positions are exact ints from md5 hex (the countmin
    recipe); every reported number is an exact integer except the
    two rates — one exact-int division and one shared three-factor
    product, both emitted unrounded."""
    e = load_table(spark, sf_dir, "events")

    def pos(uid_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            uid_col.cast("string"),
                            F.lit("#"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        )

    js = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_J)])).alias("j")
    bits = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .select("user_id", js)
        .select(pos(F.col("user_id")).alias("pos"))
        .distinct()
        .localCheckpoint(eager=True)  # ≤ m rows; joined AND counted
    )
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("is_member")
    )
    probe = (
        users.select("user_id", "is_member", js)
        .select(
            "user_id", "is_member", pos(F.col("user_id")).alias("pos")
        )
        .join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy("user_id", "is_member")
        .agg(F.count("_hit").alias("matched"))
    )
    stats = probe.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("is_member").alias("n_members"),
        F.sum(
            F.when(F.col("matched") == _BLOOM_J, 1).otherwise(0)
        ).alias("n_hits"),
        F.sum(
            F.when(
                (F.col("matched") == _BLOOM_J) & (F.col("is_member") == 0), 1
            ).otherwise(0)
        ).alias("n_false_pos"),
    )
    nb = bits.agg(F.count(F.lit(1)).alias("n_set_bits"))
    q = F.col("n_set_bits").cast("double") / _BLOOM_M
    return stats.crossJoin(F.broadcast(nb)).select(
        F.lit(_BLOOM_M).cast("int").alias("m_bits"),
        F.lit(_BLOOM_J).cast("int").alias("k_hashes"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_set_bits").cast("long").alias("n_set_bits"),
        F.col("n_probed").cast("long").alias("n_probed"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("n_false_pos").cast("long").alias("n_false_pos"),
        F.when(
            F.col("n_probed") > F.col("n_members"),
            F.col("n_false_pos").cast("double")
            / (F.col("n_probed") - F.col("n_members")),
        ).alias("fp_rate"),
        (q * q * q).alias("predicted_fp"),
    )


@query(
    "agg_trimmed_mean",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             COUNT(*) // 20 AS k,
             list_sort(list(CAST(l_extendedprice AS DECIMAL(18,2)))) AS arr,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           total / n AS raw_mean,
           CAST(list_sum(arr[k + 1 : n - k]) AS DOUBLE) / (n - 2 * k)
             AS trimmed_mean,
           CAST(list_sum(arr[k + 1 : n - k])
                + k * (arr[k + 1] + arr[n - k]) AS DOUBLE) / n AS winsor_mean
    FROM g
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext E23 (r11) — ROBUST location per group: the 5% two-sided
    TRIMMED mean (drop the k = n div 20 smallest and largest) and the
    WINSORIZED mean (clamp them to the k+1-th / n-k-th values)
    beside the raw mean — the outlier-resistant aggregates a metrics
    platform reports when means move on whale activity (Tukey; the
    despike sibling of win_hampel_outliers, which edits points —
    these edit the AGGREGATE).

    Exactness: the sorted group is a DECIMAL array, the trimmed sum
    is an in-array decimal fold (exact at any order), the winsorized
    correction k·(lo+hi) is integer×decimal, and each mean is ONE
    double cast + division — hash-exact, where any float prefix sum
    would not be. k = n div 20 in integer arithmetic; k = 0
    degenerates all three means to equal, n = 1 keeps the slice
    non-empty (n-2k >= 0.9n).

    Scale: like agg_percentile this materializes one GROUP in memory
    (fine at bounded group count; 3 return flags here). For
    high-cardinality groups or 100 TB groups, trim via two
    approx_percentile cut values + conditional aggregation — the
    sketch path, conservative at the trim boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(
            F.collect_list(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).alias("arr"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
    return grp.selectExpr(
        "l_returnflag",
        "n",
        "n div 20 AS k",
        "total / n AS raw_mean",
        """CAST(aggregate(slice(arr, CAST(n div 20 + 1 AS INT),
                                CAST(n - 2 * (n div 20) AS INT)),
                          CAST(0 AS DECIMAL(38,2)),
                          (acc, x) -> acc + CAST(x AS DECIMAL(38,2)))
                AS DOUBLE) / (n - 2 * (n div 20)) AS trimmed_mean""",
        """CAST(aggregate(slice(arr, CAST(n div 20 + 1 AS INT),
                                CAST(n - 2 * (n div 20) AS INT)),
                          CAST(0 AS DECIMAL(38,2)),
                          (acc, x) -> acc + CAST(x AS DECIMAL(38,2)))
                + (n div 20) * (element_at(arr, CAST(n div 20 + 1 AS INT))
                                + element_at(arr, CAST(n - n div 20 AS INT)))
                AS DOUBLE) / n AS winsor_mean""",
    )


@query(
    "agg_moments",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS prio,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
    ),
    pw AS (
      SELECT prio, p,
             CAST(CAST(p AS DECIMAL(19,2)) * CAST(p AS DECIMAL(19,2))
                  AS DECIMAL(19,4)) AS p2
      FROM x
    ),
    sums AS (
      SELECT prio,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p) AS DECIMAL(38,2)) AS s1,
             CAST(SUM(p2) AS DECIMAL(38,4)) AS s2,
             CAST(SUM(CAST(p2 AS DECIMAL(28,4))
                      * CAST(p AS DECIMAL(10,2))) AS DECIMAL(38,6)) AS s3,
             CAST(SUM(CAST(p2 AS DECIMAL(19,4))
                      * CAST(p2 AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s4
      FROM pw GROUP BY prio
    ),
    mom AS (
      SELECT prio, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM sums
    ),
    cen AS (
      SELECT prio, n, mu,
             r2 - mu * mu AS m2,
             r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                - 3.0 * mu * mu * mu * mu AS m4
      FROM mom
    )
    SELECT prio, n,
           round(mu, 6) + 0.0 AS mean_price,
           CASE WHEN m2 > 0 THEN
             round(m3 / sqrt(m2 * m2 * m2), 9) + 0.0 END AS skewness,
           CASE WHEN m2 > 0 THEN
             round(m4 / (m2 * m2) - 3.0, 9) + 0.0 END AS excess_kurtosis
    FROM cen
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r13) — population SKEWNESS and EXCESS KURTOSIS of
    order value per priority class: the shape moments beside the
    existing mean/σ screens (is the value distribution fat-tailed or
    lopsided per segment — the pricing-anomaly cousin of
    pipeline_jarque_bera, which consumes exactly these two numbers).

    Determinism: the four raw power sums are EXACT decimals — prices
    are cents-exact DECIMAL(18,2); p² binds (19,2)×(19,2)→(38,4) in
    DuckDB (its multiply does NOT widen, the r13 ledger rule, so
    operands are pre-cast) and (39→38,4) losslessly in Spark; p³/p⁴
    build from p² with operand widths chosen so BOTH engines keep
    exact integers under the 38-digit cap through sf~1 (Σp⁴ ≈ 6·10²⁸
    at sf0.1, scale 8 → 37 digits; the documented headroom knob is
    dollars-not-cents quantization). Central moments derive from the
    raw sums in ONE shared IEEE tree per engine (>2^53 decimal→double
    casts can split an ulp — the 9-dp ratio emission absorbs it);
    zero-variance groups emit NULL, never NaN.

    Scale: one corpus pass, one 5-group aggregate — partial
    aggregation does the map-side combine; no joins, no windows."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    pw = o.select(
        F.col("o_orderpriority").alias("prio"),
        p.alias("p"),
        (p.cast("decimal(19,2)") * p.cast("decimal(19,2)"))
        .cast("decimal(19,4)")
        .alias("p2"),
    )
    sums = pw.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("decimal(38,2)").alias("s1"),
        F.sum("p2").cast("decimal(38,4)").alias("s2"),
        F.sum(
            F.col("p2").cast("decimal(28,4)") * F.col("p").cast("decimal(10,2)")
        )
        .cast("decimal(38,6)")
        .alias("s3"),
        F.sum(
            F.col("p2").cast("decimal(19,4)") * F.col("p2").cast("decimal(19,4)")
        )
        .cast("decimal(38,8)")
        .alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    cen = sums.select(
        "prio", "n",
        mu.alias("mu"),
        (r2 - mu * mu).alias("m2"),
        (r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu).alias("m3"),
        (
            r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu
        ).alias("m4"),
    )
    return cen.select(
        "prio",
        "n",
        (F.round(F.col("mu"), 6) + F.lit(0.0)).alias("mean_price"),
        F.when(
            F.col("m2") > 0,
            F.round(
                F.col("m3")
                / F.sqrt(F.col("m2") * F.col("m2") * F.col("m2")),
                9,
            )
            + F.lit(0.0),
        ).alias("skewness"),
        F.when(
            F.col("m2") > 0,
            F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 9)
            + F.lit(0.0),
        ).alias("excess_kurtosis"),
    )


_WM_FLAGS = ["A", "N", "R"]


@query(
    "agg_weighted_median",
    oracle=f"""
    WITH by_val AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             {', '.join(
                 "CAST(SUM(CASE WHEN l_returnflag = '" + f + "' "
                 "THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)"
                 f" AS w_{f.lower()}"
                 for f in _WM_FLAGS)}
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT cents,
             {', '.join(
                 f"w_{f.lower()}, "
                 f"SUM(w_{f.lower()}) OVER (ORDER BY cents)"
                 f" AS run_{f.lower()}"
                 for f in _WM_FLAGS)}
      FROM by_val
    ),
    tot AS (
      SELECT {', '.join(
          f'CAST(SUM(w_{f.lower()}) AS BIGINT) AS t_{f.lower()}'
          for f in _WM_FLAGS)}
      FROM by_val
    ),
    sel AS (
      SELECT {', '.join(
          f"MIN(CASE WHEN run_{f.lower()} >= (t_{f.lower()} + 1) // 2 "
          f"THEN cents END) AS med_{f.lower()}"
          for f in _WM_FLAGS)}
      FROM cum, tot
    )
    SELECT u.flag AS l_returnflag, u.total_qty, u.median_price
    FROM (
      SELECT * FROM sel, tot
    ) s, LATERAL (VALUES
      {', '.join(
          f"('{f}', s.t_{f.lower()},"
          f" CAST(s.med_{f.lower()} AS DOUBLE) / 100.0)"
          for f in _WM_FLAGS)}
    ) AS u(flag, total_qty, median_price)
    WHERE u.total_qty > 0
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — exact WEIGHTED MEDIAN (lower-median convention):
    the price at which half the shipped QUANTITY sits below, per
    return flag — the inventory-weighted sibling of agg_percentile's
    row-weighted quantiles (a handful of huge orders can't drag it;
    a cheap high-volume SKU can). Convention: smallest value v with
    cumweight(v) ≥ ⌈W/2⌉ — for even W this is the lower weighted
    median, so the result is always an observed price.

    Exactness: prices quantize once to exact integer cents (2-dp by
    TPC-H construction), quantities are integral BIGINTs; the
    per-flag cumulative runs over the bounded distinct-value table
    via bucket-offsets (flags ride as a wide pivot so one pass serves
    all three), the crossing position (W+1)//2 is an exact
    control-plane literal from ``bucketed_running``'s totals, and the
    selection MIN over the monotone cumulative is pure — the only
    double is the final cents/100 emission.

    Scale: one corpus pass to distinct (price → per-flag weights);
    everything after is distinct-value-bounded (pre-quantize
    continuous values at 100 TB — the kruskal note)."""
    from osm_airflow_spark.bucketing import bucketed_running

    li = load_table(spark, sf_dir, "lineitem")
    wcols = [f"w_{f.lower()}" for f in _WM_FLAGS]
    by_val = (
        li.groupBy(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents")
        )
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("l_returnflag") == f,
                        F.col("l_quantity").cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                )
                .cast("long")
                .alias(f"w_{f.lower()}")
                for f in _WM_FLAGS
            ]
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    out, totals = bucketed_running(by_val, "cents", wcols)
    sel = out.agg(
        *[
            F.min(
                F.when(
                    F.col(f"run_w_{f.lower()}")
                    >= F.lit((totals[f"w_{f.lower()}"] + 1) // 2),
                    F.col("cents"),
                )
            ).alias(f"med_{f.lower()}")
            for f in _WM_FLAGS
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f).alias("flag"),
                    F.lit(totals[f"w_{f.lower()}"])
                    .cast("long")
                    .alias("total_qty"),
                    (F.col(f"med_{f.lower()}").cast("double") / 100.0).alias(
                        "median_price"
                    ),
                )
                for f in _WM_FLAGS
            ]
        )
    )
    return (
        sel.select(rows.alias("r"))
        .select(
            F.col("r.flag").alias("l_returnflag"),
            F.col("r.total_qty").alias("total_qty"),
            F.col("r.median_price").alias("median_price"),
        )
        .where(F.col("total_qty") > 0)
    )


@query(
    "agg_histogram",
    oracle="""
    WITH ext AS (
      SELECT CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS lo,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM orders
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) - e.lo AS DOUBLE)
               / (CAST(e.hi - e.lo AS DOUBLE) / 20.0)) AS BIGINT), 19)
               AS bin,
             e.n_total, CAST(e.lo AS DOUBLE) AS lo_d,
             CAST(e.hi - e.lo AS DOUBLE) / 20.0 AS w
      FROM orders, ext e
      WHERE e.hi > e.lo
    )
    SELECT CAST(bin AS INT) AS bin,
           lo_d + bin * w AS bin_low,
           lo_d + (bin + 1) * w AS bin_high,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) / n_total AS share
    FROM binned
    GROUP BY bin, lo_d, w, n_total
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — equi-width HISTOGRAM (20 bins) of order totals
    with DATA-DRIVEN edges: the profiling aggregate beside
    agg_percentile (quantiles say where the mass is, the histogram
    says what the shape is) — and the distributed-scalar shape: the
    min/max extent rides as a broadcast 1-row aggregate
    cross-joined into the binning expression, never a driver-side
    collect (the pagerank |V| doctrine).

    Determinism: the extent is exact decimal selection; bin
    assignment is FLOOR over one shared IEEE tree of exact-decimal-
    derived doubles (no rounding boundary — FLOOR is exact; ties at
    a bin edge land identically in both engines because the doubles
    are bit-identical), clamped so x = max lands in the last bin.
    Edges and share are shared trees over the same agreed doubles,
    unrounded. A degenerate single-value corpus (hi = lo) emits zero
    rows in both engines rather than a zero-width division.

    Scale: two corpus passes (extent + counts — Spark cannot reuse
    the scan subtree, the exchange-reuse ledger), 20-row output; at
    100 TB the extent pass prunes to one column."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    ext = o.agg(
        F.min(price).alias("lo"),
        F.max(price).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    w = (F.col("hi") - F.col("lo")).cast("double") / 20.0
    binned = (
        o.join(F.broadcast(ext))
        .where(F.col("hi") > F.col("lo"))
        .select(
            F.least(
                F.floor(
                    (price - F.col("lo")).cast("double") / w
                ).cast("long"),
                F.lit(19).cast("long"),
            ).alias("bin"),
            F.col("n_total"),
            F.col("lo").cast("double").alias("lo_d"),
            w.alias("w"),
        )
    )
    return binned.groupBy("bin", "lo_d", "w", "n_total").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(
        F.col("bin").cast("int").alias("bin"),
        (F.col("lo_d") + F.col("bin") * F.col("w")).alias("bin_low"),
        (F.col("lo_d") + (F.col("bin") + 1) * F.col("w")).alias("bin_high"),
        "n",
        (F.col("n").cast("double") / F.col("n_total")).alias("share"),
    )
