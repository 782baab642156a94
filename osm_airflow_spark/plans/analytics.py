"""Composed analytics pipelines: full multi-operator queries in the
classic warehouse shapes (TPC-H Q1/Q3/Q5/Q10 silhouettes, adapted to
the fixture schema).

The reference's end state is a database "amenable to efficient
querying" (/root/reference/README.md:70); these are the queries that
end state exists for — each one composes scan → filter → join →
aggregate → sort from the §2 operator inventory into a single
Catalyst-optimized plan, proving the operators compose, not just
pass in isolation.

Scale notes: every pipeline keeps dims broadcast, facts pruned at
the scan (date filters push down), and aggregates decimal-exact.
These four are the bench.py headliners most representative of the
100 TB workload mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import dsum, query, sql_dsum


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "pipeline_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pipeline_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape — pricing summary report: one wide scan, 8 aggregates,
    tiny output. The canonical partial-aggregation showcase: shuffle
    carries 6 groups × 9 values no matter how many input rows."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_rev(), 4).alias("sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / n).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / n).alias(
                "avg_price"
            ),
            (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "pipeline_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def pipeline_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape — unshipped-orders revenue ranking: selective dim
    filter → two joins → per-order aggregate → top-10. Customer
    filter broadcasts; both date predicates push to the scans."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "pipeline_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def pipeline_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape — local-supplier volume: five joins including the
    customer-nation = supplier-nation equality, one year of orders,
    revenue per nation. The join-reorder stress test."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "pipeline_top_returning_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def pipeline_top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — returned-item revenue by customer: who returned
    the most value in a quarter. Join-heavy with a top-k tail."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "pipeline_small_quantity_revenue",
    oracle=f"""
    SELECT p_brand,
           {sql_dsum('l_extendedprice', 2)} AS small_lot_revenue,
           COUNT(*) AS n_small_lots
    FROM lineitem l1
    JOIN part ON l_partkey = p_partkey
    WHERE l_quantity < 0.5 * (SELECT AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l1.l_partkey)
    GROUP BY p_brand
    """,
)
def pipeline_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — correlated scalar subquery: lineitems under half
    their part's average quantity. Catalyst decorrelates the subquery
    into an aggregate + join (no per-row re-execution — the thing a
    naive engine gets catastrophically wrong at scale). l_quantity is
    integer-valued so the average is summation-order exact."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q17")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_q17")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_lot_revenue,
               COUNT(*) AS n_small_lots
        FROM li_q17 l1
        JOIN part_q17 ON l_partkey = p_partkey
        WHERE l_quantity < 0.5 * (SELECT AVG(l2.l_quantity)
                                  FROM li_q17 l2
                                  WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY p_brand
        """
    )


@query(
    "pipeline_nation_trade",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS trade_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, CAST(year(o_orderdate) AS INT)
    """,
)
def pipeline_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — cross-nation trade volume: the same dimension table
    joined twice under different roles (customer's nation vs
    supplier's nation), anti-diagonal filter, per-year rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("trade_year"))
        .agg(dsum(_rev(), 4).alias("volume"))
    )


@query(
    "pipeline_priority_fulfillment",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(CASE WHEN late THEN 1 END) AS n_with_late_item
    FROM (
      SELECT o_orderkey, o_orderpriority,
             EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_orderpriority
    """,
)
def pipeline_priority_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — per-priority fulfillment check: orders with ≥1 item
    shipped >90 days after ordering. The correlated EXISTS plans as a
    left-semi join feeding a flag — no row multiplication."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late_keys = (
        o.select("o_orderkey", "o_orderdate")
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
            "left_semi",
        )
        .select(F.col("o_orderkey").alias("late_key"))
    )
    flagged = o.join(late_keys, F.col("o_orderkey") == F.col("late_key"), "left").select(
        "o_orderpriority", F.col("late_key").isNotNull().alias("late")
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("late"), F.lit(1))).alias("n_with_late_item"),
    )


@query(
    "pipeline_priority_class_share",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count,
           {sql_dsum('l_extendedprice', 2)} AS shipped_value
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY CAST(year(l_shipdate) AS INT)
    """,
)
def pipeline_priority_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — priority-class split per ship year: conditional
    counts over a fact⋈dim join with a pushed date band."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
            dsum("l_extendedprice").alias("shipped_value"),
        )
    )


@query(
    "pipeline_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS potential_revenue,
           COUNT(*) AS n_qualifying
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def pipeline_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape — the minimal plan: one scan, three pushed
    predicates, one global aggregate. Every filter reaches the
    Parquet reader; the whole query is a single codegen stage plus a
    one-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_qualifying"),
        )
    )


@query(
    "pipeline_branded_discounts",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10 AND 40)
    """,
)
def pipeline_branded_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — OR-of-conjunctions mixing join-side and fact-side
    predicates: Catalyst must split the disjunction so the common
    part-side terms still prune the broadcast build side while the
    residual evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(5, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(10, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            dsum(_rev(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "pipeline_market_share",
    oracle=f"""
    SELECT trade_year,
           CAST(SUM(CAST(CASE WHEN r_name = 'ASIA'
                         THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(18,4)))
                AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS asia_share,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS trade_year,
             l_extendedprice, l_discount, r_name
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1999-01-01'
    )
    GROUP BY trade_year
    """,
)
def pipeline_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — market share: a ratio of conditional aggregate to
    total aggregate in one group-by (nested-aggregation silhouette).
    Both numerator and denominator decimal-sum before one double
    division — exact under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = _rev()
    asia_rev = F.when(F.col("r_name") == "ASIA", rev)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("trade_year"))
        .agg(
            (
                F.sum(asia_rev.cast("decimal(18,4)")).cast("double")
                / F.sum(rev.cast("decimal(18,4)")).cast("double")
            ).alias("asia_share"),
            dsum(rev, 4).alias("total_volume"),
        )
    )


@query(
    "pipeline_order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def pipeline_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 silhouette — customer order-count distribution
    INCLUDING zero-order customers: the left join with the filter in
    the JOIN CONDITION (not a WHERE, which would silently turn the
    join inner), then a double aggregation. First groupBy shuffles on
    c_custkey; the second is over ≤ a few hundred distinct counts —
    negligible. At 100 TB broadcast customer? No — both sides are
    large; this is the legitimate big-big shuffle join, bucketable on
    the customer key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "pipeline_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def pipeline_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 silhouette — large-volume orders: IN over a
    GROUP BY ... HAVING subquery, expressed as an aggregate-then-
    semi-join. The qualifying-keys set aggregates lineitem once
    (partial-agg shuffle), is tiny after HAVING, and semi-joins back
    — Catalyst turns it into a LeftSemi with the aggregate
    broadcast when it fits."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(qualifying, F.col("o_orderkey") == qualifying["l_orderkey"], "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "pipeline_waiting_multi_supplier",
    oracle="""
    SELECT l1.l_suppkey AS suppkey, COUNT(*) AS n_waiting
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY l1.l_suppkey
    """,
)
def pipeline_waiting_multi_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 silhouette — the sole late supplier on multi-
    supplier finished orders: one correlated EXISTS plus one
    correlated NOT EXISTS over the same fact, the hardest
    decorrelation shape in the suite. Expressed as a per-order
    aggregate (suppliers present / suppliers late) joined back once —
    ONE extra shuffle over lineitem replaces two correlated
    re-scans; each EXISTS/NOT EXISTS becomes a column predicate on
    the aggregate."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_returnflag") == "R"
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supps"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    # EXISTS other-supplier  → n_supps > 1
    # NOT EXISTS other-late  → exactly one late supplier overall
    qualifying = per_order.where(
        (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
    ).select("l_orderkey", "late_supp")
    waiting = (
        li.where(late)
        .join(qualifying, "l_orderkey")
        .where(F.col("l_suppkey") == F.col("late_supp"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    return waiting.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("n_waiting")
    )


@query(
    "pipeline_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    ),
    n AS (SELECT (SELECT COUNT(*) FROM v) AS n1,
                 (SELECT COUNT(*) FROM c) AS n2,
                 (SELECT COUNT(*) FROM p) AS n3)
    SELECT 1 AS step_order, 'view' AS step, n1 AS n_users,
           CAST(NULL AS DOUBLE) AS conversion FROM n
    UNION ALL
    SELECT 2, 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM n
    UNION ALL
    SELECT 3, 'purchase', n3, CAST(n3 AS DOUBLE) / n2 FROM n
    """,
)
def pipeline_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel over the event stream: users who viewed,
    then clicked strictly after their first view, then purchased
    strictly after that click — the product-analytics query shape
    (strict event ordering per user, not mere co-occurrence).

    Shape (the r4 rewrite: 26 exchanges → 3): ONE shuffle of events
    by user_id into a conditional aggregation that keeps first-view
    plus the sorted click/purchase timestamps; the strict ordering
    then runs as pure array expressions (t2 = min click after t1,
    t3 = min purchase after t2 — null-propagating: filter over a
    null bound yields an empty array, array_min of empty is null),
    and the three funnel counts collapse into one global aggregate.
    The earlier chained-joins version re-derived each stage's subtree
    (this Spark build never reuses exchanges), scanning events four
    times; this scans once. Per-user array state is bounded by that
    user's click/purchase count — the same O(events-per-user) bound
    every per-user sessionization op carries; a degenerate bot user
    is capped by upstream hygiene, not this operator."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    staged = per_user.withColumn(
        "t2", F.array_min(F.filter("clicks", lambda x: x > F.col("t1")))
    ).withColumn(
        "t3", F.array_min(F.filter("purchases", lambda x: x > F.col("t2")))
    )
    funnel = staged.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return funnel.selectExpr(
        """stack(3,
             1, 'view',     n1, CAST(NULL AS DOUBLE),
             2, 'click',    n2, CAST(n2 AS DOUBLE) / n1,
             3, 'purchase', n3, CAST(n3 AS DOUBLE) / n2
           ) AS (step_order, step, n_users, conversion)"""
    )


@query(
    "pipeline_retention_cohort",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
    ),
    activity AS (
      SELECT f.cohort_day, d.day - f.cohort_day AS day_offset, d.user_id
      FROM days d JOIN firsts f USING (user_id)
    ),
    cells AS (
      SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_active
      FROM activity GROUP BY cohort_day, day_offset
    ),
    sizes AS (
      SELECT cohort_day, n_active AS cohort_size FROM cells WHERE day_offset = 0
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           c.day_offset, c.n_active, s.cohort_size,
           CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM cells c JOIN sizes s USING (cohort_day)
    """,
)
def pipeline_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    tracked by day offset — the standard growth-analytics triangle.
    day_offset is exact integer date arithmetic (no week-truncation,
    whose start-of-week convention differs across engines).

    Shape (r4: windows, not branch-joins — this Spark build never
    reuses a shared exchange, so groupBy-then-join-back re-derived
    the whole upstream subtree each time, scanning events thrice):
    distinct (user, day) once → per-user MIN window for the cohort
    day (partition = one user's distinct days) → count-distinct per
    (cohort, offset) cell → per-cohort window for cohort size
    (partition = one cohort's offsets, ≤ day span). ONE scan; the
    only wide shuffle carries distinct user-days; the cell matrix is
    days² — control-plane sized."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = F.min("day").over(Window.partitionBy("user_id"))
    activity = days.withColumn("cohort_day", cohort).select(
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        "user_id",
    )
    cells = activity.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    size_w = Window.partitionBy("cohort_day")
    cells = cells.withColumn(
        "cohort_size",
        F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(size_w),
    )
    return cells.select(
        # ISO string, not DATE: date cells stringify differently across
        # engines' canonicalizers (DATE vs midnight TIMESTAMP)
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


@query(
    "pipeline_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'create'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'modify' END AS change_op,
           CAST(o.o_totalprice AS DOUBLE) AS old_price,
           CAST(n.o_totalprice AS DOUBLE) AS new_price
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction between two snapshot states (deterministic
    fixture slices standing in for week N / week N+1): the minimal
    create/modify/delete feed that upgrades a full-rebuild pipeline
    to incremental — see ``plans/merge.snapshot_diff`` for the scale
    contract (one key-partitioned full outer join, feed is
    O(changes); roundtrip with ``apply_diff`` is property-tested)."""
    from osm_airflow_spark.plans.merge import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    d = snapshot_diff(old, new, "o_orderkey", ["o_totalprice"])
    return d.select(
        "o_orderkey",
        "change_op",
        F.col("_old_o_totalprice").cast("double").alias("old_price"),
        F.col("_new_o_totalprice").cast("double").alias("new_price"),
    )


@query(
    "pipeline_date_spine",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, day
    )
    SELECT t.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(a.n, 0) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = s.day
    """,
)
def pipeline_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: every (event_type, day) cell over the
    observed span, zero-filled — the reporting prerequisite (moving
    averages and charts break on missing days). The spine is
    ``sequence(min, max)`` exploded from a 1-row aggregate — control
    plane, like win_ntile's cut points; the only real shuffle is the
    daily count. The spine×types cross join is dim×dim (days ×
    5 types). Day is emitted as an ISO string (DATE cells stringify
    differently across engine canonicalizers)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day"), "event_type")
    span = days.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = days.select("event_type").distinct()
    actual = days.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(types)
        .join(actual, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "pipeline_market_basket",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    pair_counts AS (
      SELECT part_a, part_b, COUNT(*) AS support
      FROM pairs GROUP BY part_a, part_b
    ),
    item_counts AS (
      SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT o_orderkey) AS n_total FROM orders)
    SELECT p.part_a, p.part_b, p.support,
           CAST(p.support AS DOUBLE) * n_total
             / (ia.n_orders * ib.n_orders) AS lift
    FROM pair_counts p
    JOIN item_counts ia ON ia.l_partkey = p.part_a
    JOIN item_counts ib ON ib.l_partkey = p.part_b
    CROSS JOIN n
    WHERE p.support >= 2
    """,
)
def pipeline_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs ordered together, with
    support and lift — the association-rules primer (the full Apriori
    loop just iterates this shape). The self-join is keyed on
    l_orderkey, so the quadratic term is per-basket (≤ items²/order,
    single digits here), never corpus-wide — the same bounded-block
    discipline as er_blocked_match; support ≥ 2 prunes the long
    tail before the (broadcastable) item-frequency join-back. Lift's
    division is double-only: integer counts in, one IEEE division
    out — engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pair_counts = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
    )
    item_counts = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    # 1-row in-plan aggregate (trade_edges pattern), not a driver-side
    # .count(): the basket total rides broadcast into the lift math
    # and the count branch prunes to a key-only scan
    n_total = o.agg(F.count_distinct("o_orderkey").alias("n_total"))
    ia = item_counts.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_a")
    )
    ib = item_counts.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(n_total))
        .select(
            "part_a",
            "part_b",
            "support",
            (
                F.col("support").cast("double")
                * F.col("n_total")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


@query(
    "pipeline_data_quality",
    oracle="""
    SELECT 'orders_custkey_null' AS check_name,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
    UNION ALL
    SELECT 'orders_orderkey_unique',
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    """,
)
def pipeline_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Deequ / Great Expectations
    shape — Deequ itself is a Spark library, so this is the native
    formulation): completeness (null rate), uniqueness (count vs
    distinct), referential integrity (anti-join orphans), and two
    range constraints, emitted as one (check_name, n_violations)
    report the pipeline gates publishes on.

    Scale: each check is a single-pass aggregate or an anti-join on
    the key it guards — no check materializes violating rows (count
    first, sample violators separately only when a gate trips). The
    five 1-row aggregates union into a control-plane-sized report;
    at 100 TB the scan-bound checks on the same table share one pass
    via a multi-aggregate (as the null/range checks on orders do
    here)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # one pass over orders for all orders-scoped expectations
    o_stats = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nulls"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dupes"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos"),
    )
    orphans = li.join(
        o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    disc = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(
                0
            )
        ).alias("n")
    )
    report = (
        o_stats.select(
            F.lit("orders_custkey_null").alias("check_name"),
            F.col("nulls").cast("long").alias("n_violations"),
        )
        .unionByName(
            o_stats.select(
                F.lit("orders_orderkey_unique").alias("check_name"),
                F.col("dupes").cast("long").alias("n_violations"),
            )
        )
        .unionByName(
            orphans.select(
                F.lit("lineitem_orphan_orderkey").alias("check_name"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )
        .unionByName(
            disc.select(
                F.lit("lineitem_discount_range").alias("check_name"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )
        .unionByName(
            o_stats.select(
                F.lit("orders_totalprice_positive").alias("check_name"),
                F.col("nonpos").cast("long").alias("n_violations"),
            )
        )
    )
    return report


@query(
    "pipeline_time_travel",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0
                THEN CAST(o_totalprice * 1.1 AS DOUBLE)
                ELSE CAST(o_totalprice AS DOUBLE) END AS price
    FROM orders
    WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
    """,
)
def pipeline_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through an SCD2 history built in-engine: an
    initial snapshot (orders slice, open versions at 1995) merged
    with one change batch at 1999 (modify every %3 key to price×1.1,
    delete every %7 key — keys hitting both exercise the
    delete-beats-modify same-timestamp tie-break), then read back
    as-of 2000. The oracle states the expected end state directly —
    so the whole merge→close→append→interval-read machinery
    (plans/merge.py: scd2_merge + snapshot_as_of, the relational
    form of the reference's --pgosm-date snapshot pinning,
    osm_etl.py:13) is hash-checked, not just pytest-checked.
    Scale contract is scd2_merge's: shuffle O(batch + touched keys),
    never O(history)."""
    from osm_airflow_spark.plans.merge import scd2_merge, snapshot_as_of

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    history = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    ts = F.lit("1999-01-01").cast("timestamp")
    modifies = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("double") * 1.1).alias("price"),
            ts.alias("change_ts"),
            F.lit("modify").alias("change_op"),
        )
    )
    deletes = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit(None).cast("double").alias("price"),
            ts.alias("change_ts"),
            F.lit("delete").alias("change_op"),
        )
    )
    merged = scd2_merge(history, modifies.unionByName(deletes), "o_orderkey")
    return snapshot_as_of(merged, "2000-01-01").select("o_orderkey", "price")


# ---------------------------------------------------------------------------
# TPC Q2/Q11/Q15 silhouettes over a DERIVED partsupp. The fixtures
# lack a partsupp table, so one derives deterministically from
# lineitem (observed supplier×part supply: total quantity ever
# shipped as availability, minimum unit price as supply cost) — the
# same fixture-derivation trick the OSM queries use, giving the three
# classic decorrelation shapes (min-per-group correlation, HAVING
# against a global scalar, equality-with-MAX subquery) hash-checked
# oracle entries.
# ---------------------------------------------------------------------------

_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS ps_availqty,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp ← lineitem: availqty = exact decimal sum of shipped
    quantity, supplycost = minimum observed line price. The cost is
    deliberately comparison-only (no derived arithmetic): an earlier
    min-UNIT-price variant rounded the IEEE division to 6 dp and the
    two engines disagreed in the last digit on boundary values at
    sf0.1 — Spark's double→decimal goes through the shortest-string
    representation (BigDecimal.valueOf), DuckDB through the exact
    binary value, and a quotient landing near x.xxxxxx5 splits them.
    MIN over untouched stored doubles is bit-identical everywhere.
    One shuffle on (part, supp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        dsum("l_quantity").alias("ps_availqty"),
        F.min("l_extendedprice").alias("ps_supplycost"),
    )


@query(
    "pipeline_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eligible AS (
      SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN part p     ON ps.ps_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY' AND p.p_size < 25
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ps_partkey
                                   ORDER BY ps_supplycost, ps_suppkey) AS rn
      FROM eligible
    )
    SELECT ps_partkey AS p_partkey, ps_suppkey AS s_suppkey, s_name,
           n_name, ps_supplycost AS supplycost, s_acctbal
    FROM ranked WHERE rn = 1
    """,
)
def pipeline_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 silhouette — cheapest supplier per part within a region,
    for a part-type/size slice. The classic correlated MIN subquery
    decorrelates into a per-part window rank (row_number = 1 with a
    (cost, suppkey) total order — float ties cannot make the answer
    partition-dependent). All dims broadcast; the only shuffles are
    the partsupp derivation and the per-part rank, both ∝ supplier×
    part pairs. WindowGroupLimit caps the rank map-side."""
    from pyspark.sql import Window

    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eligible = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(
                p.where((F.col("p_type") == "ECONOMY") & (F.col("p_size") < 25))
            ),
            ps.ps_partkey == p.p_partkey,
        )
    )
    w = Window.partitionBy("ps_partkey").orderBy("ps_supplycost", "ps_suppkey")
    return (
        eligible.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("ps_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            F.col("ps_supplycost").alias("supplycost"),
            "s_acctbal",
        )
    )


@query(
    "pipeline_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    national AS (
      SELECT ps.ps_partkey,
             CAST(ps.ps_supplycost AS DECIMAL(18,2))
               * CAST(ps.ps_availqty AS DECIMAL(18,2)) AS v
      FROM ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    total AS (SELECT SUM(v) AS tot, COUNT(DISTINCT ps_partkey) AS np
              FROM national)
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
    FROM national CROSS JOIN total
    GROUP BY ps_partkey, tot, np
    HAVING CAST(SUM(v) AS DOUBLE) > CAST(tot AS DOUBLE) * 3.0 / np
    """,
)
def pipeline_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 silhouette — parts whose national stock value exceeds 3×
    the average per-part share (scale-relative, like trade_edges'
    floor, so the result stays comparably selective at every SF
    instead of emptying as part count grows). The HAVING-against-a-
    global-scalar decorrelates into a broadcast-cross-joined 1-row
    aggregate. Values sum in decimal (exact, order-free) per
    CLAUDE.md; the threshold compare is one identical IEEE expression
    on both engines over those exact sums."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.where(F.col("n_name") == "NATION_3")),
            s.s_nationkey == n.n_nationkey,
        )
        .select(
            "ps_partkey",
            # each factor is an exact 2-dp value (min of stored 2-dp
            # prices; integer-valued quantity sum), so the per-factor
            # decimal(18,2) casts are boundary-free on both engines and
            # the product stays in exact decimal end-to-end — no
            # double→decimal conversion ever sits on a rounding
            # boundary (ADVICE r4; the drift class _derived_partsupp's
            # docstring documents)
            (
                F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("ps_availqty").cast("decimal(18,2)")
            ).alias("v"),
        )
    )
    # materialize the per-part aggregate once (part-count rows): the
    # global total then derives from IT (Σ sv ≡ Σ v exactly — decimal
    # addition is associative) instead of re-deriving the whole
    # partsupp join for a second branch (measured: 6 scans → 3)
    per_part = (
        national.groupBy("ps_partkey")
        .agg(F.sum("v").alias("sv"))
        .localCheckpoint(eager=True)
    )
    total = per_part.agg(
        F.sum("sv").alias("tot"), F.count(F.lit(1)).alias("np")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("sv").cast("double")
            > F.col("tot").cast("double") * 3.0 / F.col("np")
        )
        .select("ps_partkey", F.col("sv").cast("double").alias("stock_value"))
    )


@query(
    "pipeline_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def pipeline_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 silhouette — supplier(s) achieving the maximum quarterly
    revenue. The equality-with-MAX-subquery decorrelates into a
    broadcast-cross-joined 1-row MAX; equality is safe because both
    sides are the same exact decimal sum (cast to double once), so
    genuine revenue ties return every tied supplier in both engines —
    the documented Q15 semantics. Date filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "total_revenue"
            )
        )
    )
    # supplier-count rows; materializing once keeps the MAX branch
    # from re-scanning lineitem (no exchange reuse on this build)
    revenue = revenue.localCheckpoint(eager=True)
    best = revenue.agg(F.max("total_revenue").alias("best"))
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "pipeline_event_paths",
    oracle="""
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS steps
      FROM events GROUP BY user_id
    ),
    paths AS (
      SELECT unnest(list_transform(
               generate_series(1, len(steps) - 2),
               i -> steps[i] || '>' || steps[i+1] || '>' || steps[i+2]
             )) AS path
      FROM seqs WHERE len(steps) >= 3
    ),
    counted AS (SELECT path, COUNT(*) AS n_paths FROM paths GROUP BY path)
    SELECT path, n_paths FROM counted
    ORDER BY n_paths DESC, path LIMIT 20
    """,
)
def pipeline_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pathing — the top 3-step journeys across all users (the
    'what do people actually do' product-analytics query). Per user:
    events in (ts, event_id) total order — the tie-break matters,
    same-timestamp events otherwise make the path partition-dependent
    — then sliding 3-grams of event types, counted corpus-wide.

    Shape: ONE shuffle of events by user into an ordered collect
    (state ∝ that user's events, the same bound as sessionization),
    3-grams generated in-array (no self-join, no window), one
    count-by-path aggregation, TakeOrderedAndProject for the top-20
    with a (count desc, path asc) total order. At 100 TB the
    path-count table is (event_type)³-bounded — tiny."""
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    steps = F.expr("transform(evs, s -> s.event_type)")
    grams = F.expr(
        "transform(sequence(1, size(evs) - 2),"
        " i -> concat_ws('>', evs[i-1].event_type, evs[i].event_type,"
        " evs[i+1].event_type))"
    )
    return (
        seqs.where(F.size("evs") >= 3)
        .select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path"))
        .limit(20)
    )


@query(
    "pipeline_funnel_windowed",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
             list(CASE WHEN event_type = 'purchase' THEN ts END
                  ORDER BY ts, event_id) AS purchases
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT user_id, t1,
             (SELECT MIN(p) FROM unnest(purchases) AS u(p)
              WHERE p > t1 AND p <= t1 + INTERVAL '24 hours') AS t2
      FROM per_user
    )
    SELECT COUNT(t1) AS n_viewed,
           COUNT(t2) AS n_converted,
           CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS conversion_24h
    FROM staged
    """,
)
def pipeline_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion — the production funnel variant: a
    purchase only converts if it lands within 24 h of the user's
    first view (unbounded funnels overcount forever-later
    purchases). Same single-pass shape as pipeline_event_funnel: one
    conditional aggregation per user, the window bound applied as a
    null-propagating array filter, one global rollup. One events
    scan, two exchanges."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    in_window = F.array_min(
        F.filter(
            "purchases",
            lambda p: (p > F.col("t1"))
            & (p <= F.col("t1") + F.expr("INTERVAL 24 HOURS")),
        )
    )
    staged = per_user.withColumn("t2", in_window)
    return staged.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_converted"),
        (F.count("t2").cast("double") / F.count("t1")).alias("conversion_24h"),
    )


@query(
    "pipeline_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey
    ),
    scored AS (
      SELECT c_custkey, last_order, frequency, monetary, monetary_dec,
             NTILE(4) OVER (ORDER BY last_order DESC, c_custkey) AS r_quartile,
             NTILE(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_quartile,
             NTILE(4) OVER (ORDER BY monetary DESC, c_custkey) AS m_quartile
      FROM base
    )
    SELECT r_quartile, f_quartile, m_quartile,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary_dec) AS DOUBLE) AS segment_value
    FROM scored
    GROUP BY 1, 2, 3
    """,
)
def pipeline_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing rollup: per customer
    recency (last order date), frequency (order count), monetary
    (exact decimal revenue), quartiled on each axis and rolled up to
    segment sizes and value. Every NTILE orders by (metric desc,
    custkey) — the explicit tie-break that keeps quartile boundaries
    partition-independent (ties on frequency are pervasive).

    Every quartile runs through ``distributed_ntile`` (the win_ntile
    exact-rank pattern as a helper) — NO unpartitioned window
    anywhere, pinned by tests/test_plans.py's plan invariant. DESC
    ordering = negated metric ascending; unix-µs timestamps stay
    double-exact (< 2^53). The per-customer base materializes once
    (localCheckpoint) so the helper's control-plane collects don't
    re-run the orders join per axis."""
    from osm_airflow_spark.operators.windows import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
            # exact decimal twin of monetary, carried through so
            # segment_value never round-trips through double
            # (ADVICE r4: no double→decimal cast on derived values)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary_dec"
            ),
        )
        .localCheckpoint(eager=True)
    )
    scored = distributed_ntile(
        # ntz → ltz cast is value-preserving (session TZ pinned UTC);
        # unix_micros refuses NTZ directly
        base,
        F.unix_micros(F.col("last_order").cast("timestamp")) * -1,
        "c_custkey",
        "r_quartile",
        4,
    )
    scored = distributed_ntile(
        scored, F.col("frequency") * -1, "c_custkey", "f_quartile", 4
    )
    scored = distributed_ntile(
        scored, F.col("monetary") * -1, "c_custkey", "m_quartile", 4
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_dec").cast("double").alias("segment_value"),
    )


@query(
    "pipeline_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    spine AS (SELECT DISTINCT day AS d FROM days),
    joined AS (
      SELECT s.d, a.user_id, a.day
      FROM spine s JOIN days a
        ON a.day <= s.d AND a.day >= s.d - INTERVAL '29 days'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT CASE WHEN day = d THEN user_id END) AS dau,
           COUNT(DISTINCT CASE WHEN day >= d - INTERVAL '6 days'
                               THEN user_id END) AS wau,
           COUNT(DISTINCT user_id) AS mau,
           CAST(COUNT(DISTINCT CASE WHEN day = d THEN user_id END) AS DOUBLE)
             / COUNT(DISTINCT user_id) AS stickiness
    FROM joined GROUP BY d
    """,
)
def pipeline_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU and stickiness (DAU/MAU) per day — the
    engagement report every product team runs. Rolling DISTINCT
    counts can't ride an ordinary window frame (distinct doesn't
    decompose), so the standard shape is: distinct (user, day) once,
    a date-spine range join pulling each day's trailing 30 days of
    user-days, and ONE aggregation computing all three horizons as
    conditional distincts.

    Scale: the range join output is ≤ 30 × user-days — linear in
    activity with a fixed factor, never user-pairs; the spine side is
    tiny (one row per day) and broadcasts, so the user-days table
    never reshuffles for the join. At 100 TB the exact-distinct
    aggregation is the cost center; swapping approx_count_distinct
    per horizon is the documented relaxation (agg_approx_distinct's
    pattern) when ±2% is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    spine = days.select(F.col("day").alias("d")).distinct()
    joined = days.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("d"))
        & (F.col("day") >= F.date_sub(F.col("d"), 29)),
    )
    dau = F.count_distinct(F.when(F.col("day") == F.col("d"), F.col("user_id")))
    wau = F.count_distinct(
        F.when(F.col("day") >= F.date_sub(F.col("d"), 6), F.col("user_id"))
    )
    mau = F.count_distinct("user_id")
    return (
        joined.groupBy("d")
        .agg(
            dau.alias("dau"),
            wau.alias("wau"),
            mau.alias("mau"),
            (dau.cast("double") / mau).alias("stickiness"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
            "stickiness",
        )
    )


@query(
    "pipeline_ship_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           quantile_cont(days, 0.5) AS p50_days,
           quantile_cont(days, 0.9) AS p90_days,
           quantile_cont(days, 0.99) AS p99_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def pipeline_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order→ship latency distribution per priority class —
    the SLA report shape, and the EXACT percentile surface
    (agg_approx_percentile covers the sketch path; this is
    PERCENTILE_CONT with linear interpolation, hash-checked because
    both engines define it as (1−d)·lower + d·upper and the inputs
    are small integers, so every interpolation is exact in a
    double). Exact percentiles hold the full sorted group — fine per
    priority class (5 groups); at 100 TB per-high-cardinality-key
    percentiles go through the approx sketch instead."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
                "days"
            ),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.percentile("days", F.lit(0.5)).alias("p50_days"),
        F.percentile("days", F.lit(0.9)).alias("p90_days"),
        F.percentile("days", F.lit(0.99)).alias("p99_days"),
    )


@query(
    "pipeline_product_profit",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT n.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS profit_year,
           {sql_dsum('l_extendedprice * (1 - l_discount) - ps.ps_supplycost * l_quantity', 4)}
             AS profit
    FROM lineitem
    JOIN ps ON l_partkey = ps.ps_partkey AND l_suppkey = ps.ps_suppkey
    JOIN part p     ON l_partkey = p.p_partkey
    JOIN orders o   ON l_orderkey = o.o_orderkey
    JOIN supplier s ON l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(o_orderdate) AS INT)
    """,
)
def pipeline_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 silhouette — product-type profit by supplier nation and
    order year: profit = revenue − cost, where cost rides in from the
    lineitem-derived partsupp. Every factor is an exact 2-dp stored
    value, so both product terms are exact 4-dp and the difference
    decimal-sums order-free (dsum scale 4). The partsupp join-back is
    corpus-bounded (distinct part×supp pairs), so it stays a join
    rather than a window (CLAUDE.md); part/supplier/nation dims
    broadcast; the one big shuffle is lineitem⋈partsupp on the
    composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit_term = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("profit_year"),
        )
        .agg(dsum(profit_term, 4).alias("profit"))
    )


@query(
    "pipeline_part_supplier_counts",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def pipeline_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 silhouette — how many distinct suppliers can furnish parts
    of each (brand, type, size) slice, with NOT-LIKE / <> / IN-list
    exclusion filters. The part dim broadcasts with its filters
    applied pre-join; COUNT(DISTINCT) shuffles on the grouping key
    with the distinct folded into a two-phase aggregate."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "pipeline_excess_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    recent AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_1995
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT r.l_suppkey
        FROM recent r
        JOIN ps ON r.l_partkey = ps.ps_partkey AND r.l_suppkey = ps.ps_suppkey
        JOIN part p ON r.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small%'
          AND r.qty_1995 > 0.5 * ps.ps_availqty
      )
    """,
)
def pipeline_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 silhouette — suppliers in one nation whose 1995 shipments
    of 'small *' parts exceeded half that part-supplier's total
    shipped quantity. The classic doubly-nested IN decorrelates into
    two aggregates joined on the composite key, a broadcast part
    filter, and a LEFT SEMI join up to supplier — no correlated
    re-execution anywhere; the semi join keeps supplier rows unique
    by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    recent = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty_1995"))
    )
    excess = (
        recent.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("qty_1995") > 0.5 * F.col("ps_availqty"))
        .select(F.col("l_suppkey").alias("x_suppkey"))
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("x_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "pipeline_untapped_customers",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING') AND c_acctbal > 0
    ),
    threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM pool
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM pool CROSS JOIN threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
)
def pipeline_untapped_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 silhouette — well-funded customers in target segments with
    no RECENT orders (every fixture customer has ordered at least
    once, so 'lapsed since 1999' is the non-degenerate form of Q22's
    never-ordered test): a global scalar threshold (average positive
    balance over the segment pool) and a NOT EXISTS. The threshold
    rides as a broadcast 1-row aggregate (never a driver .collect());
    NOT EXISTS is a LEFT ANTI join on custkey with the date filter
    pushed into the anti side's scan; the average divides the exact
    decimal sum as one IEEE expression identical on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    pool = c.where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING") & (F.col("c_acctbal") > 0)
    ).select("c_custkey", "c_mktsegment", "c_acctbal")
    threshold = pool.agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        pool.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "pipeline_promo_revenue",
    oracle=f"""
    SELECT 100 * (
             CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount) END
                           AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE)
           ) AS promo_revenue_pct,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-09-01'
      AND l_shipdate <  TIMESTAMP '1998-10-01'
    """,
)
def pipeline_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 silhouette — promo revenue share for one month: a ratio of
    conditional aggregate to total aggregate over a lineitem × part
    join (the fixture's p_type carries a literal 'PROMO' class). The
    last of the 22 TPC-H shapes — reference end state is a database
    "amenable to efficient querying" (/root/reference/README.md:70).

    Scale: the month filter pushes to the lineitem scan (one month ≈
    1/80th of the fact table before the join even starts). part is
    broadcast at fixture scale; at 100 TB part scales with SF, so the
    real-cluster form is a shuffle join bucketed on the part key —
    same plan family as pipeline_product_profit's join-back. Both the
    numerator and denominator decimal-sum before a single double
    division, and the ×100 applies after the division in both engines
    (100*(a/b) != (100*a)/b in IEEE), so the percentage is bit-exact
    under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100)
                * (
                    F.sum(promo_rev.cast("decimal(18,4)")).cast("double")
                    / F.sum(rev.cast("decimal(18,4)")).cast("double")
                )
            ).alias("promo_revenue_pct"),
            dsum(rev, 4).alias("total_revenue"),
        )
    )


@query(
    "pipeline_median_order_gap",
    oracle="""
    WITH gaps AS (
      SELECT c.c_mktsegment,
             date_diff('day',
                       LAG(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                                ORDER BY o.o_orderdate,
                                                         o.o_orderkey),
                       o.o_orderdate) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           COUNT(gap_days) AS n_gaps,
           PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY gap_days)
             AS median_gap_days,
           CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days)
             AS mean_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def pipeline_median_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval analysis: per-customer day gaps between
    consecutive orders (LAG over a total-ordered per-customer window),
    rolled up to the median and mean gap per market segment — the
    repeat-purchase cadence metric behind churn/LTV models, composing
    the F3 lag pattern with E11 exact percentiles in one plan.

    Exactness: gaps are integer days; PERCENTILE_CONT's linear
    interpolation on integers yields .0/.5 values that are
    double-exact in both engines (the agg_percentile discipline), and
    the mean divides an exact integer sum once. Scale: one shuffle to
    the per-customer window (bounded partitions — orders per
    customer), one to the |segments|-row rollup."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count("gap_days").alias("n_gaps"),
        F.expr("percentile(gap_days, 0.5)").alias("median_gap_days"),
        (F.sum("gap_days").cast("double") / F.count("gap_days")).alias(
            "mean_gap_days"
        ),
    )


@query(
    "pipeline_last_touch_attribution",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS) OVER w AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CASE WHEN touch_ts IS NOT NULL
                 AND touch_ts >= ts - INTERVAL 24 HOUR
                THEN touch_type ELSE 'none' END AS attributed_to,
           COUNT(*) AS n_purchases,
           {sql_dsum('value')} AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def pipeline_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    most recent click/view by the same user within a 24-hour
    lookback, else 'none' — the standard conversion-attribution
    rollup, composed from the F13 LOCF pattern (two consistent
    last-ignorenulls fills over one total-ordered per-user window)
    plus integer-exact interval arithmetic on the pinned-µs
    timestamps. One shuffle to the user window, one to the 3-row
    rollup; the window partition is per-user and bounded."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias(
            "touch_ts"
        ),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    attributed = F.when(
        F.col("touch_ts").isNotNull()
        & (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS")),
        F.col("touch_type"),
    ).otherwise("none")
    return (
        tagged.where(F.col("event_type") == "purchase")
        .groupBy(attributed.alias("attributed_to"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("attributed_value"),
        )
    )


@query(
    "pipeline_mom_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT c.c_mktsegment,
             CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, month, revenue,
           revenue - LAG(revenue) OVER w AS revenue_delta,
           100 * (revenue / LAG(revenue) OVER w - 1) AS growth_pct
    FROM monthly
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY month)
    """,
)
def pipeline_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per market segment — the
    period-over-period report every BI dashboard leads with, composed
    as rollup-then-lag: one keyed monthly aggregation (decimal-exact
    revenue), then LAG over a window partitioned by segment and
    ordered by month. The window input is the |segments|x|months|
    AGGREGATE (hundreds of rows), never the fact table — the
    rollup-first ordering is what keeps the lag cheap at any scale.
    Delta is an exact double subtraction of decimal-derived values;
    the growth ratio is one division + one multiply over those agreed
    doubles — bit-identical in both engines, so it is emitted
    UNROUNDED (the r7 round()-audit: rounding a derived double was
    the only possible divergence point, and per-row output needs no
    rounding)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "c_mktsegment",
        "month",
        "revenue",
        (F.col("revenue") - prev).alias("revenue_delta"),
        (100 * (F.col("revenue") / prev - 1)).alias("growth_pct"),
    )


def chase_to_roots(parent_of: DataFrame, max_rounds: int = 16) -> DataFrame:
    """POINTER-DOUBLING chase up the (pid, parent) edge table until
    every cursor sits on a root (parent < 1). Returns (id, cur=root).

    r14 (guide §1.2, algorithm level): the cursor table is seeded
    with the one-hop parent (roots absorb: a root's cursor is
    itself), then each round self-joins the cursor table — after
    round r every cursor has advanced min(2^r, depth) hops, so a
    depth-D hierarchy converges in ceil(log2 D) + 1 rounds instead
    of D. The per-round shuffle is the same two-N-row join the
    one-hop chase paid, so total shuffled bytes drop ~D/log D at
    scale. Each frontier is localCheckpoint-ed so lineage stays O(1);
    the convergence probe rides the checkpoint action itself as an
    ``Observation`` metric (one job per round — the cluster_pairs
    idiom), not a second count job.

    Non-convergence within ``max_rounds`` (i.e. depth > 2^max_rounds)
    RAISES instead of returning part-way labels: a silently truncated
    chase would mislabel every deeper node's root, and at 100 TB
    nobody eyeballs the output. A deeper hierarchy is a config
    decision (raise max_rounds), not a silent data-quality
    regression."""
    labels = parent_of.select(
        F.col("pid").alias("id"),
        F.when(F.col("parent") >= 1, F.col("parent"))
        .otherwise(F.col("pid"))
        .alias("cur"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        jump = labels.select(F.col("id").alias("j_id"), F.col("cur").alias("j_cur"))
        obs = Observation()
        labels = (
            labels.join(jump, F.col("cur") == F.col("j_id"))
            .select("id", F.col("cur").alias("old_cur"), F.col("j_cur").alias("cur"))
            .observe(
                obs,
                F.sum((F.col("cur") != F.col("old_cur")).cast("long")).alias("moved"),
            )
            .select("id", "cur")
            .localCheckpoint(eager=True)
        )
        if not obs.get["moved"]:
            return labels
    raise RuntimeError(
        f"hierarchy pointer chase did not converge in {max_rounds} doubling "
        "rounds; hierarchy is deeper than 2^max_rounds — raise max_rounds"
    )


@query(
    "pipeline_bom_rollup",
    oracle="""
    WITH RECURSIVE parent_of AS (
      SELECT p_partkey AS id, p_partkey // 7 AS parent FROM part
    ),
    chase AS (
      SELECT id, id AS cur FROM parent_of
      UNION ALL
      SELECT c.id, p.parent
      FROM chase c JOIN parent_of p ON p.id = c.cur
      WHERE p.parent >= 1
    ),
    roots AS (
      SELECT c.id, c.cur AS root
      FROM chase c JOIN parent_of p ON p.id = c.cur
      WHERE p.parent = 0
    )
    SELECT r.root AS root_id,
           COUNT(*) AS n_components,
           CAST(SUM(p.p_size) AS BIGINT) AS total_weight,
           MAX(p.p_retailprice) AS max_component_price
    FROM roots r JOIN part p ON p.p_partkey = r.id
    GROUP BY r.root
    """,
)
def pipeline_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials rollup — the classic recursive-hierarchy
    query (SURVEY notes the reference has NO recursive queries; this
    extension shows the engine handles the shape): every part chains
    to an assembly root through a parent edge table (parent = id//7,
    a guaranteed-acyclic derivation since parent < child), and each
    root aggregates its whole subtree's component count, weight, and
    max component price.

    Spark side is the production BOM plan: iterative pointer-chasing
    JOINS against the parent table — each round advances every
    non-root chain one hop (rounds = hierarchy depth, ~6 here;
    pointer doubling would make it log-depth at the cost of
    materializing the squared edge table), frontier localCheckpoint-ed
    per round like every iterative operator in this engine. The
    termination probe is a limit(1) existence check — control plane.
    DuckDB proves it with a recursive CTE. Integer aggregates +
    double max — hash-exact."""
    p = load_table(spark, sf_dir, "part")
    parent_of = (
        p.select(
            F.col("p_partkey").alias("pid"),
            F.floor(F.col("p_partkey") / 7).cast("long").alias("parent"),
        )
        .localCheckpoint(eager=True)
    )
    labels = chase_to_roots(parent_of)
    return (
        labels.join(p, F.col("id") == F.col("p_partkey"))
        .groupBy(F.col("cur").alias("root_id"))
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("p_size").alias("total_weight"),
            F.max("p_retailprice").alias("max_component_price"),
        )
    )


@query(
    "pipeline_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
               AS first_month
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
           COUNT(DISTINCT CASE WHEN CAST(date_trunc('month', o.o_orderdate)
                                         AS TIMESTAMP) = f.first_month
                          THEN o.o_custkey END) AS new_customers,
           COUNT(DISTINCT CASE WHEN CAST(date_trunc('month', o.o_orderdate)
                                         AS TIMESTAMP) <> f.first_month
                          THEN o.o_custkey END) AS returning_customers
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1
    """,
)
def pipeline_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning customer split per month — the growth-
    accounting staple beside MoM revenue: a customer is NEW in their
    first-ever order month and RETURNING in any later month they
    order. First months come from one keyed MIN aggregate; the fact
    side joins back on the customer key (big-big equi join, the Q13
    family — bucketable on custkey) and two conditional distinct
    counts land per month. Integer/timestamp only — hash-exact by
    construction."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("first_month"))
    return (
        o.join(firsts, "o_custkey")
        .groupBy(month.alias("month"))
        .agg(
            F.countDistinct(
                F.when(month == F.col("first_month"), F.col("o_custkey"))
            ).alias("new_customers"),
            F.countDistinct(
                F.when(month != F.col("first_month"), F.col("o_custkey"))
            ).alias("returning_customers"),
        )
    )


@query(
    "pipeline_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    aged AS (
      SELECT f.cohort_month,
             date_diff('month', f.cohort_month,
                       CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP))
               AS age_months,
             o.o_totalprice
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    rev AS (
      SELECT cohort_month, CAST(age_months AS INT) AS age_months,
             {sql_dsum('o_totalprice')} AS revenue
      FROM aged GROUP BY 1, 2
    )
    SELECT cohort_month, age_months, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                  OVER (PARTITION BY cohort_month ORDER BY age_months
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_ltv
    FROM rev
    """,
)
def pipeline_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curve — the revenue twin of the
    retention cohort: customers cohort by first-order month, each
    cohort's revenue lands at its month-age, and the running decimal
    sum per cohort is the LTV curve a growth team reads payback
    periods from. Cohort-month partitions are bounded (one row per
    age month), so the cumulative sum is a legitimate window — the
    F-family contract — and the decimal cumsum makes every prefix
    order-independent. One join-back for first months (the
    new-vs-returning shape, bucketable on custkey), one keyed
    aggregate, one bounded window."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    aged = o.join(firsts, "o_custkey").select(
        "cohort_month",
        F.months_between(month, F.col("cohort_month")).cast("int").alias(
            "age_months"
        ),
        "o_totalprice",
    )
    rev = aged.groupBy("cohort_month", "age_months").agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        "cohort_month",
        "age_months",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("cum_ltv"),
    )


@query(
    "pipeline_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outdeg AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.next_type, t.n AS n_transitions,
           CAST(t.n AS DOUBLE) / o.total AS p
    FROM trans t JOIN outdeg o USING (prev_type)
    """,
)
def pipeline_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event
    sequences — P(next event type | current) — the user-journey model
    behind next-action prediction, funnel leak diagnosis, and
    session simulation. One per-user LAG window (bounded partitions,
    total-ordered by (ts, event_id)), one groupBy for transition
    counts, out-degree totals as a tiny broadcast join-back (the
    corpus-bounded rule), and each probability is integer/integer in
    ONE IEEE division — engine-exact with no rounding at all. Row
    probabilities per prev_type sum to 1 by construction."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    outdeg = trans.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("total")
    )
    return trans.join(F.broadcast(outdeg), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.col("total")).alias("p"),
    )


@query(
    "pipeline_position_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_id AS t_id, ts AS t_ts, event_type AS t_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    joined AS (
      SELECT p.p_id, p.value, t.t_type, t.t_ts, t.t_id,
             ROW_NUMBER() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_ts, t.t_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.p_id) AS k
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts <= p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 24 HOUR
    ),
    credited AS (
      SELECT t_type, value,
             CASE WHEN k = 1 THEN 1.0
                  WHEN k = 2 THEN 0.5
                  WHEN pos = 1 OR pos = k THEN 0.4
                  ELSE 0.2 / (k - 2) END AS credit
      FROM joined
    ),
    touched AS (
      SELECT t_type AS attributed_to,
             CAST(SUM(CAST(round(credit, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS credited_conversions,
             CAST(SUM(CAST(round(value * credit, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS credited_value
      FROM credited GROUP BY t_type
    ),
    untouched AS (
      SELECT 'none' AS attributed_to,
             CAST(COUNT(*) AS DOUBLE) AS credited_conversions,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS credited_value
      FROM purchases p
      WHERE NOT EXISTS (
        SELECT 1 FROM touches t
        WHERE t.user_id = p.user_id
          AND t.t_ts <= p.p_ts
          AND t.t_ts >= p.p_ts - INTERVAL 24 HOUR
      )
    )
    SELECT * FROM touched UNION ALL SELECT * FROM untouched
    """,
)
def pipeline_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — POSITION-BASED (U-shaped) multi-touch
    attribution, completing the attribution pair with
    pipeline_last_touch_attribution: every click/view in the 24 h
    before a purchase shares the credit — 40% first touch, 40% last,
    the middle 20% split evenly (1 touch → 100%, 2 → 50/50), the
    industry-standard position model. Purchases with no touch in
    window report under 'none' with full credit, so Σ credited
    conversions over all rows equals the purchase count exactly
    (pytest-pinned).

    Determinism: touch order is total (ts, event_id); credit is a
    CASE over exact ints and one exact-int division, an agreed
    double; both credited sums follow the term rule (round each
    value·credit to 6 dp → exact decimal cast → order-independent
    sum). The no-touch leg is an anti-join, NULL-free by
    construction.

    Scale: the touch↔purchase pairing is a per-user range join —
    shuffle on user_id, per-conversion windows bounded by the 24 h
    lookback. The derived purchases and touches frames each feed TWO
    consumers (the credit join and the no-touch anti-join), so both
    are checkpointed — this build never reuses exchange subtrees,
    and without the barrier events would be scanned four times
    instead of two (r9 self-review: the first version claimed the
    checkpoint in prose but didn't place it). At 100 TB bucket
    events by user_id and the pairing is zero-Exchange (the
    write_bucketed layout)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    ).localCheckpoint(eager=True)  # credit join + anti-join
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_type"),
    ).localCheckpoint(eager=True)  # credit join + anti-join
    in_window = (F.col("t_ts") <= F.col("p_ts")) & (
        F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")
    )
    joined = purchases.join(touches, "user_id").where(in_window)
    wp = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wk = Window.partitionBy("p_id")
    pos, k = F.row_number().over(wp), F.count(F.lit(1)).over(wk)
    credit = (
        F.when(k == 1, 1.0)
        .when(k == 2, 0.5)
        .when((pos == 1) | (pos == k), 0.4)
        .otherwise(F.lit(0.2) / (k - 2))
    )
    credited = joined.select(
        "t_type", "value", credit.alias("credit")
    )
    touched = credited.groupBy(F.col("t_type").alias("attributed_to")).agg(
        F.sum(F.round(F.col("credit"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("credited_conversions"),
        F.sum(
            F.round(F.col("value") * F.col("credit"), 6).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("credited_value"),
    )
    # left_anti with RENAMED right columns: both frames derive from
    # `ev`, and same-name attribute equality in a self-join can
    # resolve both sides to the left (Spark's trivially-true-predicate
    # warning) — renaming makes the condition unambiguous.
    touches_r = touches.select(
        F.col("user_id").alias("t_user"), "t_ts"
    )
    anti_cond = (
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    )
    untouched = (
        purchases.join(touches_r, anti_cond, "left_anti")
        .agg(
            F.count(F.lit(1)).cast("double").alias("credited_conversions"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("credited_value"),
        )
        .select(
            F.lit("none").alias("attributed_to"),
            "credited_conversions",
            "credited_value",
        )
    )
    return touched.unionByName(untouched)


@query(
    "pipeline_item_cf",
    oracle="""
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT pk, COUNT(*) AS n_orders FROM bi GROUP BY pk),
    cooc AS (
      SELECT a.pk AS item_a, b.pk AS item_b, COUNT(*) AS cooc
      FROM bi a JOIN bi b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY a.pk, b.pk
      HAVING COUNT(*) >= 2
    ),
    scored AS (
      SELECT c.item_a, c.item_b, c.cooc,
             CAST(c.cooc AS DOUBLE)
               / sqrt(CAST(na.n_orders * nb.n_orders AS DOUBLE)) AS cos_sim
      FROM cooc c
      JOIN n na ON na.pk = c.item_a
      JOIN n nb ON nb.pk = c.item_b
    )
    SELECT item_a, item_b, CAST(cooc AS BIGINT) AS cooc, cos_sim,
           CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY item_a
                                   ORDER BY cos_sim DESC, item_b) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def pipeline_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering — top-5 "customers who bought
    X also bought Y" neighbors per part, by co-occurrence cosine
    cnt(A,B) / sqrt(cnt(A)·cnt(B)) over order baskets (Sarwar et al.
    2001). The many-small-models sibling of pipeline_market_basket
    (which emits support/confidence/lift rules; this emits the
    normalized neighbor LISTS a recommender serves).

    Scale shape: the pair generation is a self-join on the BASKET
    key, so cost is Σ basket_size² — bounded by the biggest order
    (7 lines here), never n². The HAVING cooc >= 2 prune drops the
    singleton-pair long tail BEFORE the norm join, and the top-k
    window partitions by item (WindowGroupLimit caps it map-side).
    At 100 TB the exact form's hot spots are mega-popular items
    (skewed neighbor lists); the published fix is DIMSUM sampling
    (Zadeh & Goel 2013 — sample each basket pair w.p.
    ~1/sqrt(cnt(A)·cnt(B)), the MLlib RowMatrix.columnSimilarities
    path) or a hard basket-size cap, both of which keep this exact
    plan shape. Integer counts, one exact sqrt+division per pair →
    bit-identical in both engines → SQL-oracled."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    bi = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    n = bi.groupBy("pk").agg(F.count(F.lit(1)).alias("n_orders"))
    a = bi.select("ok", F.col("pk").alias("item_a"))
    b = bi.select("ok", F.col("pk").alias("item_b"))
    cooc = (
        a.join(b, "ok")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .where(F.col("cooc") >= 2)
    )
    na = n.select(F.col("pk").alias("item_a"), F.col("n_orders").alias("n_a"))
    nb = n.select(F.col("pk").alias("item_b"), F.col("n_orders").alias("n_b"))
    cos = F.col("cooc").cast("double") / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
    scored = (
        cooc.join(na, "item_a")
        .join(nb, "item_b")
        .select("item_a", "item_b", "cooc", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("item_a").orderBy(F.col("cos_sim").desc(), F.col("item_b"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)


def _item_cf_capped_baskets(baskets: DataFrame, basket_cap: int | None) -> DataFrame:
    """Apply the hard per-basket item cap: oversized baskets keep the
    ``basket_cap`` items with the smallest ``xxhash64(ok, pk)`` — a
    deterministic content-derived uniform item sample per basket."""
    from pyspark.sql import Window

    if basket_cap is None:
        return baskets
    bw = Window.partitionBy("ok").orderBy(
        F.xxhash64("ok", "pk"), "pk"  # pk breaks xxhash64 ties: total order
    )
    return (
        baskets.withColumn("_cap_rn", F.row_number().over(bw))
        .where(F.col("_cap_rn") <= basket_cap)
        .drop("_cap_rn")
    )


def item_cf_pair_stream(
    baskets: DataFrame,
    basket_cap: int | None = None,
    dimsum_gamma: float | None = None,
) -> DataFrame:
    """The weighted (item_a, item_b, w) pair stream behind
    ``item_cf_capped`` — exposed separately so the skew probe
    (tools/itemcf_skew_probe.py) can measure the emitted pair VOLUME
    each guard actually produces, not just the final top-k."""
    bi = _item_cf_capped_baskets(baskets, basket_cap)
    a = bi.select("ok", F.col("pk").alias("item_a"))
    b = bi.select("ok", F.col("pk").alias("item_b"))
    pairs = a.join(b, "ok").where(F.col("item_a") != F.col("item_b"))
    if dimsum_gamma is None:
        return pairs.select("item_a", "item_b", F.lit(1.0).alias("w"))
    n = bi.groupBy("pk").agg(F.count(F.lit(1)).alias("n_orders"))
    na = n.select(F.col("pk").alias("item_a"), F.col("n_orders").alias("n_a"))
    nb = n.select(F.col("pk").alias("item_b"), F.col("n_orders").alias("n_b"))
    pairs = pairs.join(F.broadcast(na), "item_a").join(F.broadcast(nb), "item_b")
    p = F.least(
        F.lit(1.0),
        F.lit(float(dimsum_gamma))
        / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
    )
    # content-derived uniform in [0, 1): 32 high-entropy bits of
    # xxhash64 over (basket, pair) — exact dyadic double
    u = (
        F.pmod(F.xxhash64("ok", "item_a", "item_b"), F.lit(2**32)).cast("double")
        / F.lit(float(2**32))
    )
    return pairs.where(u < p).select("item_a", "item_b", (F.lit(1.0) / p).alias("w"))


def item_cf_capped(
    baskets: DataFrame,
    k: int = 5,
    min_cooc: int = 2,
    basket_cap: int | None = None,
    dimsum_gamma: float | None = None,
) -> DataFrame:
    """The SCALE guard for ``pipeline_item_cf`` (VERDICT r11 #3 — the
    one documented-but-unbuilt hazard in the hot set): item-item
    cosine top-k over ``baskets`` (columns ``ok``, ``pk``; distinct
    pairs) with the two published mega-popular-item mitigations, both
    plan-shape-preserving:

    * ``basket_cap`` — hard per-basket item cap (the common-practice
      guard): baskets larger than the cap keep the ``basket_cap``
      items with the smallest ``xxhash64(ok, pk)`` — a deterministic,
      content-derived (house no-rand() rule) uniform item sample per
      basket. Everything downstream runs the EXACT algorithm on the
      capped table (self-consistent norms), so per-basket pair work
      is bounded by cap² regardless of how many lines one order —
      or one bot session — accumulates. ``cap >= max basket size``
      reproduces the exact result bit-for-bit (equivalence-tested).

    * ``dimsum_gamma`` — DIMSUM pair sampling (Zadeh & Goel 2013,
      the MLlib RowMatrix.columnSimilarities path): a basket's pair
      (a, b) is emitted with probability p = min(1, γ/√(n_a·n_b)),
      each emission Horvitz–Thompson-weighted 1/p, so E[Σw] = cooc
      and the cosine estimate is unbiased while a hot item's pair
      volume drops from n_hot·basket to ~γ·√basket. The coin is
      content-derived (xxhash64(ok, a, b) → exact dyadic uniform);
      γ ≥ √(max n_a·n_b) forces p = 1 everywhere and reproduces the
      exact result bit-for-bit. Item frequencies are an items-bounded
      dim table, BROADCAST onto the pair stream — no extra shuffle.

    Returns (item_a, item_b, cooc DOUBLE — the HT estimate, exact
    integers when no sampling triggers — cos_sim, rk <= k). The
    min_cooc prune applies to the estimated cooc, matching the exact
    HAVING when p = 1."""
    from pyspark.sql import Window

    bi = _item_cf_capped_baskets(baskets, basket_cap)
    n = bi.groupBy("pk").agg(F.count(F.lit(1)).alias("n_orders"))
    na = n.select(F.col("pk").alias("item_a"), F.col("n_orders").alias("n_a"))
    nb = n.select(F.col("pk").alias("item_b"), F.col("n_orders").alias("n_b"))
    weighted = item_cf_pair_stream(baskets, basket_cap, dimsum_gamma)
    cooc = (
        weighted.groupBy("item_a", "item_b")
        .agg(F.sum("w").alias("cooc"))
        .where(F.col("cooc") >= float(min_cooc))
    )
    cos = F.col("cooc") / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
    scored = (
        cooc.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select("item_a", "item_b", "cooc", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("item_a").orderBy(F.col("cos_sim").desc(), F.col("item_b"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


@query(
    "pipeline_nrr",
    oracle="""
    WITH cy AS (
      SELECT o_custkey AS ck, EXTRACT(year FROM o_orderdate) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    base AS (
      SELECT * FROM cy WHERE y + 1 IN (SELECT DISTINCT y FROM cy)
    ),
    j AS (
      SELECT b.y, b.rev AS rev0, n.rev AS rev1
      FROM base b LEFT JOIN cy n ON n.ck = b.ck AND n.y = b.y + 1
    )
    SELECT CAST(y AS BIGINT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN rev1 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(rev0) AS DOUBLE) AS base_rev,
           CAST(SUM(COALESCE(rev1, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE)
             AS retained_rev,
           CAST(SUM(COALESCE(rev1, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE)
             / CAST(SUM(rev0) AS DOUBLE) AS nrr
    FROM j GROUP BY y
    """,
)
def pipeline_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — NET REVENUE RETENTION by calendar-year cohort: for
    each year y that has a successor year in the data, take the
    customers who bought in y (the base book), and divide their
    TOTAL year-y+1 revenue (churned customers contribute 0,
    expansion counts in full — the SaaS NRR convention) by their
    year-y revenue. The revenue-weighted complement to the
    count-based retention_cohort key: NRR > 1 means expansion
    outruns churn. Emits base/retained customer counts alongside.

    Determinism: per-customer-year revenue is an exact decimal(18,2)
    sum; both cohort totals re-sum those decimals exactly and cast
    to double ONCE (< 2^53 cents through sf ~ 1000); nrr is one IEEE
    division of those two doubles. base_rev > 0 by construction
    (o_totalprice is positive), so the division never sees zero.

    Scale + lint: one orders groupBy(custkey, year); the
    year-over-year match is a LEFT join co-keyed on (custkey, year)
    (shift y-1 on the build side — co-partitioned at scale, no
    broadcast of corpus-sized sides); the successor-year filter is a
    broadcast semi-join against the tiny distinct-year list; final
    rollup is per-year. cy is localCheckpointed once for its three
    legs (the engine-wide no-exchange-reuse workaround)."""
    o = load_table(spark, sf_dir, "orders")
    cy = (
        o.groupBy(
            F.col("o_custkey").alias("ck"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .localCheckpoint(eager=True)  # base + next + year-list legs
    )
    have_next = cy.select((F.col("y") - 1).alias("y")).distinct()
    base = cy.join(F.broadcast(have_next), "y", "semi")
    nxt = cy.select(
        "ck", (F.col("y") - 1).alias("y"), F.col("rev").alias("rev1")
    )
    j = base.join(nxt, ["ck", "y"], "left")
    zero = F.lit(0).cast("decimal(18,2)")
    return j.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("n_base"),
        F.sum(F.when(F.col("rev1").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum("rev").cast("double").alias("base_rev"),
        F.sum(F.coalesce(F.col("rev1"), zero)).cast("double").alias(
            "retained_rev"
        ),
        (
            F.sum(F.coalesce(F.col("rev1"), zero)).cast("double")
            / F.sum("rev").cast("double")
        ).alias("nrr"),
    ).withColumnRenamed("y", "year")


@query(
    "pipeline_price_index",
    oracle="""
    WITH py AS (
      SELECT l_partkey AS pk,
             EXTRACT(year FROM l_shipdate) AS y,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS v_c
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2
    ),
    up AS (
      SELECT pk, y, q, (2 * v_c + q) // (2 * q) AS p_c FROM py
    ),
    both_eras AS (
      SELECT b.pk, p.p_brand,
             b.p_c AS p0, b.q AS q0, c.p_c AS p1, c.q AS q1
      FROM up b JOIN up c ON c.pk = b.pk AND b.y = 1996 AND c.y = 1997
      JOIN part p ON p.p_partkey = b.pk
    ),
    sums AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(p1 * q0) AS BIGINT) AS s_p1q0,
             CAST(SUM(p0 * q0) AS BIGINT) AS s_p0q0,
             CAST(SUM(p1 * q1) AS BIGINT) AS s_p1q1,
             CAST(SUM(p0 * q1) AS BIGINT) AS s_p0q1
      FROM both_eras GROUP BY 1
    )
    SELECT p_brand, n_parts,
           CAST(s_p1q0 AS DOUBLE) / s_p0q0 AS laspeyres,
           CAST(s_p1q1 AS DOUBLE) / s_p0q1 AS paasche,
           sqrt((CAST(s_p1q0 AS DOUBLE) / s_p0q0)
                * (CAST(s_p1q1 AS DOUBLE) / s_p0q1)) AS fisher
    FROM sums
    """,
)
def pipeline_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — LASPEYRES / PAASCHE / FISHER price indices per
    brand across the 1996→1997 era split: the index-number theory
    triple (base-weighted, current-weighted, and their geometric
    mean — Fisher's "ideal" index satisfying time reversal) over
    parts traded in BOTH eras. Per-part era unit price is DEFINED as
    era revenue / era quantity rounded HALF-UP to the integer CENT —
    the bookkeeping convention that makes the whole basket
    arithmetic exact: a round(p·q, 6)-of-doubles draft of this key
    split from the oracle by one 6-dp term (the r14 win_macd ledger
    class — p·q products frequently TERMINATE in decimal and sit on
    round boundaries). The macro-economics complement to the micro
    price_elasticity key.

    Determinism: per-part-era (q, v) are exact BIGINT/decimal sums;
    the cent price is pure integer arithmetic ((2v+q) // (2q) —
    floor-division HALF-UP, identical in both engines for the
    positive operands here); every p·q term and basket sum is exact
    BIGINT (< 2^53 through sf ~ 100; the documented decimal(38,0)
    upgrade past that); the three indices are single IEEE trees over
    exact longs (sqrt is correctly-rounded). The inner era join
    guarantees non-empty, positive denominators.

    Scale + lint: one lineitem groupBy(partkey, year) with the year
    predicate PUSHED to the scan; the era match is a self-join
    co-keyed on partkey (co-partitioned at scale); the part dim is
    broadcast; the final rollup is per-brand. py is
    localCheckpointed once for its two era legs."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yr = F.year("l_shipdate")
    py = (
        li.where(yr.isin(1996, 1997))
        .groupBy(
            F.col("l_partkey").alias("pk"), yr.cast("long").alias("y")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("v_c"),
        )
        .localCheckpoint(eager=True)  # both era legs
    )
    up = py.select(
        "pk", "y", "q",
        F.expr("(2 * v_c + q) DIV (2 * q)").alias("p_c"),
    )
    base = up.where(F.col("y") == 1996).select(
        "pk", F.col("p_c").alias("p0"), F.col("q").alias("q0")
    )
    cur = up.where(F.col("y") == 1997).select(
        F.col("pk").alias("pk2"), F.col("p_c").alias("p1"),
        F.col("q").alias("q1"),
    )
    brand = p.select(F.col("p_partkey").alias("pk"), "p_brand")
    j = base.join(cur, F.col("pk") == F.col("pk2")).join(
        F.broadcast(brand), "pk"
    )
    sums = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).cast("long").alias("s_p1q0"),
        F.sum(F.col("p0") * F.col("q0")).cast("long").alias("s_p0q0"),
        F.sum(F.col("p1") * F.col("q1")).cast("long").alias("s_p1q1"),
        F.sum(F.col("p0") * F.col("q1")).cast("long").alias("s_p0q1"),
    )
    lasp = F.col("s_p1q0").cast("double") / F.col("s_p0q0")
    paas = F.col("s_p1q1").cast("double") / F.col("s_p0q1")
    return sums.select(
        "p_brand", "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )
