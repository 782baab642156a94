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

from pyspark.sql import DataFrame, SparkSession
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
    "pipeline_pareto_abc",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_partkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                    OVER (ORDER BY revenue DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST((SELECT SUM(CAST(revenue AS DECIMAL(18,4)))
                       FROM part_rev) AS DOUBLE) AS cum_share
      FROM part_rev
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           {sql_dsum('revenue', 4)} AS class_revenue
    FROM ranked
    GROUP BY 1
    """,
)
def pipeline_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts ranked by revenue,
    cumulative revenue share, classes at 80% / 95% — the 80/20
    analysis every inventory and spend dashboard runs, and the shape
    that tempts a GLOBAL cumulative window (the canonical 100x scale
    killer). This plan refuses it: the win_ntile bucket-offset
    pattern generalizes from ranks to PREFIX SUMS —

    1. revenue per part (one keyed aggregation, decimal-exact);
    2. approx-percentile cuts -> B range-contiguous buckets of
       (-revenue), so bucket order == global (revenue DESC) order;
    3. per-bucket DECIMAL revenue totals (B tiny rows, collected —
       control plane) -> exact cumulative offsets per bucket,
       Python-summed as Decimal so nothing rounds;
    4. per-bucket decimal running sum (window partitioned by bucket —
       B-way parallel) + the bucket's offset = the exact global
       prefix; one double division against the exact total.

    Every prefix is a decimal sum in some order of the same values —
    order-independent, so the distributed prefix equals the oracle's
    global-window prefix bit-for-bit."""
    from decimal import Decimal

    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part_rev = (
        li.groupBy("l_partkey")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .localCheckpoint(eager=True)  # feeds cuts + totals + ranking
    )
    n_buckets = 8
    probs = [i / n_buckets for i in range(1, n_buckets)]
    work = part_rev.withColumn("_m", -F.col("revenue"))
    cuts = work.agg(F.percentile_approx("_m", probs, 10_000).alias("c")).head()[0]
    bucket = F.lit(0)
    for cut in cuts:
        bucket = bucket + F.when(F.col("_m") > F.lit(cut), 1).otherwise(0)
    bucketed = work.withColumn("_bkt", bucket.cast("int"))
    # control plane: per-bucket exact decimal totals -> offsets
    totals = {
        r["_bkt"]: r["t"]
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum(F.col("revenue").cast("decimal(18,4)")).alias("t"))
        .collect()
    }
    grand = sum(totals.values(), Decimal(0))
    offset_expr, running = F.lit(0).cast("decimal(28,4)"), Decimal(0)
    for b in range(n_buckets):
        if running and totals.get(b) is not None:
            offset_expr = F.when(
                F.col("_bkt") == b, F.lit(str(running)).cast("decimal(28,4)")
            ).otherwise(offset_expr)
        running += totals.get(b, Decimal(0))
    w_local = Window.partitionBy("_bkt").orderBy("_m", "l_partkey")
    prefix = offset_expr + F.sum(F.col("revenue").cast("decimal(18,4)")).over(w_local)
    cum_share = prefix.cast("double") / F.lit(str(grand)).cast("decimal(28,4)").cast(
        "double"
    )
    classed = bucketed.withColumn(
        "abc_class",
        F.when(cum_share <= 0.8, "A").when(cum_share <= 0.95, "B").otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum("revenue", 4).alias("class_revenue"),
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
    """Iterative pointer chase: advance every id's cursor one hop up
    the (pid, parent) edge table per round until every cursor sits on
    a root (parent < 1). Returns (id, cur=root). Each frontier is
    localCheckpoint-ed so lineage stays O(1) across rounds; the
    convergence probe is a take(1) existence check — control plane,
    not a data collect.

    Non-convergence within ``max_rounds`` RAISES instead of returning
    part-way labels: a silently truncated chase would mislabel every
    deeper node's root, and at 100 TB nobody eyeballs the output. A
    deeper hierarchy is a config decision (raise max_rounds, or
    switch to pointer-doubling for log-depth rounds), not a silent
    data-quality regression."""
    labels = parent_of.select(F.col("pid").alias("id"), F.col("pid").alias("cur"))
    for _ in range(max_rounds):
        step = (
            labels.join(parent_of, F.col("cur") == F.col("pid"))
            .select(
                "id",
                F.when(F.col("parent") >= 1, F.col("parent"))
                .otherwise(F.col("cur"))
                .alias("cur"),
                (F.col("parent") >= 1).alias("moved"),
            )
        ).localCheckpoint(eager=True)
        labels = step.select("id", "cur")
        if not step.where(F.col("moved")).take(1):
            return labels
    raise RuntimeError(
        f"hierarchy pointer chase did not converge in {max_rounds} rounds; "
        "hierarchy is deeper than the cap — raise max_rounds or use "
        "pointer doubling"
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
    "pipeline_value_anomalies",
    oracle="""
    WITH stats0 AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(25,6)) AS sxd,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DECIMAL(25,6)) AS sxxd
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n,
             CAST(sxd AS DOUBLE) AS sx, CAST(sxxd AS DOUBLE) AS sxx,
             CAST(n AS HUGEINT) * CAST(sxxd * 1000000 AS HUGEINT) * 1000000
               - CAST(sxd * 1000000 AS HUGEINT)
                 * CAST(sxd * 1000000 AS HUGEINT) AS vnum_u
      FROM stats0
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.sx / s.n)
                 / sqrt((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))),
                 6) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.n > 1 AND s.vnum_u > 0
      AND abs(round((e.value - s.sx / s.n)
              / sqrt((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))),
              6)) >= 3.0
    """,
)
def pipeline_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — statistical OUTLIER DETECTION: flag events whose
    value sits ≥ 3 sample standard deviations from its event-type
    mean (the monitoring/data-quality z-score screen; the fraud and
    sensor-fault staple). Per-type sufficient statistics (n, Σx, Σx²)
    come from the agg_corr_exact decimal recipe, so they are exact
    and partition-order independent; the z-score is then one shared
    IEEE expression tree over those agreed doubles, rounded once, and
    the ≥3 cut compares the ROUNDED value so the boundary decision is
    identical in both engines.

    Degenerate-group guard (r6 advice): a single-row or zero-variance
    event_type makes the denominator 0 — Spark IEEE division yields
    NaN/Inf (and Spark sorts NaN above every double, so |z| >= 3
    would PASS), while DuckDB returns NULL and drops the row. The
    guard's SIGN is decided in EXACT arithmetic (r7 advice): the
    double form n*sxx - sx*sx is precisely the a*b - c*d shape DuckDB
    may FMA-contract (the agg_corr_exact ledger note), so a group
    whose true numerator sits within an ulp of zero could pass in one
    engine and fail in the other. sx and sxx are exact 6-dp values by
    construction, so both engines compare
    n*(sxx*1e6)*1e6 - (sx*1e6)^2 > 0 in integer micro^2-units —
    decimal(38,0) here, HUGEINT in DuckDB — which is exact up to
    |term| < 1e38 (far beyond any tested SF) and identical by
    integer-arithmetic determinism. The z-score itself keeps the
    double tree over the agreed doubles.

    Scale shape: event_type partitions grow with the corpus, so the
    per-type stats ride as a tiny broadcast join-back (the
    corpus-bounded rule from the SCALE ledger — a window over
    event_type would put whole types in single partitions). One
    full-scan aggregate + one broadcast equi-join; output ∝
    anomalies, not events."""
    e = load_table(spark, sf_dir, "events")
    stats0 = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(25,6)").alias("sxd"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)"))
        .cast("decimal(25,6)")
        .alias("sxxd"),
    )
    sxu = (F.col("sxd") * 1000000).cast("decimal(20,0)")
    sxxu = (F.col("sxxd") * 1000000).cast("decimal(20,0)")
    stats = stats0.select(
        "event_type",
        "n",
        F.col("sxd").cast("double").alias("sx"),
        F.col("sxxd").cast("double").alias("sxx"),
        (
            F.col("n").cast("decimal(20,0)") * sxxu * 1000000 - sxu * sxu
        ).alias("vnum_u"),
    )
    z = F.round(
        (F.col("value") - F.col("sx") / F.col("n"))
        / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * (F.col("n") - 1))
        ),
        6,
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .where((F.col("n") > 1) & (F.col("vnum_u") > 0))
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) >= 3.0)
    )


@query(
    "pipeline_gini",
    oracle=f"""
    WITH cust_rev AS (
      SELECT o_custkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i
      FROM cust_rev
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE)
             AS total_revenue,
           (2 * CAST(SUM(i * CAST(revenue AS DECIMAL(18,4))) AS DOUBLE))
             / (COUNT(*) * CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                                AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*) AS gini
    FROM ranked
    """,
)
def pipeline_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration GINI coefficient over customers — the
    inequality metric beside Pareto/ABC: G = 2·Σ(i·xᵢ)/(n·Σx) −
    (n+1)/n with x ascending. The rank i is GLOBAL — the shape that
    tempts an unpartitioned window (the lint's hard GLOBW rule) — so
    this plan reuses the pareto bucket-offset pattern for RANKS:
    value-contiguous buckets from approx-percentile cuts, per-bucket
    row_number (B-way parallel windows), plus exact per-bucket count
    offsets collected as B control-plane rows. Σ(i·x) is exact:
    bigint rank × DECIMAL(18,4) revenue (an unambiguous double→
    decimal cast — revenue IS a 4-dp value by construction) summed in
    decimal; the final G is one shared IEEE expression over agreed
    doubles, emitted UNROUNDED (the win_ewma ledger rule: never
    round() an inexact double sum for the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust_rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .localCheckpoint(eager=True)  # feeds cuts + counts + ranking
    )
    n_buckets = 8
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = cust_rev.agg(
        F.percentile_approx("revenue", probs, 10_000).alias("c")
    ).head()[0]
    bucket = F.lit(0)
    for cut in cuts:
        bucket = bucket + F.when(F.col("revenue") > F.lit(cut), 1).otherwise(0)
    bucketed = cust_rev.withColumn("_bkt", bucket.cast("int"))
    # control plane: per-bucket row counts -> exact rank offsets
    counts = {
        r["_bkt"]: r["n"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offset_expr, running = F.lit(0), 0
    for b in range(n_buckets):
        if running and counts.get(b) is not None:
            offset_expr = F.when(F.col("_bkt") == b, F.lit(running)).otherwise(
                offset_expr
            )
        running += counts.get(b, 0)
    from pyspark.sql import Window

    w_local = Window.partitionBy("_bkt").orderBy("revenue", "o_custkey")
    rank = (offset_expr + F.row_number().over(w_local)).cast("long")
    rev_dec = F.col("revenue").cast("decimal(18,4)")
    ranked = bucketed.select(rev_dec.alias("rd"), rank.alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rd").alias("sx"),
        F.sum(F.col("i") * F.col("rd")).alias("six"),
    )
    n = F.col("n")
    return agg.select(
        n.alias("n_customers"),
        F.col("sx").cast("double").alias("total_revenue"),
        (
            (F.lit(2) * F.col("six").cast("double"))
            / (n * F.col("sx").cast("double"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
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
    "pipeline_value_anomalies_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value,
           0.6745 * (e.value - m.med) / m.mad AS robust_z
    FROM events e JOIN mad m USING (event_type)
    WHERE m.mad <> 0
      AND abs(0.6745 * (e.value - m.med) / m.mad) > 3.5
    """,
)
def pipeline_value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen — the MAD (median-absolute-deviation)
    twin of the z-score key: modified z = 0.6745·(x − median)/MAD
    with the Iglewicz–Hoaglin 3.5 cut. Means and standard deviations
    are themselves dragged by the outliers they hunt; medians are
    not — this is the screen that stays calibrated when a sensor
    wedges at a huge constant. Two grouped exact medians (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the agg_percentile-
    proven pair), each joined back broadcast (per-type stats are
    corpus-bounded — the SCALE ledger join-back rule), then one
    shared IEEE expression per row with the cut on the RAW value —
    nothing rounded, per the win_ewma ledger rule. Two full-scan
    aggregates + two broadcast joins; output ∝ anomalies.

    Degenerate-group guard (r6 advice): MAD = 0 whenever > 50% of a
    type's values equal its median — then Spark's x/0 is NaN/Inf
    (NaN sorts above every double, so the > 3.5 cut PASSES) while
    DuckDB's is NULL (row dropped). Both engines exclude mad = 0
    groups explicitly, mirroring osm_polygon_centroid's a2 <> 0
    guard."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
    )
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        e.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") != 0.0)
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
        .where(F.abs(F.col("robust_z")) > 3.5)
    )


@query(
    "pipeline_revenue_trend_forecast",
    oracle=f"""
    WITH monthly AS (
      SELECT date_diff('month', TIMESTAMP '1992-01-01',
                       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
               AS mi,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    ),
    fit AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(mi AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(mi * CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(mi * CAST(mi AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
             MAX(mi) AS last_mi
      FROM monthly
    ),
    coefs AS (
      SELECT n, last_mi,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept
      FROM fit
    )
    SELECT CAST(last_mi + h AS INT) AS month_index,
           slope, intercept,
           intercept + slope * (last_mi + h) AS projected_revenue
    FROM coefs, generate_series(1, 3) AS g(h)
    """,
)
def pipeline_revenue_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-trend revenue FORECAST — ordinary least squares over
    the monthly revenue series, projected 3 months past the last
    observed month: the baseline every real forecasting system is
    benchmarked against (and the planning number a finance team asks
    for first). Slope/intercept come from exact decimal sufficient
    statistics (n, Σx, Σy, Σxy, Σx² — the agg_corr_exact recipe:
    month indexes are exact integers, revenues exact 2-dp decimals),
    so the normal-equation solution is one shared IEEE expression
    over agreed doubles, emitted UNROUNDED per the win_ewma rule; the
    3 projections are pure arithmetic on those coefficients. One
    keyed aggregate + one 1-row global fold — the forecast itself is
    control-plane sized."""
    o = load_table(spark, sf_dir, "orders")
    mi = F.months_between(
        F.date_trunc("month", "o_orderdate"), F.lit("1992-01-01").cast("timestamp")
    ).cast("long")
    monthly = o.groupBy(mi.alias("mi")).agg(dsum("o_totalprice").alias("revenue"))
    rev_d = F.col("revenue").cast("decimal(18,2)")
    mi_d = F.col("mi").cast("decimal(18,0)")
    fit = monthly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(mi_d).cast("double").alias("sx"),
        F.sum(rev_d).cast("double").alias("sy"),
        F.sum(F.col("mi") * rev_d).cast("double").alias("sxy"),
        F.sum(F.col("mi") * mi_d).cast("double").alias("sxx"),
        F.max("mi").alias("last_mi"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    coefs = fit.select(
        "last_mi", slope.alias("slope"), intercept.alias("intercept")
    )
    horizons = coefs.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("h")
    )
    return horizons.select(
        (F.col("last_mi") + F.col("h")).cast("int").alias("month_index"),
        "slope",
        "intercept",
        (
            F.col("intercept") + F.col("slope") * (F.col("last_mi") + F.col("h"))
        ).alias("projected_revenue"),
    )


@query(
    "pipeline_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
      FROM events WHERE event_type = 'purchase'
    ),
    stats AS (
      SELECT grp,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 'A' THEN n END) AS na,
             MAX(CASE WHEN grp = 'A' THEN sx END) AS sxa,
             MAX(CASE WHEN grp = 'A' THEN sxx END) AS sxxa,
             MAX(CASE WHEN grp = 'B' THEN n END) AS nb,
             MAX(CASE WHEN grp = 'B' THEN sx END) AS sxb,
             MAX(CASE WHEN grp = 'B' THEN sxx END) AS sxxb
      FROM stats
    )
    SELECT na, nb,
           sxa / na AS mean_a,
           sxb / nb AS mean_b,
           sxb / nb - sxa / na AS lift,
           (sxb / nb - sxa / na)
             / sqrt(((na * sxxa - sxa * sxa) / (na * (na - 1.0))) / na
                    + ((nb * sxxb - sxb * sxb) / (nb * (nb - 1.0))) / nb)
             AS t_stat,
           abs((sxb / nb - sxa / na)
               / sqrt(((na * sxxa - sxa * sxa) / (na * (na - 1.0))) / na
                      + ((nb * sxxb - sxb * sxb) / (nb * (nb - 1.0))) / nb))
             > 1.96 AS significant
    FROM wide
    """,
)
def pipeline_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-experiment readout — Welch's two-sample t statistic over
    purchase values, arms assigned deterministically by user-id
    parity (the hash-bucketing shape of every experimentation
    platform; content-derived assignment, never ingest order): per-
    arm exact decimal sufficient statistics (the z-score recipe),
    then mean lift, t = Δmean/√(s²ᴬ/nᴬ + s²ᴮ/nᴮ), and a 1.96 cut
    applied to the same unrounded double in both engines. One keyed
    aggregate → a 2-row pivot → a 1-row readout: the entire
    experiment analysis is control-plane sized after one corpus
    pass."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        "value",
    )
    stats = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)"))
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{g.lower()}")
            for g in ("A", "B")
            for c in ("n", "sx", "sxx")
        ]
    )
    na, nb = F.col("na"), F.col("nb")
    mean_a, mean_b = F.col("sxa") / na, F.col("sxb") / nb
    var_a = (na * F.col("sxxa") - F.col("sxa") * F.col("sxa")) / (na * (na - F.lit(1.0)))
    var_b = (nb * F.col("sxxb") - F.col("sxb") * F.col("sxb")) / (nb * (nb - F.lit(1.0)))
    t = (mean_b - mean_a) / F.sqrt(var_a / na + var_b / nb)
    return wide.select(
        "na",
        "nb",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_b - mean_a).alias("lift"),
        t.alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant"),
    )


@query(
    "pipeline_two_proportion_z",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS c_t,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS c_c
      FROM units
    ),
    z AS (
      SELECT n_t, n_c, c_t, c_c,
             CAST(c_t AS DOUBLE) / n_t AS rate_t,
             CAST(c_c AS DOUBLE) / n_c AS rate_c,
             CAST(c_t + c_c AS DOUBLE) / (n_t + n_c) AS pooled
      FROM arms
    ),
    zz AS (
      SELECT n_t, n_c, c_t, c_c, rate_t, rate_c,
             CASE WHEN pooled > 0 AND pooled < 1
                  THEN (rate_t - rate_c)
                       / sqrt(pooled * (1 - pooled)
                              * (1.0 / n_t + 1.0 / n_c))
             END AS z_score
      FROM z
    )
    SELECT n_t, n_c, c_t, c_c, rate_t, rate_c, z_score,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM zz
    """,
)
def pipeline_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION z-test on CONVERSION (did the user ever make a
    HIGH-VALUE purchase, > 150?) between the parity experiment arms —
    the missing third leg of the A/B readout triple: pipeline_ab_test
    tests the MEAN, pipeline_ks_test the DISTRIBUTION, this the RATE
    (the metric most experiments actually ship on). Unit of analysis
    is the USER (one converted flag per user — per-event counting
    would double-count multi-purchase users and break the binomial
    model). The value threshold exists because EVERY fixture user
    purchases *something* (measured: bare purchase-conversion is 1.0
    in both arms → zero pooled variance → all-NULL output); > 150
    lands the rates near 0.45 at every SF with real arm variance.

    z = (p̂_t − p̂_c)/√(p̂(1−p̂)(1/n_t+1/n_c)) with the pooled p̂ —
    every ingredient an exact integer, so z is one shared IEEE tree,
    emitted UNROUNDED. Degenerate pooled rates (0 or 1: zero
    variance) emit NULL z/p in both engines, never a division crash.
    The two-sided p uses the logistic CDF approximation of Φ
    (|error| < 0.01 — the bh_fdr precedent), rounded at its
    transcendental to 6 dp with the decision reading the rounded
    value.

    Scale: one groupBy(user) pass (partial-agg friendly), then a
    1-row fold — sufficient statistics all the way down."""
    e = load_table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    arm = F.col("user_id") % 2
    arms = units.agg(
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(arm == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_t"),
        F.sum(F.when(arm == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_c"),
    )
    rate_t = F.col("c_t").cast("double") / F.col("n_t")
    rate_c = F.col("c_c").cast("double") / F.col("n_c")
    pooled = (F.col("c_t") + F.col("c_c")).cast("double") / (
        F.col("n_t") + F.col("n_c")
    )
    z = arms.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        rate_t.alias("rate_t"),
        rate_c.alias("rate_c"),
        pooled.alias("pooled"),
    )
    zz = z.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        "rate_t",
        "rate_c",
        F.when(
            (F.col("pooled") > 0) & (F.col("pooled") < 1),
            (F.col("rate_t") - F.col("rate_c"))
            / F.sqrt(
                F.col("pooled")
                * (1 - F.col("pooled"))
                * (
                    F.lit(1.0) / F.col("n_t")
                    + F.lit(1.0) / F.col("n_c")
                )
            ),
        ).alias("z_score"),
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(F.col("z_score")))), 6)
    return zz.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        "rate_t",
        "rate_c",
        "z_score",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_seasonal_index",
    oracle=f"""
    WITH monthly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS y,
             EXTRACT(month FROM o_orderdate) AS m,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1, 2
    ),
    yearly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS y,
             {sql_dsum('o_totalprice')} / 12 AS mean_month
      FROM orders GROUP BY 1
    ),
    ratios AS (
      SELECT mo.m, round(mo.revenue / yr.mean_month, 6) AS r
      FROM monthly mo JOIN yearly yr USING (y)
    )
    SELECT CAST(m AS INT) AS month_of_year,
           COUNT(*) AS n_years,
           CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS seasonal_index
    FROM ratios GROUP BY m
    """,
)
def pipeline_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical SEASONALITY indices — each calendar month's revenue
    as a ratio to its year's monthly mean, averaged across years: the
    multiplicative-decomposition factor a demand planner applies
    before comparing months (and the sanity check behind 'is December
    really up, or is it just December?'). Deliberately windowless:
    the textbook centered-moving-average formulation needs a GLOBAL
    ordered window (the lint's hard rule); the year-relative
    formulation is two keyed aggregations + a broadcast join-back and
    gives the same seasonal factors for complete years. Each ratio is
    ONE division of two exactly-agreed doubles, rounded per-term at
    6 dp (per-row values — the transcendental-term rule), then
    decimal-averaged so the cross-year mean is order-independent."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    monthly = o.groupBy(
        y.alias("y"), F.month("o_orderdate").alias("m")
    ).agg(dsum("o_totalprice").alias("revenue"))
    yearly = o.groupBy(y.alias("y")).agg(
        (dsum("o_totalprice") / 12).alias("mean_month")
    )
    ratios = monthly.join(F.broadcast(yearly), "y").select(
        "m", F.round(F.col("revenue") / F.col("mean_month"), 6).alias("r")
    )
    return ratios.groupBy(F.col("m").cast("int").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_years"),
        (
            F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seasonal_index"),
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


# ---------------------------------------------------------------------------
# Two-sample hypothesis tests (r9). Both tests run on the same framing
# as pipeline_ab_test: purchase values, arms by user-id parity. The
# shared machinery is a per-distinct-value count table with EXACT
# cumulative counts, built with the zipf/gini bucket-offset pattern
# (value-contiguous buckets from approx-percentile cuts, per-bucket
# parallel windows, <=B collected offset rows) — never a global
# window.
# ---------------------------------------------------------------------------

_TWO_SAMPLE_SQL_CTE = """
    assigned AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    by_val AS (
      SELECT value, SUM(is_a) AS c_a, SUM(1 - is_a) AS c_b
      FROM assigned GROUP BY value
    ),
    tot AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM by_val),
    cum AS (
      SELECT value, c_a, c_b, c_a + c_b AS c,
             SUM(c_a) OVER (ORDER BY value) AS cum_a,
             SUM(c_b) OVER (ORDER BY value) AS cum_b
      FROM by_val
    )
"""


def _two_sample_value_cum(spark: SparkSession, sf_dir: str):
    """(cum_df, n_a, n_b): per-distinct-value counts for the two arms
    with exact inclusive cumulative counts, plus the exact arm sizes
    (control-plane ints from the same <=B offset rows the cumulative
    needs anyway).

    cum_df columns: value, c_a, c_b, c (=c_a+c_b), cum_a, cum_b —
    everything an ECDF- or rank-based statistic needs. The distinct-
    value table is localCheckpointed: cuts, offsets and the windowed
    pass all read it, and this build never reuses exchange subtrees.
    At 100 TB pre-quantize `value` to a fixed grid first (the table
    is distinct-value-bounded, which for continuous measurements is
    corpus-sized without quantization)."""
    from osm_airflow_spark.bucketing import bucketed_running

    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
        "value",
    )
    by_val = (
        assigned.groupBy("value")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
        .localCheckpoint(eager=True)
    )
    out, totals = bucketed_running(by_val, "value", ["c_a", "c_b"])
    cum = out.select(
        "value",
        "c_a",
        "c_b",
        (F.col("c_a") + F.col("c_b")).alias("c"),
        F.col("run_c_a").alias("cum_a"),
        F.col("run_c_b").alias("cum_b"),
    )
    return cum, totals["c_a"], totals["c_b"]


@query(
    "pipeline_ks_test",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL_CTE},
    dmax AS (
      SELECT MAX(ABS(cum_a * n_b - cum_b * n_a)) AS d_num
      FROM cum, tot
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(d_num AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
           (sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
            + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
             * (CAST(d_num AS DOUBLE)
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS lambda,
           least(1.0, round(2.0 * exp(
             -2.0 * ((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
                      + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
                     * (CAST(d_num AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
                  * ((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
                      + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
                     * (CAST(d_num AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))), 6))
             AS p_approx
    FROM dmax, tot
    """,
)
def pipeline_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — two-sample Kolmogorov–Smirnov test on
    purchase values between the parity-assigned experiment arms: the
    distribution-shift companion to pipeline_ab_test's mean-shift t
    (an A/B platform reports both — KS catches variance/shape moves a
    t-test is blind to; the same statistic gates training-data drift
    between corpus snapshots). D = max |ECDF_A − ECDF_B| is kept
    EXACT as the integer max of |cum_a·n_b − cum_b·n_a| over distinct
    values, divided once at the end; the supremum over a step
    function is attained at a sample point, so scanning distinct
    values IS the exact D. The p-value uses the standard asymptotic
    Kolmogorov tail (first series term, with Stephens'
    small-sample λ correction) — its exp() is rounded at emission
    (the libm rule), everything upstream a shared IEEE tree over
    exact ints and correctly-rounded sqrt.

    Scale: one corpus pass to distinct-value counts, then the
    cumulative runs on the BOUNDED distinct-value table via the
    bucket-offset pattern (8-way parallel windows + collected
    offsets, no global window). The long products cum·n overflow
    past ~3·10⁹ rows per arm — switch to decimal(38,0) there (noted,
    not paid: the comparison stays JVM-side either way)."""
    cum, n_a, n_b = _two_sample_value_cum(spark, sf_dir)
    d_num = F.max(
        F.abs(F.col("cum_a") * F.lit(n_b) - F.col("cum_b") * F.lit(n_a))
    )
    stat = cum.agg(d_num.alias("d_num"))
    na_d = F.lit(float(n_a))
    nb_d = F.lit(float(n_b))
    d_stat = F.col("d_num").cast("double") / (na_d * nb_d)
    sqrt_ne = F.sqrt(na_d * F.lit(n_b) / F.lit(n_a + n_b))
    lam = (sqrt_ne + 0.12 + 0.11 / sqrt_ne) * d_stat
    return stat.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        d_stat.alias("d_stat"),
        lam.alias("lambda"),
        F.least(
            F.lit(1.0), F.round(2.0 * F.exp(-2.0 * lam * lam), 6)
        ).alias("p_approx"),
    )


@query(
    "pipeline_mann_whitney",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL_CTE},
    ranked AS (
      SELECT SUM(c_a * (2 * (cum_a + cum_b - c) + c + 1)) AS two_r_a,
             SUM(c * c * c - c) AS tie_term
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
             AS u_a,
           CAST(n_a AS DOUBLE) * n_b
             - CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
             AS u_b,
           CAST(tie_term AS BIGINT) AS tie_term,
           (CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
            - CAST(n_a AS DOUBLE) * n_b / 2.0)
           / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                  * ((n_a + n_b + 1.0)
                     - CAST(tie_term AS DOUBLE)
                       / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))))
             AS z_score
    FROM ranked, tot
    """,
)
def pipeline_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Mann–Whitney U (Wilcoxon rank-sum) on the
    same two-arm framing: the nonparametric location test an A/B
    readout falls back to when values are heavy-tailed enough that
    pipeline_ab_test's t is untrustworthy (exactly the revenue-per-
    user shape). Midrank tie handling is kept EXACT in integers:
    for each distinct value, midrank = rank_before + (c+1)/2, so the
    doubled rank-sum 2·R_A = Σ c_a·(2·cum_before + c + 1) is an
    exact long and U_A = R_A − n_A(n_A+1)/2 only becomes a (dyadic,
    exact) double at emission. The normal approximation's z uses the
    standard tie-corrected variance — one sqrt over exact-int
    ratios, a shared IEEE tree emitted unrounded (no transcendental
    at all, so no rounding anywhere).

    Scale: identical machinery (and cost) to pipeline_ks_test — the
    two tests share _two_sample_value_cum's bounded distinct-value
    cumulative. The c³ tie term overflows long past c ≈ 2·10⁶
    duplicates of ONE value — pre-quantized grids at 100 TB need the
    decimal(38,0) form (noted)."""
    cum, n_a, n_b = _two_sample_value_cum(spark, sf_dir)
    cum_before = F.col("cum_a") + F.col("cum_b") - F.col("c")
    ranked = cum.agg(
        F.sum(
            F.col("c_a") * (2 * cum_before + F.col("c") + 1)
        ).alias("two_r_a"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    # the product is computed in PYTHON: two IntegerType literals
    # multiplied column-side overflow int32 at n_a >= 46341 and ANSI
    # (on in this build) turns that into ARITHMETIC_OVERFLOW at
    # constant folding (r9 self-review, reproduced)
    u_a = (
        F.col("two_r_a") - F.lit(n_a * (n_a + 1))
    ).cast("double") / 2.0
    mu = F.lit(float(n_a)) * F.lit(n_b) / 2.0
    n = n_a + n_b
    var = (F.lit(float(n_a)) * F.lit(n_b) / 12.0) * (
        F.lit(float(n + 1))
        - F.col("tie_term").cast("double")
        / (F.lit(float(n)) * F.lit(n - 1.0))
    )
    return ranked.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        u_a.alias("u_a"),
        (F.lit(float(n_a)) * F.lit(n_b) - u_a).alias("u_b"),
        F.col("tie_term").cast("long").alias("tie_term"),
        ((u_a - mu) / F.sqrt(var)).alias("z_score"),
    )


_KW_TR = ", ".join(
    f"SUM(c{k} * (2 * (run_c - c) + c + 1)) AS tr{k}" for k in range(7)
)
_KW_N = ", ".join(f"SUM(c{k}) AS n{k}" for k in range(7))
_KW_SU = " + ".join(
    f"(CASE WHEN n{k} > 0 THEN CAST(tr{k} AS DOUBLE) * tr{k} / n{k} "
    f"ELSE 0.0 END)"
    for k in range(7)
)


@query(
    "pipeline_kruskal_wallis",
    oracle=f"""
    WITH pur AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    by_val AS (
      SELECT value,
             {", ".join(
                 f"SUM(CASE WHEN g = {k} THEN 1 ELSE 0 END) AS c{k}"
                 for k in range(7)
             )},
             COUNT(*) AS c
      FROM pur GROUP BY value
    ),
    cum AS (
      SELECT *, SUM(c) OVER (ORDER BY value) AS run_c FROM by_val
    ),
    agg AS (
      SELECT {_KW_TR}, {_KW_N},
             SUM(c * c * c - c) AS tie_term,
             SUM(c) AS n
      FROM cum
    ),
    hs AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(tie_term AS BIGINT) AS tie_term,
             3.0 * ({_KW_SU}) / (CAST(n AS DOUBLE) * (n + 1))
               - 3.0 * (n + 1) AS h_stat,
             1.0 - CAST(tie_term AS DOUBLE)
                   / CAST(n * n * n - n AS DOUBLE) AS tie_c
      FROM agg
    ),
    hc AS (
      SELECT n, tie_term, h_stat,
             CASE WHEN tie_c > 0 THEN h_stat / tie_c END AS h_corrected
      FROM hs
    )
    SELECT n, tie_term, h_stat, h_corrected,
           round(exp(-(h_corrected / 2))
                 * (1 + (h_corrected / 2)
                      + ((h_corrected / 2) * (h_corrected / 2)) / 2), 6)
             AS p_approx,
           round(exp(-(h_corrected / 2))
                 * (1 + (h_corrected / 2)
                      + ((h_corrected / 2) * (h_corrected / 2)) / 2), 6)
             < 0.05 AS significant
    FROM hc
    """,
)
def pipeline_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL–WALLIS H test (Kruskal & Wallis 1952) of purchase
    value across the seven weekdays — the RANK-based sibling of
    pipeline_anova's F (the k-group generalization of
    pipeline_mann_whitney exactly as anova generalizes ab_test):
    the weekday-effect readout that survives the heavy-tailed
    revenue-per-event shape a variance-based F is fragile on.
    H = 12/(n(n+1)) Σ_g R_g²/n_g − 3(n+1), tie-corrected by
    C = 1 − Σ(t³−t)/(n³−n).

    Exactness discipline — three house patterns composed: (1) the
    mann_whitney DOUBLED midrank identity per distinct value
    (2R_g = Σ c_g(2·cum_before + c + 1)) keeps every rank sum an
    exact integer with no halves; (2) the pooled cumulative runs on
    the BOUNDED distinct-value table via the bucket-offset pattern
    (no global window — lint-clean); (3) the 7 per-group terms
    reduce through a WIDE PIVOT (the anova rule) so Σ tr_g²/n_g is a
    fixed-order IEEE tree over exact-int casts — with doubled ranks,
    Σ R²/n = ¼ Σ (2R)²/n, so the 12/(n(n+1)) coefficient becomes 3.
    H and the tie correction are therefore bit-identical unrounded;
    the chi²₆ survival (even dof: exp(−H/2)(1 + h + h²/2)) is the
    only transcendental, rounded 6 dp with the decision reading the
    rounded value (the bh_fdr rule). Degenerate all-ties input
    (C = 0) emits NULL H_corr/p in both engines, never a crash.

    Scale: one corpus pass to distinct-value group counts; everything
    after is distinct-value-bounded (pre-quantize continuous values
    at 100 TB — the _two_sample_value_cum note); weekday extraction
    is Spark weekday() ≡ DuckDB isodow−1 (the 1=Sunday trap dodged,
    the anova precedent). Integer headroom: the tie-correction's
    n³−n runs in Spark LONG vs DuckDB HUGEINT, so past n ≈ 2×10⁶
    pooled events the Spark side needs the decimal(38,0) upgrade
    (the wilcoxon 2n(n+1)(2n+1) note — same cliff, same knob)."""
    from osm_airflow_spark.bucketing import bucketed_running

    e = load_table(spark, sf_dir, "events")
    pur = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    by_val = (
        pur.groupBy("value")
        .agg(
            *[
                F.sum(F.when(F.col("g") == k, 1).otherwise(0)).alias(f"c{k}")
                for k in range(7)
            ],
            F.count(F.lit(1)).alias("c"),
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    out, _totals = bucketed_running(by_val, "value", ["c"])
    cum_before = F.col("run_c") - F.col("c")
    agg = out.agg(
        *[
            F.sum(
                F.col(f"c{k}") * (2 * cum_before + F.col("c") + 1)
            ).alias(f"tr{k}")
            for k in range(7)
        ],
        *[F.sum(f"c{k}").alias(f"n{k}") for k in range(7)],
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias(
            "tie_term"
        ),
        F.sum("c").alias("n"),
    )
    su = None
    for k in range(7):
        trd = F.col(f"tr{k}").cast("double")
        term = F.when(
            F.col(f"n{k}") > 0, trd * trd / F.col(f"n{k}")
        ).otherwise(F.lit(0.0))
        su = term if su is None else su + term
    nd = F.col("n").cast("double")
    h_stat = F.lit(3.0) * su / (nd * (F.col("n") + 1)) - F.lit(3.0) * (
        F.col("n") + 1
    )
    tie_c = F.lit(1.0) - F.col("tie_term").cast("double") / (
        F.col("n") * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    hs = agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("tie_term").cast("long").alias("tie_term"),
        h_stat.alias("h_stat"),
        tie_c.alias("tie_c"),
    )
    hc = hs.select(
        "n",
        "tie_term",
        "h_stat",
        F.when(F.col("tie_c") > 0, F.col("h_stat") / F.col("tie_c")).alias(
            "h_corrected"
        ),
    )
    half = F.col("h_corrected") / 2
    p = F.round(F.exp(-half) * (1 + half + (half * half) / 2), 6)
    return hc.select(
        "n",
        "tie_term",
        "h_stat",
        "h_corrected",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_chi_square",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT p, SUM(o) AS r FROM cells GROUP BY p),
    cols_ AS (SELECT s, SUM(o) AS c FROM cells GROUP BY s),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT p) AS nr,
                   COUNT(DISTINCT s) AS nc
            FROM cells),
    terms AS (
      SELECT round(
               (CAST(o AS DOUBLE)
                - CAST(r AS DOUBLE) * c / n)
               * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
               / (CAST(r AS DOUBLE) * c / n), 6) AS t
      FROM cells JOIN rows_ USING (p) JOIN cols_ USING (s), tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nr AS BIGINT) AS n_rows,
           CAST(nc AS BIGINT) AS n_cols,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
           sqrt(CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE)
                / (n * least(nr - 1, nc - 1))) AS cramers_v
    FROM terms, tot
    GROUP BY n, nr, nc
    """,
)
def pipeline_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — chi-square test of independence between order
    priority and order status (the categorical-association readout:
    'does fulfilment status depend on priority?'), with Cramér's V
    as the effect size. The contingency table is one keyed aggregate
    (cells are (priorities × statuses)-bounded); row/column margins
    re-aggregate the CHECKPOINTED 15-row cell table (broadcast
    join-backs — this build never reuses exchange subtrees, so the
    barrier stops the corpus scan re-running per margin). Each
    (o−e)²/e term is a shared IEEE tree over exact counts, rounded
    to 6 dp per the term rule and decimal-summed so the cell order
    can't matter; Cramér's V is one sqrt over the agreed sum,
    emitted unrounded. Output is ONE row; everything after the first
    aggregate is control-plane sized."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)  # 15 rows; margins + terms + totals
    )
    rows_ = cells.groupBy("p").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("s").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("p").alias("nr"),
        F.countDistinct("s").alias("nc"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        6,
    )
    terms = (
        cells.join(F.broadcast(rows_), "p")
        .join(F.broadcast(cols_), "s")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("t"), "n", "nr", "nc")
    )
    chi2 = F.sum(F.col("t").cast("decimal(18,6)")).cast("double")
    return (
        terms.groupBy("n", "nr", "nc")
        .agg(chi2.alias("chi2"))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("nr").cast("long").alias("n_rows"),
            F.col("nc").cast("long").alias("n_cols"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.col("chi2"),
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ).alias("cramers_v"),
        )
    )


@query(
    "pipeline_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
                           AS DECIMAL(30,6))) AS DOUBLE) AS sxx
      FROM daily GROUP BY event_type
    ),
    params AS (
      SELECT event_type, n_days,
             sx / n_days AS mu,
             sqrt((n_days * sxx - sx * sx)
                  / (n_days * (n_days - 1.0))) AS sigma
      FROM stats
    ),
    walk AS (
      SELECT d.event_type, d.day, p.n_days, p.mu, p.sigma,
             CAST(SUM(d.x) OVER w AS DOUBLE)
               - (ROW_NUMBER() OVER w) * (p.mu + 0.5 * p.sigma) AS pref
      FROM daily d JOIN params p USING (event_type)
      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cusum AS (
      SELECT event_type, day, n_days, mu, sigma,
             pref - least(0.0, MIN(pref) OVER (PARTITION BY event_type
                                    ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)) AS c_plus
      FROM walk
    ),
    best AS (
      SELECT event_type, day, n_days, mu, sigma, c_plus,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY c_plus DESC, day) AS rn
      FROM cusum
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           mu, sigma,
           c_plus AS max_cusum,
           strftime(day, '%Y-%m-%d') AS peak_day,
           c_plus > 4.0 * sigma AS breached
    FROM best WHERE rn = 1
    """,
)
def pipeline_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — CUSUM drift detection over the daily value
    series of each event type (Page 1954): the sequential
    change-point statistic every metrics platform runs on KPIs, and
    the standard alternative to pipeline_value_anomalies' pointwise
    z-cut for SUSTAINED small shifts. The textbook recursion
    C⁺_t = max(0, C⁺_{t-1} + x_t − μ − kσ) looks stateful, but has
    the closed form C⁺_t = P_t − min_{0≤i≤t} P_i over the drift-
    corrected prefix sum P with P_0 = 0 — so it is two ordered
    windows (a cumulative and a running min folded with 0), no
    applyInPandas, no recursion. The P_0 term matters: dropping it
    understates C⁺ whenever the prefix starts positive and silently
    missed a first-day spike (r9 self-review, test-pinned).
    Allowance k=0.5σ, decision threshold h=4σ (the classic ARL
    tuning); the key reports each type's peak statistic, its day,
    and whether the threshold was breached.

    Determinism: daily totals are EXACT decimals; the cumulative is
    a decimal window sum (the win_running_sum rule — frame
    evaluation order cannot matter) cast once to double; the
    per-row subtraction of rn·(μ+kσ) is a shared IEEE tree over
    that cast and the agreed μ/σ (exact sufficient stats, sqrt
    correctly rounded); the running MIN is selection, not
    arithmetic — order-independent on agreed doubles. Peak
    selection breaks ties by earliest day.

    Scale: one corpus pass to (type × day) dailies; all windows
    partition by event_type over DAYS — calendar-bounded partitions
    (the house bounded-window rule), ~10⁴ rows per type after
    decades. Stats ride back as a types-bounded broadcast join."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
        .localCheckpoint(eager=True)  # stats + walk both read it
    )
    xd = F.col("x").cast("double")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.round(xd * xd, 6).cast("decimal(30,6)"))
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sxx = F.col("n_days"), F.col("sx"), F.col("sxx")
    params = stats.select(
        "event_type",
        "n_days",
        (sx / n).alias("mu"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))).alias("sigma"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = daily.join(F.broadcast(params), "event_type")
    pref = F.sum("x").over(w).cast("double") - F.row_number().over(
        Window.partitionBy("event_type").orderBy("day")
    ) * (F.col("mu") + 0.5 * F.col("sigma"))
    walk = joined.select(
        "event_type", "day", "n_days", "mu", "sigma", pref.alias("pref")
    )
    # the running min includes the EMPTY prefix P_0 = 0 (least with
    # 0): without it C+ is understated whenever the drift-corrected
    # prefix starts positive — a first-day spike was silently missed
    # (r9 self-review finding, pinned by the first-day-spike test)
    c_plus = F.col("pref") - F.least(F.lit(0.0), F.min("pref").over(w))
    cusum = walk.select(
        "event_type", "day", "n_days", "mu", "sigma", c_plus.alias("c_plus")
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("c_plus").desc(), F.col("day")
        )
    )
    return (
        cusum.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            "mu",
            "sigma",
            F.col("c_plus").alias("max_cusum"),
            F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
            (F.col("c_plus") > 4.0 * F.col("sigma")).alias("breached"),
        )
    )


@query(
    "pipeline_survival_km",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             MAX(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey) AS cmax
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey,
             MIN(CASE WHEN rn = 1 THEN od END) AS t1,
             MIN(CASE WHEN rn = 2 THEN od END) AS t2,
             MAX(cmax) AS cmax
      FROM ranked WHERE rn <= 2 GROUP BY o_custkey
    ),
    g AS (SELECT MAX(cmax) AS gmax, COUNT(*) AS total FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM spells GROUP BY t
    ),
    cum AS (
      SELECT t, d, c, total,
             COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM by_time, g
    ),
    terms AS (
      SELECT t, d, c, total - before AS n_risk,
             CASE
               WHEN d > 0 AND d < total - before THEN
                 CAST(round(round(ln(1.0 - CAST(d AS DOUBLE)
                                        / (total - before)), 6)
                            * 1000000, 0) AS BIGINT)
               WHEN d > 0 THEN -99000000000
               ELSE 0 END AS micro
      FROM cum
    ),
    surv AS (
      SELECT t, d, c, n_risk,
             SUM(micro) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumm
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           round(exp(CAST(cumm AS DOUBLE) / 1000000), 6) AS survival
    FROM surv
    """,
)
def pipeline_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Kaplan–Meier survival over time-to-reorder:
    each customer's spell runs from their first order to their second
    (event) or to the end of observation (right-censored at the
    corpus max date) — the churn/repeat-purchase curve every
    lifecycle team reads, and the estimator that handles censoring
    correctly where a naive mean-gap (pipeline_median_order_gap)
    silently drops one-order customers. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)
    with nᵢ = at-risk (Kaplan & Meier 1958).

    Determinism: the product runs in LOG space as a running sum of
    per-time terms, each ln(1 − d/n) of an exact-int ratio rounded
    to 6 dp at the transcendental and SCALED TO INTEGER MICROS — so
    the running sum is exact long addition (order-independent, no
    decimal plumbing), and the final exp(Σ/1e6) is rounded at
    emission (the libm rule). A time where everyone at risk fails
    (d = n) gets the −9.9e10-micro sentinel: exp underflows to an
    EXACT double 0.0 identically in both engines. n_risk derives
    from the same exact cumulative.

    Scale: the per-customer spell extraction is a bounded window
    (orders per customer); distinct spell lengths are
    calendar-bounded (~10³ rows after years), and BOTH running
    passes over them (the at-risk cumulative, then the log-micro
    sum, which depends on the first) use the bucket-offset pattern —
    two ≤B control-plane collects, no global window. The corpus max
    date and cohort size ride as one broadcast row."""
    from pyspark.sql import Window

    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wmax = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.row_number().over(wc).alias("rn"),
        F.max(F.col("o_orderdate").cast("date")).over(wmax).alias("cmax"),
    ).where(F.col("rn") <= 2)
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("od"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("od"))).alias("t2"),
        F.max("cmax").alias("cmax"),
    ).localCheckpoint(eager=True)  # feeds the 1-row globals AND spells
    g = per_cust.agg(
        F.max("cmax").alias("gmax"), F.count(F.lit(1)).alias("total")
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "total",
    )
    by_time = (
        spells.groupBy("t", "total")
        .agg(F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c"))
        .withColumn("dc", F.col("d") + F.col("c"))
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc"])
    before = F.col("run_dc") - F.col("dc")
    n_risk = F.col("total") - F.col("before")
    ratio = F.lit(1.0) - F.col("d").cast("double") / n_risk
    micro = (
        F.when(
            (F.col("d") > 0) & (F.col("d") < n_risk),
            F.round(F.round(F.log(ratio), 6) * 1_000_000, 0).cast("long"),
        )
        .when(F.col("d") > 0, F.lit(-99_000_000_000))
        .otherwise(F.lit(0))
    )
    terms = (
        out1.withColumn("before", before)
        .select(
            "t",
            "d",
            "c",
            n_risk.alias("n_risk"),
            micro.alias("micro"),
        )
        .localCheckpoint(eager=True)  # second offset collect + window
    )
    out2, _ = bucketed_running(terms, "t", ["micro"])
    cumm = F.col("run_micro")
    return out2.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.round(F.exp(cumm.cast("double") / 1_000_000), 6).alias("survival"),
    )


def _exact_median_1row(df: DataFrame, col: str):
    """Exact median of a BOUNDED value column as a 1-row DataFrame
    (column ``med``), via the bucket-offset rank pattern — no global
    window. Median = mean of the rank-⌈n/2⌉ and rank-⌈(n+1)/2⌉
    values (equal when n is odd); computed as Σ value·hits / Σ hits
    where hits counts how many of the two target ranks fall inside
    each distinct value's rank span — bit-identical to the SQL
    two-rank formulation because two-term IEEE addition is
    commutative and the division is shared. Returns (df_1row, n)."""
    from osm_airflow_spark.bucketing import bucketed_running

    vals = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    out, totals = bucketed_running(vals, col, ["_c"])
    n = totals["_c"]
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    cum = F.col("run__c")
    lo = cum - F.col("_c") + 1
    hits = F.when((lo <= k1) & (cum >= k1), 1).otherwise(0) + F.when(
        (lo <= k2) & (cum >= k2), 1
    ).otherwise(0)
    med = out.select(F.col(col).alias("_v"), hits.alias("_h")).agg(
        (
            F.sum(F.col("_v") * F.col("_h")).cast("double") / F.sum("_h")
        ).alias("med")
    )
    return med, n


@query(
    "pipeline_theil_sen",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rdec
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT mi - (SELECT MIN(mi) FROM monthly) AS m,
             CAST(rdec AS DOUBLE) AS r, rdec
      FROM monthly
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(m) AS BIGINT) AS sx,
             CAST(SUM(m * m) AS BIGINT) AS sxx,
             CAST(SUM(rdec) AS DOUBLE) AS sy,
             CAST(SUM(m * rdec) AS DOUBLE) AS sxy
      FROM base
    ),
    pairs AS (
      SELECT (b.r - a.r) / (b.m - a.m) AS slope
      FROM base a JOIN base b ON b.m > a.m
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             COUNT(*) OVER () AS np FROM pairs
    ),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                           THEN slope END) AS DOUBLE)
             / COUNT(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                          THEN 1 END) AS ts_slope,
             MAX(np) AS n_pairs
      FROM ranked
    ),
    resid AS (
      SELECT base.r - med.ts_slope * base.m AS e FROM base, med
    ),
    rranked AS (
      SELECT e, ROW_NUMBER() OVER (ORDER BY e) AS rn,
             COUNT(*) OVER () AS np FROM resid
    ),
    rmed AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                           THEN e END) AS DOUBLE)
             / COUNT(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                          THEN 1 END) AS ts_intercept
      FROM rranked
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           ts_slope,
           ts_intercept,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS ols_slope
    FROM stats, med, rmed
    """,
)
def pipeline_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Theil–Sen ROBUST trend of monthly revenue:
    the median of all pairwise month-to-month slopes (Theil 1950,
    Sen 1968; 29% breakdown point), with the median-residual
    intercept and the OLS slope beside it for comparison — the
    trend line a forecast pipeline trusts when a demo spike or a
    refund month would drag least squares (the heavy-tail reality
    pipeline_mann_whitney exists for, applied to trend).

    Determinism: monthly revenue stays an EXACT decimal through the
    sufficient sums (Σy, Σxy are decimal-exact; month indices are
    ints) and becomes a double once; each pairwise slope is one
    shared division of agreed doubles; both medians use the exact
    two-rank formulation (Σ value·hits / Σ hits ≡ the SQL two-rank
    mean — two-term IEEE addition is commutative, so bucket order
    cannot matter) over the bucket-offset rank machinery — no global
    window anywhere. OLS emits from the same agreed tree.

    Scale: months are calendar-bounded (~10² after a decade), so the
    pair table is months²-bounded (~10⁴) — the quadratic lives in
    control-plane-sized data, never the corpus; the one corpus pass
    is the monthly aggregate. Both medians are
    distinct-value-bounded bucket-offset passes (≤B collects)."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = (
        o.groupBy(mi.alias("mi"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rdec"))
        .localCheckpoint(eager=True)  # min(mi) + base both read it
    )
    m0 = monthly.agg(F.min("mi").alias("m0"))
    base = (
        monthly.crossJoin(F.broadcast(m0))
        .select(
            (F.col("mi") - F.col("m0")).alias("m"),
            F.col("rdec").cast("double").alias("r"),
            "rdec",
        )
        .localCheckpoint(eager=True)  # stats + both pair sides + resid
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("sx"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
        F.sum("rdec").cast("double").alias("sy"),
        F.sum(F.col("m") * F.col("rdec")).cast("double").alias("sxy"),
    )
    a = base.select(F.col("m").alias("ma"), F.col("r").alias("ra"))
    b = base.select(F.col("m").alias("mb"), F.col("r").alias("rb"))
    pairs = (
        a.join(F.broadcast(b), F.col("mb") > F.col("ma"))
        .select(
            ((F.col("rb") - F.col("ra")) / (F.col("mb") - F.col("ma"))).alias(
                "slope"
            )
        )
    )
    med, n_pairs = _exact_median_1row(pairs, "slope")
    resid = base.crossJoin(F.broadcast(med)).select(
        (F.col("r") - F.col("med") * F.col("m")).alias("e")
    )
    rmed, _ = _exact_median_1row(resid, "e")
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    return (
        stats.crossJoin(F.broadcast(med.select(F.col("med").alias("ts_slope"))))
        .crossJoin(F.broadcast(rmed.select(F.col("med").alias("ts_intercept"))))
        .select(
            n.cast("long").alias("n_months"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
            "ts_slope",
            "ts_intercept",
            ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("ols_slope"),
        )
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
    "pipeline_seasonal_decompose",
    oracle="""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rdec
      FROM orders GROUP BY 1, 2
    ),
    trend AS (
      SELECT a.mi, a.mo, a.rdec,
             SUM(CASE WHEN abs(b.mi - a.mi) = 6 THEN b.rdec
                      ELSE 2 * b.rdec END) AS t24,
             COUNT(*) AS n_frame
      FROM monthly a JOIN monthly b ON b.mi BETWEEN a.mi - 6 AND a.mi + 6
      GROUP BY a.mi, a.mo, a.rdec
    ),
    detr AS (
      SELECT mi, mo, rdec, t24, 24 * rdec - t24 AS d24
      FROM trend WHERE n_frame = 13
    ),
    seas AS (
      SELECT mo, SUM(d24) AS s24_sum, COUNT(*) AS n_years
      FROM detr GROUP BY mo
    )
    SELECT d.mi AS month_index,
           CAST(d.rdec AS DOUBLE) AS revenue,
           CAST(d.t24 AS DOUBLE) / 24.0 AS trend,
           CAST(s.s24_sum AS DOUBLE) / s.n_years / 24.0 AS seasonal,
           CAST(d.d24 AS DOUBLE) / 24.0
             - CAST(s.s24_sum AS DOUBLE) / s.n_years / 24.0 AS residual
    FROM detr d JOIN seas s USING (mo)
    """,
)
def pipeline_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — classical ADDITIVE seasonal decomposition of
    monthly revenue (the moving-average method behind STL's
    initialization and every textbook decompose()): trend = centered
    2×12 moving average, seasonal = per-calendar-month mean of the
    detrended series, residual = the rest. Completes the time-series
    toolkit beside pipeline_seasonal_index (year-relative ratios),
    pipeline_cusum_changepoint (drift) and win_hampel_outliers
    (despiking).

    Windowless by construction: the centered ±6 frame is a BOUNDED
    self-join of the months spine (months² ≤ ~10⁴ after a decade —
    control-plane sized, broadcast), sidestepping both the global-
    window lint rule AND the bucket-offset machinery (offsets fix
    running sums, not sliding frames — a bucketed centered MA would
    break at bucket boundaries). Only full 13-month frames emit.

    Determinism: everything stays EXACT decimal, SCALED — the 2×12
    MA is Σ w·r with integer weights (1 at ±6, 2 elsewhere), so
    trend×24, detrended×24 and the seasonal sums are exact decimal
    arithmetic with no division until emission, where each output is
    one shared double tree (cast, divide by 24.0 / n_years). No
    rounding, no transcendental — raw doubles hash-exact.

    Scale: one corpus pass to the monthly aggregate; all downstream
    joins are months- or 12-bounded broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = (
        o.groupBy(
            mi.alias("mi"), F.month("o_orderdate").cast("int").alias("mo")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rdec"))
        .localCheckpoint(eager=True)  # both self-join sides + seasonal
    )
    b = monthly.select(F.col("mi").alias("bmi"), F.col("rdec").alias("brdec"))
    w24 = F.when(F.abs(F.col("bmi") - F.col("mi")) == 6, F.col("brdec")).otherwise(
        2 * F.col("brdec")
    )
    trend = (
        monthly.join(
            F.broadcast(b),
            F.col("bmi").between(F.col("mi") - 6, F.col("mi") + 6),
        )
        .groupBy("mi", "mo", "rdec")
        .agg(F.sum(w24).alias("t24"), F.count(F.lit(1)).alias("n_frame"))
        .where(F.col("n_frame") == 13)
    )
    detr = trend.select(
        "mi", "mo", "rdec", "t24", (24 * F.col("rdec") - F.col("t24")).alias("d24")
    ).localCheckpoint(eager=True)  # seasonal agg + final join
    seas = detr.groupBy("mo").agg(
        F.sum("d24").alias("s24_sum"), F.count(F.lit(1)).alias("n_years")
    )
    seasonal = F.col("s24_sum").cast("double") / F.col("n_years") / 24.0
    return detr.join(F.broadcast(seas), "mo").select(
        F.col("mi").alias("month_index"),
        F.col("rdec").cast("double").alias("revenue"),
        (F.col("t24").cast("double") / 24.0).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("d24").cast("double") / 24.0 - seasonal).alias("residual"),
    )


@query(
    "pipeline_psi_drift",
    oracle="""
    WITH span AS (
      SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1 FROM orders
    ),
    tagged AS (
      -- integer epoch-us midpoint: DuckDB divides INTERVALs
      -- field-wise (SCALE r9), which on an ODD-day span lands 12 h
      -- earlier than Spark's exact micros division — the fixture
      -- span happens to be even, but the exact form owes nothing
      -- to luck
      SELECT CASE WHEN epoch_us(o_orderdate) * 2
                       < epoch_us(d0) + epoch_us(d1)
                  THEN 0 ELSE 1 END AS half,
             CAST(least(floor(o_totalprice / 60000.0), 9) AS INT) AS bin
      FROM orders, span
    ),
    cells AS (
      SELECT bin,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM tagged GROUP BY bin
    ),
    tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM cells),
    terms AS (
      SELECT bin, a, b,
             greatest(CAST(a AS DOUBLE), 0.5) / na AS p,
             greatest(CAST(b AS DOUBLE), 0.5) / nb AS q
      FROM cells, tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MAX(na) AS BIGINT) AS n_ref,
           CAST(MAX(nb) AS BIGINT) AS n_cur,
           CAST(SUM(CAST(round((p - q) * round(ln(p / q), 6), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS psi,
           CAST(SUM(CAST(round((p - q) * round(ln(p / q), 6), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) > 0.2 AS drifted
    FROM terms, tot
    GROUP BY na, nb
    """,
)
def pipeline_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — POPULATION STABILITY INDEX between the early
    and late halves of the order history, binned on o_totalprice:
    PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ), the de-facto ML-monitoring drift
    score (>0.2 = investigate, the banking-scorecard convention),
    completing the drift toolkit beside llm_corpus_divergence (JS on
    token distributions) and pipeline_ks_test (exact two-sample
    shape test — KS answers 'is it different', PSI answers 'by how
    much per bin' with an auditable per-bin decomposition).

    Determinism: the half split is exact timestamp interval
    arithmetic on the corpus span (a 1-row broadcast); bins are
    fixed-width (literal 60k) so binning is a shared floor over
    agreed doubles; empty bins take the standard 0.5-count smoothing
    (exact rational, both engines); each term rounds ln at the
    transcendental and the product to 6 dp before the decimal sum
    (the term rule). Scale: one corpus pass to ≤10 cells; everything
    after is control-plane."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    half = F.when(us("o_orderdate") * 2 < us("d0") + us("d1"), 0).otherwise(1)
    bin_ = F.least(F.floor(F.col("o_totalprice") / 60000.0), F.lit(9)).cast(
        "int"
    )
    cells = (
        o.crossJoin(F.broadcast(span))
        .select(half.alias("half"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b"),
        )
        .localCheckpoint(eager=True)  # totals + terms
    )
    tot = cells.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    p = F.greatest(F.col("a").cast("double"), F.lit(0.5)) / F.col("na")
    q = F.greatest(F.col("b").cast("double"), F.lit(0.5)) / F.col("nb")
    term = F.round((p - q) * F.round(F.log(p / q), 6), 6).cast(
        "decimal(18,6)"
    )
    psi = F.sum(term).cast("double")
    return (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            psi.alias("psi"),
        )
        .select(
            "n_bins",
            F.col("na").cast("long").alias("n_ref"),
            F.col("nb").cast("long").alias("n_cur"),
            "psi",
            (F.col("psi") > 0.2).alias("drifted"),
        )
    )


@query(
    "pipeline_spearman",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ),
    rx AS (
      SELECT x AS v, 2 * (SUM(c) OVER (ORDER BY x) - c) + c + 1 AS two_r
      FROM (SELECT x, COUNT(*) AS c FROM daily GROUP BY x)
    ),
    ry AS (
      SELECT y AS v, 2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1 AS two_r
      FROM (SELECT y, COUNT(*) AS c FROM daily GROUP BY y)
    ),
    j AS (
      SELECT CAST(rx.two_r AS BIGINT) AS u, CAST(ry.two_r AS BIGINT) AS w
      FROM daily d JOIN rx ON rx.v = d.x JOIN ry ON ry.v = d.y
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(u * w) AS BIGINT) AS suw,
             CAST(SUM(u * u) AS BIGINT) AS suu,
             CAST(SUM(w * w) AS BIGINT) AS sww
      FROM j
    )
    SELECT n AS n_days,
           CASE WHEN (n * suu - su * su) > 0 AND (n * sww - sw * sw) > 0
                THEN CAST(n * suw - su * sw AS DOUBLE)
                     / sqrt(CAST(n * suu - su * su AS DOUBLE)
                            * CAST(n * sww - sw * sw AS DOUBLE))
           END AS rho
    FROM s
    """,
)
def pipeline_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — SPEARMAN rank correlation between daily
    revenue and daily order count: the robust (monotone, outlier-
    immune) dependence measure beside pipeline_xcorr's Pearson —
    a revenue spike from one whale order drags Pearson but moves
    ranks by one slot. Spearman-with-ties = Pearson on MIDRANKS,
    computed exactly: 2x-scaled midranks are integers
    (2R(v) = 2·cum_before(v) + c(v) + 1 over the distinct-value
    cumulative — the Mann–Whitney machinery), so every sum in
    r = (nΣuw − ΣuΣw) / √((nΣu²−(Σu)²)(nΣw²−(Σw)²)) is an exact
    int64. The day count is CALENDAR-bounded (~2.4k for the 7-year
    TPC-H span at every SF), so all magnitudes stay < 2^47 ≪ 2^53:
    the long→double casts are EXACT in both engines and rho is
    emitted unrounded — no decimal→double 1-ulp exposure anywhere
    (contrast pipeline_acf, whose decimal sums exceed 2^53 and emit
    at 9 dp). Revenue ranks on exact integer CENTS (decimal(18,2)·100
    → bigint, order-isomorphic); tie guard emits NULL for a
    degenerate constant series in both engines.

    Scale: one corpus pass to the calendar-bounded daily table; each
    rank leg is a distinct-value groupBy + the bucket-offset running
    pattern (B-way parallel windows + ≤8-row offset collect, no
    global window) + a value-bounded join-back (per-distinct-value —
    the corpus-bounded join-back case of the house rule). Everything
    after the first aggregate is control-plane sized."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .localCheckpoint(eager=True)  # calendar-bounded; read 3x below
    )

    def midranks2(col: str) -> DataFrame:
        counts = daily.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        run, _tot = bucketed_running(counts, col, ["c"])
        return run.select(
            F.col(col).alias("v"),
            (2 * (F.col("run_c") - F.col("c")) + F.col("c") + 1).alias("two_r"),
        )

    rx = midranks2("x").select(F.col("v").alias("vx"), F.col("two_r").alias("u"))
    ry = midranks2("y").select(F.col("v").alias("vy"), F.col("two_r").alias("w"))
    j = daily.join(rx, daily.x == rx.vx).join(ry, daily.y == ry.vy)
    st = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("su"),
        F.sum("w").alias("sw"),
        F.sum(F.col("u") * F.col("w")).alias("suw"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    dx = F.col("n") * F.col("suu") - F.col("su") * F.col("su")
    dy = F.col("n") * F.col("sww") - F.col("sw") * F.col("sw")
    num = F.col("n") * F.col("suw") - F.col("su") * F.col("sw")
    return st.select(
        F.col("n").alias("n_days"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("rho"),
    )


@query(
    "pipeline_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT sign(b.x - a.x) * sign(b.y - a.y) AS s,
             CASE WHEN b.x = a.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (
      SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(tx) AS BIGINT) AS n1,
             CAST(SUM(ty) AS BIGINT) AS n2
      FROM p
    ),
    nd AS (SELECT COUNT(*) AS n_days FROM daily)
    SELECT nd.n_days, s.n0 AS n_pairs, s.c AS n_concordant,
           s.d AS n_discordant,
           CASE WHEN (s.n0 - s.n1) > 0 AND (s.n0 - s.n2) > 0
                THEN CAST(s.c - s.d AS DOUBLE)
                     / sqrt(CAST(s.n0 - s.n1 AS DOUBLE)
                            * CAST(s.n0 - s.n2 AS DOUBLE))
           END AS tau_b
    FROM s, nd
    """,
)
def pipeline_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — KENDALL τ-b between daily revenue and daily
    order count: the concordance twin of pipeline_spearman's
    midrank correlation (same daily table, same tie-aware contract:
    τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with n₁/n₂ the x-/y-tied pair
    counts — Kendall 1945). Spearman answers "how monotone is the
    map", τ answers "what fraction of pairs order the same way" —
    the pair-level effect size reviewers ask for next to ρ.

    Determinism: every pair statistic is an integer (sign products
    and tie indicators summed as int64), so C, D, n₀, n₁, n₂ are
    exact; magnitudes are pair-bounded (~2.4k² / 2 < 2^23 ≪ 2^53),
    the long→double casts are exact, and τ-b is one shared IEEE
    sqrt + division — emitted unrounded like spearman's rho.

    Scale: ONE corpus pass to the CALENDAR-bounded daily table
    (~2.4k rows at every SF for the 7-year TPC-H span); the O(n²)
    pair enumeration is a broadcast non-equi self-join over that
    control-plane-sized table (the pipeline_theil_sen precedent —
    BroadcastNestedLoopJoin on a bounded side, never a corpus
    cartesian), and everything after it is a 1-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .localCheckpoint(eager=True)  # calendar-bounded; read 3x below
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    s = F.signum((F.col("xb") - F.col("xa")).cast("double")) * F.signum(
        (F.col("yb") - F.col("ya")).cast("double")
    )
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        s.alias("s"),
        F.when(F.col("xb") == F.col("xa"), 1).otherwise(0).alias("tx"),
        F.when(F.col("yb") == F.col("ya"), 1).otherwise(0).alias("ty"),
    )
    st = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias("d"),
        F.sum("tx").alias("n1"),
        F.sum("ty").alias("n2"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    dx = F.col("n0") - F.col("n1")
    dy = F.col("n0") - F.col("n2")
    return st.crossJoin(F.broadcast(nd)).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("n_concordant"),
        F.col("d").alias("n_discordant"),
        F.when(
            (dx > 0) & (dy > 0),
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("tau_b"),
    )


@query(
    "pipeline_forecast_backtest",
    oracle="""
    WITH monthly AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mi,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS y
      FROM orders GROUP BY 1
    ),
    ev AS (
      SELECT m.y AS y, l1.y AS f1, l12.y AS f12
      FROM monthly m JOIN monthly l1 ON m.mi = l1.mi + 1
           JOIN monthly l12 ON m.mi = l12.mi + 12
    ),
    terms AS (
      SELECT abs(y - f1) AS ae1, abs(y - f12) AS ae12,
             round(CAST(2 * abs(y - f1) AS DOUBLE)
                   / CAST(y + f1 AS DOUBLE), 6) AS sm1,
             round(CAST(2 * abs(y - f12) AS DOUBLE)
                   / CAST(y + f12 AS DOUBLE), 6) AS sm12
      FROM ev
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(ae1) AS DECIMAL(38,2)) AS s1,
             CAST(SUM(ae12) AS DECIMAL(38,2)) AS s12,
             CAST(SUM(CAST(sm1 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS t1,
             CAST(SUM(CAST(sm12 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS t12
      FROM terms
    )
    SELECT 'naive' AS model, n AS n_evals,
           CAST(s1 AS DOUBLE) / n AS mae,
           100.0 * (CAST(t1 AS DOUBLE) / n) AS smape_pct,
           CAST(s1 AS DOUBLE) / CAST(s1 AS DOUBLE) AS mase
    FROM agg
    UNION ALL
    SELECT 'seasonal_naive', n,
           CAST(s12 AS DOUBLE) / n,
           100.0 * (CAST(t12 AS DOUBLE) / n),
           CAST(s12 AS DOUBLE) / CAST(s1 AS DOUBLE)
    FROM agg
    """,
)
def pipeline_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — rolling-origin FORECAST BACKTEST: evaluate
    the two standard benchmark forecasters (naive ŷ_t = y_{t−1},
    seasonal-naive ŷ_t = y_{t−12}) over monthly revenue with the
    three standard error measures — MAE, sMAPE, and MASE
    (Hyndman & Koehler 2006; MASE here = Σ|e_model|/Σ|e_naive| on
    the SAME eval months, so naive's MASE ≡ 1.0 and seasonal-naive's
    says whether seasonality beats persistence). The evaluation side
    of pipeline_forecast_revenue / pipeline_revenue_trend_forecast:
    a forecast key without a backtest is a claim without a score.

    Determinism: monthly revenue, the lagged forecasts and every
    absolute error are EXACT decimals (sums of decimal(18,2) casts);
    the per-month sMAPE ratio is the only raw-double op, pre-rounded
    to 6 dp then decimal-summed (the TERM rule); MAE and sMAPE each
    take ONE final decimal→double cast and division (< 2^53 unscaled
    at bench SFs), and MASE is a ratio of two exact decimal sums —
    the n cancels, and the engines agree because both divide the
    identical pair of doubles.

    Shape: one corpus pass to the CALENDAR-bounded monthly table
    (~84 rows), localCheckpoint'ed because its three consumers (eval
    rows + two lag sides) would each re-aggregate the corpus under
    no-exchange-reuse; the lags are broadcast self-equi-joins on the
    month index (no window, no global sort); the two model rows come
    from ONE 1-row aggregate via stack."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = (
        o.groupBy(mi.alias("mi"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("y")
        )
        .localCheckpoint(eager=True)  # calendar-bounded; 3 consumers
    )
    l1 = monthly.select((F.col("mi") + 1).alias("mi"), F.col("y").alias("f1"))
    l12 = monthly.select(
        (F.col("mi") + 12).alias("mi"), F.col("y").alias("f12")
    )
    ev = monthly.join(F.broadcast(l1), "mi").join(F.broadcast(l12), "mi")
    sm1 = F.round(
        (F.lit(2) * F.abs(F.col("y") - F.col("f1"))).cast("double")
        / (F.col("y") + F.col("f1")).cast("double"),
        6,
    )
    sm12 = F.round(
        (F.lit(2) * F.abs(F.col("y") - F.col("f12"))).cast("double")
        / (F.col("y") + F.col("f12")).cast("double"),
        6,
    )
    terms = ev.select(
        F.abs(F.col("y") - F.col("f1")).alias("ae1"),
        F.abs(F.col("y") - F.col("f12")).alias("ae12"),
        sm1.alias("sm1"),
        sm12.alias("sm12"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ae1").cast("decimal(38,2)").alias("s1"),
        F.sum("ae12").cast("decimal(38,2)").alias("s12"),
        F.sum(F.col("sm1").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("t1"),
        F.sum(F.col("sm12").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("t12"),
    )
    two = agg.select(
        "n",
        F.col("s1").alias("sbase"),
        F.expr(
            "stack(2, 'naive', s1, t1, 'seasonal_naive', s12, t12) "
            "as (model, sae, st)"
        ),
    )
    return two.select(
        "model",
        F.col("n").alias("n_evals"),
        (F.col("sae").cast("double") / F.col("n")).alias("mae"),
        (
            F.lit(100.0) * (F.col("st").cast("double") / F.col("n"))
        ).alias("smape_pct"),
        (F.col("sae").cast("double") / F.col("sbase").cast("double")).alias(
            "mase"
        ),
    )


@query(
    "pipeline_hhi",
    oracle="""
    WITH fs AS (
      SELECT n.n_name AS nation, l.l_suppkey AS supp,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS frev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT nation, frev,
             CAST(SUM(frev) OVER (PARTITION BY nation) AS DECIMAL(38,4))
               AS trev
      FROM fs
    ),
    t AS (
      SELECT nation, trev,
             CAST(frev AS DOUBLE) / CAST(trev AS DOUBLE) AS share,
             round(10000.0 * (CAST(frev AS DOUBLE) / CAST(trev AS DOUBLE))
                           * (CAST(frev AS DOUBLE) / CAST(trev AS DOUBLE)),
                   6) AS term
      FROM w
    )
    SELECT nation, COUNT(*) AS n_suppliers,
           CAST(MAX(trev) AS DOUBLE) AS total_revenue,
           CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS hhi,
           MAX(share) AS top_share
    FROM t GROUP BY nation
    """,
)
def pipeline_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — HERFINDAHL-HIRSCHMAN concentration index per
    nation-market: HHI = Σ (100·share)² over each nation's suppliers'
    discounted-revenue shares (0 → atomistic, 10 000 → monopoly; the
    DOJ's 1 500/2 500 merger screens live on this scale), with the
    top supplier's share beside it. The concentration measure next to
    pipeline_gini's inequality curve and pipeline_market_share's
    single-share ratio — the standard "is this market captured?"
    screen over any grouped revenue table.

    Determinism: per-supplier and per-nation revenues are exact
    decimal sums (the dsum contract); the share is one agreed double
    division (both decimals < 2^53 unscaled at bench SFs, so the
    casts are exact); each squared term pre-rounds to 6 dp and
    decimal-sums (the house TERM rule — Σ of doubles is the one
    order-sensitive op, so it never happens in raw doubles);
    top_share is a MAX of agreed doubles (order-free).

    Shape: one corpus pass to the (nation, supplier)-bounded
    aggregate; the nation total is a WINDOW over that aggregate
    (partition = suppliers-per-nation, bounded), NOT a groupBy +
    join-back, per the measured no-exchange-reuse rule; the final
    collapse is a 25-row groupBy. At 100 TB the only corpus-sized
    work is the first aggregation's shuffle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fs = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(rev.cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("frev")
        )
    )
    w = fs.select(
        "nation",
        "frev",
        F.sum("frev")
        .over(Window.partitionBy("nation"))
        .cast("decimal(38,4)")
        .alias("trev"),
    )
    share = F.col("frev").cast("double") / F.col("trev").cast("double")
    t = w.select(
        "nation",
        "trev",
        share.alias("share"),
        F.round(F.lit(10000.0) * share * share, 6).alias("term"),
    )
    return t.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("trev").cast("double").alias("total_revenue"),
        F.sum(F.col("term").cast("decimal(18,6)")).cast("double").alias("hhi"),
        F.max("share").alias("top_share"),
    )


@query(
    "pipeline_bh_fdr",
    oracle="""
    WITH base AS (
      SELECT n.n_name AS nation, c.c_nationkey AS nk,
             COUNT(*) AS n_orders,
             CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
             CAST(SUM(n_urgent) AS BIGINT) AS kk,
             COUNT(*) AS m
      FROM base
    ),
    pv AS (
      SELECT nation, nk, n_orders, n_urgent, m,
             (CAST(n_urgent AS DOUBLE) / n_orders
              - CAST(kk AS DOUBLE) / nn)
             / sqrt((CAST(kk AS DOUBLE) / nn)
                    * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders) AS z,
             round(2.0 / (1.0 + exp(1.702 * abs(
               (CAST(n_urgent AS DOUBLE) / n_orders
                - CAST(kk AS DOUBLE) / nn)
               / sqrt((CAST(kk AS DOUBLE) / nn)
                      * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders)))), 6)
               AS p_value
      FROM base, tot
    ),
    rk AS (
      SELECT a.nation, a.n_orders, a.n_urgent, a.m, a.z, a.p_value,
             CAST(COUNT(*) AS BIGINT) AS bh_rank
      FROM pv a JOIN pv b
        ON (b.p_value < a.p_value)
           OR (b.p_value = a.p_value AND b.nk <= a.nk)
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    kstar AS (
      SELECT CAST(MAX(CASE WHEN p_value <= bh_rank * 0.05 / m
                           THEN bh_rank ELSE 0 END) AS BIGINT) AS k
      FROM rk
    )
    SELECT nation, n_orders, n_urgent, z, p_value, bh_rank,
           bh_rank <= k AS rejected
    FROM rk, kstar
    """,
)
def pipeline_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — BENJAMINI-HOCHBERG false-discovery-rate
    control (Benjamini & Hochberg 1995) over a 25-way hypothesis
    family: per nation, a two-proportion z-test of "this nation's
    urgent-order share differs from global", then the BH step-up —
    sort p-values ascending, find the largest rank k with
    p(k) ≤ k/m·α (α = 0.05), reject ranks ≤ k. The multiple-testing
    correction every per-segment screen (pipeline_ab_test,
    pipeline_chi_square run one test) needs once it fans out over
    segments — without it, 25 tests at α=0.05 expect a false
    positive by chance alone.

    Determinism: z is exact-IEEE on integer counts (all < 2^53, so
    every cast is exact and both engines evaluate the identical op
    tree). The two-sided p uses the LOGISTIC approximation to the
    normal CDF, p = 2/(1 + exp(1.702·|z|)) (the classic 1.702
    probit-logit scaling constant) — exp() differs between libms in
    the last ulp, so p rounds to 6 dp and EVERY downstream decision
    (ranking, BH threshold, rejection) reads the ROUNDED value (the
    llm_quality_logit recipe). Ranks come from a tie-broken
    (p, nationkey) pair count, total-ordered in both engines.

    Shape: one corpus pass (orders ⋈ customer, the standard big-side
    shuffle with nation broadcast) to a NATION-bounded 25-row table,
    localCheckpoint'ed (3 consumers under no-exchange-reuse); global
    counts ride as a broadcast 1-row aggregate; the rank self-join
    is 25×25 broadcast control-plane work; k* is another broadcast
    1-row aggregate. Nothing after the first aggregate touches the
    corpus."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(urgent).cast("long").alias("n_urgent"),
        )
        .localCheckpoint(eager=True)  # 25 rows; 3 consumers below
    )
    tot = base.agg(
        F.sum("n_orders").cast("long").alias("nn"),
        F.sum("n_urgent").cast("long").alias("kk"),
        F.count(F.lit(1)).alias("m"),
    )
    pg = F.col("kk").cast("double") / F.col("nn")
    z = (F.col("n_urgent").cast("double") / F.col("n_orders") - pg) / F.sqrt(
        pg * (F.lit(1.0) - pg) / F.col("n_orders")
    )
    pv = base.crossJoin(F.broadcast(tot)).select(
        "nation",
        "nk",
        "n_orders",
        "n_urgent",
        "m",
        z.alias("z"),
        F.round(
            2.0 / (1.0 + F.exp(F.lit(1.702) * F.abs(z))), 6
        ).alias("p_value"),
    )
    pvb = pv.select(F.col("nk").alias("nk_b"), F.col("p_value").alias("p_b"))
    rk = (
        pv.join(
            F.broadcast(pvb),
            (F.col("p_b") < F.col("p_value"))
            | ((F.col("p_b") == F.col("p_value")) & (F.col("nk_b") <= F.col("nk"))),
        )
        .groupBy("nation", "n_orders", "n_urgent", "m", "z", "p_value")
        .agg(F.count(F.lit(1)).alias("bh_rank"))
    )
    kstar = rk.agg(
        F.max(
            F.when(
                F.col("p_value") <= F.col("bh_rank") * 0.05 / F.col("m"),
                F.col("bh_rank"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k")
    )
    return rk.crossJoin(F.broadcast(kstar)).select(
        "nation",
        "n_orders",
        "n_urgent",
        "z",
        "p_value",
        "bh_rank",
        (F.col("bh_rank") <= F.col("k")).alias("rejected"),
    )


_ACF_ORACLE = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(x) AS DECIMAL(18,2)) AS s,
             MIN(day) AS d0
      FROM daily
    ),
    dev AS (
      SELECT datediff('day', d0, day) AS t,
             CAST(x * CAST(n AS DECIMAL(6,0)) - s AS DECIMAL(18,2)) AS d
      FROM daily, tot
    ),
    den AS (
      -- one operand widened to DECIMAL(19,2): DuckDB executes an
      -- 18x18 multiply in INT64 and overflows at runtime; width 19
      -- forces INT128 arithmetic (Spark's decimal(37,4) product is
      -- exact either way)
      SELECT SUM(CAST(d AS DECIMAL(19,2)) * d) AS den FROM dev
    ),
    pairs AS (
      SELECT k.lag AS lag, a.d AS da, b.d AS db
      FROM (SELECT UNNEST(generate_series(1, 8)) AS lag) k
      JOIN dev b ON TRUE
      JOIN dev a ON a.t = b.t + k.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           COUNT(*) AS n_pairs,
           -- the num/den decimals exceed 2^53 unscaled, so the two
           -- engines' decimal->double casts can differ by 1 ulp
           -- (DuckDB: int128->double then /10^4, two roundings;
           -- Spark: one correctly-rounded BigDecimal cast) -- the
           -- ratio is emitted at 9 dp, 11 sig digits, where both
           -- agree
           round(CAST(SUM(CAST(da AS DECIMAL(19,2)) * db) AS DOUBLE)
                 / CAST(MAX(den) AS DOUBLE), 9) AS acf
    FROM pairs, den
    GROUP BY lag
    ORDER BY lag
    """


@query(
    "pipeline_acf",
    oracle=_ACF_ORACLE,
)
def pipeline_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — AUTOCORRELATION FUNCTION of the daily revenue
    series at lags 1–8: the diagnostic that decides whether
    pipeline_revenue_trend_forecast's OLS residuals are white, what
    window pipeline_seasonal_decompose's MA should span, and whether
    pipeline_cusum_changepoint will false-alarm (CUSUM assumes
    independent increments). Standard biased estimator
    r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)², computed EXACTLY: with
    n·(x_t−x̄) = n·x_t − S both numerator and denominator scale by
    n², so r_k is a ratio of two exact decimal sums of products of
    the integer-scaled deviations d_t = n·x_t − S — no mean division
    ever happens. The num/den decimals exceed 2^53 unscaled, where
    DuckDB's two-rounding decimal→double cast can sit 1 ulp off
    Spark's correctly-rounded one, so the emitted ratio is rounded
    to 9 dp (11 significant digits — both engines agree there). Lag pairing joins on calendar
    datediff (t = days since min), so date gaps drop pairs instead of
    silently mis-aligning — identical semantics in the oracle.

    Scale: one corpus pass to the dates-bounded daily table (~2.4 k
    rows at any SF — checkpointed: totals, deviations, the den
    aggregate and both join sides reuse it, and this build never
    reuses exchange subtrees). The lag expansion is 8× that bounded
    table, broadcast-joined; everything after the first aggregate is
    control-plane sized. Decimal headroom: d ≤ n·max|x−x̄| keeps
    (18,2) exact through sf ~10; the d·d sum rides decimal(38,4)
    (capacity 1e34 ≫ the 1e25 at sf 0.1)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
        .localCheckpoint(eager=True)  # dates-bounded; totals + dev read it
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(18,2)").alias("s"),
        F.min("day").alias("d0"),
    )
    dev = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            F.datediff(F.col("day"), F.col("d0")).alias("t"),
            (F.col("x") * F.col("n").cast("decimal(6,0)") - F.col("s"))
            .cast("decimal(18,2)")
            .alias("d"),
        )
        .localCheckpoint(eager=True)  # den + both lag-join sides
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lagged = (
        dev.select(
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("lag"),
            F.col("t").alias("bt"),
            F.col("d").alias("db"),
        )
        .select("lag", (F.col("bt") + F.col("lag")).alias("t_target"), "db")
    )
    return (
        dev.join(F.broadcast(lagged), dev.t == lagged.t_target)
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("d") * F.col("db")).alias("num"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 9
            ).alias("acf"),
        )
        .orderBy("lag")
    )


_LB_TERMS = " + ".join(f"t{k}" for k in range(1, 9))


@query(
    "pipeline_ljung_box",
    oracle=f"""
    WITH acf_t AS ({_ACF_ORACLE}),
    pv AS (
      SELECT MAX(CASE WHEN lag = 1 THEN n_pairs + 1 END) AS n,
             {", ".join(
                 f"MAX(CASE WHEN lag = {k} THEN acf * acf / n_pairs END) AS t{k}"
                 for k in range(1, 9)
             )}
      FROM acf_t
    ),
    qs AS (
      SELECT CAST(n AS BIGINT) AS n_days,
             CAST(n AS DOUBLE) * (n + 2) * ({_LB_TERMS}) AS q_stat
      FROM pv
    )
    SELECT n_days, q_stat,
           round(exp(-(q_stat / 2))
                 * (1 + (q_stat / 2)
                      + ((q_stat / 2) * (q_stat / 2)) / 2
                      + (((q_stat / 2) * (q_stat / 2)) * (q_stat / 2)) / 6), 6)
             AS p_approx,
           round(exp(-(q_stat / 2))
                 * (1 + (q_stat / 2)
                      + ((q_stat / 2) * (q_stat / 2)) / 2
                      + (((q_stat / 2) * (q_stat / 2)) * (q_stat / 2)) / 6), 6)
             < 0.05 AS significant
    FROM qs
    """,
)
def pipeline_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX portmanteau test (Ljung & Box 1978) on the daily
    revenue series — Q = n(n+2) Σ_{k=1..8} r_k²/(n−k), the standard
    "are these residuals white?" test that consumes ``pipeline_acf``'s
    r_k directly (n−k is exactly that key's n_pairs, and n rides out
    of the lag-1 row as n_pairs+1 — no second scan of anything).

    Determinism: each r_k is the ACF's 9-dp-rounded ratio, identical
    doubles in both engines, so r_k²/(n−k) is a shared exact IEEE
    tree; the 8 terms are summed by a FIXED-ORDER conditional pivot
    (the pipeline_anova wide-pivot rule — an 8-row SUM would be an
    order-free double reduction), making Q bit-identical unrounded.
    The only transcendental is the chi²₈ survival function, which at
    even dof has the closed form exp(−Q/2)·Σ_{i=0..3}(Q/2)^i/i! —
    rounded at 6 dp with the significance decision reading the
    ROUNDED value (the bh_fdr rule).

    Scale: everything downstream of the ACF is a 8-row pivot — pure
    control plane; the ACF itself is dates-bounded (see its entry)."""
    acf_t = pipeline_acf(spark, sf_dir)
    term = F.col("acf") * F.col("acf") / F.col("n_pairs")
    pv = acf_t.agg(
        F.max(F.when(F.col("lag") == 1, F.col("n_pairs") + 1)).alias("n"),
        *[
            F.max(F.when(F.col("lag") == k, term)).alias(f"t{k}")
            for k in range(1, 9)
        ],
    )
    tsum = F.col("t1")
    for k in range(2, 9):
        tsum = tsum + F.col(f"t{k}")
    qs = pv.select(
        F.col("n").cast("bigint").alias("n_days"),
        (F.col("n").cast("double") * (F.col("n") + 2) * tsum).alias("q_stat"),
    )
    h = F.col("q_stat") / 2
    p = F.round(
        F.exp(-h) * (1 + h + (h * h) / 2 + ((h * h) * h) / 6),
        6,
    )
    return qs.select(
        "n_days",
        "q_stat",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


# Fixed weekday order for pipeline_anova's wide pivot: the cross-group
# reductions must be a FIXED-ORDER IEEE tree (Python's left-assoc `+`
# mirrors SQL's), so group stats are pivoted into columns instead of
# summed by an order-free aggregate.
_ANOVA_DAYS = list(range(7))


@query(
    "pipeline_anova",
    oracle=f"""
    WITH assigned AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    stats AS (
      SELECT g,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sx END) AS s{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sxx END) AS q{d}"
                   for d in _ANOVA_DAYS)}
      FROM stats
    )
    SELECT CAST({' + '.join(f'n{d}' for d in _ANOVA_DAYS)} AS BIGINT) AS n,
           CAST(7 AS BIGINT) AS k,
           ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}) AS ss_between,
           ({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             AS ss_within,
           ((({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)})) / 6.0)
           / ((({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
               - ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)}))
              / (({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}) - 7.0))
             AS f_stat,
           (({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}))
           / (({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
              - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
                * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
                / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)})) AS eta_sq
    FROM wide
    """,
)
def pipeline_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — one-way ANOVA of purchase value across the
    seven weekdays (Mon=0 … Sun=6 via ISO day-of-week): the k-group
    generalization of pipeline_ab_test's two-arm t — 'does revenue
    per purchase depend on the day of week?' with F = (SSB/(k−1)) /
    (SSW/(N−k)) and η² = SSB/SST as the effect size. Per-group
    sufficient statistics follow the ab_test recipe exactly (exact
    decimal Σx, term-rounded Σx²); the cross-group reductions then
    run over a 7-group WIDE PIVOT so every multi-term double sum is
    a fixed-order left-associated IEEE tree — identical expression
    shape in both engines, no order-free double aggregation
    anywhere (the 5-term agg trap the chi-square key dodges with
    per-term rounding is dodged here structurally).

    Scale: one corpus pass to 7 groups of 3 sufficient statistics;
    the pivot and the F readout are a single control-plane row.
    Weekday extraction: Spark weekday() ≡ DuckDB isodow−1 (the
    1=Sunday dayofweek trap is avoided on both sides)."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    stats = assigned.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c))).alias(f"{a}{d}")
            for d in _ANOVA_DAYS
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )

    def _chain(make):
        out = make(0)
        for d in _ANOVA_DAYS[1:]:
            out = out + make(d)
        return out

    n_tot = _chain(lambda d: F.col(f"n{d}"))
    s_tot = _chain(lambda d: F.col(f"s{d}"))
    t_tot = _chain(lambda d: F.col(f"q{d}"))
    q_tot = _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ssb = q_tot - s_tot * s_tot / n_tot
    ssw = t_tot - q_tot
    return wide.select(
        n_tot.cast("long").alias("n"),
        F.lit(7).cast("long").alias("k"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / F.lit(6.0)) / (ssw / (n_tot - F.lit(7.0)))).alias("f_stat"),
        (ssb / (t_tot - s_tot * s_tot / n_tot)).alias("eta_sq"),
    )


@query(
    "pipeline_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT CAST(digit AS INT) AS digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / total AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS exp_share,
           abs(CAST(n AS DOUBLE) / total
               - round(log10(1.0 + 1.0 / digit), 6)) AS abs_dev
    FROM counts, tot
    ORDER BY digit
    """,
)
def pipeline_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — BENFORD'S-LAW first-digit screen on order
    totals: observed first-significant-digit shares against the
    log10(1+1/d) law, the standard forensic-accounting / synthetic-
    data smell test (fabricated or uniformly-generated amounts flunk
    it; TPC-H-style uniform prices do too, visibly — the point is
    the per-digit deviation column, not a verdict). First digit is
    extracted WITHOUT transcendentals: FLOOR(x) is exact on both
    engines (CAST-to-BIGINT truncation vs rounding is the known
    trap), and the leading char of the integer's decimal string is
    engine-stable — no log10-of-x digit math whose boundary cases
    (x exactly a power of 10 after FP log) could disagree. The law's
    expected share rounds its log10 at the transcendental (term
    rule); obs_share and abs_dev are shared IEEE trees over exact
    counts.

    Scale: one corpus pass to ≤9 cells; everything after is
    control-plane. The x ≥ 1 guard drops sub-unit amounts where the
    integer-string trick has no leading digit (none in the fixture:
    min price ~1013)."""
    o = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = (
        o.where(F.col("o_totalprice") >= 1)
        .select(digit)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # totals + shares
    )
    tot = counts.agg(F.sum("n").alias("total"))
    exp_share = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    obs = F.col("n").cast("double") / F.col("total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n"),
            obs.alias("obs_share"),
            exp_share.alias("exp_share"),
            F.abs(obs - exp_share).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "pipeline_xcorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(18,6)) END)
                  AS DECIMAL(18,6)) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,6)) END)
                  AS DECIMAL(18,6)) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY 1
    ),
    both_ AS (
      SELECT day, x, y FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
    ),
    tot AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DECIMAL(18,6)) AS sx,
             CAST(SUM(y) AS DECIMAL(18,6)) AS sy,
             MIN(day) AS d0
      FROM both_
    ),
    dev AS (
      SELECT datediff('day', d0, day) AS t,
             CAST(x * CAST(n AS DECIMAL(6,0)) - sx AS DECIMAL(18,6)) AS dx,
             CAST(y * CAST(n AS DECIMAL(6,0)) - sy AS DECIMAL(18,6)) AS dy
      FROM both_, tot
    ),
    den AS (
      SELECT SUM(CAST(dx AS DECIMAL(19,6)) * dx) AS dxx,
             SUM(CAST(dy AS DECIMAL(19,6)) * dy) AS dyy
      FROM dev
    ),
    pairs AS (
      -- dx at t pairs with dy at t + lag, so a POSITIVE-lag peak
      -- means x leads y by that many days
      SELECT k.lag AS lag, a.dx AS dxa, b.dy AS dyb
      FROM (SELECT UNNEST(generate_series(-7, 7)) AS lag) k
      JOIN dev b ON TRUE
      JOIN dev a ON a.t = b.t - k.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           COUNT(*) AS n_pairs,
           round(CAST(SUM(CAST(dxa AS DECIMAL(19,6)) * dyb) AS DOUBLE)
                 / sqrt(CAST(MAX(dxx) AS DOUBLE) * CAST(MAX(dyy) AS DOUBLE)),
                 9) AS xcorr
    FROM pairs, den
    GROUP BY lag
    ORDER BY lag
    """,
)
def pipeline_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — lagged CROSS-CORRELATION between the daily
    click and purchase value series at lags −7…+7: 'does click
    activity lead purchase activity, and by how many days?' — the
    lead–lag diagnostic behind attribution windows and forecast
    feature selection (positive-lag peak ⇒ x leads y). Same exact
    algebra as pipeline_acf: deviations are n-scaled integers
    (dx = n·x_t − Sx), so numerator and both denominator sums are
    exact decimals; r_xy(k) = Σ dx_t·dy_{t−k} / √(Σdx²·Σdy²) takes
    one sqrt over the agreed double casts and is emitted at 9 dp
    (the >2^53 decimal→double ulp dodge, as in ACF). Days missing
    either series drop out before centering, so both engines center
    over the identical support.

    Scale: one events pass to the dates-bounded daily two-series
    table (conditional aggregation — one scan for both series, not
    two); the ±7 lag expansion is 15× that bounded table, broadcast-
    joined; one control-plane row per lag out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    F.col("value").cast("decimal(18,6)"),
                )
            )
            .cast("decimal(18,6)")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,6)"),
                )
            )
            .cast("decimal(18,6)")
            .alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .localCheckpoint(eager=True)  # dates-bounded; totals + dev
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(18,6)").alias("sx"),
        F.sum("y").cast("decimal(18,6)").alias("sy"),
        F.min("day").alias("d0"),
    )
    n_dec = F.col("n").cast("decimal(6,0)")
    dev = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            F.datediff(F.col("day"), F.col("d0")).alias("t"),
            (F.col("x") * n_dec - F.col("sx"))
            .cast("decimal(18,6)")
            .alias("dx"),
            (F.col("y") * n_dec - F.col("sy"))
            .cast("decimal(18,6)")
            .alias("dy"),
        )
        .localCheckpoint(eager=True)  # den + both lag-join sides
    )
    den = dev.agg(
        F.sum(F.col("dx") * F.col("dx")).alias("dxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("dyy"),
    )
    lagged = dev.select(
        F.explode(F.sequence(F.lit(-7), F.lit(7))).alias("lag"),
        F.col("t").alias("bt"),
        F.col("dy").alias("dyb"),
    ).select("lag", (F.col("bt") - F.col("lag")).alias("t_target"), "dyb")
    return (
        dev.join(F.broadcast(lagged), dev.t == lagged.t_target)
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("dx") * F.col("dyb")).alias("num"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(
                F.col("num").cast("double")
                / F.sqrt(
                    F.col("dxx").cast("double") * F.col("dyy").cast("double")
                ),
                9,
            ).alias("xcorr"),
        )
        .orderBy("lag")
    )


@query(
    "pipeline_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT p, SUM(o) AS r FROM cells GROUP BY p),
    cols_ AS (SELECT s, SUM(o) AS c FROM cells GROUP BY s),
    tot AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
      SELECT round((CAST(o AS DOUBLE) / n)
                   * round(ln(CAST(o AS DOUBLE) * n
                              / (CAST(r AS DOUBLE) * c)), 6), 9) AS mi_t,
             round(-(CAST(o AS DOUBLE) / n)
                   * round(ln(CAST(o AS DOUBLE) / n), 6), 9) AS h_t
      FROM cells JOIN rows_ USING (p) JOIN cols_ USING (s), tot
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           COUNT(*) AS n_cells,
           CAST(SUM(CAST(mi_t AS DECIMAL(18,9))) AS DOUBLE) AS mutual_info,
           CAST(SUM(CAST(h_t AS DECIMAL(18,9))) AS DOUBLE) AS joint_entropy,
           CAST(SUM(CAST(mi_t AS DECIMAL(18,9))) AS DOUBLE)
             / CAST(SUM(CAST(h_t AS DECIMAL(18,9))) AS DOUBLE)
             AS iqr_ratio
    FROM terms, tot
    GROUP BY n
    """,
)
def pipeline_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — MUTUAL INFORMATION (in nats) between order
    priority and status on the same contingency table as
    pipeline_chi_square: I(P;S) = Σ p_ij·ln(p_ij/(p_i·p_j)), with
    the joint entropy H(P,S) and their ratio (the information
    quality ratio) as the normalized readout — the information-
    theoretic association measure that, unlike chi², is comparable
    across table sizes and is the feature-selection score used for
    categorical columns in training pipelines. Each term rounds its
    ln at the transcendental and the product at 9 dp (terms are
    ≤ ln(cells) ≈ small magnitude — well inside the shortest-repr
    safe zone), then decimal-sums so cell order can't matter.

    Scale: identical cost shape to the chi-square key — one corpus
    pass to a (priorities × statuses)-bounded checkpointed cell
    table; margins re-aggregate the 15 rows via broadcast
    join-backs; a single control-plane row out."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)  # margins + totals + terms
    )
    rows_ = cells.groupBy("p").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("s").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    od = F.col("o").cast("double")
    mi_t = F.round(
        (od / F.col("n"))
        * F.round(
            F.log(od * F.col("n") / (F.col("r").cast("double") * F.col("c"))),
            6,
        ),
        9,
    )
    h_t = F.round(-(od / F.col("n")) * F.round(F.log(od / F.col("n")), 6), 9)
    terms = (
        cells.join(F.broadcast(rows_), "p")
        .join(F.broadcast(cols_), "s")
        .crossJoin(F.broadcast(tot))
        .select(mi_t.alias("mi_t"), h_t.alias("h_t"), "n")
    )
    mi = F.sum(F.col("mi_t").cast("decimal(18,9)")).cast("double")
    h = F.sum(F.col("h_t").cast("decimal(18,9)")).cast("double")
    return (
        terms.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            mi.alias("mutual_info"),
            h.alias("joint_entropy"),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            "n_cells",
            "mutual_info",
            "joint_entropy",
            (F.col("mutual_info") / F.col("joint_entropy")).alias(
                "iqr_ratio"
            ),
        )
    )


@query(
    "pipeline_abc_xyz",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS rc
      FROM lineitem GROUP BY l_partkey
    ),
    vals AS (
      SELECT rc, CAST(rc * COUNT(*) AS BIGINT) AS vt
      FROM rev GROUP BY rc
    ),
    run AS (
      SELECT rc, CAST(SUM(vt) OVER (ORDER BY rc DESC) AS BIGINT) AS cum,
             CAST((SELECT SUM(vt) FROM vals) AS BIGINT) AS total
      FROM vals
    ),
    abc AS (
      SELECT rev.pk,
             CASE WHEN run.cum * 5 <= run.total * 4 THEN 'A'
                  WHEN run.cum * 20 <= run.total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev.rc
      FROM rev JOIN run ON rev.rc = run.rc
    ),
    monthly AS (
      SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT pk,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq,
             CAST(SUM(q * q) AS BIGINT) AS sqq
      FROM monthly GROUP BY pk
    ),
    classed AS (
      SELECT abc.abc_class,
             CASE WHEN (xyz.n * xyz.sqq - xyz.sq * xyz.sq) * 4
                       < xyz.sq * xyz.sq THEN 'X'
                  WHEN (xyz.n * xyz.sqq - xyz.sq * xyz.sq)
                       <= xyz.sq * xyz.sq THEN 'Y'
                  ELSE 'Z' END AS xyz_class,
             abc.rc
      FROM abc JOIN xyz ON abc.pk = xyz.pk
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rc) AS DOUBLE)
             / (SELECT CAST(SUM(rc) AS DOUBLE) FROM rev) AS revenue_share
    FROM classed
    GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def pipeline_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — ABC/XYZ INVENTORY SEGMENTATION: every sold
    part classed on two axes — cumulative revenue contribution
    (A ≤ 80% cum share, B ≤ 95%, C tail: the pipeline_pareto_abc cut,
    here value-grained so equal-revenue parts always share a class)
    × demand variability (coefficient of variation of monthly
    demand: X = CV < 0.5, Y ≤ 1.0, Z erratic) — the 9-cell planning
    matrix (AX = forecast + automate, CZ = stock-to-order) every
    supply-chain curriculum teaches, and the same two-axis screen a
    training-data curator runs on sources (volume × volatility).

    The entire classification is INTEGER arithmetic: revenue in
    exact cents, the cumulative cut via scaled comparisons
    (cum·5 ≤ total·4), and the CV thresholds CROSS-MULTIPLIED so no
    sqrt, division or float ever participates — CV < 0.5 ⟺
    4·(nΣq²−(Σq)²) < (Σq)² on exact int64 (population variance
    identity, n²-scaled on both sides). Only the final reporting
    ratio (revenue_share) touches doubles: one division of exact
    < 2^53 cents sums. Running revenue uses the bucket-offset
    pattern over DISTINCT part-revenue values (no global window,
    value-contiguous ⇒ tie-safe).

    Scale: two lineitem aggregations (per-part revenue, per-part×
    month demand — both map-side combine on the partkey shuffle),
    a distinct-value running pass (bounded by distinct revenue
    values), one value-bounded join-back, one parts-bounded join.
    Nothing corpus-sized after the first shuffles."""
    from osm_airflow_spark.bucketing import bucketed_running

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("rc")
        )
        .localCheckpoint(eager=True)  # vals + abc join-back + share total
    )
    vals = rev.groupBy("rc").agg(
        (F.col("rc") * F.count(F.lit(1))).cast("long").alias("vt")
    ).select((-F.col("rc")).alias("neg_rc"), "rc", "vt")
    run, totals = bucketed_running(vals, "neg_rc", ["vt"])
    total = int(totals["vt"])
    # explicit long literal: a small fixture total would land an
    # int32 lit and total*19 overflows under ANSI (caught by the
    # planted test; the sf fixtures' cent totals auto-promote to long)
    total_l = F.lit(total).cast("long")
    classed_vals = run.select(
        "rc",
        F.when(F.col("run_vt") * 5 <= total_l * 4, "A")
        .when(F.col("run_vt") * 20 <= total_l * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    abc = rev.join(classed_vals, "rc")

    monthly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    xyz = monthly.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    var_n2 = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    mean_n2 = F.col("sq") * F.col("sq")
    xyz_class = (
        F.when(var_n2 * 4 < mean_n2, "X")
        .when(var_n2 <= mean_n2, "Y")
        .otherwise("Z")
    )
    classed = abc.join(xyz.select("pk", xyz_class.alias("xyz_class")), "pk")
    total_rev = rev.agg(F.sum("rc").alias("tr"))
    return (
        classed.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rc").alias("cell_rc"),
        )
        .crossJoin(F.broadcast(total_rev))
        .select(
            "abc_class",
            "xyz_class",
            "n_parts",
            (F.col("cell_rc").cast("double") / F.col("tr").cast("double"))
            .alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@query(
    "pipeline_uplift_by_decile",
    oracle="""
    WITH resp AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    scored AS (
      SELECT c_custkey,
             NTILE(10) OVER (ORDER BY -c_acctbal, c_custkey) AS decile,
             CASE WHEN resp.k IS NOT NULL THEN 1 ELSE 0 END AS responded
      FROM customer LEFT JOIN resp ON c_custkey = resp.k
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(responded) AS BIGINT) AS r
      FROM scored GROUP BY decile
    ),
    c AS (
      SELECT a.decile,
             CAST(MAX(a.n) AS BIGINT) AS n, CAST(MAX(a.r) AS BIGINT) AS r,
             CAST(SUM(b.n) AS BIGINT) AS cum_n,
             CAST(SUM(b.r) AS BIGINT) AS cum_r
      FROM d a JOIN d b ON b.decile <= a.decile
      GROUP BY a.decile
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt
            FROM d)
    SELECT decile, n AS n_customers, r AS n_responders,
           CAST(r AS DOUBLE) / n AS response_rate,
           cum_r AS cum_responders,
           CAST(cum_r * nt AS DOUBLE) / CAST(cum_n * rt AS DOUBLE)
             AS cum_lift,
           CAST(cum_r AS DOUBLE) / rt AS gain
    FROM c, tot
    ORDER BY decile
    """,
)
def pipeline_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — GAINS/LIFT TABLE: customers ranked by a
    score (account balance as the stand-in model score, best first),
    cut into exact deciles, each reporting response rate (placed an
    urgent order), cumulative gain (share of all responders captured
    so far) and cumulative lift vs the base rate — the
    targeting-model evaluation every campaign/ranking report leads
    with, completing the eval leg beside llm_eval_auc (threshold-free
    rank quality) and llm_eval_calibration (probability quality):
    lift is what the score is WORTH at a given outreach budget.

    Exactness: deciles come from distributed_ntile (range-contiguous
    buckets + offset ranks — bit-equal to global NTILE, no
    unpartitioned window); counts are exact ints; the cumulative leg
    is a bounded 10×10 self-join (decile ≤ decile — no window at
    all); every emitted ratio divides two exact < 2^53 integer
    products once in IEEE double. Scale: one orders pass to the
    responder set (DISTINCT custkey), one customer⋈responder join,
    the ntile machinery's bounded collects — nothing else moves."""
    from osm_airflow_spark.operators.windows import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    resp = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    scored = (
        c.join(resp, c.c_custkey == F.col("k"), "left")
        .select(
            "c_custkey",
            (-F.col("c_acctbal")).alias("neg_score"),
            F.when(F.col("k").isNotNull(), 1).otherwise(0).alias("responded"),
        )
    )
    tiled = distributed_ntile(
        scored, F.col("neg_score"), "c_custkey", "decile", 10
    )
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("responded").alias("r")
    ).localCheckpoint(eager=True)  # 10 rows; both self-join legs + totals
    tot = d.agg(
        F.sum("n").alias("nt"), F.sum("r").alias("rt")
    )
    b = d.select(
        F.col("decile").alias("d2"), F.col("n").alias("n2"), F.col("r").alias("r2")
    )
    cum = (
        d.join(F.broadcast(b), F.col("d2") <= F.col("decile"))
        .groupBy("decile")
        .agg(
            F.max("n").alias("n"),
            F.max("r").alias("r"),
            F.sum("n2").alias("cum_n"),
            F.sum("r2").alias("cum_r"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n").alias("n_customers"),
            F.col("r").alias("n_responders"),
            (F.col("r").cast("double") / F.col("n")).alias("response_rate"),
            F.col("cum_r").alias("cum_responders"),
            (
                (F.col("cum_r") * F.col("nt")).cast("double")
                / (F.col("cum_n") * F.col("rt")).cast("double")
            ).alias("cum_lift"),
            (F.col("cum_r").cast("double") / F.col("rt")).alias("gain"),
        )
        .orderBy("decile")
    )


@query(
    "pipeline_grouped_ols",
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(p.p_retailprice AS DECIMAL(18,2)) AS x,
             CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT)
               AS y
      FROM part p LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey, p.p_retailprice
    ),
    stats AS (
      SELECT brand,
             COUNT(*) AS n,
             CAST(SUM(x) AS DECIMAL(28,2)) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS DECIMAL(28,2)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,2)) * x) AS DECIMAL(28,4)) AS sxx
      FROM demand GROUP BY brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_parts,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
           round((CAST(sy AS DOUBLE)
                  - round(CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE), 9)
                    * CAST(sx AS DOUBLE)) / n, 9) AS intercept
    FROM stats
    ORDER BY brand
    """,
)
def pipeline_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — GROUPED OLS: one regression PER BRAND in a
    single pass (demand curve: total quantity sold per part vs its
    retail price, 25 independent fits here, millions on a real
    catalog) — the many-small-models shape that distinguishes a
    distributed engine from a stats library looping over groups.
    pipeline_revenue_trend_forecast fits ONE global line;
    pipeline_theil_sen fits ONE robust line; this fits every group's
    line in the same two aggregations any one of them costs.

    Exactness: x = retail price as DECIMAL(18,2) (fixture-safe cast),
    y = integer quantity sum, so every sufficient statistic
    (n, Σx, Σy, Σxy, Σx²) is exact; slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    is a ratio of exact decimals whose unscaled magnitudes pass 2^53
    at sf ≥ ~0.5 — emitted at 9 dp (the pipeline_acf decimal-ratio
    recipe); the intercept reuses the ROUNDED slope so both engines
    derive it from bit-identical inputs. Parts that never sold enter
    with y = 0 (LEFT join): a demand curve estimated only on sold
    parts would survivorship-bias the slope toward zero.

    Scale: one lineitem shuffle on partkey (the per-part demand
    aggregate), one brand-bounded groupBy (25 rows out). Nothing
    else moves; at 100 TB the demand aggregate is the only
    corpus-sized exchange and it map-side-combines."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    sold = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    demand = pt.join(sold, pt.p_partkey == F.col("k"), "left").select(
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").cast("decimal(18,2)").alias("x"),
        F.coalesce(F.col("q"), F.lit(0)).cast("long").alias("y"),
    )
    st = demand.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(28,2)").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(28,2)").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("x"))
        .cast("decimal(28,4)")
        .alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round(num.cast("double") / den.cast("double"), 9)
    intercept = F.round(
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n"),
        9,
    )
    return st.select(
        "brand",
        F.col("n").cast("long").alias("n_parts"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).orderBy("brand")


@query(
    "pipeline_price_elasticity",
    oracle="""
    WITH obs AS (
      SELECT p.p_brand AS brand,
             round(ln(CAST(l.l_extendedprice AS DOUBLE)
                      / CAST(l.l_quantity AS DOUBLE)), 6) AS x,
             round(ln(CAST(l.l_quantity AS DOUBLE)), 6) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0
    ),
    s AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sxy,
             CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sxx
      FROM obs GROUP BY brand
    )
    SELECT brand, n_obs,
           CASE WHEN n_obs * sxx - sx * sx <> 0
                THEN (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
           END AS elasticity
    FROM s
    ORDER BY brand
    """,
)
def pipeline_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY of demand per brand — the LOG-LOG regression
    d ln(qty)/d ln(unit price) over line items (the pricing-analytics
    staple; pipeline_grouped_ols is its linear sibling — this key
    adds the transcendental-regressor discipline a log-log model
    forces).

    Determinism recipe (three house rules composed): both logs are
    rounded AT the transcendental to 6 dp (engines' ln differ by
    ulps); every product term x·y, x·x is ALSO rounded to 6 dp before
    the decimal cast (the anova Σx² term rule — the raw 12-dp product
    scale would push the sums past the 2^53 cast-exactness line), so
    all five sufficient statistics are exact decimal sums with exact
    double casts; the slope is then a fixed-order shared IEEE tree —
    emitted UNROUNDED, bit-identical by construction. Zero-variance
    brands (all lines at one log-price) emit NULL, never a division
    crash.

    Scale: one fact-table pass with a broadcast part-dim join; per-
    brand sufficient statistics shuffle 5 decimals × brands — the
    many-small-models shape; nothing downstream exceeds the brand
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.round(
        F.log(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ),
        6,
    )
    y = F.round(F.log(F.col("l_quantity").cast("double")), 6)
    obs = (
        li.where(F.col("l_quantity") > 0)
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("p_brand").alias("brand"), x.alias("x"), y.alias("y"))
    )
    d6 = "decimal(18,6)"
    s = obs.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("x").cast(d6)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d6)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(d6))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(d6))
        .cast("double")
        .alias("sxx"),
    )
    num = F.col("n_obs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_obs") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "brand",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.when(den != 0, num / den).alias("elasticity"),
    ).orderBy("brand")


@query(
    "pipeline_cem_matching",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(18,2)) AS s
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT c_custkey,
             c_mktsegment = 'AUTOMOBILE' AS treated,
             CAST(floor(c_acctbal / 250.0) AS BIGINT) AS stratum,
             COALESCE(spend.s, CAST(0 AS DECIMAL(18,2))) AS outcome
      FROM customer LEFT JOIN spend ON c_custkey = o_custkey
    ),
    strata AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treated,
             CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_control,
             CAST(SUM(CASE WHEN treated THEN outcome END) AS DECIMAL(18,2))
               AS sum_t,
             CAST(SUM(CASE WHEN NOT treated THEN outcome END)
                  AS DECIMAL(18,2)) AS sum_c
      FROM cust GROUP BY stratum
    )
    SELECT stratum, n_treated, n_control,
           CAST(sum_t AS DOUBLE) / n_treated AS mean_treated,
           CAST(sum_c AS DOUBLE) / n_control AS mean_control,
           CAST(sum_t AS DOUBLE) / n_treated
             - CAST(sum_c AS DOUBLE) / n_control AS diff
    FROM strata
    WHERE n_treated > 0 AND n_control > 0
    ORDER BY stratum
    """,
)
def pipeline_cem_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — COARSENED EXACT MATCHING (Iacus, King &
    Porro 2012): the observational-causal estimator beside the
    experimental pair (pipeline_ab_test, pipeline_did). Treatment =
    AUTOMOBILE segment membership, outcome = customer lifetime
    spend, confounder = account balance coarsened into width-250
    strata; within each stratum that holds BOTH groups, treated and
    control are exchangeable-by-construction on the coarsened
    confounder, so mean_treated − mean_control is that stratum's
    effect estimate. Per-stratum rows emit (the weighted ATT
    reduction is one more line driver-side); strata with no
    counterfactual are pruned — exactly CEM's "discard unmatched"
    step, the property that distinguishes matching from regression.

    Determinism without any rounding: each mean is ONE IEEE division
    of an exact-decimal sum cast to double (stratum spend sums stay
    < 2^53 unscaled through sf 1, so the casts are exact in both
    engines), diff subtracts two agreed doubles, and there is NO
    cross-stratum double reduction to order — per-stratum grain
    sidesteps the order-free-double-agg hazard entirely.

    Scale: one orders pass to per-customer spend (shuffle on
    custkey), one broadcast-sized strata groupBy (≤ 44 strata at any
    SF — the output is control-plane sized); the customer⋈spend join
    shuffles on the same custkey both sides. At 100 TB nothing here
    grows beyond the customer table's natural key partitioning."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("s")
    )
    cust = c.join(spend, c.c_custkey == F.col("k"), "left").select(
        (F.col("c_mktsegment") == "AUTOMOBILE").alias("treated"),
        F.floor(F.col("c_acctbal") / 250.0).cast("long").alias("stratum"),
        F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,2)")).alias("outcome"),
    )
    strata = cust.groupBy("stratum").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("n_treated"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("treated"), F.col("outcome")))
        .cast("decimal(18,2)")
        .alias("sum_t"),
        F.sum(F.when(~F.col("treated"), F.col("outcome")))
        .cast("decimal(18,2)")
        .alias("sum_c"),
    )
    mean_t = F.col("sum_t").cast("double") / F.col("n_treated")
    mean_c = F.col("sum_c").cast("double") / F.col("n_control")
    return (
        strata.where((F.col("n_treated") > 0) & (F.col("n_control") > 0))
        .select(
            "stratum",
            "n_treated",
            "n_control",
            mean_t.alias("mean_treated"),
            mean_c.alias("mean_control"),
            (mean_t - mean_c).alias("diff"),
        )
        .orderBy("stratum")
    )


@query(
    "pipeline_did",
    oracle="""
    WITH span AS (
      SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    assigned AS (
      -- midpoint in integer epoch-us: DuckDB divides INTERVALs
      -- field-wise (29 days / 2 = 14 days, the half-day DROPPED)
      -- while Spark divides total microseconds -- epoch integer
      -- arithmetic is identical in both engines
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
             CASE WHEN epoch_us(ts) * 2 < epoch_us(t0) + epoch_us(t1)
                  THEN 'pre' ELSE 'post' END AS period,
             value
      FROM events, span
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    stats AS (
      SELECT arm, period,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY arm, period
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN n END) AS n_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN sx END) AS s_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN sxx END) AS q_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN n END) AS n_a1,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN sx END) AS s_a1,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN sxx END) AS q_a1,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN n END) AS n_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN sx END) AS s_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN sxx END) AS q_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN n END) AS n_b1,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN sx END) AS s_b1,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN sxx END) AS q_b1
      FROM stats
    )
    SELECT CAST(n_a0 + n_a1 + n_b0 + n_b1 AS BIGINT) AS n,
           s_b1 / n_b1 - s_b0 / n_b0 AS delta_treat,
           s_a1 / n_a1 - s_a0 / n_a0 AS delta_control,
           (s_b1 / n_b1 - s_b0 / n_b0) - (s_a1 / n_a1 - s_a0 / n_a0)
             AS did_estimate,
           sqrt(((n_a0 * q_a0 - s_a0 * s_a0) / (n_a0 * (n_a0 - 1.0))) / n_a0
                + ((n_a1 * q_a1 - s_a1 * s_a1) / (n_a1 * (n_a1 - 1.0))) / n_a1
                + ((n_b0 * q_b0 - s_b0 * s_b0) / (n_b0 * (n_b0 - 1.0))) / n_b0
                + ((n_b1 * q_b1 - s_b1 * s_b1) / (n_b1 * (n_b1 - 1.0))) / n_b1)
             AS std_err,
           ((s_b1 / n_b1 - s_b0 / n_b0) - (s_a1 / n_a1 - s_a0 / n_a0))
           / sqrt(((n_a0 * q_a0 - s_a0 * s_a0) / (n_a0 * (n_a0 - 1.0))) / n_a0
                  + ((n_a1 * q_a1 - s_a1 * s_a1) / (n_a1 * (n_a1 - 1.0))) / n_a1
                  + ((n_b0 * q_b0 - s_b0 * s_b0) / (n_b0 * (n_b0 - 1.0))) / n_b0
                  + ((n_b1 * q_b1 - s_b1 * s_b1) / (n_b1 * (n_b1 - 1.0))) / n_b1)
             AS t_stat
    FROM wide
    """,
)
def pipeline_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — DIFFERENCE-IN-DIFFERENCES on purchase values:
    arms by user-id parity (the ab_test assignment), periods by the
    exact midpoint of the corpus span (the psi_drift split) — the
    quasi-experimental readout when treatment rolls out at a point
    in time and the control arm carries the seasonal trend:
    DiD = (B̄post − B̄pre) − (Āpost − Āpre), with the four-variance
    standard error and t. Per-cell sufficient statistics follow the
    ab_test recipe (exact decimal Σx, term-rounded Σx²); everything
    cross-cell is computed off a 2×2 WIDE PIVOT so each reduction is
    a fixed-order IEEE tree (the anova discipline).

    Scale: one corpus pass to 4 cells × 3 statistics (the span ride
    is a broadcast 1-row aggregate); the readout is one
    control-plane row."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    span = purchases.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    # integer epoch-us midpoint compare: ts*2 < t0+t1 (see oracle note
    # on DuckDB's field-wise interval division)
    def us(c):
        # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
        # cast to TIMESTAMP makes unix_micros the naive-UTC epoch --
        # exactly DuckDB's epoch_us on a naive timestamp
        return F.unix_micros(F.col(c).cast("timestamp"))

    is_pre = us("ts") * 2 < us("t0") + us("t1")
    assigned = purchases.crossJoin(F.broadcast(span)).select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        F.when(is_pre, "pre").otherwise("post").alias("period"),
        "value",
    )
    stats = assigned.groupBy("arm", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    cells = [("a", "pre", "a0"), ("a", "post", "a1"), ("b", "pre", "b0"), ("b", "post", "b1")]
    wide = stats.agg(
        *[
            F.max(
                F.when(
                    (F.col("arm") == arm) & (F.col("period") == per), F.col(c)
                )
            ).alias(f"{a}_{tag}")
            for arm, per, tag in cells
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )

    def mean(tag):
        return F.col(f"s_{tag}") / F.col(f"n_{tag}")

    def sem2(tag):
        n = F.col(f"n_{tag}")
        s = F.col(f"s_{tag}")
        q = F.col(f"q_{tag}")
        return ((n * q - s * s) / (n * (n - F.lit(1.0)))) / n

    delta_t = mean("b1") - mean("b0")
    delta_c = mean("a1") - mean("a0")
    did = delta_t - delta_c
    se = F.sqrt(sem2("a0") + sem2("a1") + sem2("b0") + sem2("b1"))
    n_tot = (
        F.col("n_a0") + F.col("n_a1") + F.col("n_b0") + F.col("n_b1")
    ).cast("long")
    return wide.select(
        n_tot.alias("n"),
        delta_t.alias("delta_treat"),
        delta_c.alias("delta_control"),
        did.alias("did_estimate"),
        se.alias("std_err"),
        (did / se).alias("t_stat"),
    )


@query(
    "pipeline_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    diffs AS (
      SELECT event_type, day,
             CASE WHEN x > LAG(x) OVER w THEN 1
                  WHEN x < LAG(x) OVER w THEN -1 END AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    signs AS (
      SELECT event_type, s,
             CASE WHEN s <> LAG(s) OVER (PARTITION BY event_type
                                         ORDER BY day) THEN 1 ELSE 0 END
               AS is_break
      FROM diffs WHERE s IS NOT NULL
    ),
    counts AS (
      SELECT event_type,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n_plus,
             SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n_minus,
             SUM(is_break) + 1 AS n_runs
      FROM signs GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_plus AS BIGINT) AS n_plus,
           CAST(n_minus AS BIGINT) AS n_minus,
           CAST(n_runs AS BIGINT) AS n_runs,
           CASE WHEN n_plus = 0 OR n_minus = 0 THEN NULL ELSE
           (CAST(n_runs AS DOUBLE)
            - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
           / sqrt(2.0 * n_plus * n_minus
                  * (2.0 * n_plus * n_minus - n_plus - n_minus)
                  / (CAST(n_plus + n_minus AS DOUBLE)
                     * (n_plus + n_minus)
                     * (n_plus + n_minus - 1.0))) END AS z_score,
           CASE WHEN n_plus = 0 OR n_minus = 0 THEN NULL ELSE
           abs((CAST(n_runs AS DOUBLE)
                - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
               / sqrt(2.0 * n_plus * n_minus
                      * (2.0 * n_plus * n_minus - n_plus - n_minus)
                      / (CAST(n_plus + n_minus AS DOUBLE)
                         * (n_plus + n_minus)
                         * (n_plus + n_minus - 1.0)))) <= 1.96
           END AS random_at_05
    FROM counts
    ORDER BY event_type
    """,
)
def pipeline_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — WALD–WOLFOWITZ RUNS TEST per event type: are
    the daily up/down moves of the value series RANDOM, or do they
    streak (momentum/trend) or alternate (mean-reversion,
    over-smoothing)? The classic randomness check a metrics platform
    runs before trusting i.i.d.-assuming monitors (CUSUM, Bollinger)
    on a series — too FEW runs ⇒ regimes (z < 0), too MANY ⇒
    oscillation (z > 0). Tie days (zero diff) drop per the standard
    formulation. Everything until the final z is exact integers:
    signs from exact-decimal daily totals, runs as sign-break counts
    + 1; μ_R = 2ab/n + 1 and σ²_R = 2ab(2ab−n)/(n²(n−1)) form one
    shared IEEE tree over those ints, emitted unrounded with the
    1.96 cut applied to the same double in both engines. A
    one-direction series (a·b = 0) has σ_R = 0 and the statistic is
    undefined — NULL, never NaN (whose comparisons diverge).

    Scale: one corpus pass to the dates×types-bounded daily table;
    both lag windows are type-partitioned (bounded, no global
    window); one row per type out."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("x").over(w)
    s = F.when(F.col("x") > prev, 1).when(F.col("x") < prev, -1)
    signs = (
        daily.select("event_type", "day", s.alias("s"))
        .where(F.col("s").isNotNull())
        .select(
            "event_type",
            "s",
            F.when(F.col("s") != F.lag("s").over(w), 1)
            .otherwise(0)
            .alias("is_break"),
        )
    )
    counts = signs.groupBy("event_type").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n_minus"),
        (F.sum("is_break") + 1).alias("n_runs"),
    )
    a = F.col("n_plus").cast("double")
    b = F.col("n_minus").cast("double")
    n = a + b
    mu = 2.0 * a * b / n + 1.0
    var = 2.0 * a * b * (2.0 * a * b - n) / (n * n * (n - 1.0))
    degenerate = (F.col("n_plus") == 0) | (F.col("n_minus") == 0)
    # a one-direction series has sigma_R = 0: 0/0 is NaN, and NaN
    # compares engine-dependently — the test is undefined there, so
    # emit NULL in both engines
    z = F.when(
        ~degenerate, (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    )
    return counts.select(
        "event_type",
        F.col("n_plus").cast("long").alias("n_plus"),
        F.col("n_minus").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        z.alias("z_score"),
        F.when(~degenerate, F.abs(z) <= 1.96).alias("random_at_05"),
    ).orderBy("event_type")


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
    "pipeline_conformal",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS prio, o_orderkey % 5 AS fold,
             o_orderkey, CAST(o_totalprice AS DOUBLE) AS y
      FROM orders
    ),
    model AS (
      SELECT prio,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS pred
      FROM base WHERE fold <= 2 GROUP BY prio
    ),
    calib AS (
      SELECT b.prio, abs(b.y - m.pred) AS resid
      FROM base b JOIN model m USING (prio) WHERE b.fold = 3
    ),
    qhat AS (
      SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CASE WHEN (9 * (COUNT(*) + 1) + 9) // 10 <= COUNT(*)
                  THEN list_sort(list(resid))[(9 * (COUNT(*) + 1) + 9) // 10]
                  END AS q_resid
      FROM calib GROUP BY prio
    ),
    cov AS (
      SELECT b.prio, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN abs(b.y - m.pred) <= q.q_resid
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM base b
      JOIN model m USING (prio)
      JOIN qhat q USING (prio)
      WHERE b.fold = 4
      GROUP BY b.prio
    )
    SELECT m.prio, m.pred, q.n_cal, q.q_resid,
           m.pred - q.q_resid AS lo, m.pred + q.q_resid AS hi,
           c.n_test, c.n_covered,
           CAST(c.n_covered AS DOUBLE) / c.n_test AS coverage
    FROM model m
    JOIN qhat q USING (prio)
    JOIN cov c ON c.prio = m.prio
    """,
)
def pipeline_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals (Vovk et al.;
    Papadopoulos et al. 2002; Angelopoulos & Bates 2023 tutorial) —
    the distribution-free UQ wrapper every model-eval pipeline wants:
    fit on a train split, take the ceil((n+1)(1-alpha))-th smallest
    absolute residual on a held-out calibration split, and pred ± q
    then covers a fresh point with probability >= 1-alpha, for ANY
    model. alpha = 0.1; the model here is the simplest honest one
    (per-priority train mean), because the guarantee — and this
    plan — is model-agnostic.

    Splits are content-derived (o_orderkey % 5: 0-2 train, 3
    calibration, 4 test — the llm_split_assign discipline, no
    rand()). The conformal rank k = ceil(0.9·(n+1)) is computed in
    INTEGER arithmetic ((9(n+1)+9) div 10) and the k-th order
    statistic comes from array_sort(collect_list(resid))[k] — the
    blessed agg_collect_ordered shape: an exact per-group order
    statistic with NO global window; memory is one calibration
    group (fine at 5 priority classes; at 100 TB with big groups,
    swap in a fixed-width residual histogram and take the k-th via
    cumulative counts — the guarantee only needs a conservative
    upper rank). Coverage on the test fold is reported beside the
    interval; every quantity is exact decimal/integer arithmetic or
    a deterministic double op → SQL-oracled."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    model = (
        base.where(F.col("fold") <= 2)
        .groupBy("prio")
        .agg(
            (F.sum(F.col("y").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("pred")
        )
    )
    calib = (
        base.where(F.col("fold") == 3)
        .join(model, "prio")
        .select("prio", F.abs(F.col("y") - F.col("pred")).alias("resid"))
    )
    qhat = split_conformal_qhat(calib, "prio", "resid")
    cov = (
        base.where(F.col("fold") == 4)
        .join(model, "prio")
        .join(qhat.select("prio", "q_resid"), "prio")
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.abs(F.col("y") - F.col("pred")) <= F.col("q_resid"), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        model.join(qhat, "prio")
        .join(cov, "prio")
        .select(
            "prio",
            "pred",
            "n_cal",
            "q_resid",
            (F.col("pred") - F.col("q_resid")).alias("lo"),
            (F.col("pred") + F.col("q_resid")).alias("hi"),
            "n_test",
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test")).alias("coverage"),
        )
    )


def split_conformal_qhat(
    calib: DataFrame,
    group_col: str,
    resid_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Generic per-group SPLIT-CONFORMAL quantile — the reusable
    estimator behind ``pipeline_conformal`` (the
    ``poisson_bootstrap_ci`` extraction pattern, ROADMAP r12 #4):
    given a calibration frame of nonconformity scores, returns one
    row per group with (n_cal, q_resid) where q_resid is the
    k = ceil((1-alpha)(n+1))-th smallest score. ``pred ± q_resid``
    then covers a fresh point with probability >= 1-alpha for ANY
    model (Papadopoulos et al. 2002; Angelopoulos & Bates 2023).

    alpha arrives as the RATIONAL alpha_num/alpha_den so the rank is
    EXACT integer arithmetic: k = ((den-num)(n+1) + den - 1) div den.
    A float alpha would put ceil() one ulp from a cliff — e.g.
    (1-0.1)*(n+1) evaluates to 9.000000000000002 at n = 9, and
    ceil() silently demands an 11th residual from 9. At the default
    1/10 this reproduces the key's pinned (9(n+1)+9) div 10.

    k > n_cal means the guarantee needs the INFINITE interval: emit
    NULL (DuckDB's out-of-range list index is NULL; Spark's under
    ANSI is a runtime error, so the guard is correctness AND
    crash-safety — the win_hampel_outliers lesson). Memory bound is
    one calibration group (the agg_collect_ordered contract); for
    corpus-sized groups use ``conformal_qhat_histogram``, the
    bounded-memory conservative variant."""
    if not 0 < alpha_num < alpha_den:
        raise ValueError(
            f"alpha must be a proper fraction: got {alpha_num}/{alpha_den}"
        )
    keep = alpha_den - alpha_num
    k = F.expr(f"({keep} * (count(1) + 1) + {alpha_den} - 1) div {alpha_den}")
    return calib.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.when(
            k <= F.count(F.lit(1)),
            F.element_at(F.array_sort(F.collect_list(resid_col)), k.cast("int")),
        ).alias("q_resid"),
    )


# Cumulative Poisson(1) CDF at k = 0..4, as 15-significant-digit
# literals: both engines parse <= 15-digit literals to the same
# double (the house literal rule), so the thresholds ARE the spec.
# u >= all five -> weight 5 (truncation mass ~6e-4, deterministic).
_POIS1_CDF = (
    "0.367879441171442",
    "0.735758882342885",
    "0.919698602928606",
    "0.981011843123846",
    "0.996340153172656",
)
_BOOT_B = 200  # replicas; 2.5% tails -> order statistics 5 and 196


@query(
    "pipeline_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT b, c_acctbal,
             {" + ".join(
                 f"(CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#' || CAST(b AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 >= {t} THEN 1 ELSE 0 END)"
                 for t in _POIS1_CDF
             )} AS w
      FROM customer, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
    ),
    means AS (
      -- a replica whose weights all drew 0 has no resample: drop it
      -- in BOTH engines (unguarded, Spark's ANSI division crashes
      -- and DuckDB emits NULL rep_means that poison the order
      -- statistics asymmetrically). P(degenerate) = e^-n per
      -- replica, so real corpora lose none; tiny ones lose a few
      -- and the n_replicas >= 196 CI guard reports NULL bounds.
      SELECT b,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * w) AS DOUBLE)
               / SUM(w) AS rep_mean
      FROM reps GROUP BY b
      HAVING SUM(w) > 0
    ),
    summ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
             CASE WHEN COUNT(*) >= 196
                  THEN list_sort(list(rep_mean))[5] END AS ci_lo,
             CASE WHEN COUNT(*) >= 196
                  THEN list_sort(list(rep_mean))[196] END AS ci_hi
      FROM means
    ),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS est_mean
      FROM customer
    )
    SELECT p.n_rows, p.est_mean, s.n_replicas, s.ci_lo, s.ci_hi
    FROM point p, summ s
    """,
)
def pipeline_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval (Chamandy, Muralidharan,
    Najmi & Naidu 2012, "Estimating Uncertainty for Massive Data
    Streams" — Google's scale-out bootstrap; Hanley & MacGibbon 2006)
    for the mean customer account balance, with B = 200 replicas.

    The classical bootstrap resamples n rows WITH replacement — at
    100 TB that needs the global n and a shuffle per replica. The
    Poisson bootstrap replaces each row's multinomial count with an
    independent Poisson(1) weight, so EVERY (row, replica) weight is
    computed locally from the row itself: one narrow explode of B
    replica ids per row, one groupBy(replica) — fully map-parallel,
    mergeable, and streaming-friendly (the paper's point). Weights
    are content-derived (the house no-rand() rule): u = md5(custkey #
    replica) first-8-hex / 2^32 — an exact dyadic double in both
    engines — inverted through the Poisson(1) CDF as five
    15-digit-literal threshold comparisons (truncated at weight 5;
    tail mass 6e-4; deterministic). Replica means are decimal-exact
    weighted sums cast to double once; the 95% CI is the exact
    5th/196th order statistic of the 200 replica means via the
    blessed array_sort(collect_list(...)) shape — 200 elements, a
    bounded collect by construction. Everything deterministic →
    SQL-oracled (the rare thing for a bootstrap)."""
    c = load_table(spark, sf_dir, "customer")
    return poisson_bootstrap_ci(c, spark, unit_col="c_custkey", value_col="c_acctbal")


def poisson_bootstrap_ci(
    df: DataFrame,
    spark: SparkSession,
    unit_col: str,
    value_col: str,
    b: int = _BOOT_B,
    alpha: float = 0.05,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
) -> DataFrame:
    """Generic deterministic Poisson-bootstrap CI for the mean of
    ``value_col`` over units keyed by ``unit_col`` — the reusable
    estimator behind the ``pipeline_bootstrap_ci`` key (same
    md5-derived weights, same guards; the key pins it to the oracle).
    Returns one row: (n_rows, est_mean, n_replicas, ci_lo, ci_hi).

    The interval ranks DERIVE from ``(b, alpha)`` — lo = max(1,
    floor(alpha/2·b)), hi = b+1−lo (200/0.05 → 5/196, the key's
    pinned values) — so changing ``b`` alone keeps the coverage
    level instead of silently yielding NULL bounds (the
    n_replicas < hi_rank guard) or a wrong-level interval. The floor
    runs in EXACT RATIONALS (Fraction.limit_denominator recovers the
    intended decimal alpha from its double) — ``int(alpha/2.0*b)``
    would truncate one ulp below the true product (alpha=0.3, b=20:
    0.15*20 = 2.9999999999999996 → 2, not 3 — the split_conformal
    float-rank cliff, r12 review finding). Explicit
    ``lo_rank``/``hi_rank`` overrides are validated against ``b``."""
    if lo_rank is None:
        from fractions import Fraction

        fa = Fraction(alpha).limit_denominator(1_000_000)
        lo_rank = max(1, int(fa * b / 2))
    if hi_rank is None:
        hi_rank = b + 1 - lo_rank
    if not 1 <= lo_rank < hi_rank <= b:
        raise ValueError(
            f"bootstrap ranks out of range: need 1 <= lo_rank < hi_rank <= b, "
            f"got lo_rank={lo_rank}, hi_rank={hi_rank}, b={b}"
        )
    # The b-fold explode multiplies work b-times BEFORE the first
    # shuffle, so it inherits the scan's partitioning — a small
    # single-file input would hash b*n rows in ONE task. Spreading
    # the tiny input first costs a negligible shuffle and unlocks
    # full map parallelism (measured 5.6 s -> 0.14 s warm at sf0.1
    # on local[32]); at 100 TB inputs are many-file already and this
    # is a no-op-sized safety net.
    c = df.repartition(spark.sparkContext.defaultParallelism)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(unit_col).cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w_col = None
    for t in _POIS1_CDF:
        ind = F.when(u >= float(t), 1).otherwise(0)
        w_col = ind if w_col is None else (w_col + ind)
    reps = c.select(
        unit_col,
        value_col,
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
    ).select("b", value_col, w_col.alias("w"))
    # drop all-zero-weight replicas BEFORE dividing: Spark's ANSI
    # division would crash and DuckDB's NULL means would poison the
    # sorted order statistics (code-review find, reproduced on a
    # 3-customer corpus — 8/200 degenerate replicas at n = 3)
    means = (
        reps.groupBy("b")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)") * F.col("w")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select((F.col("swx").cast("double") / F.col("sw")).alias("rep_mean"))
    )
    # empty-corpus guard: zero replicas -> element_at on an empty
    # array is an ANSI runtime error in Spark (NULL in DuckDB) —
    # emit NULL bounds instead of crashing
    has_b = F.count(F.lit(1)) >= hi_rank
    summ = means.agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.when(
            has_b, F.element_at(F.array_sort(F.collect_list("rep_mean")), lo_rank)
        ).alias("ci_lo"),
        F.when(
            has_b, F.element_at(F.array_sort(F.collect_list("rep_mean")), hi_rank)
        ).alias("ci_hi"),
    )
    point = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est_mean"),
    )
    return point.crossJoin(F.broadcast(summ)).select(
        "n_rows", "est_mean", "n_replicas", "ci_lo", "ci_hi"
    )


@query(
    "pipeline_cuped",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             COUNT(*) FILTER (o_orderdate < TIMESTAMP '1997-01-01') AS x,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                      THEN CAST(o_totalprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y_dec
      FROM orders GROUP BY o_custkey
    ),
    units AS (
      SELECT c.c_custkey % 2 AS arm,
             COALESCE(p.x, 0) AS x,
             COALESCE(p.y_dec, CAST(0 AS DECIMAL(18,2))) AS y_dec
      FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(y_dec) AS DOUBLE) AS sy,
             CAST(SUM(x * y_dec) AS DOUBLE) AS sxy,
             CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS DOUBLE) AS sx_t,
             CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS DOUBLE) AS sx_c,
             CAST(SUM(CASE WHEN arm = 1 THEN y_dec
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sy_t,
             CAST(SUM(CASE WHEN arm = 0 THEN y_dec
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sy_c
      FROM units
    )
    SELECT n, n_t, n_c,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) END AS theta,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
             round(sy_t / n_t - sy_c / n_c, 9) END AS delta_raw,
           CASE WHEN n_t > 0 AND n_c > 0 AND n * sxx - sx * sx <> 0 THEN
             round((sy_t / n_t - sy_c / n_c)
                   - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
                     * (sx_t / n_t - sx_c / n_c), 9) END AS delta_cuped
    FROM stats
    """,
)
def pipeline_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
    Xu, Kohavi & Walker, WSDM 2013): the industry-standard variance
    reduction for A/B tests. Each unit's post-period metric y is
    adjusted by its PRE-period covariate x (here: 1995-96 order
    count, an integer, vs 1997+ spend): y' = y - θ(x - x̄) with
    θ = cov(x,y)/var(x); the treatment contrast of y' has variance
    (1-ρ²)·var(Δ_raw) and is unbiased for any θ because assignment
    (c_custkey % 2, content-derived) is independent of x.

    One pass builds per-unit (x, y) — a conditional aggregate over
    orders, LEFT-joined so no-order customers enter as (0, 0) — and a
    second single-row aggregate folds ALL sufficient statistics
    (n, Σx, Σx², Σy, Σxy + per-arm sums) map-side: the whole
    estimator is two shuffles of sufficient statistics, never a
    per-unit residual materialization — the agg_corr_exact /
    pipeline_grouped_ols discipline. The integer covariate keeps
    every cross-moment's decimal unscaled value < 2^53 (Σxy <=
    15k·12·5.5e6·100 ≈ 1e14 at sf0.1), so each cast to double is
    exact and θ is ONE deterministic double expression, rounded 9 dp
    (FMA-contraction guard); delta_cuped reads the ROUNDED θ — every
    downstream decision off the rounded value, the bh_fdr rule.
    Variance-reduction itself needs Σy² (unscaled > 2^53 here), so
    the ρ² claim is pinned by the planted pytest, not emitted."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    split = F.lit("1997-01-01").cast("timestamp")
    zero2 = F.lit(0).cast("decimal(18,2)")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < split, 1).otherwise(0)).alias("x"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= split,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(zero2)
        ).alias("y_dec"),
    )
    units = c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left").select(
        (F.col("c_custkey") % 2).alias("arm"),
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y_dec"), zero2).alias("y_dec"),
    )
    arm_t = F.col("arm") == 1
    stats = units.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(arm_t, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(~arm_t, 1).otherwise(0)).alias("n_c"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y_dec").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y_dec")).cast("double").alias("sxy"),
        F.sum(F.when(arm_t, F.col("x")).otherwise(0)).cast("double").alias("sx_t"),
        F.sum(F.when(~arm_t, F.col("x")).otherwise(0)).cast("double").alias("sx_c"),
        F.sum(F.when(arm_t, F.col("y_dec")).otherwise(zero2)).cast("double").alias("sy_t"),
        F.sum(F.when(~arm_t, F.col("y_dec")).otherwise(zero2)).cast("double").alias("sy_c"),
    )
    n = F.col("n")
    theta = F.round(
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (n * F.col("sxx") - F.col("sx") * F.col("sx")),
        9,
    )
    mean_gap_y = F.col("sy_t") / F.col("n_t") - F.col("sy_c") / F.col("n_c")
    mean_gap_x = F.col("sx_t") / F.col("n_t") - F.col("sx_c") / F.col("n_c")
    # degenerate-input guards (NULL, never Inf/NaN — NaN compares
    # engine-dependently, the runs_test rule): a constant covariate
    # has var(x) = 0 (theta undefined), a single-arm corpus has no
    # contrast
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    both_arms = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    return stats.select(
        "n",
        "n_t",
        "n_c",
        F.when(den != 0, theta).alias("theta"),
        F.when(both_arms, F.round(mean_gap_y, 9)).alias("delta_raw"),
        F.when(both_arms & (den != 0), F.round(mean_gap_y - theta * mean_gap_x, 9)).alias(
            "delta_cuped"
        ),
    )


# Wald SPRT constants, scaled to exact integers (millionths):
# H0 p=0.5 vs H1 p=0.6; ln(1.2)=0.182322, ln(0.8)=-0.223144 (6 dp);
# alpha=beta=0.05 -> bounds +-ln(19)=+-2.944439 -> +-2944439.
_SPRT_C1 = 182322
_SPRT_C0 = 223144
_SPRT_A = 2944439


@query(
    "pipeline_sprt",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS s,
             SUM(CASE WHEN value > 10.0 THEN 0 ELSE 1 END) AS f
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    walk AS (
      SELECT event_type, day,
             SUM(s) OVER w AS n1, SUM(f) OVER w AS n0
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
      SELECT event_type, day, n1, n0,
             n1 * {_SPRT_C1} - n0 * {_SPRT_C0} AS llr_m
      FROM walk
    ),
    first_cross AS (
      SELECT event_type, MIN(day) AS dday
      FROM scored WHERE llr_m >= {_SPRT_A} OR llr_m <= -{_SPRT_A}
      GROUP BY event_type
    ),
    last_day AS (
      SELECT event_type, MAX(day) AS lday FROM scored GROUP BY event_type
    ),
    decided AS (
      SELECT l.event_type, COALESCE(fc.dday, l.lday) AS day,
             fc.dday IS NOT NULL AS crossed
      FROM last_day l LEFT JOIN first_cross fc USING (event_type)
    )
    SELECT d.event_type,
           CASE WHEN NOT d.crossed THEN 'continue'
                WHEN s.llr_m >= {_SPRT_A} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           strftime(d.day, '%Y-%m-%d') AS day_decided,
           CAST(s.n1 + s.n0 AS BIGINT) AS n_seen,
           CAST(s.n1 AS BIGINT) AS n_success,
           CAST(s.llr_m AS DOUBLE) / 1000000.0 AS llr
    FROM decided d
    JOIN scored s ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def pipeline_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945) — the
    always-valid sequential monitor: per event type, walk the stream
    in time order accumulating the Bernoulli log-likelihood ratio for
    H1 p=0.6 vs H0 p=0.5 (success = value > 10), and stop at the
    FIRST crossing of +-ln(19) (alpha = beta = 0.05) — 'peeking' is
    the design, not a sin, unlike the fixed-horizon pipeline_ab_test.
    The open-ended drift sibling of pipeline_cusum_changepoint.

    Scale discipline (the runs-test precedent): the sequential walk
    runs over the CALENDAR-BOUNDED daily table — one groupBy
    compresses the stream to (type, day) counts, the running sums
    are integer windows over days, and the group-sequential decision
    is taken at day granularity (Wald's bounds stay conservative
    under batching). The LLR is EXACT INTEGER arithmetic end to end:
    6-dp log-ratio constants scaled to millionths (n1*182322 -
    n0*223144 vs +-2944439), so no double accumulation, no FMA
    contraction at the decision boundary, nothing to round — the
    crossing day is hash-exact. First-crossing row rides a min(day)
    join-back; never-crossing types report 'continue' at the last
    day. Streaming twin: the same integer state in an
    applyInPandasWithState fold (streaming/stateful.py cusum shape)."""
    from pyspark.sql import Window

    # ts null guard: a NULL day would sort NULLS FIRST in Spark's
    # window but NULLS LAST in DuckDB's — exclude it from the walk in
    # both engines
    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.when(F.col("value") > 10.0, 1).otherwise(0).alias("s_"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum("s_").alias("s"),
            F.sum(1 - F.col("s_")).alias("f"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "day",
        F.sum("s").over(w).alias("n1"),
        F.sum("f").over(w).alias("n0"),
    ).withColumn("llr_m", F.col("n1") * _SPRT_C1 - F.col("n0") * _SPRT_C0)
    first_cross = (
        scored.where((F.col("llr_m") >= _SPRT_A) | (F.col("llr_m") <= -_SPRT_A))
        .groupBy("event_type")
        .agg(F.min("day").alias("dday"))
    )
    last_day = scored.groupBy("event_type").agg(F.max("day").alias("lday"))
    decided = last_day.join(first_cross, "event_type", "left").select(
        "event_type",
        F.coalesce(F.col("dday"), F.col("lday")).alias("day"),
        F.col("dday").isNotNull().alias("crossed"),
    )
    return decided.join(scored, ["event_type", "day"]).select(
        "event_type",
        F.when(~F.col("crossed"), F.lit("continue"))
        .when(F.col("llr_m") >= _SPRT_A, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        F.date_format("day", "yyyy-MM-dd").alias("day_decided"),
        (F.col("n1") + F.col("n0")).cast("long").alias("n_seen"),
        F.col("n1").cast("long").alias("n_success"),
        (F.col("llr_m").cast("double") / 1000000.0).alias("llr"),
    )


@query(
    "pipeline_power_analysis",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4)))
                  AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    ),
    derived AS (
      SELECT l_returnflag, n,
             sx / n AS mean_x,
             (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)) AS var_x
      FROM stats
    )
    SELECT l_returnflag, n,
           round(mean_x, 9) AS mean_qty,
           CASE WHEN n >= 2 THEN round(var_x, 9) END AS var_qty,
           CASE WHEN n >= 2 THEN
             round(2.801585 * sqrt(2.0 * var_x / n), 9) END AS mde_abs,
           CASE WHEN n >= 2 AND mean_x <> 0 THEN
             round(2.801585 * sqrt(2.0 * var_x / n) / mean_x, 9) END AS mde_rel,
           CASE WHEN n >= 2 AND mean_x <> 0 THEN
             CAST(ceil(round(
               2.0 * var_x * 2.801585 * 2.801585
                 / ((0.02 * mean_x) * (0.02 * mean_x)), 6)) AS BIGINT) END
             AS n_req_per_arm
    FROM derived
    """,
)
def pipeline_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS — the pre-experiment sizing report
    that belongs beside pipeline_ab_test / pipeline_cuped /
    pipeline_sprt: per return-flag stratum, the metric's mean and
    variance from exact decimal sufficient statistics (n, Σx, Σx² —
    the agg_stats_moments recipe, every unscaled value < 2^53 here
    so casts are exact), then the two standard design numbers for a
    two-sample z-test at alpha = 0.05 (two-sided), power = 0.80
    (z_sum = 1.959964 + 0.841621 = 2.801585, one 15-digit-safe
    literal):

      MDE at current n      = z_sum * sqrt(2 var / n)
      n per arm for 2% lift = ceil(2 var z_sum^2 / (0.02 mean)^2)

    All emissions are single deterministic double expressions over
    the exact statistics, rounded 9 dp (FMA guard); the ceil for
    n_req reads a 6-dp-ROUNDED quotient so the integer decision
    cannot sit on a contraction-dependent ulp (the bh_fdr
    rounded-decision rule). One groupBy, sufficient statistics only —
    nothing about this plan changes at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,4)"))
        .cast("double")
        .alias("sxx"),
    )
    n = F.col("n")
    mean_x = F.col("sx") / n
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n.cast("double") * (n - 1))
    zsum = F.lit(2.801585)
    mde_abs = zsum * F.sqrt(2.0 * var_x / n)
    n_req = F.ceil(
        F.round(2.0 * var_x * zsum * zsum / ((0.02 * mean_x) * (0.02 * mean_x)), 6)
    )
    # degenerate guards (NULL, never Inf/NaN): variance needs n >= 2,
    # the relative numbers need a nonzero mean
    has_var = n >= 2
    has_mean = has_var & (mean_x != 0)
    return stats.select(
        "l_returnflag",
        "n",
        F.round(mean_x, 9).alias("mean_qty"),
        F.when(has_var, F.round(var_x, 9)).alias("var_qty"),
        F.when(has_var, F.round(mde_abs, 9)).alias("mde_abs"),
        F.when(has_mean, F.round(mde_abs / mean_x, 9)).alias("mde_rel"),
        F.when(has_mean, n_req.cast("long")).alias("n_req_per_arm"),
    )


def conformal_qhat_histogram(
    calib: DataFrame,
    group_col: str = "prio",
    resid_col: str = "resid",
    bin_width: float = 1000.0,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """The 100 TB path pipeline_conformal's docstring promises: a
    FIXED-WIDTH-HISTOGRAM conformal quantile that never materializes
    a per-group sorted residual list.

    Exact split conformal needs the k-th smallest calibration
    residual (k = ceil((1-alpha)(n+1))); the sorted-collect form
    holds one group in memory. This form buckets residuals into
    fixed-width bins (one groupBy on (group, bin) — mergeable,
    bounded state) and returns the UPPER EDGE of the first bin whose
    cumulative count reaches k. Because the upper edge >= the true
    k-th order statistic, intervals built from it are CONSERVATIVE:
    coverage >= 1 - alpha still holds (Angelopoulos & Bates 2023 §2
    remark on conservative scores), at a width cost of at most one
    bin. The cumulative walk is a window over BINS per group —
    bounded by range/bin_width, never by n.

    alpha is passed as a rational (num/den) so k stays integer
    arithmetic. Returns (group, n_cal, q_hist)."""
    from pyspark.sql import Window

    b = F.floor(F.col(resid_col) / bin_width).cast("long").alias("bin")
    bins = (
        calib.select(F.col(group_col).alias("grp"), b)
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("bin")
    n_w = Window.partitionBy("grp")
    cum = bins.select(
        "grp",
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(n_w).alias("n_cal"),
    )
    # k = ceil((1-alpha)(n+1)) with alpha = num/den, in integers
    k = F.expr(
        f"(({alpha_den} - {alpha_num}) * (n_cal + 1) + {alpha_den} - 1)"
        f" div {alpha_den}"
    )
    hits = cum.where(F.col("cum") >= k)
    return (
        hits.groupBy("grp")
        .agg(
            F.any_value("n_cal").alias("n_cal"),
            ((F.min("bin") + 1) * bin_width).alias("q_hist"),
        )
        .select(F.col("grp").alias(group_col), "n_cal", "q_hist")
    )


@query(
    "pipeline_pettitt",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT a.event_type, a.day,
             1 + CAST(SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) AS BIGINT)
               + CAST(SUM(CASE WHEN b.x <= a.x THEN 1 ELSE 0 END) AS BIGINT)
               AS r2
      FROM daily a JOIN daily b ON a.event_type = b.event_type
      GROUP BY a.event_type, a.day
    ),
    walk AS (
      SELECT event_type, day,
             SUM(r2) OVER w AS s2,
             ROW_NUMBER() OVER w AS t,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM ranked
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    u AS (
      SELECT event_type, day, n, abs(s2 - t * (n + 1)) AS au
      FROM walk WHERE t < n
    ),
    k AS (
      SELECT event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n_days,
             CAST(MAX(au) AS BIGINT) AS k_stat
      FROM u GROUP BY event_type
    ),
    at AS (
      SELECT u.event_type, MIN(u.day) AS cday
      FROM u JOIN k ON k.event_type = u.event_type AND u.au = k.k_stat
      GROUP BY u.event_type
    )
    SELECT k.event_type, k.n_days, k.k_stat,
           strftime(at.cday, '%Y-%m-%d') AS change_day,
           round(2.0 * exp(-6.0 * (CAST(k.k_stat AS DOUBLE) * k.k_stat)
                           / (CAST(k.n_days AS DOUBLE) * k.n_days * k.n_days
                              + CAST(k.n_days AS DOUBLE) * k.n_days)), 6)
             AS p_approx,
           round(2.0 * exp(-6.0 * (CAST(k.k_stat AS DOUBLE) * k.k_stat)
                           / (CAST(k.n_days AS DOUBLE) * k.n_days * k.n_days
                              + CAST(k.n_days AS DOUBLE) * k.n_days)), 6)
             < 0.05 AS significant
    FROM k JOIN at ON at.event_type = k.event_type
    """,
)
def pipeline_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PETTITT change-point test (Pettitt 1979) — the nonparametric
    sibling of pipeline_cusum_changepoint: locates a single shift in
    a daily series with NO distributional assumption, via the
    rank-based Mann-Whitney walk U_t = 2 Σ_{i<=t} r_i − t(n+1); the
    change point is argmax|U_t| and K = max|U_t| has the classic
    approximation p ≈ 2·exp(−6K²/(n³+n²)).

    Exactness discipline: the daily values are 6-dp exact-integer
    scalings (the spearman recipe), MIDRANKS are kept integer by the
    DOUBLED-rank trick (2r = 1 + cnt_less + cnt_leq — no halves),
    so S2_t and U_t are exact integers; K and the argmax day are
    hash-exact with zero float content. The ONLY float is the final
    p: K² and n³ in exact-double arithmetic (K < 2^26 here, so K·K
    is exact; the ratio is one IEEE division), exp rounded at the
    transcendental to 6 dp with the significance decision reading
    the ROUNDED value (the bh_fdr rule).

    Scale shape (consolidated r12 — VERDICT r11 #4: the 15-exchange
    v1 built midranks via a per-type self-join and located the argmax
    via two join-back branches, each re-executing its upstream under
    this build's no-exchange-reuse): the doubled midrank has the
    closed form 2r = n + 1 + rank_asc − rank_desc (#less = rank_asc−1,
    #leq = n − rank_desc + 1), so the WHOLE test is now one window
    stage over the daily aggregate — rank by x, rank by x desc, walk
    by day, max|U| — all partitioned by event_type (calendar-bounded),
    ONE exchange, then a single groupBy. No joins, no branches, 3
    exchanges total (was 15), and the rank leg drops from O(days²) to
    O(days·log days)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg((F.sum("v") * 1000000).cast("long").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    nw = Window.partitionBy("event_type")
    xa = Window.partitionBy("event_type").orderBy("x")
    xd = Window.partitionBy("event_type").orderBy(F.col("x").desc())
    # 2r = 1 + #less + #leq, with #less = rank_asc - 1 and
    # #leq = n - rank_desc + 1 — same integers as the oracle's
    # self-join counts, RANK ties handle the midrank halves
    ranked = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(nw)
            + 1
            + F.rank().over(xa)
            - F.rank().over(xd)
        ).cast("long").alias("r2"),
    )
    walk = ranked.select(
        "event_type",
        "day",
        F.sum("r2").over(w).alias("s2"),
        F.row_number().over(w).alias("t"),
        F.count(F.lit(1)).over(nw).alias("n"),
    )
    u = walk.where(F.col("t") < F.col("n")).select(
        "event_type",
        "day",
        "n",
        F.abs(F.col("s2") - F.col("t").cast("long") * (F.col("n") + 1)).alias("au"),
    )
    # argmax via one more same-partitioning window (no re-exchange),
    # then a single aggregation — no join-back
    u = u.withColumn("k", F.max("au").over(nw))
    res = u.groupBy("event_type").agg(
        F.any_value("n").cast("long").alias("n_days"),
        F.any_value("k").cast("long").alias("k_stat"),
        F.min(F.when(F.col("au") == F.col("k"), F.col("day"))).alias("cday"),
    )
    nd = F.col("n_days").cast("double")
    p = F.round(
        2.0
        * F.exp(
            -6.0
            * (F.col("k_stat").cast("double") * F.col("k_stat"))
            / (nd * F.col("n_days") * F.col("n_days") + nd * F.col("n_days"))
        ),
        6,
    )
    return res.select(
        "event_type",
        "n_days",
        "k_stat",
        F.date_format("cday", "yyyy-MM-dd").alias("change_day"),
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_open_orders_per_day",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
             -- the fixture has ship dates BEFORE order dates (the
             -- ship_latency filter precedent): an order is open at
             -- least on its order day
             GREATEST(MAX(CAST(l.l_shipdate AS DATE)),
                      CAST(o.o_orderdate AS DATE)) AS e,
             ANY_VALUE(CAST(o.o_totalprice AS DECIMAL(18,2))) AS val
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    bounds AS (SELECT MIN(s) AS d0, MAX(e) AS d1 FROM iv),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    sp AS (SELECT day, date_trunc('month', day)::DATE AS m FROM spine),
    ivm AS (
      SELECT iv.s, iv.e, iv.val,
             unnest(generate_series(date_trunc('month', iv.s),
                                    date_trunc('month', iv.e),
                                    INTERVAL 1 MONTH))::DATE AS m
      FROM iv
    )
    SELECT strftime(sp.day, '%Y-%m-%d') AS day,
           CAST(COUNT(ivm.val) AS BIGINT) AS n_open,
           CAST(COALESCE(SUM(ivm.val), CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
             AS open_value
    FROM sp LEFT JOIN ivm
      ON ivm.m = sp.m AND sp.day >= ivm.s AND sp.day <= ivm.e
    GROUP BY sp.day
    """,
)
def pipeline_open_orders_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal OCCUPANCY — how many orders are open (placed, not yet
    fully shipped) on each calendar day, with the open dollar value:
    the WIP/backlog report, and the interval-overlap COUNTING shape
    (join_interval_overlap emits the pairs; this aggregates
    concurrency over a spine).

    Scale shape: the naive form is spine x intervals — a
    broadcast-nested-loop over every (day, order) pair. Bucketing
    both sides by MONTH turns it into an EQUI-join (each order
    explodes into the handful of months it spans; each spine day
    carries its month), so cost is Σ per-month overlap — the
    join_interval_overlap coarse-cell rule. Zero-open days survive
    via the LEFT join from the spine (the date_spine densification
    discipline). The sweep-line alternative (+1/−1 running sum) needs
    a global cumulative window — rejected by the no-global-window
    rule; at 100 TB the month bucket IS the partition key. Exact:
    integer dates, decimal value sums, one final double cast."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(
            # fixture quirk: ship dates can precede order dates — an
            # order is open at least on its order day
            F.greatest(F.max(F.to_date("l_shipdate")), F.to_date(F.first("o_orderdate"))).alias("e"),
            F.any_value(F.col("o_totalprice").cast("decimal(18,2)")).alias("val"),
        )
    )
    bounds = iv.agg(F.min("s").alias("d0"), F.max("e").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    ).select("day", F.trunc("day", "month").alias("m"))
    ivm = iv.select(
        "s",
        "e",
        "val",
        F.explode(
            F.sequence(
                F.trunc("s", "month"), F.trunc("e", "month"), F.expr("INTERVAL 1 MONTH")
            )
        ).alias("m"),
    )
    hits = spine.join(
        ivm,
        (spine["m"] == ivm["m"]) & (F.col("day") >= F.col("s")) & (F.col("day") <= F.col("e")),
        "left",
    )
    zero2 = F.lit(0).cast("decimal(18,2)")
    return hits.groupBy("day").agg(
        F.count("val").cast("long").alias("n_open"),
        F.coalesce(F.sum("val"), zero2).cast("double").alias("open_value"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_open", "open_value"
    )


_SPELL_CTE = """ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             MAX(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey) AS cmax
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, CAST(o_custkey % 2 AS BIGINT) AS arm,
             MIN(CASE WHEN rn = 1 THEN od END) AS t1,
             MIN(CASE WHEN rn = 2 THEN od END) AS t2,
             MAX(cmax) AS cmax
      FROM ranked WHERE rn <= 2 GROUP BY o_custkey
    )"""


def _reorder_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer time-to-reorder spell ingredients — first order
    date t1, second order date t2 (NULL = censored), the customer's
    own max order date cmax, and the parity arm — the shared
    extraction behind pipeline_nelson_aalen / pipeline_logrank /
    pipeline_weibull_fit (SQL twin: _SPELL_CTE; pipeline_survival_km
    predates it and stays inline — driver-proven keys are not
    churned). Checkpointed: every consumer feeds both a 1-row
    globals aggregate and the spell pass (r12 review
    consolidation)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wmax = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.row_number().over(wc).alias("rn"),
        F.max(F.col("o_orderdate").cast("date")).over(wmax).alias("cmax"),
    ).where(F.col("rn") <= 2)
    return ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("od"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("od"))).alias("t2"),
        F.max("cmax").alias("cmax"),
    ).withColumn(
        "arm", (F.col("o_custkey") % 2).cast("long")
    ).localCheckpoint(eager=True)


@query(
    "pipeline_nelson_aalen",
    oracle=f"""
    WITH {_SPELL_CTE},
    g AS (SELECT MAX(cmax) AS gmax, COUNT(*) AS total FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM spells GROUP BY t
    ),
    cum AS (
      SELECT t, d, c, total,
             total - COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM by_time, g
    ),
    terms AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d > 0 THEN
               CAST(round(round(CAST(d AS DOUBLE) / n_risk, 6)
                          * 1000000, 0) AS BIGINT)
             ELSE 0 END AS hm,
             CASE WHEN d > 0 THEN
               CAST(round(round((CAST(d AS DOUBLE) / n_risk) / n_risk, 9)
                          * 1000000000, 0) AS BIGINT)
             ELSE 0 END AS vn
      FROM cum
    ),
    runs AS (
      SELECT t, d, c, n_risk,
             SUM(hm) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumh,
             SUM(vn) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CAST(cumh AS DOUBLE) / 1000000 AS cum_hazard,
           CAST(cumv AS DOUBLE) / 1000000000 AS var_hazard,
           round(exp(-(CAST(cumh AS DOUBLE) / 1000000)), 6) AS s_fh
    FROM runs
    """,
)
def pipeline_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard over the same time-to-reorder
    spells as pipeline_survival_km: H(t) = Sigma_{t_i<=t} d_i/n_i
    (Nelson 1972, Aalen 1978) with the simple variance estimate
    Sigma d_i/n_i^2, plus the Fleming-Harrington survival translation
    S_FH = exp(-H) (the estimator of choice when at-risk counts get
    small, where KM's product form loses precision). Completes the
    survival trio: KM estimates S directly, this estimates the
    HAZARD, pipeline_logrank compares arms.

    Determinism is the KM recipe verbatim: each per-time term is a
    ratio of exact integers rounded at 6 dp (hazard) / 9 dp
    (variance -- d/n^2 at fixture n would vanish at 6 dp), scaled to
    integer micros/nanos so both running sums are exact long
    addition; the only transcendental (exp) is rounded at emission.
    d = n_risk needs no sentinel here (the term is exactly 1.0, not
    a log singularity) -- the hazard just steps by 1.

    Scale: identical machinery and cost to pipeline_survival_km --
    bounded per-customer window, calendar-bounded distinct spell
    table, two bucket-offset running passes (the second carries BOTH
    cumulative columns in one pass), globals ride a broadcast row.
    Cites reference README.md:70 ("amenable to efficient querying")
    -- lifecycle/churn readouts are that end state."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    g = per_cust.agg(
        F.max("cmax").alias("gmax"), F.count(F.lit(1)).alias("total")
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "total",
    )
    by_time = (
        spells.groupBy("t", "total")
        .agg(F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c"))
        .withColumn("dc", F.col("d") + F.col("c"))
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc"])
    n_risk = F.col("total") - (F.col("run_dc") - F.col("dc"))
    dd = F.col("d").cast("double")
    hm = F.when(
        F.col("d") > 0,
        F.round(F.round(dd / F.col("n_risk"), 6) * 1_000_000, 0).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    vn = F.when(
        F.col("d") > 0,
        F.round(
            F.round((dd / F.col("n_risk")) / F.col("n_risk"), 9)
            * 1_000_000_000,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    terms = (
        out1.withColumn("n_risk", n_risk)
        .select("t", "d", "c", "n_risk", hm.alias("hm"), vn.alias("vn"))
        .localCheckpoint(eager=True)  # second offset collect + window
    )
    out2, _ = bucketed_running(terms, "t", ["hm", "vn"])
    cumh = F.col("run_hm").cast("double") / 1_000_000
    cumv = F.col("run_vn").cast("double") / 1_000_000_000
    return out2.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        cumh.alias("cum_hazard"),
        cumv.alias("var_hazard"),
        F.round(F.exp(-cumh), 6).alias("s_fh"),
    )


@query(
    "pipeline_logrank",
    oracle=f"""
    WITH {_SPELL_CTE},
    g AS (SELECT MAX(cmax) AS gmax,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS total1,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS total0
          FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev,
             arm, total1, total0
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, total1, total0,
             CAST(SUM(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
               AS d0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dc1,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS dc0
      FROM spells GROUP BY t, total1, total0
    ),
    cum AS (
      SELECT *,
        total1 - COALESCE(SUM(dc1) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        total0 - COALESCE(SUM(dc0) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
      FROM by_time
    ),
    terms AS (
      SELECT d1, d0,
        CASE WHEN d1 + d0 > 0 THEN
          CAST(round(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0), 6)
               AS DECIMAL(18,6))
        ELSE CAST(0 AS DECIMAL(18,6)) END AS e1t,
        CASE WHEN d1 + d0 > 0 AND n1 + n0 > 1 THEN
          CAST(round(
            ((CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0))
             * (CAST(n0 AS DOUBLE) / (n1 + n0)))
            * ((CAST(n1 + n0 AS DOUBLE) - (d1 + d0)) / (n1 + n0 - 1)),
            6) AS DECIMAL(18,6))
        ELSE CAST(0 AS DECIMAL(18,6)) END AS vt
      FROM cum
    ),
    s AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(d0) AS BIGINT) AS o0,
             SUM(e1t) AS e1s, SUM(vt) AS vs
      FROM terms
    ),
    z AS (
      SELECT total1 AS n_arm1, total0 AS n_arm0, o1, o0,
             CAST(e1s AS DOUBLE) AS e1_expected,
             CAST(vs AS DOUBLE) AS variance,
             CASE WHEN CAST(vs AS DOUBLE) > 0 THEN
               (CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
               / sqrt(CAST(vs AS DOUBLE))
             END AS z_score
      FROM s, g
    )
    SELECT n_arm1, n_arm0, o1, o0, e1_expected, variance, z_score,
           z_score * z_score AS chi_square,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM z
    """,
)
def pipeline_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK test (Mantel 1966) comparing time-to-reorder between
    the parity experiment arms (o_custkey % 2) -- the censoring-aware
    arm comparison pipeline_ab_test cannot do (a t-test on observed
    gaps silently drops every one-order customer; KM curves per arm
    show the difference but don't test it). At each distinct event
    time: O1 accumulates arm-1 events, E1 the hypergeometric
    expectation d*n1/n, V the hypergeometric variance
    d*(n1/n)*(n0/n)*(n-d)/(n-1); z = (O1-E1)/sqrt(V).

    Determinism: O1 is an exact long. Each E1/V term is a ratio of
    exact integers evaluated in ONE fixed-shape IEEE tree (written
    identically here and in the oracle), rounded at 6 dp and summed
    in decimal -- the house rational-term recipe -- so both sums are
    order-free exact; z/chi2 are a shared tree over their double
    casts (unscaled sums < 2^53 at any plausible corpus: E1 is
    bounded by the event count). The logistic-CDF p is rounded at
    its transcendental (bh_fdr precedent), decision reads the
    rounded value. Times with n = 1 contribute no variance (the
    standard convention); zero total variance emits NULL z/p, never
    a division crash.

    Scale: the same bounded machinery as pipeline_survival_km --
    per-customer window, calendar-bounded distinct-time table, ONE
    bucket-offset running pass carrying both arms' at-risk
    cumulatives, per-arm totals riding the broadcast globals row.
    Nothing scales past the distinct-spell-length table."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    g = per_cust.agg(
        F.max("cmax").alias("gmax"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("total1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("total0"),
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "arm",
        "total1",
        "total0",
    )
    by_time = (
        spells.groupBy("t", "total1", "total0")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("ev")).otherwise(0))
            .cast("long")
            .alias("d1"),
            F.sum(F.when(F.col("arm") == 0, F.col("ev")).otherwise(0))
            .cast("long")
            .alias("d0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("dc1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("dc0"),
        )
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc1", "dc0"])
    n1 = F.col("total1") - (F.col("run_dc1") - F.col("dc1"))
    n0 = F.col("total0") - (F.col("run_dc0") - F.col("dc0"))
    cum = out1.select("d1", "d0", n1.alias("n1"), n0.alias("n0"))
    d = F.col("d1") + F.col("d0")
    n = F.col("n1") + F.col("n0")
    dd = d.cast("double")
    zero6 = F.lit(0).cast("decimal(18,6)")
    e1t = F.when(
        d > 0, F.round(dd * F.col("n1") / n, 6).cast("decimal(18,6)")
    ).otherwise(zero6)
    vt = F.when(
        (d > 0) & (n > 1),
        F.round(
            ((dd * F.col("n1") / n) * (F.col("n0").cast("double") / n))
            * ((n.cast("double") - d) / (n - 1)),
            6,
        ).cast("decimal(18,6)"),
    ).otherwise(zero6)
    s = cum.select(
        "d1", "d0", e1t.alias("e1t"), vt.alias("vt")
    ).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d0").cast("long").alias("o0"),
        F.sum("e1t").alias("e1s"),
        F.sum("vt").alias("vs"),
    )
    zrow = s.crossJoin(F.broadcast(g))
    e1d = F.col("e1s").cast("double")
    vd = F.col("vs").cast("double")
    z = F.when(vd > 0, (F.col("o1").cast("double") - e1d) / F.sqrt(vd))
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return zrow.select(
        F.col("total1").alias("n_arm1"),
        F.col("total0").alias("n_arm0"),
        "o1",
        "o0",
        e1d.alias("e1_expected"),
        vd.alias("variance"),
        z.alias("z_score"),
        (z * z).alias("chi_square"),
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_wilcoxon_signed_rank",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s95,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s96
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey
    ),
    d AS (
      SELECT s96 - s95 AS diff FROM per
      WHERE s95 IS NOT NULL AND s96 IS NOT NULL AND s96 <> s95
    ),
    by_val AS (
      SELECT CAST(abs(diff) * 100 AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_pos,
             COUNT(*) AS c
      FROM d GROUP BY 1
    ),
    cum AS (SELECT *, SUM(c) OVER (ORDER BY cents) AS run_c FROM by_val),
    agg AS (
      SELECT CAST(SUM(c_pos * (2 * (run_c - c) + c + 1)) AS BIGINT)
               AS two_w,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term,
             CAST(SUM(c) AS BIGINT) AS n
      FROM cum
    ),
    z AS (
      SELECT n, two_w, tie_term,
             CAST(two_w AS DOUBLE) / 2 AS w_pos,
             CASE WHEN n > 0
                   AND 2 * n * (n + 1) * (2 * n + 1) - tie_term > 0 THEN
               CAST(2 * two_w - n * (n + 1) AS DOUBLE)
               / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie_term
                           AS DOUBLE) / 3.0)
             END AS z_score
      FROM agg
    )
    SELECT n, two_w AS two_w_pos, w_pos, tie_term, z_score,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM z
    """,
)
def pipeline_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILCOXON SIGNED-RANK test (Wilcoxon 1945) on PAIRED
    per-customer spend: 1995 total vs 1996 total for customers active
    in both years -- the within-subject before/after readout the
    two-sample keys can't express (mann_whitney compares two
    independent arms; this pairs each customer with themselves, so
    between-customer variance cancels). Zero diffs drop (the standard
    exclusion treatment); W+ sums the |diff| midranks of positive
    diffs.

    Exactness: spend totals are exact DECIMAL(18,2) sums, so diff and
    |diff| are exact and rank order is exact integer CENTS (the 2-dp
    scale makes x100 integral -- no float keys). The mann_whitney
    DOUBLED-midrank identity keeps 2W+ = Sigma c_pos(2 cum_before +
    c + 1) an exact long over the distinct-|diff| cumulative; the
    tie-corrected normal approximation reduces (x4 both sides) to
    z = (2*2W+ - n(n+1)) / sqrt((2n(n+1)(2n+1) - tie)/3) -- one
    shared IEEE tree over exact-int casts, emitted unrounded. The
    logistic-CDF p rounds at its transcendental. Degenerate inputs
    (no pairs, zero variance) emit NULL, never a crash. The inner
    int 2n(n+1)(2n+1) stays exact-in-double below n ~ 1e5 pairs;
    past that, emit z at 9 dp (the big-decimal-ratio rule, noted).

    Scale: one groupBy(customer) pass (partial-agg friendly), then
    everything is bounded by distinct |diff| values (2-dp cents --
    pre-quantized by construction); the cumulative is the
    bucket-offset pattern, no global window."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    per = (
        o.where(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1995, dec)).alias("s95"),
            F.sum(F.when(yr == 1996, dec)).alias("s96"),
        )
    )
    d = per.where(
        F.col("s95").isNotNull()
        & F.col("s96").isNotNull()
        & (F.col("s96") != F.col("s95"))
    ).select((F.col("s96") - F.col("s95")).alias("diff"))
    by_val = (
        d.groupBy((F.abs("diff") * 100).cast("long").alias("cents"))
        .agg(
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
            .cast("long")
            .alias("c_pos"),
            F.count(F.lit(1)).alias("c"),
        )
        .localCheckpoint(eager=True)  # distinct-|diff|-bounded
    )
    out, _ = bucketed_running(by_val, "cents", ["c"])
    cum_before = F.col("run_c") - F.col("c")
    agg = out.agg(
        F.sum(F.col("c_pos") * (2 * cum_before + F.col("c") + 1))
        .cast("long")
        .alias("two_w"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term"),
        F.sum("c").cast("long").alias("n"),
    )
    n = F.col("n")
    inner = 2 * n * (n + 1) * (2 * n + 1) - F.col("tie_term")
    z = F.when(
        (n > 0) & (inner > 0),
        (2 * F.col("two_w") - n * (n + 1)).cast("double")
        / F.sqrt(inner.cast("double") / 3.0),
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return agg.select(
        "n",
        F.col("two_w").alias("two_w_pos"),
        (F.col("two_w").cast("double") / 2).alias("w_pos"),
        "tie_term",
        z.alias("z_score"),
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


_WEEKDAY_BLOCK_CTE = """daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    filled AS (
      SELECT s.day, COALESCE(a.rev, CAST(0 AS DECIMAL(38,2))) AS rev
      FROM spine s LEFT JOIN daily a ON a.day = s.day
    ),
    cells AS (
      SELECT CAST(FLOOR(date_diff('day', DATE '1970-01-05', day) / 7)
                  AS BIGINT) AS blk,
             (EXTRACT(isodow FROM day) - 1) AS wd, rev
      FROM filled
    ),
    complete AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY blk) AS n_in_blk FROM cells
      ) WHERE n_in_blk = 7
    ),
    rk AS (
      SELECT blk, wd,
             2 * RANK() OVER (PARTITION BY blk ORDER BY rev)
               + COUNT(*) OVER (PARTITION BY blk, rev) - 1 AS two_r
      FROM complete
    )"""


def _weekday_block_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubled within-week weekday midranks of daily revenue over
    complete Monday-aligned weeks, zero-filled from a date spine —
    the shared block machinery behind pipeline_friedman and
    pipeline_page_trend (SQL twin: _WEEKDAY_BLOCK_CTE). Returns
    (blk, wd, two_r); ranks are exact ints from two bounded
    7-row-partition windows (r12 review consolidation)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .localCheckpoint(eager=True)  # feeds span AND the fill join
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        )
    )
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("rev"), F.lit(0).cast("decimal(28,2)")).alias("rev"),
    )
    monday0 = F.to_date(F.lit("1970-01-05"))
    cells = filled.select(
        F.floor(F.datediff("day", monday0) / 7).alias("blk"),
        F.weekday("day").alias("wd"),
        "rev",
    )
    wblk = Window.partitionBy("blk")
    complete = cells.withColumn(
        "n_in_blk", F.count(F.lit(1)).over(wblk)
    ).where(F.col("n_in_blk") == 7)
    wrank = Window.partitionBy("blk").orderBy("rev")
    wpeer = Window.partitionBy("blk", "rev")
    return complete.select(
        "blk",
        "wd",
        (
            2 * F.rank().over(wrank) + F.count(F.lit(1)).over(wpeer) - 1
        ).alias("two_r"),
    )


_FR_TW = ", ".join(
    f"CAST(SUM(CASE WHEN wd = {k} THEN two_r ELSE 0 END) AS BIGINT)"
    f" AS tw{k}"
    for k in range(7)
)
_FR_SR2 = " + ".join(f"tw{k} * tw{k}" for k in range(7))


@query(
    "pipeline_friedman",
    oracle=f"""
    WITH {_WEEKDAY_BLOCK_CTE},
    agg AS (
      SELECT {_FR_TW},
             CAST(SUM(two_r * two_r) AS BIGINT) AS den_all,
             CAST(COUNT(*) / 7 AS BIGINT) AS b
      FROM rk
    ),
    chi AS (
      SELECT b AS n_weeks, {", ".join(f"tw{k}" for k in range(7))},
             CASE WHEN den_all - 448 * b > 0 THEN
               CAST(6 * (({_FR_SR2}) - 448 * b * b) AS DOUBLE)
               / (den_all - 448 * b)
             END AS chi_square
      FROM agg
    )
    SELECT n_weeks, {", ".join(f"tw{k}" for k in range(7))}, chi_square,
           round(exp(-(chi_square / 2))
                 * (1 + (chi_square / 2)
                      + ((chi_square / 2) * (chi_square / 2)) / 2), 6)
             AS p_approx,
           round(exp(-(chi_square / 2))
                 * (1 + (chi_square / 2)
                      + ((chi_square / 2) * (chi_square / 2)) / 2), 6)
             < 0.05 AS significant
    FROM chi
    """,
)
def pipeline_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN test (Friedman 1937) for a weekday effect on daily
    revenue, treating each complete Monday-aligned WEEK as a block --
    the within-block rank design that removes week-to-week level
    shifts (seasonality, growth) which pollute pipeline_kruskal_wallis'
    pooled ranks: each week ranks its own 7 days, so only the
    weekday PATTERN accumulates. Tie-adjusted form
    chi2 = (k-1)(Sigma R_j^2 - b^2 k(k+1)^2/4)/(Sigma r_ij^2 -
    bk(k+1)^2/4), dof k-1 = 6.

    Exactness: daily revenue is an exact decimal sum; within-block
    DOUBLED midranks 2r = 2*RANK + peers - 1 are exact ints from two
    BOUNDED windows (7 rows per block -- lint-clean); with ranks
    doubled, BOTH the numerator and denominator quarter-factors
    cancel, so chi2 is a ratio of exact LONGS (k(k+1)^2 = 448) --
    one double division, emitted unrounded, NO wide-pivot IEEE
    ordering to manage at all (integer addition is order-free). The
    chi2_6 survival (even dof: exp(-h)(1+h+h^2/2)) rounds at the
    transcendental, decision reads the rounded value (the kruskal
    rule). All-tied weeks (den = 448b) emit NULL, never a crash.
    Monday alignment dodges the epoch-is-a-Thursday trap (r5 ledger)
    via the 1970-01-05 Monday anchor; incomplete edge weeks drop.
    Days with no orders are ZERO-FILLED from a date spine (the
    date_spine idiom) -- a quiet calendar day is real zero revenue,
    not a missing cell, and without the fill sparse small-SF corpora
    have no complete weeks at all (measured at sf0.001).

    Scale: one groupBy(day) pass (partial-agg friendly), then
    everything is calendar-bounded (days); the 7 rank sums ride one
    global aggregate row."""
    rk = _weekday_block_ranks(spark, sf_dir)
    agg = rk.agg(
        *[
            F.sum(F.when(F.col("wd") == k, F.col("two_r")).otherwise(0))
            .cast("long")
            .alias(f"tw{k}")
            for k in range(7)
        ],
        F.sum(F.col("two_r") * F.col("two_r")).cast("long").alias("den_all"),
        (F.count(F.lit(1)) / 7).cast("long").alias("b"),
    )
    sr2 = None
    for k in range(7):
        t = F.col(f"tw{k}") * F.col(f"tw{k}")
        sr2 = t if sr2 is None else sr2 + t
    b = F.col("b")
    chi2 = F.when(
        F.col("den_all") - 448 * b > 0,
        (6 * (sr2 - 448 * b * b)).cast("double")
        / (F.col("den_all") - 448 * b),
    )
    chi = agg.select(
        b.alias("n_weeks"),
        *[F.col(f"tw{k}") for k in range(7)],
        chi2.alias("chi_square"),
    )
    half = F.col("chi_square") / 2
    p = F.round(F.exp(-half) * (1 + half + (half * half) / 2), 6)
    return chi.select(
        "n_weeks",
        *[F.col(f"tw{k}") for k in range(7)],
        "chi_square",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_holm",
    oracle="""
    WITH base AS (
      SELECT n.n_name AS nation, c.c_nationkey AS nk,
             COUNT(*) AS n_orders,
             CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
             CAST(SUM(n_urgent) AS BIGINT) AS kk,
             COUNT(*) AS m
      FROM base
    ),
    pv AS (
      SELECT nation, nk, n_orders, n_urgent, m,
             (CAST(n_urgent AS DOUBLE) / n_orders
              - CAST(kk AS DOUBLE) / nn)
             / sqrt((CAST(kk AS DOUBLE) / nn)
                    * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders) AS z,
             round(2.0 / (1.0 + exp(1.702 * abs(
               (CAST(n_urgent AS DOUBLE) / n_orders
                - CAST(kk AS DOUBLE) / nn)
               / sqrt((CAST(kk AS DOUBLE) / nn)
                      * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders)))), 6)
               AS p_value
      FROM base, tot
    ),
    rk AS (
      SELECT a.nation, a.n_orders, a.n_urgent, a.m, a.z, a.p_value,
             CAST(COUNT(*) AS BIGINT) AS hrank
      FROM pv a JOIN pv b
        ON (b.p_value < a.p_value)
           OR (b.p_value = a.p_value AND b.nk <= a.nk)
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    fstar AS (
      SELECT CAST(COALESCE(MIN(CASE WHEN p_value > 0.05 / (m - hrank + 1)
                                    THEN hrank END), MAX(m) + 1) AS BIGINT)
               AS ff
      FROM rk
    )
    SELECT nation, n_orders, n_urgent, z, p_value, hrank,
           0.05 / (m - hrank + 1) AS holm_alpha,
           hrank < ff AS rejected,
           p_value <= 0.05 / m AS bonf_rejected
    FROM rk, fstar
    """,
)
def pipeline_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension -- HOLM step-DOWN multiple-testing control (Holm
    1979) over the same 25-nation urgent-share z-test family as
    pipeline_bh_fdr, completing the correction pair: BH steps UP
    controlling FDR (find the LARGEST passing rank, reject below),
    Holm steps DOWN controlling FWER (walk the sorted p-values from
    the smallest, reject while p_(i) <= alpha/(m-i+1), STOP at the
    first failure -- later ranks stay accepted even if they
    individually pass). Plain Bonferroni rides as a third column;
    by construction bonferroni rejects subset holm rejects subset
    bh (pinned in tests).

    Determinism is the bh_fdr recipe verbatim: exact-IEEE z on
    integer counts, logistic-Phi p rounded 6 dp with EVERY decision
    reading the rounded value, tie-broken (p, nationkey) ranks from
    the 25x25 broadcast pair count. The step-down stopping point is
    MIN(rank where p > alpha/(m-rank+1)) -- a broadcast 1-row
    aggregate (the kstar shape), so 'reject' is rank < first_fail
    with no running window at all.

    Shape: identical cost to bh_fdr -- one corpus pass to the
    nation-bounded 25-row family, everything after is broadcast
    control-plane. Cites operators: pipeline_bh_fdr
    (plans/analytics.py) for the shared family design."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_nationkey").alias("nk")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(urgent).cast("long").alias("n_urgent"),
        )
        .localCheckpoint(eager=True)  # 25 rows; 3 consumers below
    )
    tot = base.agg(
        F.sum("n_orders").cast("long").alias("nn"),
        F.sum("n_urgent").cast("long").alias("kk"),
        F.count(F.lit(1)).alias("m"),
    )
    pg = F.col("kk").cast("double") / F.col("nn")
    z = (F.col("n_urgent").cast("double") / F.col("n_orders") - pg) / F.sqrt(
        pg * (F.lit(1.0) - pg) / F.col("n_orders")
    )
    pv = base.crossJoin(F.broadcast(tot)).select(
        "nation",
        "nk",
        "n_orders",
        "n_urgent",
        "m",
        z.alias("z"),
        F.round(
            2.0 / (1.0 + F.exp(F.lit(1.702) * F.abs(z))), 6
        ).alias("p_value"),
    )
    pvb = pv.select(F.col("nk").alias("nk_b"), F.col("p_value").alias("p_b"))
    rk = (
        pv.join(
            F.broadcast(pvb),
            (F.col("p_b") < F.col("p_value"))
            | (
                (F.col("p_b") == F.col("p_value"))
                & (F.col("nk_b") <= F.col("nk"))
            ),
        )
        .groupBy("nation", "n_orders", "n_urgent", "m", "z", "p_value")
        .agg(F.count(F.lit(1)).alias("hrank"))
    )
    thr = F.lit(0.05) / (F.col("m") - F.col("hrank") + 1)
    fstar = rk.agg(
        F.coalesce(
            F.min(F.when(F.col("p_value") > thr, F.col("hrank"))),
            F.max("m") + 1,
        )
        .cast("long")
        .alias("ff")
    )
    return rk.crossJoin(F.broadcast(fstar)).select(
        "nation",
        "n_orders",
        "n_urgent",
        "z",
        "p_value",
        "hrank",
        thr.alias("holm_alpha"),
        (F.col("hrank") < F.col("ff")).alias("rejected"),
        (F.col("p_value") <= F.lit(0.05) / F.col("m")).alias("bonf_rejected"),
    )


@query(
    "pipeline_page_trend",
    oracle=f"""
    WITH {_WEEKDAY_BLOCK_CTE},
    agg AS (
      SELECT CAST(SUM((wd + 1) * two_r) AS BIGINT) AS two_l,
             CAST(COUNT(*) / 7 AS BIGINT) AS b
      FROM rk
    ),
    zz AS (
      SELECT b AS n_weeks, two_l,
             CAST(two_l AS DOUBLE) / 2 AS l_stat,
             CASE WHEN b > 0 THEN
               CAST(6 * two_l - 1344 * b AS DOUBLE) / sqrt(18816.0 * b)
             END AS z_score
      FROM agg
    )
    SELECT n_weeks, two_l, l_stat, z_score,
           round(1.0 / (1 + exp(1.702 * z_score)), 6) AS p_one_sided,
           round(1.0 / (1 + exp(1.702 * z_score)), 6) < 0.05 AS significant
    FROM zz
    """,
)
def pipeline_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE'S L trend test (Page 1963) on the same within-week
    weekday ranks as pipeline_friedman -- the ORDERED-alternative
    version: Friedman asks "do weekdays differ at all?", Page asks
    "does revenue INCREASE through the week (Mon < Tue < ... < Sun)?"
    and buys the usual power win when the ordering is the real
    hypothesis. L = Sigma_j c_j R_j with c_j = 1..7 in weekday order.

    Exactness: identical block machinery to pipeline_friedman
    (spine-zero-filled days, Monday-anchored complete weeks, exact
    doubled midranks from two bounded windows). With doubled ranks
    2L = Sigma (wd+1) 2r is an exact long, and scaling the normal
    approximation by 12 clears every fraction: z = (12L - 3bk(k+1)^2)
    / sqrt(b k^2 (k+1)^2 (k-1)) = (6*2L - 1344b)/sqrt(18816b) -- one
    shared IEEE tree over exact longs, emitted unrounded. The
    one-sided p (positive z = ascending trend) uses the logistic-Phi
    recipe rounded at the transcendental; the variance is the
    standard no-ties form (midrank ties make it conservative --
    documented, the textbook treatment). b = 0 emits NULL.

    Scale: one groupBy(day) pass, then calendar-bounded; the L sum
    rides one global aggregate row."""
    rk = _weekday_block_ranks(spark, sf_dir)
    agg = rk.agg(
        F.sum((F.col("wd") + 1) * F.col("two_r")).cast("long").alias("two_l"),
        (F.count(F.lit(1)) / 7).cast("long").alias("b"),
    )
    b = F.col("b")
    z = F.when(
        b > 0,
        (6 * F.col("two_l") - 1344 * b).cast("double")
        / F.sqrt(F.lit(18816.0) * b),
    )
    p = F.round(1.0 / (1 + F.exp(1.702 * z)), 6)
    return agg.select(
        b.alias("n_weeks"),
        "two_l",
        (F.col("two_l").cast("double") / 2).alias("l_stat"),
        z.alias("z_score"),
        p.alias("p_one_sided"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_dickey_fuller",
    oracle="""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rdec
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT mi, CAST(FLOOR(CAST(rdec AS DOUBLE) / 1000) AS BIGINT) AS z
      FROM monthly
    ),
    pairs AS (
      SELECT a.z AS zl, b.z - a.z AS dy
      FROM base a JOIN base b ON b.mi = a.mi + 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(zl) AS BIGINT) AS sz,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(zl * zl) AS BIGINT) AS szz,
             CAST(SUM(zl * dy) AS BIGINT) AS szy,
             CAST(SUM(dy * dy) AS BIGINT) AS syy
      FROM pairs
    ),
    abc AS (
      SELECT n,
             n * szz - sz * sz AS a,
             n * szy - sz * sy AS b,
             n * syy - sy * sy AS c
      FROM s
    ),
    t AS (
      SELECT n,
             CASE WHEN a > 0 THEN CAST(b AS DOUBLE) / a END AS rho,
             CASE WHEN a > 0
                   AND CAST(a AS DOUBLE) * CAST(c AS DOUBLE)
                       - CAST(b AS DOUBLE) * CAST(b AS DOUBLE) > 0 THEN
               CAST(b AS DOUBLE) * sqrt(CAST(n - 2 AS DOUBLE))
               / sqrt(CAST(a AS DOUBLE) * CAST(c AS DOUBLE)
                      - CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
             END AS t_stat
      FROM abc
    )
    SELECT n AS n_diffs, rho, t_stat,
           t_stat < -2.89 AS stationary
    FROM t
    """,
)
def pipeline_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICKEY-FULLER unit-root test (Dickey & Fuller 1979, the
    constant-only non-augmented form) on the monthly revenue series:
    regress delta_x_t on x_{t-1}; rho near 0 (t above the critical
    value) means the series behaves like a random walk and every
    trend readout on LEVELS (pipeline_revenue_trend_forecast,
    pipeline_theil_sen) is spurious-regression-prone -- the
    stationarity gate a forecasting stack runs first. Decision at
    the 5% constant-case critical value -2.89 (n ~ 80 months).

    Exactness: the series is quantized to integer REVENUE THOUSANDS
    (floor of an exact-cast double -- monthly totals stay exact in
    double far past sf 10, and floor has no midpoint hazard), so all
    six sufficient sums and the centered A/B/C are exact longs
    (< 2^53 through sf ~0.3; at larger corpora re-quantize to
    millions -- the documented rescale knob, same plan). A*C and B^2
    then exceed int range, so t = B*sqrt(n-2)/sqrt(A*C - B^2) is ONE
    shared IEEE tree over exact-long casts (the A^2 cancellation
    removes the standalone se), emitted unrounded; rho = B/A is a
    shared exact-long division. Degenerate variance (A = 0 or
    AC <= B^2) emits NULL, never a crash.

    Scale: one groupBy(month) pass, then the months-bounded lag-1
    self-join (~80 rows, broadcast); sufficient statistics all the
    way down."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("mi")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rdec"))
    base = monthly.select(
        "mi",
        F.floor(F.col("rdec").cast("double") / 1000).cast("long").alias("z"),
    ).localCheckpoint(eager=True)  # months-bounded; both join sides
    a_side = base.select(F.col("mi").alias("am"), F.col("z").alias("zl"))
    b_side = base.select(F.col("mi").alias("bm"), F.col("z").alias("zb"))
    pairs = a_side.join(
        F.broadcast(b_side), F.col("bm") == F.col("am") + 1
    ).select("zl", (F.col("zb") - F.col("zl")).alias("dy"))
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zl").cast("long").alias("sz"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("zl") * F.col("zl")).cast("long").alias("szz"),
        F.sum(F.col("zl") * F.col("dy")).cast("long").alias("szy"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    abc = s.select(
        "n",
        (F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")).alias("a"),
        (F.col("n") * F.col("szy") - F.col("sz") * F.col("sy")).alias("b"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("c"),
    )
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    disc = ad * cd - bd * bd
    rho = F.when(F.col("a") > 0, bd / F.col("a"))
    t = F.when(
        (F.col("a") > 0) & (disc > 0),
        bd * F.sqrt((F.col("n") - 2).cast("double")) / F.sqrt(disc),
    )
    return abc.select(
        F.col("n").alias("n_diffs"),
        rho.alias("rho"),
        t.alias("t_stat"),
        (t < -2.89).alias("stationary"),
    )


_RDD_SIDE_SQL = """
      CAST(SUM(CASE WHEN {side} THEN 1 ELSE 0 END) AS BIGINT) AS n_{tag},
      CAST(SUM(CASE WHEN {side} THEN x ELSE 0 END) AS BIGINT) AS sx_{tag},
      CAST(SUM(CASE WHEN {side} THEN x * x ELSE 0 END) AS BIGINT)
        AS sxx_{tag},
      CAST(SUM(CASE WHEN {side} THEN y END) AS DECIMAL(18,2)) AS sy_{tag},
      CAST(SUM(CASE WHEN {side} THEN x * y END) AS DECIMAL(18,2))
        AS sxy_{tag}"""


@query(
    "pipeline_rdd",
    oracle=f"""
    WITH band AS (
      SELECT CAST(l_quantity AS BIGINT) - 25 AS x,
             CAST(l_discount AS DECIMAL(18,2)) AS y
      FROM lineitem
      WHERE l_quantity >= 15 AND l_quantity < 35
    ),
    s AS (
      SELECT
      {_RDD_SIDE_SQL.format(side="x < 0", tag="l")},
      {_RDD_SIDE_SQL.format(side="x >= 0", tag="r")}
      FROM band
    ),
    fit AS (
      SELECT n_l, n_r,
        n_l * sxx_l - sx_l * sx_l AS den_l,
        n_r * sxx_r - sx_r * sx_r AS den_r,
        sy_l * sxx_l - sx_l * sxy_l AS anum_l,
        sy_r * sxx_r - sx_r * sxy_r AS anum_r,
        n_l * sxy_l - sx_l * sy_l AS bnum_l,
        n_r * sxy_r - sx_r * sy_r AS bnum_r
      FROM s
    ),
    est AS (
      SELECT n_l, n_r,
        CASE WHEN den_l > 0
             THEN round(CAST(anum_l AS DOUBLE) / den_l, 9) END AS alpha_l,
        CASE WHEN den_r > 0
             THEN round(CAST(anum_r AS DOUBLE) / den_r, 9) END AS alpha_r,
        CASE WHEN den_l > 0
             THEN round(CAST(bnum_l AS DOUBLE) / den_l, 9) END AS slope_l,
        CASE WHEN den_r > 0
             THEN round(CAST(bnum_r AS DOUBLE) / den_r, 9) END AS slope_r
      FROM fit
    )
    SELECT n_l AS n_left, n_r AS n_right,
           alpha_l AS alpha_left, alpha_r AS alpha_right,
           slope_l AS slope_left, slope_r AS slope_right,
           alpha_r - alpha_l AS tau_rdd
    FROM est
    """,
)
def pipeline_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGRESSION DISCONTINUITY estimate (sharp RDD, local-linear
    with a rectangular kernel) of the discount jump at the
    quantity-25 cutoff: fit y on (quantity - 25) separately inside
    the bandwidth on each side, tau = the difference of the two
    intercepts AT the cutoff -- the observational-causal design for
    threshold rules (bulk-discount policies, score cutoffs, quota
    effects) beside pipeline_did (time discontinuity) and
    pipeline_cem_matching (covariate matching). The fixture has no
    real policy at 25, so tau is a null-effect readout; the planted
    test carries the recovery semantics.

    Exactness: x is an exact integer offset, y an exact
    DECIMAL(18,2); all ten side-pivoted sufficient sums are exact
    (longs / decimals) in ONE corpus pass (the anova wide-pivot
    rule), and each intercept/slope is a ratio of an exact decimal
    numerator over an exact long denominator -- numerators pass 2^53
    unscaled past sf ~3, so each ratio is emitted at 9 dp (the
    grouped_ols/acf discipline) and tau subtracts the two ROUNDED
    intercepts (exact on agreed doubles). Degenerate sides
    (den <= 0) emit NULL.

    Scale: predicate-pushed band scan, one aggregate, zero shuffles
    beyond the partial-agg combine; sufficient statistics all the
    way down. Bandwidth/cutoff are compile-time constants here; a
    production variant parameterizes them (same plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    band = li.where(
        (F.col("l_quantity") >= 15) & (F.col("l_quantity") < 35)
    ).select(
        (F.col("l_quantity").cast("long") - 25).alias("x"),
        F.col("l_discount").cast("decimal(18,2)").alias("y"),
    )
    sides = {"l": F.col("x") < 0, "r": F.col("x") >= 0}
    aggs = []
    for tag, cond in sides.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"sx_{tag}"),
            F.sum(F.when(cond, F.col("x") * F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"sxx_{tag}"),
            F.sum(F.when(cond, F.col("y")))
            .cast("decimal(18,2)")
            .alias(f"sy_{tag}"),
            F.sum(F.when(cond, F.col("x") * F.col("y")))
            .cast("decimal(18,2)")
            .alias(f"sxy_{tag}"),
        ]
    s = band.agg(*aggs)
    cols = {"n_left": F.col("n_l"), "n_right": F.col("n_r")}
    ests = {}
    for tag in ("l", "r"):
        den = F.col(f"n_{tag}") * F.col(f"sxx_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sx_{tag}")
        anum = F.col(f"sy_{tag}") * F.col(f"sxx_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sxy_{tag}")
        bnum = F.col(f"n_{tag}") * F.col(f"sxy_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sy_{tag}")
        ests[f"alpha_{tag}"] = F.when(
            den > 0, F.round(anum.cast("double") / den, 9)
        )
        ests[f"slope_{tag}"] = F.when(
            den > 0, F.round(bnum.cast("double") / den, 9)
        )
    return s.select(
        cols["n_left"].alias("n_left"),
        cols["n_right"].alias("n_right"),
        ests["alpha_l"].alias("alpha_left"),
        ests["alpha_r"].alias("alpha_right"),
        ests["slope_l"].alias("slope_left"),
        ests["slope_r"].alias("slope_right"),
        (ests["alpha_r"] - ests["alpha_l"]).alias("tau_rdd"),
    )


_DAILY_XY_CTE = """daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    t0 AS (SELECT MIN(day) AS d0 FROM daily),
    idx AS (
      SELECT date_diff('day', d0, day) AS t, x, y FROM daily, t0
    )"""


def _daily_xy_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click/purchase counts with a gap-aware integer day index
    (t = days since min) — the shared series behind pipeline_granger
    and pipeline_cointegration (SQL twin: _DAILY_XY_CTE). Checkpointed:
    in both consumers multiple legs read it and this build never
    reuses exchange subtrees."""
    e = load_table(spark, sf_dir, "events")
    daily = e.where(F.col("ts").isNotNull()).groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    t0 = daily.agg(F.min("day").alias("d0"))
    return daily.crossJoin(F.broadcast(t0)).select(
        F.datediff("day", "d0").alias("t"), "x", "y"
    ).localCheckpoint(eager=True)


_GRANGER_F_SQL = """
      CASE WHEN n >= 4 AND a_uu > 0
            AND CAST(a_uu AS DOUBLE) * a_vv
                - CAST(a_uv AS DOUBLE) * a_uv > 0
            AND CAST(a_ww AS DOUBLE)
                - ((CAST(a_uw AS DOUBLE) * a_uw * a_vv
                    + CAST(a_vw AS DOUBLE) * a_vw * a_uu)
                   - 2.0 * (CAST(a_uw AS DOUBLE) * a_vw * a_uv))
                  / (CAST(a_uu AS DOUBLE) * a_vv
                     - CAST(a_uv AS DOUBLE) * a_uv) > 0 THEN
        ((CAST(a_ww AS DOUBLE) - CAST(a_uw AS DOUBLE) * a_uw / a_uu)
         - (CAST(a_ww AS DOUBLE)
            - ((CAST(a_uw AS DOUBLE) * a_uw * a_vv
                + CAST(a_vw AS DOUBLE) * a_vw * a_uu)
               - 2.0 * (CAST(a_uw AS DOUBLE) * a_vw * a_uv))
              / (CAST(a_uu AS DOUBLE) * a_vv
                 - CAST(a_uv AS DOUBLE) * a_uv)))
        * (n - 3)
        / (CAST(a_ww AS DOUBLE)
           - ((CAST(a_uw AS DOUBLE) * a_uw * a_vv
               + CAST(a_vw AS DOUBLE) * a_vw * a_uu)
              - 2.0 * (CAST(a_uw AS DOUBLE) * a_vw * a_uv))
             / (CAST(a_uu AS DOUBLE) * a_vv
                - CAST(a_uv AS DOUBLE) * a_uv))
      END"""


@query(
    "pipeline_granger",
    oracle=f"""
    WITH {_DAILY_XY_CTE},
    pairs AS (
      SELECT b.y AS w, b.x AS w2, a.y AS u, a.x AS v
      FROM idx a JOIN idx b ON b.t = a.t + 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(w) AS BIGINT) AS sw, CAST(SUM(w2) AS BIGINT) AS sw2,
             CAST(SUM(u * u) AS BIGINT) AS suu,
             CAST(SUM(v * v) AS BIGINT) AS svv,
             CAST(SUM(u * v) AS BIGINT) AS suv,
             CAST(SUM(u * w) AS BIGINT) AS suw,
             CAST(SUM(v * w) AS BIGINT) AS svw,
             CAST(SUM(w * w) AS BIGINT) AS sww,
             CAST(SUM(u * w2) AS BIGINT) AS suw2,
             CAST(SUM(v * w2) AS BIGINT) AS svw2,
             CAST(SUM(w2 * w2) AS BIGINT) AS sw2w2
      FROM pairs
    ),
    fwd AS (
      SELECT n,
             n * suu - su * su AS a_uu, n * svv - sv * sv AS a_vv,
             n * suv - su * sv AS a_uv, n * suw - su * sw AS a_uw,
             n * svw - sv * sw AS a_vw, n * sww - sw * sw AS a_ww
      FROM s
    ),
    rev AS (
      SELECT n,
             n * svv - sv * sv AS a_uu, n * suu - su * su AS a_vv,
             n * suv - su * sv AS a_uv, n * svw2 - sv * sw2 AS a_uw,
             n * suw2 - su * sw2 AS a_vw, n * sw2w2 - sw2 * sw2 AS a_ww
      FROM s
    ),
    f1 AS (SELECT n, {_GRANGER_F_SQL} AS f_xy FROM fwd),
    f2 AS (SELECT {_GRANGER_F_SQL} AS f_yx FROM rev)
    SELECT n AS n_pairs, f_xy, f_yx,
           f_xy > 4.0 AS x_causes_y,
           f_yx > 4.0 AS y_causes_x
    FROM f1, f2
    """,
)
def pipeline_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER CAUSALITY (Granger 1969, lag-1) between daily click
    and purchase counts, BOTH directions: does adding lagged clicks
    improve the purchase autoregression (f_xy), and vice versa
    (f_yx) — the directed sequel to pipeline_xcorr's symmetric
    lead-lag. F = (SSE_restricted − SSE_unrestricted)(n−3)/SSE_u
    with the two-regressor OLS solved in CLOSED FORM from centered
    sufficient sums: in n-scaled form A_pq = nΣpq − ΣpΣq the /n
    cancels out of F entirely, and the reverse direction reuses the
    SAME 14 sums with roles swapped — one corpus pass, both tests.
    Decision at the F(1, 26) 5% critical value 4.0 (26 dof at the
    fixture's 30-day span; the conventional 3.84 asymptote is noted
    for long spans).

    Exactness: daily counts are exact ints, every A_pq an exact
    long (< 2^53 through sf ~10 at the fixture's count scale —
    re-quantize beyond, the dickey_fuller knob); F is ONE fixed-shape
    IEEE tree over their double casts (written token-identically in
    both engines), emitted unrounded. Degenerate inputs (n < 4,
    singular design D <= 0, zero residual) emit NULL, never a
    crash or a fake rejection.

    Scale: one events pass to the dates-bounded daily table, a
    30-row lag self-join, then sufficient statistics all the way
    down — the whole test after the first aggregate is a 1-row
    broadcast computation."""
    idx = _daily_xy_idx(spark, sf_dir)  # dates-bounded; both join sides
    a = idx.select(
        F.col("t").alias("at"), F.col("y").alias("u"), F.col("x").alias("v")
    )
    b = idx.select(
        F.col("t").alias("bt"), F.col("y").alias("w"), F.col("x").alias("w2")
    )
    pairs = a.join(F.broadcast(b), F.col("bt") == F.col("at") + 1).select(
        "u", "v", "w", "w2"
    )
    sums = {
        "su": F.sum("u"), "sv": F.sum("v"),
        "sw": F.sum("w"), "sw2": F.sum("w2"),
        "suu": F.sum(F.col("u") * F.col("u")),
        "svv": F.sum(F.col("v") * F.col("v")),
        "suv": F.sum(F.col("u") * F.col("v")),
        "suw": F.sum(F.col("u") * F.col("w")),
        "svw": F.sum(F.col("v") * F.col("w")),
        "sww": F.sum(F.col("w") * F.col("w")),
        "suw2": F.sum(F.col("u") * F.col("w2")),
        "svw2": F.sum(F.col("v") * F.col("w2")),
        "sw2w2": F.sum(F.col("w2") * F.col("w2")),
    }
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[c.cast("long").alias(k) for k, c in sums.items()],
    )

    def f_stat(a_uu, a_vv, a_uv, a_uw, a_vw, a_ww, n):
        # token-identical tree to _GRANGER_F_SQL
        d = a_uu.cast("double") * a_vv - a_uv.cast("double") * a_uv
        expl = (
            (
                a_uw.cast("double") * a_uw * a_vv
                + a_vw.cast("double") * a_vw * a_uu
            )
            - 2.0 * (a_uw.cast("double") * a_vw * a_uv)
        ) / d
        sse_u = a_ww.cast("double") - expl
        sse_r = a_ww.cast("double") - a_uw.cast("double") * a_uw / a_uu
        return F.when(
            (n >= 4) & (a_uu > 0) & (d > 0) & (sse_u > 0),
            (sse_r - sse_u) * (n - 3) / sse_u,
        )

    def cent(p, q):
        return F.col("n") * F.col(f"s{p}{q}") - F.col(f"s{p}") * F.col(
            f"s{q}"
        )

    n = F.col("n")
    f_xy = f_stat(
        cent("u", "u"), cent("v", "v"), cent("u", "v"),
        cent("u", "w"), cent("v", "w"), cent("w", "w"), n,
    )
    f_yx = f_stat(
        cent("v", "v"), cent("u", "u"), cent("u", "v"),
        cent("v", "w2"), cent("u", "w2"), cent("w2", "w2"), n,
    )
    return s.select(
        n.alias("n_pairs"),
        f_xy.alias("f_xy"),
        f_yx.alias("f_yx"),
        (f_xy > 4.0).alias("x_causes_y"),
        (f_yx > 4.0).alias("y_causes_x"),
    )


@query(
    "pipeline_page_hinkley",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS xm
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, xm,
             ROW_NUMBER() OVER w AS t,
             SUM(xm) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    dev AS (
      SELECT event_type, day, t,
             xm - CAST(round(s / t) AS BIGINT) AS d
      FROM seq
    ),
    walk AS (
      SELECT event_type, day, t,
             SUM(d) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM dev
    ),
    ph AS (
      SELECT event_type, day, t, m,
             m - MIN(m) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM walk
    ),
    ranked AS (
      SELECT event_type, day, p,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY p DESC, day) AS rn
      FROM ph
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(p AS DOUBLE) / 1000000 AS ph_max,
           strftime(day, '%Y-%m-%d') AS peak_day
    FROM ranked WHERE rn = 1
    """,
)
def pipeline_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-HINKLEY drift statistic (Page 1954; the streaming-native
    upward-shift detector) per event type over the daily value
    series: m_t = Sigma_{i<=t}(x_i - mean_i), PH_t = m_t - min_{i<=t}
    m_i, reported at its peak (max PH, earliest day on ties). Unlike
    pipeline_cusum_changepoint (which needs the GLOBAL mu/sigma of
    the whole series), PH's running mean makes every step depend only
    on the PAST -- which is exactly what lets page_hinkley_stream
    maintain it incrementally with bit-identical results. delta = 0
    (pure level-shift sensitivity); thresholding is left to the
    caller since lambda is scale-dependent (the stat and its peak
    day ARE the readout, the cusum convention without its global
    sigma).

    Determinism: daily totals are exact decimal -> INTEGER MICROS
    (the x1e6 decimal shift is exact -- no rounding at all); the only
    rational is mean_i = s_i/i, rounded to integer micros with
    half-away-from-zero (both engines' round(double) semantics --
    the dyadic .5 midpoint IS reachable here and both agree); every
    cumulative and the running min are exact long arithmetic. The
    sequential recursion and the stream twin share this arithmetic
    token-for-token, so stream/batch parity is exact.

    Scale: one events pass to the dates x types daily table, then
    type-partitioned calendar-bounded windows (four passes sharing
    ONE sort -- Spark collapses same-spec window frames); no global
    window, one shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # ts IS NOT NULL matters even though value already is: a NULL ts
    # would form a NULL day group, and Spark's window ORDER BY sorts
    # NULLS FIRST while DuckDB sorts NULLS LAST -- the PH walk is
    # order-defined, so the whole statistic would diverge (the
    # _daily_xy_idx / cusum convention; ADVICE r12).
    daily = (
        ev.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(18,6)")) * 1_000_000
            ).cast("long").alias("xm")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = daily.select(
        "event_type",
        "day",
        "xm",
        F.row_number().over(w).alias("t"),
        F.sum("xm").over(wrun).alias("s"),
    )
    dev = seq.select(
        "event_type",
        "day",
        "t",
        (
            F.col("xm")
            - F.round(F.col("s") / F.col("t"), 0).cast("long")
        ).alias("d"),
    )
    walk = dev.select(
        "event_type", "day", "t", F.sum("d").over(wrun).alias("m")
    )
    ph = walk.select(
        "event_type",
        "day",
        "t",
        (F.col("m") - F.min("m").over(wrun)).alias("p"),
    )
    wtype = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("p"), "day")
    ranked = ph.select(
        "event_type",
        "day",
        "p",
        F.count(F.lit(1)).over(wtype).alias("n_days"),
        F.row_number().over(wr).alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("p").cast("double") / 1_000_000).alias("ph_max"),
        F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
    )


@query(
    "pipeline_weibull_fit",
    oracle=f"""
    WITH {_SPELL_CTE},
    spells AS (
      SELECT date_diff('day', t1, t2) AS t
      FROM per_cust
      WHERE t2 IS NOT NULL AND date_diff('day', t1, t2) >= 1
    ),
    g AS (SELECT COUNT(*) AS n FROM spells),
    by_val AS (SELECT t, COUNT(*) AS c FROM spells GROUP BY t),
    cum AS (
      SELECT t, SUM(c) OVER (ORDER BY t) AS r, n FROM by_val, g
    ),
    pts AS (
      SELECT round(ln(CAST(t AS DOUBLE)), 6) AS x,
             round(ln(-ln(1.0 - (CAST(r AS DOUBLE) - 0.3)
                                / (CAST(n AS DOUBLE) + 0.4))), 6) AS y
      FROM cum
    ),
    dsums AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(x AS DECIMAL(18,6))) AS sx,
             SUM(CAST(y AS DECIMAL(18,6))) AS sy,
             SUM(CAST(round(x * x, 6) AS DECIMAL(18,6))) AS sxx,
             SUM(CAST(round(x * y, 6) AS DECIMAL(18,6))) AS sxy
      FROM pts
    ),
    fit AS (
      SELECT CAST((SELECT n FROM g) AS BIGINT) AS n_spells,
             CAST(k AS BIGINT) AS n_points,
             CASE WHEN k >= 2 AND k * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
               (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE))
               / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
             END AS beta,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, k AS kk
      FROM dsums
    )
    SELECT n_spells, n_points, beta AS shape_beta,
           CASE WHEN beta > 0 THEN
             round(exp(-(((syd - beta * sxd) / kk) / beta)), 6)
           END AS scale_eta_days
    FROM fit
    """,
)
def pipeline_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIBULL FIT of time-to-reorder by median-rank regression (the
    classic Weibull-plot estimator): linearize 1-F = exp(-(t/eta)^b)
    to ln(-ln(1-F)) = b ln t - b ln eta, estimate F at each distinct
    spell length with Bernard's approximation (r-0.3)/(n+0.4), and
    OLS the transformed points -- the PARAMETRIC member of the
    survival family (KM estimates S nonparametrically, Nelson-Aalen
    the hazard, log-rank compares arms; the Weibull shape b answers
    'is churn risk rising or falling with tenure': b < 1 = early
    churn, b > 1 = wear-out). Simple-variant contract: UNCENSORED
    spells only, same-day reorders (t = 0) excluded -- the quick
    engineering fit; censoring-aware inference stays with KM.

    Determinism: one point per distinct spell length; both logs are
    rounded 6 dp at the transcendental and the two products
    pre-rounded 6 dp before exact decimal sums (the price_elasticity
    transcendental-regressor discipline); beta is a shared IEEE tree
    over the decimal-cast sums (unscaled magnitudes are
    log-of-calendar-bounded -- nowhere near 2^53), emitted unrounded;
    eta re-rounds at its exp (the libm rule). Degenerate inputs
    (fewer than two distinct t -- a one-point 'line' whose 6-dp
    product residue would otherwise sneak past the variance guard --
    or beta <= 0) emit NULL.

    Scale: per-customer bounded window, then everything is bounded
    by distinct spell lengths (calendar); the cumulative rank uses
    the bucket-offset pattern, no global window."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    spells = per_cust.where(
        F.col("t2").isNotNull() & (F.datediff("t2", "t1") >= 1)
    ).select(F.datediff("t2", "t1").alias("t"))
    by_val = (
        spells.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # distinct-spell-bounded
    )
    out, totals = bucketed_running(by_val, "t", ["c"])
    n = totals["c"]
    x = F.round(F.log(F.col("t").cast("double")), 6)
    fhat = (F.col("run_c") - 0.3) / F.lit(float(n) + 0.4)
    y = F.round(F.log(-F.log(1.0 - fhat)), 6)
    pts = out.select(x.alias("x"), y.alias("y"))
    dec6 = "decimal(18,6)"
    dsums = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(dec6)).alias("sx"),
        F.sum(F.col("y").cast(dec6)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dec6)).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(dec6)).alias("sxy"),
    )
    k = F.col("k")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    den = k * F.col("sxx").cast("double") - sxd * sxd
    beta = F.when(
        (k >= 2) & (den > 0),
        (k * F.col("sxy").cast("double") - sxd * syd) / den,
    )
    eta = F.when(
        beta > 0, F.round(F.exp(-(((syd - beta * sxd) / k) / beta)), 6)
    )
    return dsums.select(
        F.lit(n).cast("long").alias("n_spells"),
        k.cast("long").alias("n_points"),
        beta.alias("shape_beta"),
        eta.alias("scale_eta_days"),
    )


@query(
    "pipeline_srm",
    oracle="""
    WITH units AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c
      FROM units
    ),
    z AS (
      SELECT n_t, n_c,
             CAST(n_t AS DOUBLE) / (n_t + n_c) AS ratio_t,
             CASE WHEN n_t + n_c > 0 THEN
               CAST(n_t - n_c AS DOUBLE) / sqrt(CAST(n_t + n_c AS DOUBLE))
             END AS z_score
      FROM s
    )
    SELECT n_t, n_c, ratio_t, z_score,
           z_score * z_score AS chi_square,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.001
             AS srm_detected
    FROM z
    """,
)
def pipeline_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO MISMATCH check (the standard experiment health
    gate, run BEFORE reading any metric): do the parity arms actually
    hold the intended 50/50 unit split? A mismatched ratio means the
    assignment or logging pipeline is broken and every downstream
    readout (pipeline_ab_test, cuped, two_proportion_z on the same
    arms) is invalid — the industry convention alarms at p < 0.001,
    NOT 0.05, because the null is expected to hold to high precision
    (Fabijan et al. 2019). chi2(1) = (n_t − n_c)²/n via
    z = (n_t − n_c)/√n.

    Exactness: unit counts are exact longs from one
    groupBy(user) pass; z and chi² are one shared IEEE tree over
    their double casts, emitted unrounded; the logistic-Φ p rounds
    at its transcendental with the decision reading the rounded
    value (the bh_fdr rule). Empty input emits NULL, never a
    division crash.

    Scale: one partial-agg-friendly distinct-units pass, then a
    1-row fold — nothing scales past the unit count."""
    e = load_table(spark, sf_dir, "events")
    units = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.first((F.col("user_id") % 2).cast("long")).alias("arm"))
    )
    s = units.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
    )
    n = F.col("n_t") + F.col("n_c")
    z = F.when(
        n > 0, (F.col("n_t") - F.col("n_c")).cast("double") / F.sqrt(n.cast("double"))
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return s.select(
        "n_t",
        "n_c",
        (F.col("n_t").cast("double") / n).alias("ratio_t"),
        z.alias("z_score"),
        (z * z).alias("chi_square"),
        p.alias("p_approx"),
        (p < 0.001).alias("srm_detected"),
    )


@query(
    "pipeline_jarque_bera",
    oracle="""
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  AS DECIMAL(25,6)) AS DOUBLE) AS sx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ),
    devs AS (
      SELECT e.event_type, s.n,
             CAST(round((e.value - s.sx / s.n) * (e.value - s.sx / s.n), 6)
                  AS DECIMAL(24,6)) AS d2,
             CAST(round((e.value - s.sx / s.n) * (e.value - s.sx / s.n)
                        * (e.value - s.sx / s.n), 6)
                  AS DECIMAL(30,6)) AS d3,
             CAST(round(((e.value - s.sx / s.n) * (e.value - s.sx / s.n))
                        * ((e.value - s.sx / s.n) * (e.value - s.sx / s.n)),
                        6) AS DECIMAL(30,6)) AS d4
      FROM events e JOIN stats s USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    moms AS (
      SELECT event_type, MAX(n) AS n,
             SUM(d2) AS s2, SUM(d3) AS s3, SUM(d4) AS s4
      FROM devs GROUP BY event_type
    ),
    sk AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CASE WHEN s2 > 0 THEN
               round((CAST(s3 AS DOUBLE) / n)
                     / pow(CAST(s2 AS DOUBLE) / n, 1.5), 9) END AS skewness,
             CASE WHEN s2 > 0 THEN
               round((CAST(s4 AS DOUBLE) / n)
                     / ((CAST(s2 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)) - 3.0, 9)
             END AS ex_kurtosis
      FROM moms
    ),
    jb AS (
      SELECT event_type, n, skewness, ex_kurtosis,
             (n / 6.0) * (skewness * skewness
                          + (ex_kurtosis * ex_kurtosis) / 4.0) AS jb_stat
      FROM sk
    )
    SELECT event_type, n, skewness, ex_kurtosis, jb_stat,
           round(exp(-(jb_stat / 2)), 6) AS p_approx,
           round(exp(-(jb_stat / 2)), 6) < 0.05 AS normal_rejected
    FROM jb
    """,
)
def pipeline_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test per event type (Jarque & Bera
    1980): JB = n/6 (S² + K²/4) from the sample skewness and excess
    kurtosis — the screen that decides whether pipeline_ab_test's t
    is trustworthy or the readout should fall back to
    pipeline_mann_whitney (heavy tails show up here first). chi²(2)
    survival has the EXACT closed form exp(−JB/2) (even dof, m = 1).

    Determinism recipe (three house patterns composed): the mean
    comes from the exact decimal Σx (the value_anomalies sufficient-
    stat pass); each centered power d², d³, d⁴ is a fixed-shape
    double tree rounded 6 dp at the term then decimal-summed
    (order-free — the chi_square rule); the two moment RATIOS pass
    2^53 unscaled at corpus scale, so skewness/kurtosis emit at 9 dp
    (the acf rule) and JB is computed FROM THE ROUNDED values — the
    decision chain reads only agreed numbers. Zero-variance types
    emit NULL, never a division crash.

    Scale: two corpus passes (sufficient stats; centered powers —
    separate scans under no-exchange-reuse) with the 5-row stats
    broadcast back (the corpus-bounded join-back rule); everything
    after is a 5-row fold."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(25,6)")
        .cast("double")
        .alias("sx"),
    )
    d = F.col("value") - F.col("sx") / F.col("n")
    devs = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n",
        F.round(d * d, 6).cast("decimal(24,6)").alias("d2"),
        F.round(d * d * d, 6).cast("decimal(30,6)").alias("d3"),
        F.round((d * d) * (d * d), 6).cast("decimal(30,6)").alias("d4"),
    )
    moms = devs.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("d2").alias("s2"),
        F.sum("d3").alias("s3"),
        F.sum("d4").alias("s4"),
    )
    m2 = F.col("s2").cast("double") / F.col("n")
    skew = F.when(
        F.col("s2") > 0,
        F.round(
            (F.col("s3").cast("double") / F.col("n")) / F.pow(m2, 1.5), 9
        ),
    )
    kurt = F.when(
        F.col("s2") > 0,
        F.round(
            (F.col("s4").cast("double") / F.col("n")) / (m2 * m2) - 3.0, 9
        ),
    )
    sk = moms.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        skew.alias("skewness"),
        kurt.alias("ex_kurtosis"),
    )
    jb = (F.col("n") / 6.0) * (
        F.col("skewness") * F.col("skewness")
        + (F.col("ex_kurtosis") * F.col("ex_kurtosis")) / 4.0
    )
    out = sk.withColumn("jb_stat", jb)
    p = F.round(F.exp(-(F.col("jb_stat") / 2)), 6)
    return out.select(
        "event_type",
        "n",
        "skewness",
        "ex_kurtosis",
        "jb_stat",
        p.alias("p_approx"),
        (p < 0.05).alias("normal_rejected"),
    )


@query(
    "pipeline_cointegration",
    oracle=f"""
    WITH {_DAILY_XY_CTE},
    s1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM idx
    ),
    fit AS (
      SELECT n, sx, sy,
             CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
             END AS b
      FROM s1
    ),
    fit2 AS (
      SELECT n, b,
             (CAST(sy AS DOUBLE) - b * sx) / n AS a
      FROM fit
    ),
    resid AS (
      SELECT i.t,
             CAST(round((i.y - f.a - f.b * i.x) * 1000, 0) AS BIGINT) AS u
      FROM idx i, fit2 f
      WHERE f.b IS NOT NULL
    ),
    pairs AS (
      SELECT a.u AS ul, b.u - a.u AS du
      FROM resid a JOIN resid b ON b.t = a.t + 1
    ),
    s2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(ul * ul) AS BIGINT) AS auu,
             CAST(SUM(ul * du) AS BIGINT) AS bud,
             CAST(SUM(du * du) AS BIGINT) AS cdd
      FROM pairs
    ),
    eg AS (
      SELECT (SELECT n FROM fit2) AS n_days,
             (SELECT b FROM fit2) AS beta,
             (SELECT a FROM fit2) AS alpha,
             CASE WHEN auu > 0 THEN CAST(bud AS DOUBLE) / auu END
               AS rho_resid,
             CASE WHEN auu > 0 AND m >= 2
                   AND CAST(auu AS DOUBLE) * cdd
                       - CAST(bud AS DOUBLE) * bud > 0 THEN
               CAST(bud AS DOUBLE) * sqrt(CAST(m - 1 AS DOUBLE))
               / sqrt(CAST(auu AS DOUBLE) * cdd
                      - CAST(bud AS DOUBLE) * bud)
             END AS t_stat
      FROM s2
    )
    SELECT n_days, beta, alpha, rho_resid, t_stat,
           t_stat < -3.37 AS cointegrated
    FROM eg
    """,
)
def pipeline_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE-GRANGER cointegration test (Engle & Granger 1987)
    between the daily click and purchase count series: step 1 fits
    the levels regression y = a + b x, step 2 runs a no-constant
    Dickey-Fuller on its residuals — a stationary residual means the
    two series share a long-run equilibrium (so modeling the SPREAD
    is valid even though each level is a random walk). Completes the
    time-series causality block: xcorr (symmetric lead-lag), granger
    (short-run direction), this (long-run equilibrium). Decision at
    the EG 2-variable 5% critical value -3.37.

    Exactness: counts are exact longs, so the step-1 sufficient
    sums and b = B/A, a are shared IEEE trees over exact-long casts;
    residuals quantize to INTEGER MILLIS in one round (count-scale
    residuals need no finer grain, and millis keep Sigma u^2 under
    2^53 far past the fixture scale — the dickey_fuller quantization
    knob); the step-2 A/B/C are then exact longs and the no-constant
    DF t = B sqrt(m-1)/sqrt(AC - B^2) is one shared tree, emitted
    unrounded. Degenerate inputs (zero x-variance, zero residual
    variance, m < 2) emit NULL.

    Scale: one events pass to the 30-row daily table
    (localCheckpoint'ed: the fit, the residual pass and both lag-join
    sides read it); everything after is control-plane."""
    idx = _daily_xy_idx(spark, sf_dir)  # fit + residual pass + lag join
    s1 = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    den1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = F.when(
        den1 > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / den1,
    )
    fit = s1.select("n", "sx", "sy", b.alias("b")).select(
        "n",
        "b",
        ((F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n"))
        .alias("a"),
    )
    resid = (
        idx.crossJoin(F.broadcast(fit))
        .where(F.col("b").isNotNull())
        .select(
            "t",
            F.round(
                (F.col("y") - F.col("a") - F.col("b") * F.col("x")) * 1000, 0
            )
            .cast("long")
            .alias("u"),
        )
        .localCheckpoint(eager=True)  # both lag-join sides
    )
    ra = resid.select(F.col("t").alias("at"), F.col("u").alias("ul"))
    rb = resid.select(F.col("t").alias("bt"), F.col("u").alias("ub"))
    pairs = ra.join(F.broadcast(rb), F.col("bt") == F.col("at") + 1).select(
        "ul", (F.col("ub") - F.col("ul")).alias("du")
    )
    s2 = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("ul") * F.col("ul")).cast("long").alias("auu"),
        F.sum(F.col("ul") * F.col("du")).cast("long").alias("bud"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("cdd"),
    )
    auu_d = F.col("auu").cast("double")
    bud_d = F.col("bud").cast("double")
    disc = auu_d * F.col("cdd") - bud_d * F.col("bud")
    rho = F.when(F.col("auu") > 0, bud_d / F.col("auu"))
    t_stat = F.when(
        (F.col("auu") > 0) & (F.col("m") >= 2) & (disc > 0),
        bud_d * F.sqrt((F.col("m") - 1).cast("double")) / F.sqrt(disc),
    )
    return s2.crossJoin(F.broadcast(fit)).select(
        F.col("n").alias("n_days"),
        F.col("b").alias("beta"),
        F.col("a").alias("alpha"),
        rho.alias("rho_resid"),
        t_stat.alias("t_stat"),
        (t_stat < -3.37).alias("cointegrated"),
    )


@query(
    "pipeline_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    sstat AS (SELECT CAST(SUM(s) AS BIGINT) AS s_stat FROM p),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    ties AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x
      HAVING COUNT(*) > 1
    ),
    tiesum AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0) AS tt
      FROM ties
    ),
    v AS (
      SELECT nd.n, sstat.s_stat,
             nd.n * (nd.n - 1) * (2 * nd.n + 5) - tiesum.tt AS var_s18
      FROM nd, sstat, tiesum
    ),
    z AS (
      SELECT n, s_stat, var_s18,
             CASE WHEN var_s18 > 0 AND s_stat <> 0 THEN
               CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                         ELSE s_stat + 1 END AS DOUBLE)
               / sqrt(CAST(var_s18 AS DOUBLE) / 18.0)
             WHEN var_s18 > 0 THEN 0.0 END AS z_stat
      FROM v
    )
    SELECT n AS n_days, s_stat, var_s18, z_stat,
           CASE WHEN z_stat > 1.96 THEN 'increasing'
                WHEN z_stat < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z
    """,
)
def pipeline_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r13) — MANN–KENDALL trend test on daily revenue:
    the nonparametric 'is this series drifting' gate (Mann 1945,
    Kendall 1975) that pairs with pipeline_theil_sen exactly the way
    the literature uses them — MK decides IF a monotone trend exists,
    Sen's slope says how steep. S = Σ_{i<j} sign(x_j − x_i); the
    tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    stays an exact BIGINT (n ≈ 2.4k days → ~3·10¹⁰ ≪ 2^53), and the
    continuity-corrected z = (S ∓ 1)/√(Var) is one shared IEEE
    sqrt+division, emitted unrounded; the trend label cuts at the
    short literal 1.96 on the agreed double.

    Scale: the kendall_tau shape — one corpus pass to the
    calendar-bounded daily table, the O(n²) pair sum as a broadcast
    non-equi self-join over that control-plane-sized side, then
    1-row aggregates; revenue quantizes to exact integer cents so
    every pair sign is integer-exact."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * F.lit(100))
            .cast("long")
            .alias("x")
        )
        .localCheckpoint(eager=True)  # calendar-bounded; read 3x below
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    sstat = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .agg(F.sum(s).cast("long").alias("s_stat"))
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
    )
    tiesum = ties.agg(
        F.coalesce(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("tt")
    )
    v = (
        nd.crossJoin(F.broadcast(sstat))
        .crossJoin(F.broadcast(tiesum))
        .select(
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tt")
            ).alias("var_s18"),
        )
    )
    zcol = (
        F.when(
            (F.col("var_s18") > 0) & (F.col("s_stat") != 0),
            F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
            .otherwise(F.col("s_stat") + 1)
            .cast("double")
            / F.sqrt(F.col("var_s18").cast("double") / 18.0),
        )
        .when(F.col("var_s18") > 0, F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        "var_s18",
        zcol.alias("z_stat"),
        F.when(zcol > 1.96, "increasing")
        .when(zcol < -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


def _strength_folds() -> tuple[str, str, str]:
    """(ssr, str_sum, str_sq) SQL folds over the 12 pivoted per-month
    -of-year columns — fixed textual order mo 1→12 (one shared IEEE
    tree; empty months contribute 0.0). Per-mo ingredients are EXACT
    decimals: within a month-of-year the seasonal denominator
    24·n_years is CONSTANT, so residual×24·ny and deseasonalized
    ×24·ny stay decimal until one cast per mo."""
    def fold(terms):
        out = terms[0]
        for t in terms[1:]:
            out = f"({out}) + ({t})"
        return out

    ssr = fold([
        f"(CASE WHEN ny_{k} > 0 THEN CAST(qv_{k} AS DOUBLE) "
        f"/ ((24.0 * ny_{k}) * (24.0 * ny_{k})) ELSE 0.0 END)"
        for k in range(1, 13)
    ])
    trs = fold([
        f"(CASE WHEN ny_{k} > 0 THEN CAST(sw_{k} AS DOUBLE) "
        f"/ (24.0 * ny_{k}) ELSE 0.0 END)"
        for k in range(1, 13)
    ])
    trq = fold([
        f"(CASE WHEN ny_{k} > 0 THEN CAST(qw_{k} AS DOUBLE) "
        f"/ ((24.0 * ny_{k}) * (24.0 * ny_{k})) ELSE 0.0 END)"
        for k in range(1, 13)
    ])
    return ssr, trs, trq


_STRENGTH_SSR, _STRENGTH_TRS, _STRENGTH_TRQ = _strength_folds()

_STRENGTH_PIVOT = ", ".join(
    f"MAX(CASE WHEN mo = {k} THEN ny END) AS ny_{k}, "
    f"MAX(CASE WHEN mo = {k} THEN qv END) AS qv_{k}, "
    f"MAX(CASE WHEN mo = {k} THEN sw END) AS sw_{k}, "
    f"MAX(CASE WHEN mo = {k} THEN qw END) AS qw_{k}"
    for k in range(1, 13)
)


@query(
    "pipeline_seasonality_strength",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rdec
      FROM orders GROUP BY 1, 2
    ),
    trend AS (
      SELECT a.mi, a.mo, a.rdec,
             CAST(SUM(CASE WHEN abs(b.mi - a.mi) = 6 THEN b.rdec
                      ELSE 2 * b.rdec END) AS DECIMAL(18,2)) AS t24,
             COUNT(*) AS n_frame
      FROM monthly a JOIN monthly b ON b.mi BETWEEN a.mi - 6 AND a.mi + 6
      GROUP BY a.mi, a.mo, a.rdec
    ),
    detr AS (
      SELECT mi, mo, rdec,
             CAST(24 * rdec - t24 AS DECIMAL(18,2)) AS d24
      FROM trend WHERE n_frame = 13
    ),
    seas AS (
      SELECT mo, CAST(SUM(d24) AS DECIMAL(18,2)) AS a_mo,
             CAST(COUNT(*) AS DECIMAL(4,0)) AS ny
      FROM detr GROUP BY mo
    ),
    permo AS (
      -- squares need DECIMAL(28,2) operands: DuckDB's decimal
      -- multiply does NOT widen ((18,2)x(18,2) -> DECIMAL(18,4),
      -- int64 overflow — measured); (28,2) operands bind (38,4)
      SELECT d.mo, s.ny,
             SUM(CAST(d.d24 * s.ny - s.a_mo AS DECIMAL(28,2))
                 * CAST(d.d24 * s.ny - s.a_mo AS DECIMAL(28,2))) AS qv,
             SUM(CAST(24 * s.ny * d.rdec - s.a_mo AS DECIMAL(18,2))) AS sw,
             SUM(CAST(24 * s.ny * d.rdec - s.a_mo AS DECIMAL(28,2))
                 * CAST(24 * s.ny * d.rdec - s.a_mo AS DECIMAL(28,2))) AS qw
      FROM detr d JOIN seas s USING (mo)
      GROUP BY d.mo, s.ny
    ),
    gstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(d24) AS DECIMAL(18,2)) AS sd,
             CAST(SUM(CAST(d24 AS DECIMAL(28,2))
                      * CAST(d24 AS DECIMAL(28,2))) AS DECIMAL(38,4)) AS qd
      FROM detr
    ),
    wide AS (SELECT {_STRENGTH_PIVOT} FROM permo),
    v AS (
      SELECT g.m,
             ({_STRENGTH_SSR}) / g.m AS var_resid,
             CAST(g.qd AS DOUBLE) / 576.0 / g.m
               - (CAST(g.sd AS DOUBLE) / 24.0 / g.m)
                 * (CAST(g.sd AS DOUBLE) / 24.0 / g.m) AS var_sr,
             ({_STRENGTH_TRQ}) / g.m
               - (({_STRENGTH_TRS}) / g.m) * (({_STRENGTH_TRS}) / g.m)
               AS var_tr
      FROM gstats g, wide
    )
    SELECT m AS n_months,
           CASE WHEN var_sr > 0 THEN
             round(greatest(0.0, 1.0 - var_resid / var_sr), 9) + 0.0 END
             AS f_seasonal,
           CASE WHEN var_tr > 0 THEN
             round(greatest(0.0, 1.0 - var_resid / var_tr), 9) + 0.0 END
             AS f_trend
    FROM v
    """,
)
def pipeline_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r13) — SEASONALITY / TREND STRENGTH of monthly
    revenue (Hyndman's tsfeatures F_s = max(0, 1 − Var(R)/Var(S+R)),
    F_t = max(0, 1 − Var(R)/Var(T+R))): the single-number follow-up
    to pipeline_seasonal_decompose — 'is the seasonal component worth
    modeling' before anyone reads 84 rows of decomposition.

    Exactness strategy: the seasonal component is the per-month-of-
    year MEAN of the detrended series, so Var(R) is a WITHIN-GROUP
    sum of squares — and within one month-of-year the seasonal
    denominator 24·n_years is CONSTANT, so residual·24·ny =
    d24·ny − Σ_mo d24 and deseasonalized·24·ny = 24·ny·r − Σ_mo d24
    stay EXACT DECIMAL through their squares (DECIMAL(18,2)² =
    (37,4), no precision-loss cap); each month-of-year contributes
    one exact aggregate, folded 12-wide in fixed textual order (the
    brier/ece pattern). Σ residual ≡ 0 exactly (residuals of group
    means), so Var(R) needs only the square fold. The >2^53-unscaled
    decimal→double casts can split one ulp between engines (SCALE
    r9), so F_s/F_t emit at the house 9-dp ratio recipe; degenerate
    zero-variance series emit NULL, never a divide-by-zero.

    Scale: one corpus pass to the months spine; the ±6 frame is the
    decompose key's bounded self-join; everything after is 12-row
    control plane."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = (
        o.groupBy(
            mi.alias("mi"), F.month("o_orderdate").cast("int").alias("mo")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rdec")
        )
        .localCheckpoint(eager=True)
    )
    b = monthly.select(F.col("mi").alias("bmi"), F.col("rdec").alias("brdec"))
    w24 = F.when(
        F.abs(F.col("bmi") - F.col("mi")) == 6, F.col("brdec")
    ).otherwise(2 * F.col("brdec"))
    trend = (
        monthly.join(
            F.broadcast(b),
            F.col("bmi").between(F.col("mi") - 6, F.col("mi") + 6),
        )
        .groupBy("mi", "mo", "rdec")
        .agg(
            F.sum(w24).cast("decimal(18,2)").alias("t24"),
            F.count(F.lit(1)).alias("n_frame"),
        )
    )
    detr = (
        trend.where(F.col("n_frame") == 13)
        .select(
            "mi", "mo", "rdec",
            (24 * F.col("rdec") - F.col("t24"))
            .cast("decimal(18,2)")
            .alias("d24"),
        )
        .localCheckpoint(eager=True)  # seas + permo + glob read it
    )
    seas = detr.groupBy("mo").agg(
        F.sum("d24").cast("decimal(18,2)").alias("a_mo"),
        F.count(F.lit(1)).cast("decimal(4,0)").alias("ny"),
    )
    v_col = (F.col("d24") * F.col("ny") - F.col("a_mo")).cast("decimal(18,2)")
    w_col = (24 * F.col("ny") * F.col("rdec") - F.col("a_mo")).cast(
        "decimal(18,2)"
    )
    permo = (
        detr.join(F.broadcast(seas), "mo")
        .groupBy("mo", "ny")
        .agg(
            F.sum(v_col * v_col).alias("qv"),
            F.sum(w_col).alias("sw"),
            F.sum(w_col * w_col).alias("qw"),
        )
    )
    glob = detr.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("d24").cast("decimal(18,2)").alias("sd"),
        F.sum(F.col("d24").cast("decimal(18,2)") * F.col("d24").cast("decimal(18,2)"))
        .cast("decimal(38,4)")
        .alias("qd"),
    )
    pivot_cols = []
    for k in range(1, 13):
        is_k = F.col("mo") == k
        pivot_cols.append(F.max(F.when(is_k, F.col("ny"))).alias(f"ny_{k}"))
        pivot_cols.append(F.max(F.when(is_k, F.col("qv"))).alias(f"qv_{k}"))
        pivot_cols.append(F.max(F.when(is_k, F.col("sw"))).alias(f"sw_{k}"))
        pivot_cols.append(F.max(F.when(is_k, F.col("qw"))).alias(f"qw_{k}"))
    wide = permo.agg(*pivot_cols)
    v = glob.crossJoin(F.broadcast(wide)).select(
        "m",
        (F.expr(_STRENGTH_SSR) / F.col("m")).alias("var_resid"),
        (
            F.col("qd").cast("double") / 576.0 / F.col("m")
            - (F.col("sd").cast("double") / 24.0 / F.col("m"))
            * (F.col("sd").cast("double") / 24.0 / F.col("m"))
        ).alias("var_sr"),
        (
            F.expr(_STRENGTH_TRQ) / F.col("m")
            - (F.expr(_STRENGTH_TRS) / F.col("m"))
            * (F.expr(_STRENGTH_TRS) / F.col("m"))
        ).alias("var_tr"),
    )
    return v.select(
        F.col("m").alias("n_months"),
        F.when(
            F.col("var_sr") > 0,
            F.round(
                F.greatest(F.lit(0.0), 1.0 - F.col("var_resid") / F.col("var_sr")),
                9,
            )
            + F.lit(0.0),
        ).alias("f_seasonal"),
        F.when(
            F.col("var_tr") > 0,
            F.round(
                F.greatest(F.lit(0.0), 1.0 - F.col("var_resid") / F.col("var_tr")),
                9,
            )
            + F.lit(0.0),
        ).alias("f_trend"),
    )


# Brown–Forsythe wide-pivot chains (the anova fixed-order rule): per
# weekday d the exact-long sufficient stats of the doubled absolute
# deviation z = |2v − m2_d| are pivoted to columns so every
# cross-group double reduction is one left-associated IEEE tree.
_BF_DAYS = list(range(7))


@query(
    "pipeline_levene",
    oracle=f"""
    WITH pur AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g,
             CAST(CAST(round(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    ranked AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM pur
    ),
    m2 AS (
      SELECT g,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
                  + SUM(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
                  AS BIGINT) AS m2
      FROM ranked GROUP BY g
    ),
    z AS (
      SELECT p.g, ABS(2 * p.v - m.m2) AS z2
      FROM pur p JOIN m2 m ON m.g = p.g
    ),
    stats AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(z2) AS BIGINT) AS sz,
             CAST(SUM(z2 * z2) AS BIGINT) AS szz
      FROM z GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"CAST(MAX(CASE WHEN g = {d} THEN sz END) AS DOUBLE)"
                   f" AS s{d}, "
                   f"CAST(MAX(CASE WHEN g = {d} THEN szz END) AS DOUBLE)"
                   f" AS q{d}"
                   for d in _BF_DAYS)}
      FROM stats
    )
    SELECT CAST({' + '.join(f'n{d}' for d in _BF_DAYS)} AS BIGINT) AS n,
           CAST(7 AS BIGINT) AS k,
           ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
             - ({' + '.join(f's{d}' for d in _BF_DAYS)})
               * ({' + '.join(f's{d}' for d in _BF_DAYS)})
               / ({' + '.join(f'n{d}' for d in _BF_DAYS)}) AS ss_between,
           ({' + '.join(f'q{d}' for d in _BF_DAYS)})
             - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
             AS ss_within,
           CASE WHEN ({' + '.join(f'q{d}' for d in _BF_DAYS)})
                  - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
                  > 0 THEN
             ((({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
               - ({' + '.join(f's{d}' for d in _BF_DAYS)})
                 * ({' + '.join(f's{d}' for d in _BF_DAYS)})
                 / ({' + '.join(f'n{d}' for d in _BF_DAYS)})) / 6.0)
             / ((({' + '.join(f'q{d}' for d in _BF_DAYS)})
                 - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)}))
                / (({' + '.join(f'n{d}' for d in _BF_DAYS)}) - 7.0))
           END AS f_stat
    FROM wide
    WHERE {' AND '.join(f'n{d} IS NOT NULL' for d in _BF_DAYS)}
    """,
)
def pipeline_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN–FORSYTHE variance-homogeneity test (Brown & Forsythe
    1974 — Levene's test with the MEDIAN center, the robust form) of
    purchase value across the seven weekdays: one-way ANOVA on the
    absolute deviations from each group's median. The
    homoscedasticity GATE pipeline_anova silently assumes — run this
    first; a significant F here means anova's pooled-variance F is
    suspect and pipeline_kruskal_wallis is the safer weekday readout.

    Exactness — three house patterns composed: (1) values quantize
    once to integer CENTS (round(value,2) then an exact 2-dp→decimal
    cast — the statistic is DEFINED on cent-quantized values, dodging
    the raw-double deep-scale midpoint trap); (2) each group median
    rides the DOUBLED order-statistic identity m2 = v(lo) + v(hi)
    (lo = ⌊(n+1)/2⌋, hi = ⌊(n+2)/2⌋), so z = |2v − m2| is an exact
    integer with no halves — Spark selects v(lo)/v(hi) from the
    kruskal-style distinct-value cumulative (bucket-offset, no
    global window) with the positions as literals from
    ``bucketed_running``'s by-product totals (control-plane exact);
    (3) the 7-group F reduces over the anova WIDE PIVOT so every
    cross-group double sum is a fixed-order IEEE tree over exact-long
    casts (sz ≤ 2^31, szz ≤ 2.5·10¹⁴ at sf0.1 — the documented
    decimal(38,0) knob applies past sf ≈ 3), F unrounded. Scaling z
    by 2 and by cents cancels in F. Emits only when all 7 weekdays
    are populated (both engines filter identically); all-constant
    deviation groups (ssw = 0) emit NULL F in both engines, never an
    ANSI divide crash (pinned by the degenerate test — the hampel
    lesson applied).

    Scale: one corpus pass to the distinct-value table, one broadcast
    of the 7 medians back over the corpus for the deviation stats;
    everything else is control-plane."""
    from osm_airflow_spark.bucketing import bucketed_running

    e = load_table(spark, sf_dir, "events")
    pur = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        F.weekday("ts").alias("g"),
        (F.round("value", 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    by_val = (
        pur.groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("g") == d, 1).otherwise(0)).alias(f"c{d}")
                for d in _BF_DAYS
            ]
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    out, totals = bucketed_running(by_val, "v", [f"c{d}" for d in _BF_DAYS])
    if any(totals[f"c{d}"] == 0 for d in _BF_DAYS):
        # a weekday with zero purchases: the 7-group statistic is
        # undefined — emit the same zero rows as the oracle's
        # all-present filter, with the full schema
        return out.limit(0).select(
            F.lit(0).cast("long").alias("n"),
            F.lit(7).cast("long").alias("k"),
            F.lit(0.0).alias("ss_between"),
            F.lit(0.0).alias("ss_within"),
            F.lit(0.0).alias("f_stat"),
        )
    sel = []
    for d in _BF_DAYS:
        n_d = totals[f"c{d}"]
        lo, hi = (n_d + 1) // 2, (n_d + 2) // 2
        run, cnt = F.col(f"run_c{d}"), F.col(f"c{d}")
        for tag, pos in (("lo", lo), ("hi", hi)):
            sel.append(
                F.min(
                    F.when((run >= pos) & (run - cnt < pos), F.col("v"))
                ).alias(f"{tag}{d}")
            )
    med = out.agg(*sel).select(
        *[
            (F.col(f"lo{d}") + F.col(f"hi{d}")).alias(f"m2_{d}")
            for d in _BF_DAYS
        ]
    )
    z = pur.join(F.broadcast(med)).select(
        "g",
        F.abs(
            2 * F.col("v")
            - F.coalesce(
                *[
                    F.when(F.col("g") == d, F.col(f"m2_{d}"))
                    for d in _BF_DAYS
                ]
            )
        ).alias("z2"),
    )
    stats = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z2").cast("long").alias("sz"),
        F.sum(F.col("z2") * F.col("z2")).cast("long").alias("szz"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c)))
            .cast(t)
            .alias(f"{a}{d}")
            for d in _BF_DAYS
            for c, a, t in (
                ("n", "n", "long"),
                ("sz", "s", "double"),
                ("szz", "q", "double"),
            )
        ]
    )

    def _chain(make):
        o = make(0)
        for d in _BF_DAYS[1:]:
            o = o + make(d)
        return o

    n_tot = _chain(lambda d: F.col(f"n{d}"))
    s_tot = _chain(lambda d: F.col(f"s{d}"))
    t_tot = _chain(lambda d: F.col(f"q{d}"))
    q_tot = _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ssb = q_tot - s_tot * s_tot / n_tot
    ssw = t_tot - q_tot
    cond = None
    for d in _BF_DAYS:
        c = F.col(f"n{d}").isNotNull()
        cond = c if cond is None else (cond & c)
    return wide.where(cond).select(
        n_tot.cast("long").alias("n"),
        F.lit(7).cast("long").alias("k"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(
            ssw > 0, (ssb / F.lit(6.0)) / (ssw / (n_tot - F.lit(7.0)))
        ).alias("f_stat"),
    )


_TUKEY_PAIRS = [(i, j) for i in range(7) for j in range(i + 1, 7)]


@query(
    "pipeline_tukey_hsd",
    oracle=f"""
    WITH assigned AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    stats AS (
      SELECT g,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sx END) AS s{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sxx END) AS q{d}"
                   for d in range(7))}
      FROM stats
      HAVING {' AND '.join(f'MAX(CASE WHEN g = {d} THEN n END) IS NOT NULL'
                           for d in range(7))}
    ),
    msw AS (
      SELECT *,
             (({' + '.join(f'q{d}' for d in range(7))})
              - ({' + '.join(f's{d} * s{d} / n{d}' for d in range(7))}))
             / (({' + '.join(f'n{d}' for d in range(7))}) - 7.0) AS ms_within
      FROM wide
    ),
    pairs AS (
      SELECT * FROM msw CROSS JOIN (VALUES
        {', '.join(f'({i}, {j})' for i, j in _TUKEY_PAIRS)}
      ) AS p(i, j)
    ),
    scored AS (
      SELECT CAST(i AS INT) AS day_i, CAST(j AS INT) AS day_j,
             (CASE {' '.join(f'WHEN i = {d} THEN n{d}' for d in range(7))}
              END) AS n_i,
             (CASE {' '.join(f'WHEN j = {d} THEN n{d}' for d in range(7))}
              END) AS n_j,
             (CASE {' '.join(f'WHEN i = {d} THEN s{d} / n{d}'
                             for d in range(7))} END) AS mean_i,
             (CASE {' '.join(f'WHEN j = {d} THEN s{d} / n{d}'
                             for d in range(7))} END) AS mean_j,
             ms_within
      FROM pairs
    )
    SELECT day_i, day_j,
           CAST(n_i AS BIGINT) AS n_i, CAST(n_j AS BIGINT) AS n_j,
           mean_i, mean_j,
           mean_i - mean_j AS mean_diff,
           CASE WHEN ms_within > 0 THEN (mean_i - mean_j)
             / sqrt(ms_within * 0.5 * (1.0 / n_i + 1.0 / n_j)) END AS q_stat,
           abs(CASE WHEN ms_within > 0 THEN (mean_i - mean_j)
               / sqrt(ms_within * 0.5 * (1.0 / n_i + 1.0 / n_j)) END) > 4.17
             AS significant
    FROM scored
    ORDER BY day_i, day_j
    """,
)
def pipeline_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY HSD post-hoc (Tukey 1949) over the weekday design: all
    21 pairwise mean contrasts with the studentized-range q statistic
    q_ij = (x̄_i − x̄_j)/√(MSW/2·(1/n_i + 1/n_j)) — the key
    pipeline_anova hands off to when its omnibus F is significant
    ('WHICH days differ?'), at the k=7/df=∞ 5% critical value 4.17
    with family-wise error held at α (the reason this beats 21 naive
    pipeline_ab_test t-tests).

    Exactness: group sufficient statistics are EXACTLY anova's
    (exact decimal Σx, term-rounded Σx²; both cast to double once);
    the 21 q trees each reference the 7-group WIDE PIVOT through
    CASE chains with identical shape in both engines, so every q is
    one shared fixed-order IEEE tree — unrounded; the decision reads
    |q| against the short literal 4.17 (NULL on a zero MSW — the
    degenerate guard, never an ANSI divide crash). Emits only when
    all 7 weekdays are populated (HAVING mirrors the Spark filter).

    Scale: one corpus pass to 7×3 sufficient statistics; the pivot,
    the 21-row pair explode and every q are control-plane sized."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    stats = assigned.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c))).alias(f"{a}{d}")
            for d in range(7)
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )
    cond = None
    for d in range(7):
        c = F.col(f"n{d}").isNotNull()
        cond = c if cond is None else (cond & c)
    wide = wide.where(cond)

    def _chain(make):
        o = make(0)
        for d in range(1, 7):
            o = o + make(d)
        return o

    msw = (
        _chain(lambda d: F.col(f"q{d}"))
        - _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ) / (_chain(lambda d: F.col(f"n{d}")) - F.lit(7.0))
    pairs = wide.select(
        "*",
        msw.alias("ms_within"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), F.lit(j).alias("j")
                    )
                    for i, j in _TUKEY_PAIRS
                ]
            )
        ).alias("p"),
    ).select("*", F.col("p.i").alias("i"), F.col("p.j").alias("j"))

    def _case(side, make):
        out = None
        for d in range(7):
            w = F.when(F.col(side) == d, make(d))
            out = w if out is None else out.when(F.col(side) == d, make(d))
        return out

    n_i = _case("i", lambda d: F.col(f"n{d}"))
    n_j = _case("j", lambda d: F.col(f"n{d}"))
    mean_i = _case("i", lambda d: F.col(f"s{d}") / F.col(f"n{d}"))
    mean_j = _case("j", lambda d: F.col(f"s{d}") / F.col(f"n{d}"))
    q = F.when(
        F.col("ms_within") > 0,
        (mean_i - mean_j)
        / F.sqrt(F.col("ms_within") * 0.5 * (1.0 / n_i + 1.0 / n_j)),
    )
    return pairs.select(
        F.col("i").cast("int").alias("day_i"),
        F.col("j").cast("int").alias("day_j"),
        n_i.cast("long").alias("n_i"),
        n_j.cast("long").alias("n_j"),
        mean_i.alias("mean_i"),
        mean_j.alias("mean_j"),
        (mean_i - mean_j).alias("mean_diff"),
        q.alias("q_stat"),
        (F.abs(q) > 4.17).alias("significant"),
    )


@query(
    "pipeline_lorenz",
    oracle=f"""
    WITH cust_rev AS (
      SELECT o_custkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ),
    ranked AS (
      SELECT CAST(CAST(revenue AS DECIMAL(18,4)) * 10000 AS BIGINT) AS units,
             ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i
      FROM cust_rev
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(units) AS BIGINT) AS t
      FROM ranked
    ),
    sel AS (
      SELECT g.k, (g.k * tot.n) // 10 AS m, tot.n, tot.t
      FROM generate_series(1, 10) AS g(k), tot
    ),
    nums AS (
      SELECT s.k, s.m, s.n, s.t,
             CAST(COALESCE(SUM(r.units), 0) AS BIGINT) AS num
      FROM sel s LEFT JOIN ranked r ON r.i <= s.m
      GROUP BY s.k, s.m, s.n, s.t
    )
    SELECT CAST(k AS INT) AS decile,
           m AS n_customers_cum,
           CAST(num AS DOUBLE) / 10000.0 AS cum_revenue,
           CAST(num AS DOUBLE) / t AS cum_share,
           CAST(m AS DOUBLE) / n AS pop_share
    FROM nums
    WHERE m > 0
    ORDER BY k
    """,
)
def pipeline_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE decile points over customer revenue — the curve
    pipeline_gini's coefficient summarizes: for each population
    decile (customers ascending by revenue), the cumulative share of
    total revenue held — the concentration readout a revenue team
    reads directly ('the bottom half holds x%').

    Exactness: revenues are exact DECIMAL(18,4) sums scaled to
    integer 10⁻⁴-units; the cumulative at each decile boundary is
    EXACT even mid-tie — the boundary row's tie group contributes
    (m − cum_before)·v, which is order-free because tied customers
    are interchangeable (so Spark's value-contiguous cumulative and
    the oracle's arbitrary within-tie ROW_NUMBER agree exactly).
    Decile positions m = ⌊k·n/10⌋ ride as exact control-plane
    literals from ``bucketed_running``'s by-product totals; every
    emitted double is one shared cast/division of < 2^53 exact longs,
    unrounded.

    Scale: one corpus pass to per-customer revenue, one groupBy to
    the distinct-value table, the bucket-offset cumulative (B-way
    parallel, no global window), then a broadcast 10-row boundary
    join — output is O(10)."""
    from osm_airflow_spark.bucketing import bucketed_running

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust_rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(_rev(), 4).alias("revenue"))
    )
    by_val = (
        cust_rev.groupBy("revenue")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            (F.col("revenue").cast("decimal(18,4)") * 10000)
            .cast("long")
            .alias("units"),
            "c",
        )
        .withColumn("rv", F.col("units") * F.col("c"))
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    out, totals = bucketed_running(by_val, "units", ["c", "rv"])
    n, t = totals["c"], totals["rv"]
    if n == 0:
        return out.limit(0).select(
            F.lit(0).cast("int").alias("decile"),
            F.lit(0).cast("long").alias("n_customers_cum"),
            F.lit(0.0).alias("cum_revenue"),
            F.lit(0.0).alias("cum_share"),
            F.lit(0.0).alias("pop_share"),
        )
    deciles = spark.createDataFrame(
        [(k, (k * n) // 10) for k in range(1, 11) if (k * n) // 10 > 0],
        "k int, m long",
    )
    hit = out.join(
        F.broadcast(deciles),
        (F.col("run_c") >= F.col("m"))
        & (F.col("run_c") - F.col("c") < F.col("m")),
    )
    num = (
        F.col("run_rv")
        - F.col("rv")
        + (F.col("m") - (F.col("run_c") - F.col("c"))) * F.col("units")
    )
    return hit.select(
        F.col("k").cast("int").alias("decile"),
        F.col("m").cast("long").alias("n_customers_cum"),
        (num.cast("double") / 10000.0).alias("cum_revenue"),
        (num.cast("double") / F.lit(t).cast("long")).alias("cum_share"),
        (F.col("m").cast("double") / F.lit(n).cast("long")).alias(
            "pop_share"
        ),
    )


_NV_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pipeline_newsvendor",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS prio,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS demand
      FROM orders GROUP BY 1, 2
    ),
    by_val AS (
      SELECT demand,
             {', '.join(
                 "CAST(SUM(CASE WHEN prio = '" + p + "' THEN 1 ELSE 0 END)"
                 f" AS BIGINT) AS c{i}"
                 for i, p in enumerate(_NV_PRIOS))}
      FROM daily GROUP BY demand
    ),
    cum AS (
      SELECT demand,
             {', '.join(
                 f'c{i}, SUM(c{i}) OVER (ORDER BY demand) AS run{i}'
                 for i in range(len(_NV_PRIOS)))}
      FROM by_val
    ),
    tot AS (
      SELECT {', '.join(
          f'CAST(SUM(c{i}) AS BIGINT) AS n{i}, '
          f'CAST(SUM(demand * c{i}) AS BIGINT) AS d{i}'
          for i in range(len(_NV_PRIOS)))}
      FROM by_val
    ),
    sel AS (
      SELECT {', '.join(
          f'MIN(CASE WHEN run{i} >= (3 * t.n{i} + 3) // 4 '
          f'THEN demand END) AS q{i}'
          for i in range(len(_NV_PRIOS)))}
      FROM cum, tot t
    )
    SELECT u.prio AS o_orderpriority, u.n_days, u.total_demand,
           CAST(u.total_demand AS DOUBLE) / u.n_days AS mean_demand,
           0.75 AS service_level,
           u.q_opt
    FROM (SELECT * FROM sel, tot) s, LATERAL (VALUES
      {', '.join(
          f"('{p}', s.n{i}, s.d{i}, s.q{i})"
          for i, p in enumerate(_NV_PRIOS))}
    ) AS u(prio, n_days, total_demand, q_opt)
    WHERE u.n_days > 0
    ORDER BY u.prio
    """,
)
def pipeline_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWSVENDOR critical-fractile stocking (Arrow–Harris–Marschak
    1951) per order priority: with underage:overage cost 3:1 the
    optimal stock is the 75% fractile of the daily demand
    distribution — q* = min{q : F(q) ≥ cu/(cu+co)} — the inventory
    sizing decision beside pipeline_excess_stock's after-the-fact
    screen. Demand = orders per (priority, day); emits each
    priority's day count, mean daily demand and q*.

    Exactness: demand values and day counts are exact integers; the
    per-priority CDF rides the distinct-value cumulative (5-way wide
    pivot, bucket-offsets — no global window), the fractile position
    ⌈3n/4⌉ = (3n+3)//4 is an exact control-plane literal from
    ``bucketed_running``'s totals, and q* is a pure MIN selection
    over the monotone cumulative. mean_demand is one division of
    exact longs; service_level is the short literal 0.75.

    Scale: one corpus pass to (priority, day) counts (days ×
    priorities bounded), then distinct-value-bounded everywhere."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    np_ = len(_NV_PRIOS)
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("demand"))
    by_val = (
        daily.groupBy("demand")
        .agg(
            *[
                F.sum(F.when(F.col("prio") == p, 1).otherwise(0))
                .cast("long")
                .alias(f"c{i}")
                for i, p in enumerate(_NV_PRIOS)
            ]
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    # demand totals thread through bucketed_running's by-product
    # totals exactly like the day counts (the lorenz rv pattern) —
    # no extra aggregation pass, no extra join
    by_val = by_val.select(
        "*",
        *[
            (F.col("demand") * F.col(f"c{i}")).alias(f"d{i}")
            for i in range(np_)
        ],
    )
    out, totals = bucketed_running(
        by_val,
        "demand",
        [f"c{i}" for i in range(np_)] + [f"d{i}" for i in range(np_)],
    )
    sel = out.agg(
        *[
            F.min(
                F.when(
                    F.col(f"run_c{i}")
                    >= F.lit((3 * totals[f"c{i}"] + 3) // 4),
                    F.col("demand"),
                )
            ).alias(f"q{i}")
            for i in range(np_)
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("prio"),
                    F.lit(totals[f"c{i}"]).cast("long").alias("n_days"),
                    F.lit(totals[f"d{i}"]).cast("long").alias(
                        "total_demand"
                    ),
                    F.col(f"q{i}").alias("q_opt"),
                )
                for i, p in enumerate(_NV_PRIOS)
            ]
        )
    )
    return (
        sel.select(rows.alias("r"))
        .select(
            F.col("r.prio").alias("o_orderpriority"),
            F.col("r.n_days").alias("n_days"),
            F.col("r.total_demand").alias("total_demand"),
            (
                F.col("r.total_demand").cast("double") / F.col("r.n_days")
            ).alias("mean_demand"),
            F.lit(0.75).alias("service_level"),
            F.col("r.q_opt").alias("q_opt"),
        )
        .where(F.col("n_days") > 0)
    )


_HURST_SIZES = [8, 16, 32]


@query(
    "pipeline_hurst",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rdec
      FROM orders GROUP BY 1
    ),
    z AS (
      SELECT CAST(FLOOR(CAST(rdec AS DOUBLE) / 1000) AS BIGINT) AS z,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    blocks AS (
      SELECT m.m, (rn - 1) // m.m AS blk, (rn - 1) % m.m AS pos, z
      FROM z, (VALUES (8), (16), (32)) AS m(m)
    ),
    bsum AS (
      SELECT m, blk,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(z) AS BIGINT) AS s,
             CAST(SUM(z * z) AS BIGINT) AS q
      FROM blocks GROUP BY m, blk
    ),
    full_blocks AS (SELECT * FROM bsum WHERE cnt = m),
    walk AS (
      SELECT b.m, b.blk, f.s, f.q,
             SUM(b.m * b.z - f.s) OVER (
               PARTITION BY b.m, b.blk ORDER BY b.pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w
      FROM blocks b JOIN full_blocks f ON f.m = b.m AND f.blk = b.blk
    ),
    per_block AS (
      SELECT m, blk,
             CAST(GREATEST(MAX(w), 0) - LEAST(MIN(w), 0) AS BIGINT) AS r_scaled,
             CAST(MAX(m) * MAX(q) - MAX(s) * MAX(s) AS BIGINT) AS var_scaled
      FROM walk GROUP BY m, blk
    ),
    rs AS (
      SELECT m,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(round(CAST(r_scaled AS DOUBLE)
                                 / sqrt(CAST(var_scaled AS DOUBLE)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_rs
      FROM per_block WHERE var_scaled > 0
      GROUP BY m
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN m = {m} THEN n_blocks END) AS n{m}, "
                   f"MAX(CASE WHEN m = {m} THEN round(log2(mean_rs), 6) END)"
                   f" AS y{m}"
                   for m in _HURST_SIZES)}
      FROM rs
    )
    SELECT {', '.join(f'n{m} AS n_blocks_{m}' for m in _HURST_SIZES)},
           {', '.join(f'y{m} AS log2_rs_{m}' for m in _HURST_SIZES)},
           (y32 - y8) / 2.0 AS hurst
    FROM wide
    WHERE n8 IS NOT NULL AND n16 IS NOT NULL AND n32 IS NOT NULL
    """,
)
def pipeline_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT via rescaled-range analysis (Hurst 1951,
    Mandelbrot & Wallis 1969) on the daily revenue series: the
    long-memory diagnostic beside pipeline_dickey_fuller's unit-root
    gate and pipeline_acf's short-lag correlations — H ≈ 0.5 is a
    memoryless walk, H > 0.5 trending persistence, H < 0.5 mean
    reversion. Trading-day blocks of m ∈ {{8,16,32}}; per block
    R/S = (max−min cumulative deviation)/σ; H = the least-squares
    slope of log2(mean R/S) on log2(m), which over the equally
    spaced {{3,4,5}} collapses to (y₃₂ − y₈)/2.

    Exactness — the m-CANCELLATION identity: with deviations n-scaled
    (D = m·z − S), R_scaled = max W − min W and m²·σ² = m·Σz² − S²
    are BOTH exact longs and R/S = R_scaled/√(m·Σz²−S²) exactly (the
    m's cancel), so each block's R/S is one shared sqrt-division tree
    over exact longs — rounded 6 dp at the block (the term rule: the
    cross-block mean is an order-free aggregate) and decimal-meaned;
    log2 rounds at the transcendental (libm rule) and H is exact
    decimal arithmetic on the rounded y's. The walk extremes bracket
    0 (GREATEST/LEAST vs 0 — W ends at 0, and the textbook R takes
    max(W,0)−min(W,0)). Zero-variance blocks are excluded in both
    engines; emits only when all three sizes have a full block.

    Scale: one corpus pass to daily totals; everything after lives on
    the days-bounded series (rank via ``bucketed_running``, the walk
    in ≤32-row partitioned windows — no global window)."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rdec"))
    daily = daily.select(
        F.floor(F.col("rdec").cast("double") / 1000).cast("long").alias("z"),
        F.datediff("day", F.lit("1970-01-01")).alias("day_i"),
        F.lit(1).alias("one"),
    )
    ranked, _ = bucketed_running(daily, "day_i", ["one"])
    zdf = ranked.select("z", F.col("run_one").cast("long").alias("rn"))
    sizes = spark.createDataFrame([(m,) for m in _HURST_SIZES], "m long")
    blocks = zdf.join(F.broadcast(sizes)).select(
        "m", "z",
        ((F.col("rn") - 1) / F.col("m")).cast("long").alias("blk"),
        ((F.col("rn") - 1) % F.col("m")).alias("pos"),
    ).localCheckpoint(eager=True)  # days-bounded; feeds sums + walk
    bsum = blocks.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q"),
    )
    full = bsum.where(F.col("cnt") == F.col("m")).select("m", "blk", "s", "q")
    from pyspark.sql import Window

    w_win = (
        Window.partitionBy("m", "blk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = blocks.join(F.broadcast(full), ["m", "blk"]).select(
        "m", "blk", "s", "q",
        F.sum(F.col("m") * F.col("z") - F.col("s")).over(w_win).alias("w"),
    )
    per_block = walk.groupBy("m", "blk").agg(
        (
            F.greatest(F.max("w"), F.lit(0).cast("long"))
            - F.least(F.min("w"), F.lit(0).cast("long"))
        ).cast("long").alias("r_scaled"),
        (F.max("m") * F.max("q") - F.max("s") * F.max("s"))
        .cast("long")
        .alias("var_scaled"),
    )
    rs = (
        per_block.where(F.col("var_scaled") > 0)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            (
                F.sum(
                    F.round(
                        F.col("r_scaled").cast("double")
                        / F.sqrt(F.col("var_scaled").cast("double")),
                        6,
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_rs"),
        )
    )
    wide = rs.agg(
        *[
            c
            for m in _HURST_SIZES
            for c in (
                F.max(F.when(F.col("m") == m, F.col("n_blocks"))).alias(
                    f"n{m}"
                ),
                F.max(
                    F.when(F.col("m") == m, F.round(F.log2("mean_rs"), 6))
                ).alias(f"y{m}"),
            )
        ]
    )
    return wide.where(
        F.col("n8").isNotNull()
        & F.col("n16").isNotNull()
        & F.col("n32").isNotNull()
    ).select(
        *[F.col(f"n{m}").alias(f"n_blocks_{m}") for m in _HURST_SIZES],
        *[F.col(f"y{m}").alias(f"log2_rs_{m}") for m in _HURST_SIZES],
        ((F.col("y32") - F.col("y8")) / 2.0).alias("hurst"),
    )


@query(
    "pipeline_little_law",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('day', o.o_orderdate) AS DATE) AS od,
             CAST(MAX(date_trunc('day', l.l_shipdate)) AS DATE) AS sd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, 2
    ),
    win AS (
      SELECT DATE '1997-01-01' AS w0, DATE '1997-12-31' AS w1,
             CAST(365 AS BIGINT) AS wdays
    ),
    occ AS (
      SELECT CAST(SUM(GREATEST(
               date_diff('day', GREATEST(s.od, w.w0), LEAST(s.sd, w.w1)) + 1,
               0)) AS BIGINT) AS occ_days
      FROM spans s, win w
      WHERE s.od <= w.w1 AND s.sd >= w.w0
    ),
    arr AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_arrivals,
             CAST(SUM(date_diff('day', s.od, s.sd) + 1) AS BIGINT)
               AS arr_days
      FROM spans s, win w
      WHERE s.od BETWEEN w.w0 AND w.w1
    )
    SELECT w.wdays AS window_days,
           a.n_arrivals,
           CAST(o.occ_days AS DOUBLE) / w.wdays AS l_avg_open,
           CAST(a.n_arrivals AS DOUBLE) / w.wdays AS lambda_per_day,
           CAST(a.arr_days AS DOUBLE) / a.n_arrivals AS w_mean_days,
           CAST(o.occ_days AS DOUBLE) / a.arr_days AS little_ratio
    FROM occ o, arr a, win w
    WHERE a.n_arrivals > 0
    """,
)
def pipeline_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LITTLE'S LAW audit (Little 1961, L = λW) over the 1997
    fulfillment window: average open orders per day (L, from clamped
    interval occupancy — an order is open from o_orderdate through
    its LAST ship day), arrival rate (λ, 1997 arrivals/365) and mean
    time-in-system of those arrivals (W, inclusive days). On a
    TRUNCATED window the identity holds only under stationarity, so
    little_ratio = L/(λW) = occupancy_days/arrival_days quantifies
    edge/nonstationarity effects — the queueing sanity check beside
    pipeline_open_orders_per_day's per-day curve (≈ 1 healthy;
    drifting says the window bites in-flight seasonality). On
    complete data with matching conventions the ratio is exactly 1
    by telescoping — the truncation is what makes it informative.

    Determinism: every ingredient (clamped overlaps, inclusive
    durations, counts) is an exact integer-day sum; the four emitted
    measures are single divisions of exact longs, unrounded.

    Scale: one join + groupBy to per-order spans, then two
    global 1-row aggregates (no spine explode — occupancy sums the
    CLOSED-FORM clamped overlap per order, the open_orders lesson
    generalized); output is O(1)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("od"),
        )
        .agg(
            F.max(F.date_trunc("day", F.col("l_shipdate")).cast("date")).alias(
                "sd"
            )
        )
        .localCheckpoint(eager=True)  # feeds both window aggregates
    )
    w0, w1 = F.lit("1997-01-01").cast("date"), F.lit("1997-12-31").cast("date")
    occ = spans.where((F.col("od") <= w1) & (F.col("sd") >= w0)).agg(
        F.sum(
            F.greatest(
                F.datediff(F.least(F.col("sd"), w1), F.greatest(F.col("od"), w0))
                + 1,
                F.lit(0),
            )
        )
        .cast("long")
        .alias("occ_days")
    )
    arr = spans.where(F.col("od").between(w0, w1)).agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.sum(F.datediff(F.col("sd"), F.col("od")) + 1)
        .cast("long")
        .alias("arr_days"),
    )
    return (
        occ.join(F.broadcast(arr))
        .where(F.col("n_arrivals") > 0)
        .select(
            F.lit(365).cast("long").alias("window_days"),
            "n_arrivals",
            (F.col("occ_days").cast("double") / 365).alias("l_avg_open"),
            (F.col("n_arrivals").cast("double") / 365).alias(
                "lambda_per_day"
            ),
            (F.col("arr_days").cast("double") / F.col("n_arrivals")).alias(
                "w_mean_days"
            ),
            (F.col("occ_days").cast("double") / F.col("arr_days")).alias(
                "little_ratio"
            ),
        )
    )


@query(
    "pipeline_eoq",
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d_units
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    )
    SELECT brand, d_units,
           sqrt(2.0 * d_units * 100.0 / 2.0) AS eoq_units,
           CAST(d_units AS DOUBLE) / sqrt(2.0 * d_units * 100.0 / 2.0)
             AS orders_per_period,
           sqrt(2.0 * d_units * 100.0 * 2.0) AS period_cost
    FROM demand
    WHERE d_units > 0
    """,
)
def pipeline_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECONOMIC ORDER QUANTITY (Harris 1913) per part brand: the
    deterministic-demand stocking rule beside pipeline_newsvendor's
    stochastic fractile — EOQ = √(2DS/H) with ordering cost S = 100
    and holding cost H = 2 per unit-period (short literals), plus
    the implied order cadence D/EOQ and the optimal total cost
    √(2DSH) (at the optimum, ordering and holding costs are equal —
    the closed form the n_orders·S + q/2·H curve minimizes to).

    Determinism: per-brand demand is an exact BIGINT quantity sum
    (TPC-H quantities are integral); every emitted measure is one
    shared IEEE sqrt/division tree over the exact-long cast with
    short exact literals — unrounded.

    Scale: one broadcast-dim join + groupBy(brand) — sums all the
    way down; output is O(brands)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d_units"))
        .where(F.col("d_units") > 0)
    )
    eoq = F.sqrt(2.0 * F.col("d_units") * 100.0 / 2.0)
    return demand.select(
        "brand", "d_units",
        eoq.alias("eoq_units"),
        (F.col("d_units").cast("double") / eoq).alias("orders_per_period"),
        F.sqrt(2.0 * F.col("d_units") * 100.0 * 2.0).alias("period_cost"),
    )


_ABC_ERA_SQL = """
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                           AS DECIMAL(18,4)) * 10000) AS BIGINT) AS units
      FROM lineitem WHERE l_shipdate {cond}
      GROUP BY l_partkey
"""

_ABC_CLASS_SQL = """
      SELECT v.units,
             CASE WHEN CAST(v.cum AS DOUBLE) / t.total <= 0.8 THEN 'A'
                  WHEN CAST(v.cum AS DOUBLE) / t.total <= 0.95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM (
        SELECT units,
               SUM(units * n) OVER (ORDER BY units DESC
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT units, COUNT(*) AS n FROM {era} GROUP BY units)
      ) v, (SELECT CAST(SUM(units) AS DOUBLE) AS total FROM {era}) t
"""


@query(
    "pipeline_abc_migration",
    oracle=f"""
    WITH era1 AS ({_ABC_ERA_SQL.format(cond="<  TIMESTAMP '1998-01-01'")}),
    era2 AS ({_ABC_ERA_SQL.format(cond=">= TIMESTAMP '1998-01-01'")}),
    cls1 AS ({_ABC_CLASS_SQL.format(era='era1')}),
    cls2 AS ({_ABC_CLASS_SQL.format(era='era2')}),
    p1 AS (SELECT e.l_partkey, c.cls FROM era1 e JOIN cls1 c USING (units)),
    p2 AS (SELECT e.l_partkey, c.cls FROM era2 e JOIN cls2 c USING (units)),
    m AS (
      SELECT COALESCE(p1.cls, '-') AS class_before,
             COALESCE(p2.cls, '-') AS class_after
      FROM p1 FULL OUTER JOIN p2 ON p1.l_partkey = p2.l_partkey
    ),
    agg AS (
      SELECT class_before, class_after,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM m GROUP BY 1, 2
    )
    SELECT class_before, class_after, n_parts,
           class_before <> class_after AS moved
    FROM agg
    """,
)
def pipeline_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC CLASS MIGRATION matrix across the 1998 era split: every
    part's Pareto class (A ≤ 80% cumulative revenue share, B ≤ 95%,
    C rest) computed independently for pre-1998 and 1998+ shipments,
    then the before×after transition counts with '-' for parts absent
    from an era — the inventory-DYNAMICS readout pipeline_pareto_abc's
    static snapshot can't give (a B→A climber and an A→C faller need
    opposite stocking responses; the '-'→A column is new-product
    velocity).

    Exactness: revenues quantize per-row (4-dp round then exact
    decimal — the dsum recipe) to integer 10⁻⁴-units; classes assign
    at the DISTINCT-VALUE grain with the tie-INCLUSIVE cumulative
    (every part of equal revenue shares one class — no arbitrary
    tie split to mirror), so the share is a ratio of exact longs and
    each class boundary reads one agreed double against short
    literals. Both eras' cumulatives ride ``bucketed_running`` over
    the distinct revenue values (DESC via negated order key — no
    global window).

    Scale: two filtered corpus passes to per-part revenue (the date
    predicate pushes to the scan), two distinct-value cumulatives,
    one full-outer join on partkey; output ≤ 16 rows."""
    from osm_airflow_spark.bucketing import bucketed_running

    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-01-01").cast("timestamp")

    def era_classes(cond):
        rev = (
            li.where(cond)
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4,
                    ).cast("decimal(18,4)")
                    * 10000
                )
                .cast("long")
                .alias("units")
            )
        )
        by_val = (
            rev.groupBy("units")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "units", "n",
                (-F.col("units")).alias("neg_units"),
                (F.col("units") * F.col("n")).alias("contrib"),
            )
            .localCheckpoint(eager=True)  # distinct-value-bounded
        )
        out, totals = bucketed_running(by_val, "neg_units", ["contrib"])
        total = totals["contrib"]
        share = F.col("run_contrib").cast("double") / F.lit(total).cast(
            "long"
        )
        cls = out.select(
            "units",
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("cls"),
        )
        return rev.join(cls, "units").select("l_partkey", "cls")

    p1 = era_classes(F.col("l_shipdate") < cut).select(
        F.col("l_partkey").alias("k1"), F.col("cls").alias("c1")
    )
    p2 = era_classes(F.col("l_shipdate") >= cut).select(
        F.col("l_partkey").alias("k2"), F.col("cls").alias("c2")
    )
    m = p1.join(p2, F.col("k1") == F.col("k2"), "full_outer").select(
        F.coalesce(F.col("c1"), F.lit("-")).alias("class_before"),
        F.coalesce(F.col("c2"), F.lit("-")).alias("class_after"),
    )
    return (
        m.groupBy("class_before", "class_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .select(
            "class_before", "class_after", "n_parts",
            (F.col("class_before") != F.col("class_after")).alias("moved"),
        )
    )


@query(
    "pipeline_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.c AS n_orders,
           CAST(b.total AS DOUBLE) / b.n_days AS center_line,
           CAST(b.total AS DOUBLE) / b.n_days
             + 3.0 * sqrt(CAST(b.total AS DOUBLE) / b.n_days) AS ucl,
           greatest(CAST(b.total AS DOUBLE) / b.n_days
             - 3.0 * sqrt(CAST(b.total AS DOUBLE) / b.n_days), 0.0) AS lcl,
           d.c > CAST(b.total AS DOUBLE) / b.n_days
             + 3.0 * sqrt(CAST(b.total AS DOUBLE) / b.n_days)
           OR d.c < greatest(CAST(b.total AS DOUBLE) / b.n_days
             - 3.0 * sqrt(CAST(b.total AS DOUBLE) / b.n_days), 0.0)
             AS out_of_control
    FROM daily d, base b
    """,
)
def pipeline_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHEWHART c-CHART (Shewhart 1931) over daily order counts: the
    Poisson count-control chart — center line c̄, control limits
    c̄ ± 3√c̄ (LCL floored at 0), and the out-of-control flag per
    day. The MEMORYLESS alarm beside the engine's sequential
    monitors (cusum/page_hinkley catch small persistent shifts;
    the Shewhart chart catches single large excursions — SPC runs
    both). At 100 TB the same plan monitors any keyed count stream.

    Determinism: counts are exact; c̄ rides the broadcast 1-row
    aggregate as one exact-long division, the limits are one shared
    sqrt tree over that agreed double, and the flag compares exact
    integer counts against the identical limit doubles — all
    unrounded.

    Scale: one groupBy(day) pass + a broadcast scalar; output is
    days-bounded."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    base = daily.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    j = daily.join(F.broadcast(base))
    cl = F.col("total").cast("double") / F.col("n_days")
    ucl = cl + 3.0 * F.sqrt(cl)
    lcl = F.greatest(cl - 3.0 * F.sqrt(cl), F.lit(0.0))
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("n_orders"),
        cl.alias("center_line"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((F.col("c") > ucl) | (F.col("c") < lcl)).alias("out_of_control"),
    )


@query(
    "pipeline_xmr_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x_c
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT day, x_c, LAG(x_c) OVER (ORDER BY day) AS px
      FROM daily
    ),
    mr AS (
      SELECT day, x_c, ABS(x_c - px) AS mr_c
      FROM lagged WHERE px IS NOT NULL
    ),
    base AS (
      SELECT CAST(SUM(x_c) AS BIGINT) AS sx,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mr_c) AS BIGINT) AS smr
      FROM mr
    )
    SELECT strftime(m.day, '%Y-%m-%d') AS day,
           CAST(m.x_c AS DOUBLE) / 100.0 AS x,
           CAST(m.mr_c AS DOUBLE) / 100.0 AS moving_range,
           CAST(b.sx AS DOUBLE) / b.n / 100.0 AS center_line,
           (CAST(b.sx AS DOUBLE) / b.n
            + 2.66 * (CAST(b.smr AS DOUBLE) / b.n)) / 100.0 AS ucl,
           (CAST(b.sx AS DOUBLE) / b.n
            - 2.66 * (CAST(b.smr AS DOUBLE) / b.n)) / 100.0 AS lcl,
           m.x_c > CAST(b.sx AS DOUBLE) / b.n
                    + 2.66 * (CAST(b.smr AS DOUBLE) / b.n)
           OR m.x_c < CAST(b.sx AS DOUBLE) / b.n
                       - 2.66 * (CAST(b.smr AS DOUBLE) / b.n)
             AS out_of_control
    FROM mr m, base b
    """,
)
def pipeline_xmr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR INDIVIDUALS chart (Shewhart's I-MR) over daily revenue:
    each day's total against limits x̄ ± 2.66·M̄R (the moving-range
    estimate of short-term variation — 2.66 = 3/d₂ at n=2) — the
    CONTINUOUS-variable control chart beside pipeline_control_chart's
    Poisson counts; together they are the standard SPC pair. Days
    after the first emit (the anchored MR convention).

    Determinism: daily totals and moving ranges are exact integer
    CENTS (decimal sums, lag via the bucket-offset rank join — the
    OBV shape); x̄ and M̄R ride the broadcast 1-row aggregate as
    exact-long divisions; limits are one shared tree over those
    agreed doubles with the short literal 2.66, and the flag compares
    through the IDENTICAL expression text in both engines (the
    comparison is on the same tree, so no rounding boundary) —
    all unrounded.

    Scale: one groupBy(day) pass + days-bounded control plane."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("x_c")
    )
    daily = daily.select(
        "*", F.datediff("day", F.lit("1970-01-01")).alias("day_i"),
        F.lit(1).alias("one"),
    )
    ranked, _ = bucketed_running(daily, "day_i", ["one"])
    d1 = ranked.select(
        "day", "x_c", F.col("run_one").cast("long").alias("rn")
    )
    prev = d1.select((F.col("rn") + 1).alias("rn"), F.col("x_c").alias("px"))
    mr = d1.join(F.broadcast(prev), "rn").select(
        "day", "x_c", F.abs(F.col("x_c") - F.col("px")).alias("mr_c")
    )
    base = mr.agg(
        F.sum("x_c").cast("long").alias("sx"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mr_c").cast("long").alias("smr"),
    )
    j = mr.join(F.broadcast(base))
    xbar = F.col("sx").cast("double") / F.col("n")
    mrbar = F.col("smr").cast("double") / F.col("n")
    ucl_c = xbar + 2.66 * mrbar  # cents scale: compared against x_c
    lcl_c = xbar - 2.66 * mrbar
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("x_c").cast("double") / 100.0).alias("x"),
        (F.col("mr_c").cast("double") / 100.0).alias("moving_range"),
        (xbar / 100.0).alias("center_line"),
        ((xbar + 2.66 * mrbar) / 100.0).alias("ucl"),
        ((xbar - 2.66 * mrbar) / 100.0).alias("lcl"),
        ((F.col("x_c") > ucl_c) | (F.col("x_c") < lcl_c)).alias(
            "out_of_control"
        ),
    )
