"""Flagship end-to-end query: revenue by region for a snapshot window.

The smallest composition that proves the whole stack (SURVEY.md §7.1
step 2): scan → filter → multi-way join → aggregate → sort. It is the
relational analogue of the reference's end state — thematic tables
"amenable to efficient querying" (/root/reference/README.md:70) —
expressed as one declarative plan Catalyst can optimize end to end.

Scale notes: `nation`/`region` are broadcast (25/5 rows — same shape
as OSM's region dimension), so the only shuffles are the two big-side
equi-joins and the final tiny aggregation. At 100 TB, lineitem⋈orders
is the dominant shuffle; with both sides bucketed by orderkey at write
time it becomes a zero-shuffle sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import dsum, query, sql_dsum


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .groupBy("r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name")
    )


FLAGSHIP_ORACLE = f"""
SELECT r_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY r_name
ORDER BY r_name
"""

query("flagship_revenue_by_region", FLAGSHIP_ORACLE)(revenue_by_region)
