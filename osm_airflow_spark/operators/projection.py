"""Projection / filter operators (SURVEY.md §2.C).

The reference's "flex" layer routes OSM elements into thematic tables
by tag predicates and emits only declared, typed columns
(/root/reference/README.md:74,93). Those semantics are C1–C5:
predicate filters, compound predicates, column pruning, map→typed-
column promotion, and computed columns.

Scale notes: all five are narrow, shuffle-free operators. Filters and
projections push to the Parquet reader (visible as ``PushedFilters``
/ ``ReadSchema`` in the physical plan), so at 100 TB the scan reads
only matching row groups and declared columns. JSON promotion (C4)
stays JVM-side via ``get_json_object`` — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query

LINEITEM_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — single-predicate filter; the core of flex table routing
    ('keep elements whose tags select this layer')."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND (o_totalprice BETWEEN 50000 AND 200000)
      AND NOT (o_orderpriority = '5-LOW')
      AND o_custkey IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — AND/OR/NOT/IN/BETWEEN/IS NULL combination."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & ~(F.col("o_orderpriority") == "5-LOW")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "project_columns",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — emit only the layer's declared columns (column pruning
    reaches the Parquet reader: ReadSchema lists exactly these)."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query(
    "project_map_promote",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           event_type
    FROM events
    """,
)
def project_map_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — promote a key from the free-form payload to a typed
    column, keeping the residual (the reference promotes selected OSM
    tag keys to typed columns, README.md:80-82,93)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        "event_type",
    )


@query(
    "project_computed",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
           CAST(l_quantity AS BIGINT) AS qty_int,
           UPPER(l_returnflag) AS flag_upper
    FROM lineitem
    """,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — computed/derived columns (per-row IEEE double arithmetic
    is deterministic, so exact hash-match needs no rounding)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.upper("l_returnflag").alias("flag_upper"),
    )
