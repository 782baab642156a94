"""B2 — Parquet table scan (SURVEY.md §2.B row B2).

The engine's canonical source: self-describing columnar files, with
Catalyst pushing predicates to row-group stats and pruning columns at
the reader (`PushedFilters` / `ReadSchema` in the physical plan).
Reference counterpart: the elements produced from a PBF extract
(/root/reference/osm_etl.py:54-56) land as Parquet once, then every
downstream query is a pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@query(
    "scan_parquet",
    oracle="SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
    "FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity scan of the fact table — row count, schema and
    every value must round-trip through the reader unchanged."""
    return load_table(spark, sf_dir, "lineitem").select(
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
