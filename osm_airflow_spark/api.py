"""SQL query surface (SURVEY.md §3.3).

The reference's users ultimately query PostGIS with SQL
(/root/reference/README.md:70,76); the engine serves the same
interface from the same session that built the tables: register the
snapshot/fixture tables as views, then ``spark.sql`` — Catalyst
produces identical plans for SQL and DataFrame formulations, so the
whole §2 operator surface is reachable from either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osm_airflow_spark.io import TABLES, load_table
from osm_airflow_spark.session import configure_runtime


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every fixture/layer table as a temp view (the
    engine-side analogue of the loaded PostGIS database)."""
    configure_runtime(spark)
    names = []
    for name in TABLES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run SQL against the registered views (registering first if a
    data dir is given). The user-facing query entry point."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)
