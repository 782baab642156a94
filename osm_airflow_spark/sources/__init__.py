"""Source connectors (SURVEY.md §2.B)."""

from osm_airflow_spark.sources import parquet  # noqa: F401
