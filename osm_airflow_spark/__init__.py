"""osm_airflow_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
victorborda/osm-airflow (an Airflow DAG delegating OSM ETL to
osm2pgsql/PgOSM-Flex/PostGIS — see /root/reference/osm_etl.py:40-93
and README.md:68-103). The reference splits transform (container)
from query (PostGIS); this engine serves both with one DataFrame/SQL
API, plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale
training-data work.

Layout:
  session    — SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
  io         — parquet scans, dated partitioned writes, JDBC publish
  registry   — query-key registry binding each operator to its DuckDB oracle
  operators/ — relational operators (projection, joins, aggregates,
               windows, set ops, time windows)
  functions/ — scalar function surface (string/regex/date/math/map/
               json/array/hash/geo)
  llm/       — training-data pipeline ops (dedup, similarity, text,
               multimodal)
  plans/     — composed pipelines (flagship query, OSM domain layer)
  sources/   — source connectors (parquet, jdbc, OSM PBF — pure-
               Python wire decoder/sink, blob-parallel ingest)
  streaming/ — Structured Streaming ports of the time-window ops
"""

__version__ = "0.1.0"
