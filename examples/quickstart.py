"""Quickstart: the end-to-end user journey on one page.

A PgOSM-Flex/PostGIS user switching to this engine does, in order:
build a session → point at data → query with SQL or DataFrames →
run the training-data ops → publish a dated snapshot. This script is
that journey, runnable as-is against the bundled fixtures:

    python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.api import register_views, sql
from osm_airflow_spark.io import read_snapshot, write_snapshot
from osm_airflow_spark.llm.dedup import minhash_lsh_pairs
from osm_airflow_spark.llm.similarity import cosine_expr
from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")

    # 1. SQL surface — the PostGIS-style entry point
    register_views(spark, sf_dir)
    top_regions = sql(
        spark,
        """
        SELECT r_name, COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY n_customers DESC
        """,
    )
    print("== customers per region")
    top_regions.show()

    # 2. The operator registry — every SURVEY §2 capability by key
    queries = all_queries()
    print(f"== registry: {len(queries)} operators available")
    queries["agg_groupby"](spark, sf_dir).show(3)

    # 3. Training-data ops: near-dup candidates + a similarity probe
    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    print(f"== near-duplicate candidate pairs: {pairs.count()}")

    from pyspark.sql import functions as F

    emb = spark.table("embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    knn = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", cosine_expr("embedding", "qvec").alias("cos"))
        .orderBy(F.col("cos").desc())
        .limit(3)
    )
    print("== 3-NN of vector 0")
    knn.show()

    # 4. Dated snapshot publish + pruned read-back (the pg_dump analogue)
    with tempfile.TemporaryDirectory() as d:
        write_snapshot(top_regions, f"{d}/layers/regions", "2024-07-25")
        back = read_snapshot(spark, f"{d}/layers/regions", "2024-07-25")
        print(f"== snapshot roundtrip: {back.count()} rows")


if __name__ == "__main__":
    main()
