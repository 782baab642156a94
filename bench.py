"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed via the same registry the driver checks; the
timed action is a full materialization (count via write-less
``df.toPandas`` would bias toward small results, so we use
``df.count()`` after a no-op cache-free plan — the dominant cost is
the scan/shuffle/agg pipeline itself).

Methodology (r9): each query runs THREE passes in one JVM and
reports the per-query MEDIAN; ``value`` is the sum of medians. The
r8 verdict showed one-shot numbers whipsaw ±35% on queries whose
code did not change (JIT/codegen/GC landing noise), making
round-over-round deltas meaningless — the median inside one process
is stable to a few percent (BENCH_WARM.md). The first pass is kept
verbatim in ``one_shot`` / ``one_shot_total`` for continuity with
BENCH_r01–r08, which were single-pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_airflow_spark.registry import all_queries  # noqa: E402
from osm_airflow_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_revenue_by_region",
    "pipeline_pricing_summary",
    "pipeline_shipping_priority",
    "pipeline_local_supplier_volume",
    "pipeline_top_returning_customers",
    "join_multiway",
    "agg_groupby",
    "agg_collect_ordered",
    "win_dedup_latest",
    "win_topk_group",
    "join_asof",
    "set_union_distinct",
    "win_time_session",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_sim_topk",
    "llm_text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    registry = all_queries()
    queries = {k: registry[k] for k in HEADLINE if k in registry}

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch overheads
    next(iter(queries.values()))(spark, sf_dir).count()

    passes: list[dict[str, float]] = []
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    for _ in range(n_passes):
        timings: dict[str, float] = {}
        for key, fn in queries.items():
            # drain garbage accumulated by EARLIER queries so a major
            # GC pause can't bill to whichever later query it lands in
            # (the r4 tail-of-list drift on the llm_dedup_* keys;
            # plans and isolated timings were unchanged — SCALE.md r5)
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).count()
            timings[key] = round(time.time() - t0, 3)
        passes.append(timings)

    import statistics

    # statistics.median averages the middle two for even pass counts
    # (the [n // 2] pick would report the upper one — biased high)
    median = {
        k: round(statistics.median(p[k] for p in passes), 3) for k in queries
    }
    total = round(sum(median.values()), 3)
    one_shot = passes[0]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": median,
                "sf": sf,
                "passes": n_passes,
                "one_shot": one_shot,
                "one_shot_total": round(sum(one_shot.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
