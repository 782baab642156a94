"""Training-data curation, end to end on one page.

The LLM-data side of the engine as a user runs it: score quality →
drop exact and near duplicates → decontaminate against a benchmark →
assign leakage-proof splits → pack sequences → report the mixture.
Every hop is a registered operator (COVERAGE.md §2.K keys); this
script chains them over the bundled fixtures:

    python examples/llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline")
    q = all_queries()

    # 1. Quality gate — Gopher-style heuristics, then the learned logit
    quality = q["llm_quality_score"](spark, sf_dir)
    kept = quality.where(F.col("quality_score") >= 0.5)
    print(f"== quality gate: {kept.count()}/{quality.count()} docs pass")

    # 2. Dedup — exact survivors, then near-dup candidate volume
    exact = q["llm_dedup_exact"](spark, sf_dir)
    print(f"== exact dedup survivors: {exact.count()}")
    near = q["llm_dedup_near"](spark, sf_dir)
    print(f"== near-dup pairs flagged: {near.count()}")

    # 3. Decontamination — benchmark n-gram screen
    contam = q["llm_contamination_check"](spark, sf_dir)
    dirty = contam.where(F.col("contamination_ratio") > 0.1)
    print(f"== contaminated docs (>10% bench 3-grams): {dirty.count()}")

    # 4. Splits + packing — content-hash split, then context packing
    splits = q["llm_split_assign"](spark, sf_dir)
    splits.groupBy("split").count().orderBy("split").show()
    packed = q["llm_pack_sequences"](spark, sf_dir)
    print(f"== packed sequences: {packed.count()}")

    # 5. Mixture report — temperature-0.7 domain weights
    print("== domain mixture (alpha=0.7)")
    q["llm_domain_mix"](spark, sf_dir).orderBy(F.col("mix_weight").desc()).show(5)

    # 6. Or: the whole curation pass as ONE Catalyst plan
    report = q["llm_corpus_curation"](spark, sf_dir)
    print("== composed curation report (single plan)")
    report.show()


if __name__ == "__main__":
    main()
