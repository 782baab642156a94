"""Corpus-health report, end to end on one page.

The pre-training data-quality dashboard a curation team reviews per
crawl snapshot, chained from registered operators (COVERAGE.md §2.K
keys) over the bundled fixtures:

  distribution   Zipf-exponent fit (llm_zipf_fit) — natural text has
                 s ~ 1; templated/looping text bends the power law
  diversity      distinct-bigram ratio (llm_distinct_ngrams) and
                 char entropy (llm_char_entropy) extremes
  drift          per-source Jensen-Shannon divergence vs the corpus
                 mix (llm_corpus_divergence)
  duplication    winnowing passage-overlap pairs
                 (llm_dedup_fingerprint) beside exact dups
  embeddings     PCA-whitened 2-D projection spread (llm_embed_pca)

    python examples/corpus_health.py [sf_dir]
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
    spark = get_spark("corpus-health")
    q = all_queries()

    z = q["llm_zipf_fit"](spark, sf_dir).first()
    verdict = "zipfian (natural-ish)" if z["zipf_exponent"] > 0.7 else \
        "NOT zipfian (templated/synthetic mix)"
    print(f"== word distribution: {z['n_words']} types, "
          f"s={z['zipf_exponent']:.3f} R2={z['r_squared']:.3f} -> {verdict}")

    div = q["llm_distinct_ngrams"](spark, sf_dir)
    low = div.orderBy("distinct_ratio").limit(3).collect()
    print("== least diverse docs (distinct-2 ratio):")
    for r in low:
        print(f"   doc {r['doc_id']:>6}  ratio {r['distinct_ratio']:.3f}")

    ent = q["llm_char_entropy"](spark, sf_dir)
    stats = ent.agg(
        F.min("entropy").alias("lo"), F.max("entropy").alias("hi")
    ).first()
    print(f"== char entropy range: {stats['lo']:.3f} .. {stats['hi']:.3f}")

    print("== per-source profile (worst mean quality first, top 5):")
    for r in (
        q["llm_source_profile"](spark, sf_dir)
        .orderBy("mean_quality", "source")
        .limit(5)
        .collect()
    ):
        print(f"   {r['source']:<8} docs {r['n_docs']:>5}  "
              f"quality {r['mean_quality']:.3f}  "
              f"dup-free {r['distinct_ratio']:.3f}  "
              f"mean len {r['mean_doc_len']:.1f}")

    print("== per-source drift (JS divergence vs corpus mix, top 5):")
    for r in (
        q["llm_corpus_divergence"](spark, sf_dir)
        .orderBy(F.col("js_divergence").desc())
        .limit(5)
        .collect()
    ):
        print(f"   {r['source']:<8} js {r['js_divergence']:.5f} "
              f"({r['n_tokens']} tokens)")

    fp = q["llm_dedup_fingerprint"](spark, sf_dir)
    n_pairs = fp.count()
    top = fp.orderBy(F.col("shared_fp").desc(), "doc_a", "doc_b").limit(3).collect()
    print(f"== passage-overlap pairs (winnowing, df<=25, shared>=5): {n_pairs}")
    for r in top:
        print(f"   docs {r['doc_a']:>5} ~ {r['doc_b']:>5}  "
              f"shared fingerprints {r['shared_fp']}")

    leaks = q["llm_split_leakage"](spark, sf_dir).collect()
    print(f"== split leakage (cross-split near-dups, jaccard >= 0.5): "
          f"{len(leaks)} pairs")
    for r in leaks[:3]:
        print(f"   doc {r['doc_a']} ({r['split_a']}) ~ doc {r['doc_b']} "
              f"({r['split_b']})  jaccard {r['jaccard']:.3f}")

    pcs = q["llm_embed_pca"](spark, sf_dir)
    spread = pcs.agg(
        F.min("pc1").alias("lo1"), F.max("pc1").alias("hi1"),
        F.min("pc2").alias("lo2"), F.max("pc2").alias("hi2"),
    ).first()
    print("== whitened embedding spread: "
          f"pc1 [{spread['lo1']:.2f}, {spread['hi1']:.2f}]  "
          f"pc2 [{spread['lo2']:.2f}, {spread['hi2']:.2f}]")
    print("== done")


if __name__ == "__main__":
    main()
