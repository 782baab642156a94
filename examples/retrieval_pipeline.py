"""Hybrid retrieval, end to end on one page.

The retrieval stack a RAG / data-curation system runs, chained from
registered operators (COVERAGE.md §2.K keys) over the bundled
fixtures:

  lexical arm   BM25 top-k (llm_bm25_topk)
  dense arm     embedding-cosine top-k — exact brute force
                (llm_sim_topk) AND the persisted IVF index
                (build once, probe with partition pruning)
  fusion        reciprocal rank fusion (llm_hybrid_rrf)
  scale paths   JL projection (llm_embed_project) and the ANN family
                (LSH / IVF / PQ / IVF-RQ / NN-Descent graph), each
                recall-floor-tested against the exact arm

    python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-pipeline")
    q = all_queries()

    print("== lexical arm: BM25 top-5 for query ['table','spark','merge']")
    for r in q["llm_bm25_topk"](spark, sf_dir).limit(5).collect():
        print(f"   doc {r['doc_id']:>6}  bm25 {r['bm25']:.4f}")

    print("== dense arm: exact cosine top-5 vs query vector 0")
    for r in q["llm_sim_topk"](spark, sf_dir).limit(5).collect():
        print(f"   vec {r['vec_id']:>6}  cos {r['cos_sim']:.4f}")

    print("== dense arm at scale: persisted IVF index (probe prunes partitions)")
    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.llm.similarity import build_ivf_index, query_ivf_index

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.where("vec_id = 0").select("embedding").first()[0]
    with tempfile.TemporaryDirectory() as d:
        build_ivf_index(e, d, k=4, iters=2)
        for r in query_ivf_index(spark, d, qvec, nprobe=2, topk=5).collect():
            print(f"   vec {r['vec_id']:>6}  cos {r['cos_sim']:.4f}")

    print("== incremental BM25 state: posting stats built batch-by-batch,")
    print("   then SCORED from the index (bit-identical to the inline key)")
    from pyspark.sql import functions as F

    from osm_airflow_spark.llm.text import (
        bm25_from_index,
        ingest_posting_batch,
        read_posting_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory() as d:
        ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 0), 0, d)
        ingest_posting_batch(docs.where(F.col("doc_id") % 2 == 1), 1, d)
        words, corpus = read_posting_stats(spark, d)
        c = corpus.first()
        print(f"   corpus: N={c['n_docs']} sum_dl={c['sum_dl']}")
        for r in (
            words.where(F.col("word").isin("table", "spark", "merge"))
            .orderBy("word")
            .collect()
        ):
            print(f"   word {r['word']:<6} df {r['df']:>5}  tf {r['tf']:>6}")
        top = (
            bm25_from_index(docs, d)
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(5)
            .collect()
        )
        for r in top:
            print(f"   doc {r['doc_id']:>6}  bm25 {r['bm25']:.4f}  (from index)")

    print("== batch serving (r10): every held-out query gets its top-1")
    print("   in ONE plan — IVF route (llm_sim_topk_batch):")
    batch = {r["query_id"]: r for r in q["llm_sim_topk_batch"](spark, sf_dir)
             .where(F.col("rank") == 1).collect()}
    for qid in sorted(batch)[:4]:
        r = batch[qid]
        print(f"   query {qid:>3}  top1 vec {r['vec_id']:>5}  cos {r['cos_sim']:.4f}")
    print("   graph route (query_graph_index_batch vs persisted graph index):")
    from osm_airflow_spark.llm.similarity import (
        build_graph_index,
        query_graph_index_batch,
    )

    e = load_table(spark, sf_dir, "embeddings")
    with tempfile.TemporaryDirectory() as gd:
        build_graph_index(e, gd, k=8, rounds=2, n_buckets=8)
        qs = e.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for r in query_graph_index_batch(
            spark, gd, qs, exclude_self=True
        ).where(F.col("rank") == 1).collect():
            print(f"   query {r['query_id']:>3}  top1 vec {r['vec_id']:>5}"
                  f"  cos {r['cos_sim']:.4f}")

    print("== fusion: RRF top-10 (bm_rank | cos_rank | fused)")
    for r in q["llm_hybrid_rrf"](spark, sf_dir).limit(10).collect():
        bm = "-" if r["bm_rank"] is None else f"{r['bm_rank']:>3}"
        cs = "-" if r["cos_rank"] is None else f"{r['cos_rank']:>3}"
        print(f"   doc {r['doc_id']:>6}  bm {bm}  cos {cs}  rrf {r['rrf']:.5f}")

    print("== done")


if __name__ == "__main__":
    main()
