"""Model/retrieval evaluation report, end to end on one page.

The eval leg of the pipeline: before a curation filter gates a
corpus or a retrieval stack serves a RAG system, you measure it.
Chained from registered operators over the bundled fixtures:

  retrieval      nDCG@20 / MRR / P@20 / R@20 of the BM25 ranking
                 under graded term-coverage relevance
                 (llm_eval_rank_metrics)
  classifier     per-class precision/recall/F1 of the lang-ID gate
                 (llm_eval_prf) and ROC-AUC + calibration of the
                 learned quality filter (llm_eval_auc,
                 llm_eval_calibration)
  generation     corpus BLEU-4 of a degraded candidate vs reference
                 (llm_eval_bleu) — swap in real model output

    python examples/eval_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("eval-report")
    q = all_queries()

    def fmt(v, spec=".4f"):
        return format(v, spec) if v is not None else "n/a"

    r = q["llm_eval_rank_metrics"](spark, sf_dir).first()
    print("== retrieval (BM25, graded relevance):")
    print(f"   nDCG@20 {fmt(r['ndcg_at_k'])}  MRR {fmt(r['mrr'])}  "
          f"P@20 {fmt(r['prec_at_k'], '.3f')}  "
          f"R@20 {fmt(r['rec_at_k'], '.3f')}  "
          f"({r['n_rel_corpus']} relevant in corpus)")

    print("== lang-ID gate (per class):")
    for row in q["llm_eval_prf"](spark, sf_dir).orderBy("lang").collect():
        f1 = f"{row['f1']:.3f}" if row["f1"] is not None else "  n/a"
        print(f"   {row['lang']}: P "
              f"{row['prec'] if row['prec'] is not None else float('nan'):.3f} "
              f"R {row['rec'] if row['rec'] is not None else float('nan'):.3f} "
              f"F1 {f1}  (support {row['support']})")

    a = q["llm_eval_auc"](spark, sf_dir).first()
    print(f"== quality filter: AUC {fmt(a['auc'])} "
          f"({a['n_pos']} pos / {a['n_neg']} neg, "
          f"{a['n_scores']} distinct scores)")
    print("   calibration (bin: predicted vs observed):")
    for row in q["llm_eval_calibration"](spark, sf_dir).orderBy("bin").collect():
        print(f"   bin {row['bin']}: pred {row['mean_pred']:.3f} "
              f"obs {row['obs_rate']:.3f}  (n={row['n']})")

    br = q["llm_eval_brier"](spark, sf_dir).first()
    ec = q["llm_eval_ece"](spark, sf_dir).first()
    print(f"   Brier {br['brier']:.4f} = unc {br['uncertainty']:.4f} "
          f"- res {br['resolution']:.4f} + rel {br['reliability']:.4f} "
          f"(+ within-bin); ECE {ec['ece']:.4f}  MCE {ec['mce']:.4f}")

    b = q["llm_eval_bleu"](spark, sf_dir).first()
    print(f"== generation: BLEU-4 {fmt(b['bleu'])} "
          f"(p1..p4 {fmt(b['p1'], '.3f')}/{fmt(b['p2'], '.3f')}"
          f"/{fmt(b['p3'], '.3f')}/{fmt(b['p4'], '.3f')}, "
          f"cand/ref tokens {b['cand_tokens']}/{b['ref_tokens']})")
    ro = q["llm_eval_rouge"](spark, sf_dir).first()
    print(f"== summary eval: ROUGE-1 F {fmt(ro['rouge1_f'])}  "
          f"ROUGE-2 F {fmt(ro['rouge2_f'])}  "
          f"(R1 P/R {fmt(ro['rouge1_p'], '.3f')}/{fmt(ro['rouge1_r'], '.3f')})")
    print("== done")


if __name__ == "__main__":
    main()
