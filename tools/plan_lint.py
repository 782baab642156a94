"""Engine-wide physical-plan lint: build every registered key's plan
and flag scale anti-patterns — the governance pass behind SCALE.md,
generalizing explain_audit.py's describe-the-headliners into
judge-every-key. Writes PLANLINT.md.

Checks (optimized + executed plan text):
  CART   CartesianProduct outside join_cross: both sides big and no
         broadcast bound — the genuinely dangerous shape.
         BroadcastNestedLoopJoin is deliberately NOT flagged: one
         side is broadcast by definition, and the engine's global
         scalars ride as broadcast 1-row crossJoins (so every
         scalar-threshold key shows a BNLJ on a 1-row side)
  PYUDF  row-at-a-time Python UDF (BatchEvalPython) outside the J1
         surface-parity key
  GLOBW  windowspecdefinition with no partition clause (also enforced
         per-key by tests/test_plans.py — belt and suspenders)
  XHIGH  > 14 exchanges (worst-offender report, not a failure)

Iterative keys whose DataFrame CONSTRUCTION runs checkpoint jobs
cannot be screened statically (building the DataFrame already runs
jobs), so they get the EXECUTED-plan pass instead (r7 verdict item
3): run the key to completion against a noop sink and harvest every
SQL execution it triggered — checkpoint materializations, convergence
probes, the final plan — from the SQL status store
(sharedState().statusStore(), the same data the Spark UI shows), then
apply the identical CART/PYUDF/GLOBW screens to every captured plan.
The noop sink matters: a count() action lets Catalyst prune window
columns out of the plan and the screen would inspect a vacuum.

Usage: python tools/plan_lint.py   # exit 1 on any CART/PYUDF/GLOBW
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.registry import all_queries  # noqa: E402
from osm_airflow_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

# DataFrame construction triggers jobs (driver-loop iteration /
# control-plane collects) — lint would *run* them; skip.
ITERATIVE = {
    "graph_connected_components",
    "graph_pagerank",
    "graph_shortest_path",
    "osm_super_relation_rollup",
    "llm_sim_ann_ivf_kmeans",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivf_rq",
    "llm_sim_ann_graph",
    "llm_bpe_train",
    "llm_bpe_encode",
    "llm_semdedup",
    "llm_dedup_cluster_best",
    "win_ntile",
    "pipeline_rfm_segments",
    "pipeline_pareto_abc",
    "pipeline_gini",
    "llm_zipf_fit",  # r9: same bucket-offset control-plane collects as gini
    "llm_embed_pca",  # r9: fits the whitening model (covariance collect) at build
    "llm_corpus_divergence",  # r9: checkpoints the source-word counts (4 branches)
    "llm_dedup_fingerprint",  # r9: checkpoints the winnowed posting list (4 branches)
    "llm_domain_mix",
    "llm_sample_balanced",
    "pipeline_important_stock",
    "pipeline_bom_rollup",
    # r8: checkpoints its two 100-row candidate lists before the
    # bounded join-rank (re-scoring the corpus twice costs more than
    # a 100-row checkpoint under this build's no-exchange-reuse)
    "llm_hybrid_rrf",
    # late r9: checkpoint barriers (multi-consumer 1-row/bounded
    # aggregates) and/or bucket-offset control-plane collects
    "llm_eval_rank_metrics",
    "llm_eval_auc",
    "pipeline_ks_test",
    "pipeline_mann_whitney",
    "pipeline_chi_square",
    "pipeline_cusum_changepoint",
    "pipeline_survival_km",
    "agg_bloom_probe",
    "graph_kcore",  # driver-controlled peeling loop
    "pipeline_theil_sen",  # two bucket-offset medians (control-plane collects)
    "pipeline_seasonal_decompose",  # checkpointed months spine (3 consumers)
    "pipeline_psi_drift",  # checkpointed 10-cell table (2 consumers)
    "pipeline_position_attribution",  # checkpointed purchases/touches frames
    # third r9 session: checkpoint barriers / iterative loops
    "pipeline_acf",  # checkpointed daily + deviation tables (3 consumers)
    "pipeline_xcorr",  # same shape as ACF, two series
    "pipeline_benford",  # checkpointed 9-cell digit counts
    "pipeline_mutual_info",  # checkpointed 15-cell contingency (4 consumers)
    "llm_ngram_novelty",  # checkpointed gram instances + train-distinct
    "llm_mixture_plan",  # checkpointed sources-bounded parts table
    "mm_image_ahash",  # checkpointed hash table (both band-join sides)
    "mm_dedup_cluster",  # label-propagation loop over ahash pairs
    "llm_split_leakage",  # checkpointed base + gram posting tables
}

# a deliberate unbounded cartesian (the D10 surface key)
NONEQUI_OK = {"join_cross"}
# J1 surface parity (row-at-a-time) and the J6 UDTF surface key
# (BatchEvalPythonUDTF matches the same substring) — both deliberate
PYUDF_OK = {"udf_scalar", "udf_table"}

def _window_specs(text: str) -> list[str]:
    """Paren-aware extraction of every windowspecdefinition(...) argument
    list. A [^)]* regex truncates at the first ')' inside a nested call
    (windowspecdefinition(md5(x#5) ASC ...) would capture only 'md5(x#5')
    and let an unpartitioned window escape the hard rule."""
    out = []
    needle = "windowspecdefinition("
    i = text.find(needle)
    while i != -1:
        j = i + len(needle)
        depth, k = 1, j
        while k < len(text) and depth:
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        out.append(text[j : k - 1])
        i = text.find(needle, k)
    return out


def _first_arg(spec: str) -> str:
    depth = 0
    for idx, ch in enumerate(spec):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return spec[:idx]
    return spec


def _screen(text: str, key: str) -> list[str]:
    """The shared CART/PYUDF/GLOBW screens over any plan text."""
    flags = []
    if "CartesianProduct" in text and key not in NONEQUI_OK:
        flags.append("CART")
    if "BatchEvalPython" in text and key not in PYUDF_OK:
        flags.append("PYUDF")
    for spec in _window_specs(text):
        head = _first_arg(spec)
        if " ASC" in head or " DESC" in head or head.startswith("specifiedwindowframe"):
            flags.append("GLOBW")
            break
    return flags


def lint(key: str, df) -> tuple[list[str], int]:
    qe = df._jdf.queryExecution()
    text = qe.optimizedPlan().toString() + qe.executedPlan().toString()
    flags = _screen(text, key)
    exchanges = qe.executedPlan().toString().count("Exchange")
    if exchanges > 14:
        flags.append("XHIGH")
    return flags, exchanges


def _max_execution_id(store) -> int:
    best = -1
    it = store.executionsList().iterator()
    while it.hasNext():
        best = max(best, it.next().executionId())
    return best


def lint_executed(key: str, spark, fn) -> tuple[list[str], int, int]:
    """Run the key end-to-end and screen EVERY SQL execution it
    triggered. Returns (flags, max exchanges in any one execution's
    final plan, execution count). Exchange counting restricts to the
    Final Plan tree segment so AQE's Initial Plan echo and the detail
    section don't double-count."""
    store = spark._jsparkSession.sharedState().statusStore()
    before = _max_execution_id(store)
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    bus = spark.sparkContext._jsc.sc().listenerBus()
    try:
        bus.waitUntilEmpty()
    except Exception:  # older signature wants a timeout
        bus.waitUntilEmpty(10000)
    texts = []
    it = store.executionsList().iterator()
    while it.hasNext():
        e = it.next()
        if e.executionId() > before:
            texts.append(e.physicalPlanDescription())
    flags = _screen("\n".join(texts), key)
    max_exchanges = 0
    for t in texts:
        # pre-Initial segment = the final AQE tree only (details and
        # the Initial Plan echo follow it); count every Exchange node
        # there — shuffle AND broadcast, any tree position — matching
        # the static lint's substring convention
        tree = t.split("== Initial Plan ==")[0]
        max_exchanges = max(max_exchanges, tree.count("Exchange"))
    if max_exchanges > 14:
        flags.append("XHIGH")
    return flags, max_exchanges, len(texts)


def main() -> int:
    spark = get_spark("plan-lint")
    queries = all_queries()
    rows, hard_fails = [], []
    for key in sorted(queries):
        if key in ITERATIVE:
            continue
        try:
            flags, exchanges = lint(key, queries[key](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            rows.append((key, ["ERROR"], -1))
            hard_fails.append((key, str(e)[:100]))
            continue
        rows.append((key, flags, exchanges))
        if set(flags) & {"CART", "PYUDF", "GLOBW"}:
            hard_fails.append((key, ",".join(flags)))
    exec_rows = []
    for key in sorted(ITERATIVE):
        try:
            flags, exchanges, n_execs = lint_executed(key, spark, queries[key])
        except Exception as e:  # noqa: BLE001
            exec_rows.append((key, ["ERROR"], -1, 0))
            hard_fails.append((key, str(e)[:100]))
            continue
        exec_rows.append((key, flags, exchanges, n_execs))
        if set(flags) & {"CART", "PYUDF", "GLOBW"}:
            hard_fails.append((key, ",".join(flags)))
    out = [
        "# PLANLINT — engine-wide plan governance",
        "",
        f"{len(rows)} keys statically linted at {SF_DIR}, plus the",
        f"{len(exec_rows)} iterative keys below screened via EXECUTED-plan",
        "capture (every SQL execution each key triggers — checkpoint",
        "materializations, convergence probes, final plan — harvested",
        "from the SQL status store after a noop-sink run).",
        "Checks: CART (CartesianProduct outside join_cross — both sides",
        "big, no broadcast bound), PYUDF (row-at-a-time Python UDF",
        "outside J1), GLOBW (unpartitioned window), XHIGH (>14",
        "exchanges, report-only). BroadcastNestedLoopJoin is not",
        "flagged: one side is broadcast by definition, and global",
        "scalars deliberately ride as broadcast 1-row crossJoins.",
        "",
        "| key | exchanges | flags |",
        "| --- | --- | --- |",
    ]
    for key, flags, exchanges in sorted(rows, key=lambda r: -r[2]):
        out.append(f"| {key} | {exchanges} | {' '.join(flags) or '—'} |")
    out += [
        "",
        "## Iterative keys — executed-plan screen",
        "",
        "exchanges = max in any ONE execution's final AQE plan;",
        "executions = SQL executions the full run triggered.",
        "",
        "| key | executions | max exchanges | flags |",
        "| --- | --- | --- | --- |",
    ]
    for key, flags, exchanges, n_execs in sorted(
        exec_rows, key=lambda r: -r[2]
    ):
        out.append(
            f"| {key} | {n_execs} | {exchanges} | {' '.join(flags) or '—'} |"
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANLINT.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(
        f"linted {len(rows)} static + {len(exec_rows)} executed keys; "
        f"hard fails: {hard_fails or 'none'}"
    )
    return 1 if hard_fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
