"""Experiment DESIGN-to-DECISION walkthrough on one page.

The full experimentation lifecycle, chained from registered keys on
the bundled fixtures — what a platform runs before, during, and
after an A/B test:

  size      pipeline_power_analysis — per-stratum variance, the MDE
            at the current sample, and n-per-arm for a 2% lift
  estimate  pipeline_ab_test (fixed-horizon Welch t) beside
            pipeline_cuped — the same contrast with pre-period
            variance reduction (Deng et al. 2013)
  monitor   pipeline_sprt — Wald's sequential test: the always-valid
            monitor that is ALLOWED to peek, per event type
  bound     pipeline_bootstrap_ci — deterministic Poisson-bootstrap
            CI for the mean balance (Chamandy et al. 2012), and
            pipeline_conformal — distribution-free prediction
            intervals with test-fold coverage
  correct   pipeline_bh_fdr (step-up, FDR) beside pipeline_holm
            (step-down, FWER + Bonferroni) on the 25-segment family
            — what happens when the readout fans out over segments

    python examples/experiment_design.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.registry import all_queries
from osm_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("experiment-design")
    q = all_queries()

    def _fmt(v, spec):
        # degenerate inputs legitimately yield NULL fields (tiny
        # calibration sets, zero-variance covariates, sub-196-replica
        # corpora) — report them, don't crash the report
        return format(v, spec) if v is not None else "n/a"

    print("== size (two-sample z, alpha .05 / power .80):")
    for r in q["pipeline_power_analysis"](spark, sf_dir).orderBy(
        "l_returnflag"
    ).collect():
        mde = _fmt(r["mde_rel"] * 100 if r["mde_rel"] is not None else None, ".2f")
        need = _fmt(r["n_req_per_arm"], ",")
        print(
            f"   flag {r['l_returnflag']}: n {r['n']:>6}  mean {r['mean_qty']:.2f}"
            f"  MDE now {mde}%  need {need}/arm for 2%"
        )

    t = q["pipeline_ab_test"](spark, sf_dir).first()
    cu = q["pipeline_cuped"](spark, sf_dir).first()
    print("== estimate (arms by unit parity):")
    print(
        f"   fixed-horizon Welch t {t['t_stat']:+.3f} lift {t['lift']:+.2f}"
        f" (significant: {t['significant']})"
    )
    print(
        f"   CUPED theta {_fmt(cu['theta'], '+.4f')}:"
        f" raw delta {_fmt(cu['delta_raw'], '+.2f')}"
        f" -> adjusted {_fmt(cu['delta_cuped'], '+.2f')}"
        f" (n {cu['n_t']}/{cu['n_c']})"
    )

    print("== monitor (SPRT, H1 p=.6 vs H0 p=.5, alpha=beta=.05):")
    for r in q["pipeline_sprt"](spark, sf_dir).orderBy("event_type").collect():
        print(
            f"   {r['event_type']:<10} {r['decision']:<10}"
            f" day {r['day_decided']}  n {r['n_seen']:>6}"
            f"  llr {r['llr']:+.3f}"
        )

    b = q["pipeline_bootstrap_ci"](spark, sf_dir).first()
    print(
        f"== bound: mean balance {_fmt(b['est_mean'], '.2f')},"
        f" 95% Poisson-bootstrap"
        f" CI [{_fmt(b['ci_lo'], '.2f')}, {_fmt(b['ci_hi'], '.2f')}]"
        f" ({b['n_replicas']} replicas over {b['n_rows']} units)"
    )
    for r in q["pipeline_conformal"](spark, sf_dir).orderBy("prio").collect():
        cov = _fmt(r["coverage"] * 100 if r["coverage"] is not None else None, ".1f")
        print(
            f"   conformal {r['prio']:<15} pred {r['pred']:>10.2f}"
            f" +- {_fmt(r['q_resid'], '>10.2f')}  test coverage"
            f" {cov}% (n_cal {r['n_cal']})"
        )

    bh = q["pipeline_bh_fdr"](spark, sf_dir).collect()
    hm = q["pipeline_holm"](spark, sf_dir).collect()
    n_bh = sum(1 for r in bh if r["rejected"])
    n_hm = sum(1 for r in hm if r["rejected"])
    n_bf = sum(1 for r in hm if r["bonf_rejected"])
    print(
        f"== correct ({len(hm)}-segment family): BH(FDR) rejects {n_bh},"
        f" Holm(FWER) {n_hm}, Bonferroni {n_bf}"
        f"  (nesting Bonf <= Holm <= BH holds: "
        f"{n_bf <= n_hm <= n_bh})"
    )
    print("== done")


if __name__ == "__main__":
    main()
