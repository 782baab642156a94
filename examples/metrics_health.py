"""Experiment & metrics health report, end to end on one page.

The statistics layer chained over the bundled fixtures — the readout
an experimentation/metrics platform produces per review:

  experiment     Welch t (pipeline_ab_test) beside the nonparametric
                 Mann-Whitney U and the distribution-shape KS test —
                 mean shift, location shift, and shape shift are
                 different questions
  drift          CUSUM change-point per event type
                 (pipeline_cusum_changepoint)
  despiking      Hampel rolling-median outliers (win_hampel_outliers)
  lifecycle      Kaplan-Meier reorder survival (pipeline_survival_km),
                 the Nelson-Aalen hazard beside it, and the log-rank
                 arm comparison (pipeline_logrank)
  trend          Theil-Sen robust slope vs OLS (pipeline_theil_sen),
                 the additive seasonal decomposition
                 (pipeline_seasonal_decompose), the Dickey-Fuller
                 unit-root gate (is the level series even
                 trend-testable?), and Page's L ordered weekday trend
  causal         difference-in-differences with the control arm
                 carrying the trend (pipeline_did)
  dependence     daily-revenue autocorrelation (pipeline_acf),
                 click->purchase lead-lag (pipeline_xcorr), weekday
                 ANOVA (pipeline_anova), priority-status mutual
                 information (pipeline_mutual_info)
  integrity      Wald-Wolfowitz runs test (pipeline_runs_test),
                 Benford first-digit screen (pipeline_benford) and
                 Bollinger breakout days (win_bollinger)

    python examples/metrics_health.py [sf_dir]
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
    spark = get_spark("metrics-health")
    q = all_queries()

    t = q["pipeline_ab_test"](spark, sf_dir).first()
    mw = q["pipeline_mann_whitney"](spark, sf_dir).first()
    ks = q["pipeline_ks_test"](spark, sf_dir).first()
    print("== experiment (purchase value, arms by user parity):")
    print(f"   Welch t {t['t_stat']:+.3f} (significant: {t['significant']})  "
          f"lift {t['lift']:+.2f}")
    print(f"   Mann-Whitney z {mw['z_score']:+.3f} "
          f"(U_a {mw['u_a']:.1f}, ties {mw['tie_term']})")
    print(f"   KS D {ks['d_stat']:.4f}  p~{ks['p_approx']:.4f}")

    print("== drift (CUSUM, 4-sigma bound):")
    for r in q["pipeline_cusum_changepoint"](spark, sf_dir).orderBy(
        "event_type"
    ).collect():
        flag = "BREACH" if r["breached"] else "ok"
        print(f"   {r['event_type']:<10} peak {r['max_cusum']:>12.2f} "
              f"on {r['peak_day']}  [{flag}]")
    print("== drift, nonparametric second opinion (Pettitt):")
    for r in q["pipeline_pettitt"](spark, sf_dir).orderBy("event_type").collect():
        flag = "SHIFT" if r["significant"] else "ok"
        print(f"   {r['event_type']:<10} K {r['k_stat']:>8} "
              f"at {r['change_day']}  p~{r['p_approx']:.4f}  [{flag}]")

    ham = q["win_hampel_outliers"](spark, sf_dir)
    n_out = ham.where(F.col("is_outlier")).count()
    print(f"== despiking: {n_out} Hampel outliers / {ham.count()} framed events")

    km = q["pipeline_survival_km"](spark, sf_dir)
    half = (
        km.where(F.col("survival") <= 0.5)
        .orderBy("t_days")
        .limit(1)
        .collect()
    )
    if half:
        print(f"== lifecycle: median time-to-reorder ~ {half[0]['t_days']} days "
              f"(n_risk {half[0]['n_risk']})")
    else:
        print("== lifecycle: survival never crosses 0.5 in-window")
    na_last = (
        q["pipeline_nelson_aalen"](spark, sf_dir)
        .orderBy(F.desc("t_days"))
        .limit(1)
        .collect()
    )
    if na_last:
        r = na_last[0]
        print(f"   Nelson-Aalen H({r['t_days']}d) = {r['cum_hazard']:.3f} "
              f"(var {r['var_hazard']:.5f}, S_FH {r['s_fh']:.3f})")
    lr = q["pipeline_logrank"](spark, sf_dir).first()
    if lr["z_score"] is not None:
        flag = "DIFFER" if lr["significant"] else "ok"
        print(f"   log-rank arms: O1 {lr['o1']} vs E1 {lr['e1_expected']:.1f}"
              f"  z {lr['z_score']:+.2f}  p~{lr['p_approx']:.4f}  [{flag}]")

    ts = q["pipeline_theil_sen"](spark, sf_dir).first()
    print(f"== trend: Theil-Sen {ts['ts_slope']:+.2f}/month "
          f"vs OLS {ts['ols_slope']:+.2f}/month over {ts['n_months']} months")
    df_ = q["pipeline_dickey_fuller"](spark, sf_dir).first()
    if df_["t_stat"] is not None:
        verdict = "stationary" if df_["stationary"] else "unit-root-like"
        print(f"   Dickey-Fuller rho {df_['rho']:+.3f} t {df_['t_stat']:+.2f}"
              f" -> {verdict} ({df_['n_diffs']} monthly diffs)")
    pg = q["pipeline_page_trend"](spark, sf_dir).first()
    if pg["z_score"] is not None:
        flag = "ASCENDING" if pg["significant"] else "no ordered trend"
        print(f"   Page's L weekday trend z {pg['z_score']:+.2f}"
              f" p~{pg['p_one_sided']:.4f} over {pg['n_weeks']} weeks [{flag}]")
    dec = q["pipeline_seasonal_decompose"](spark, sf_dir)
    amp = dec.agg(
        F.max("seasonal").alias("hi"), F.min("seasonal").alias("lo")
    ).first()
    print(f"== seasonality: amplitude [{amp['lo']:.0f}, {amp['hi']:.0f}] "
          f"around the centered-MA trend")

    did = q["pipeline_did"](spark, sf_dir).first()
    print(f"== causal: DiD {did['did_estimate']:+.2f} "
          f"(treat {did['delta_treat']:+.2f} vs control "
          f"{did['delta_control']:+.2f}, t {did['t_stat']:+.2f})")

    # acf/xcorr emit a row per lag only when at least one day-pair
    # exists at that lag: a short-span sf_dir (<8 days of orders) is a
    # partial report, not a crash — guard the lookups and the peak.
    acf = {r["lag"]: r["acf"] for r in q["pipeline_acf"](spark, sf_dir).collect()}
    xc = q["pipeline_xcorr"](spark, sf_dir).collect()
    peak = max(xc, key=lambda r: r["xcorr"]) if xc else None
    an = q["pipeline_anova"](spark, sf_dir).first()
    mi = q["pipeline_mutual_info"](spark, sf_dir).first()

    def _fmt(v, spec="+.3f"):
        return format(v, spec) if v is not None else "n/a"

    peak_txt = (
        f"{peak['xcorr']:+.3f} @ lag {peak['lag']:+d}" if peak else "n/a"
    )
    print(f"== dependence: acf(1) {_fmt(acf.get(1))} "
          f"acf(7) {_fmt(acf.get(7))}  xcorr peak {peak_txt}")
    print(f"   weekday ANOVA F {an['f_stat']:.2f} (eta2 {an['eta_sq']:.4f})  "
          f"MI {mi['mutual_info']:.5f} nats (IQR {mi['iqr_ratio']:.4f})")

    rt = {
        r["event_type"]: r
        for r in q["pipeline_runs_test"](spark, sf_dir).collect()
    }
    verdicts = ", ".join(
        f"{t}: {'random' if r['random_at_05'] else 'patterned'}"
        if r["random_at_05"] is not None else f"{t}: undefined"
        for t, r in sorted(rt.items())
    )
    print(f"== randomness (runs test on daily moves): {verdicts}")

    bf = q["pipeline_benford"](spark, sf_dir).collect()
    worst = max(bf, key=lambda r: r["abs_dev"])
    bb = (
        q["win_bollinger"](spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("breakout").cast("int")), F.lit(0)).alias("n_break"),
        )
        .first()
    )
    print(f"== integrity: Benford max deviation {worst['abs_dev']:.3f} "
          f"at digit {worst['digit']}  |  {bb['n_break']} Bollinger breakout "
          f"day-cells / {bb['n']}")
    print("== done")


if __name__ == "__main__":
    main()
