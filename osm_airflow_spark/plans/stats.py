"""Classical statistical tests over the fixture tables (split from
plans/analytics.py in round 14 — the module had grown past 11k lines;
registry auto-import makes the split invisible to the driver).

Rank/location/scale/association tests (KS, Mann-Whitney,
Kruskal-Wallis, Wilcoxon, Friedman, Levene, Tukey HSD, chi-square,
ANOVA, Spearman/Kendall, Theil-Sen, Benford, mutual information,
runs, Jarque-Bera, Holm, Page trend, BH-FDR) and survival analysis
(Kaplan-Meier, Nelson-Aalen, log-rank, Weibull). Shared scale rules:
exact decimal aggregation (`dsum`), rank ties via window functions
with total-order tie-breaks, corpus scalars as broadcast one-row
aggregates — see SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import dsum, query

# ---------------------------------------------------------------------------
# Two-sample hypothesis tests (r9). Both tests run on the same framing
# as pipeline_ab_test: purchase values, arms by user-id parity. The
# shared machinery is a per-distinct-value count table with EXACT
# cumulative counts, built with the zipf/gini bucket-offset pattern
# (value-contiguous buckets from approx-percentile cuts, per-bucket
# parallel windows, <=B collected offset rows) — never a global
# window.
# ---------------------------------------------------------------------------

_TWO_SAMPLE_SQL_CTE = """
    assigned AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    by_val AS (
      SELECT value, SUM(is_a) AS c_a, SUM(1 - is_a) AS c_b
      FROM assigned GROUP BY value
    ),
    tot AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM by_val),
    cum AS (
      SELECT value, c_a, c_b, c_a + c_b AS c,
             SUM(c_a) OVER (ORDER BY value) AS cum_a,
             SUM(c_b) OVER (ORDER BY value) AS cum_b
      FROM by_val
    )
"""


def _two_sample_value_cum(spark: SparkSession, sf_dir: str):
    """(cum_df, n_a, n_b): per-distinct-value counts for the two arms
    with exact inclusive cumulative counts, plus the exact arm sizes
    (control-plane ints from the same <=B offset rows the cumulative
    needs anyway).

    cum_df columns: value, c_a, c_b, c (=c_a+c_b), cum_a, cum_b —
    everything an ECDF- or rank-based statistic needs. The distinct-
    value table is localCheckpointed: cuts, offsets and the windowed
    pass all read it, and this build never reuses exchange subtrees.
    At 100 TB pre-quantize `value` to a fixed grid first (the table
    is distinct-value-bounded, which for continuous measurements is
    corpus-sized without quantization)."""
    from osm_airflow_spark.bucketing import bucketed_running

    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
        "value",
    )
    by_val = (
        assigned.groupBy("value")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
        .localCheckpoint(eager=True)
    )
    out, totals = bucketed_running(by_val, "value", ["c_a", "c_b"])
    cum = out.select(
        "value",
        "c_a",
        "c_b",
        (F.col("c_a") + F.col("c_b")).alias("c"),
        F.col("run_c_a").alias("cum_a"),
        F.col("run_c_b").alias("cum_b"),
    )
    return cum, totals["c_a"], totals["c_b"]


@query(
    "pipeline_ks_test",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL_CTE},
    dmax AS (
      SELECT MAX(ABS(cum_a * n_b - cum_b * n_a)) AS d_num
      FROM cum, tot
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(d_num AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
           (sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
            + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
             * (CAST(d_num AS DOUBLE)
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS lambda,
           least(1.0, round(2.0 * exp(
             -2.0 * ((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
                      + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
                     * (CAST(d_num AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
                  * ((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
                      + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
                     * (CAST(d_num AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))), 6))
             AS p_approx
    FROM dmax, tot
    """,
)
def pipeline_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — two-sample Kolmogorov–Smirnov test on
    purchase values between the parity-assigned experiment arms: the
    distribution-shift companion to pipeline_ab_test's mean-shift t
    (an A/B platform reports both — KS catches variance/shape moves a
    t-test is blind to; the same statistic gates training-data drift
    between corpus snapshots). D = max |ECDF_A − ECDF_B| is kept
    EXACT as the integer max of |cum_a·n_b − cum_b·n_a| over distinct
    values, divided once at the end; the supremum over a step
    function is attained at a sample point, so scanning distinct
    values IS the exact D. The p-value uses the standard asymptotic
    Kolmogorov tail (first series term, with Stephens'
    small-sample λ correction) — its exp() is rounded at emission
    (the libm rule), everything upstream a shared IEEE tree over
    exact ints and correctly-rounded sqrt.

    Scale: one corpus pass to distinct-value counts, then the
    cumulative runs on the BOUNDED distinct-value table via the
    bucket-offset pattern (8-way parallel windows + collected
    offsets, no global window). The long products cum·n overflow
    past ~3·10⁹ rows per arm — switch to decimal(38,0) there (noted,
    not paid: the comparison stays JVM-side either way)."""
    cum, n_a, n_b = _two_sample_value_cum(spark, sf_dir)
    d_num = F.max(
        F.abs(F.col("cum_a") * F.lit(n_b) - F.col("cum_b") * F.lit(n_a))
    )
    stat = cum.agg(d_num.alias("d_num"))
    na_d = F.lit(float(n_a))
    nb_d = F.lit(float(n_b))
    d_stat = F.col("d_num").cast("double") / (na_d * nb_d)
    sqrt_ne = F.sqrt(na_d * F.lit(n_b) / F.lit(n_a + n_b))
    lam = (sqrt_ne + 0.12 + 0.11 / sqrt_ne) * d_stat
    return stat.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        d_stat.alias("d_stat"),
        lam.alias("lambda"),
        F.least(
            F.lit(1.0), F.round(2.0 * F.exp(-2.0 * lam * lam), 6)
        ).alias("p_approx"),
    )


@query(
    "pipeline_mann_whitney",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL_CTE},
    ranked AS (
      SELECT SUM(c_a * (2 * (cum_a + cum_b - c) + c + 1)) AS two_r_a,
             SUM(c * c * c - c) AS tie_term
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
             AS u_a,
           CAST(n_a AS DOUBLE) * n_b
             - CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
             AS u_b,
           CAST(tie_term AS BIGINT) AS tie_term,
           (CAST(two_r_a - n_a * (CAST(n_a AS BIGINT) + 1) AS DOUBLE) / 2.0
            - CAST(n_a AS DOUBLE) * n_b / 2.0)
           / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                  * ((n_a + n_b + 1.0)
                     - CAST(tie_term AS DOUBLE)
                       / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))))
             AS z_score
    FROM ranked, tot
    """,
)
def pipeline_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Mann–Whitney U (Wilcoxon rank-sum) on the
    same two-arm framing: the nonparametric location test an A/B
    readout falls back to when values are heavy-tailed enough that
    pipeline_ab_test's t is untrustworthy (exactly the revenue-per-
    user shape). Midrank tie handling is kept EXACT in integers:
    for each distinct value, midrank = rank_before + (c+1)/2, so the
    doubled rank-sum 2·R_A = Σ c_a·(2·cum_before + c + 1) is an
    exact long and U_A = R_A − n_A(n_A+1)/2 only becomes a (dyadic,
    exact) double at emission. The normal approximation's z uses the
    standard tie-corrected variance — one sqrt over exact-int
    ratios, a shared IEEE tree emitted unrounded (no transcendental
    at all, so no rounding anywhere).

    Scale: identical machinery (and cost) to pipeline_ks_test — the
    two tests share _two_sample_value_cum's bounded distinct-value
    cumulative. The c³ tie term overflows long past c ≈ 2·10⁶
    duplicates of ONE value — pre-quantized grids at 100 TB need the
    decimal(38,0) form (noted)."""
    cum, n_a, n_b = _two_sample_value_cum(spark, sf_dir)
    cum_before = F.col("cum_a") + F.col("cum_b") - F.col("c")
    ranked = cum.agg(
        F.sum(
            F.col("c_a") * (2 * cum_before + F.col("c") + 1)
        ).alias("two_r_a"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    # the product is computed in PYTHON: two IntegerType literals
    # multiplied column-side overflow int32 at n_a >= 46341 and ANSI
    # (on in this build) turns that into ARITHMETIC_OVERFLOW at
    # constant folding (r9 self-review, reproduced)
    u_a = (
        F.col("two_r_a") - F.lit(n_a * (n_a + 1))
    ).cast("double") / 2.0
    mu = F.lit(float(n_a)) * F.lit(n_b) / 2.0
    n = n_a + n_b
    var = (F.lit(float(n_a)) * F.lit(n_b) / 12.0) * (
        F.lit(float(n + 1))
        - F.col("tie_term").cast("double")
        / (F.lit(float(n)) * F.lit(n - 1.0))
    )
    return ranked.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        u_a.alias("u_a"),
        (F.lit(float(n_a)) * F.lit(n_b) - u_a).alias("u_b"),
        F.col("tie_term").cast("long").alias("tie_term"),
        ((u_a - mu) / F.sqrt(var)).alias("z_score"),
    )


_KW_TR = ", ".join(
    f"SUM(c{k} * (2 * (run_c - c) + c + 1)) AS tr{k}" for k in range(7)
)
_KW_N = ", ".join(f"SUM(c{k}) AS n{k}" for k in range(7))
_KW_SU = " + ".join(
    f"(CASE WHEN n{k} > 0 THEN CAST(tr{k} AS DOUBLE) * tr{k} / n{k} "
    f"ELSE 0.0 END)"
    for k in range(7)
)


@query(
    "pipeline_kruskal_wallis",
    oracle=f"""
    WITH pur AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    by_val AS (
      SELECT value,
             {", ".join(
                 f"SUM(CASE WHEN g = {k} THEN 1 ELSE 0 END) AS c{k}"
                 for k in range(7)
             )},
             COUNT(*) AS c
      FROM pur GROUP BY value
    ),
    cum AS (
      SELECT *, SUM(c) OVER (ORDER BY value) AS run_c FROM by_val
    ),
    agg AS (
      SELECT {_KW_TR}, {_KW_N},
             SUM(c * c * c - c) AS tie_term,
             SUM(c) AS n
      FROM cum
    ),
    hs AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(tie_term AS BIGINT) AS tie_term,
             3.0 * ({_KW_SU}) / (CAST(n AS DOUBLE) * (n + 1))
               - 3.0 * (n + 1) AS h_stat,
             1.0 - CAST(tie_term AS DOUBLE)
                   / CAST(n * n * n - n AS DOUBLE) AS tie_c
      FROM agg
    ),
    hc AS (
      SELECT n, tie_term, h_stat,
             CASE WHEN tie_c > 0 THEN h_stat / tie_c END AS h_corrected
      FROM hs
    )
    SELECT n, tie_term, h_stat, h_corrected,
           round(exp(-(h_corrected / 2))
                 * (1 + (h_corrected / 2)
                      + ((h_corrected / 2) * (h_corrected / 2)) / 2), 6)
             AS p_approx,
           round(exp(-(h_corrected / 2))
                 * (1 + (h_corrected / 2)
                      + ((h_corrected / 2) * (h_corrected / 2)) / 2), 6)
             < 0.05 AS significant
    FROM hc
    """,
)
def pipeline_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL–WALLIS H test (Kruskal & Wallis 1952) of purchase
    value across the seven weekdays — the RANK-based sibling of
    pipeline_anova's F (the k-group generalization of
    pipeline_mann_whitney exactly as anova generalizes ab_test):
    the weekday-effect readout that survives the heavy-tailed
    revenue-per-event shape a variance-based F is fragile on.
    H = 12/(n(n+1)) Σ_g R_g²/n_g − 3(n+1), tie-corrected by
    C = 1 − Σ(t³−t)/(n³−n).

    Exactness discipline — three house patterns composed: (1) the
    mann_whitney DOUBLED midrank identity per distinct value
    (2R_g = Σ c_g(2·cum_before + c + 1)) keeps every rank sum an
    exact integer with no halves; (2) the pooled cumulative runs on
    the BOUNDED distinct-value table via the bucket-offset pattern
    (no global window — lint-clean); (3) the 7 per-group terms
    reduce through a WIDE PIVOT (the anova rule) so Σ tr_g²/n_g is a
    fixed-order IEEE tree over exact-int casts — with doubled ranks,
    Σ R²/n = ¼ Σ (2R)²/n, so the 12/(n(n+1)) coefficient becomes 3.
    H and the tie correction are therefore bit-identical unrounded;
    the chi²₆ survival (even dof: exp(−H/2)(1 + h + h²/2)) is the
    only transcendental, rounded 6 dp with the decision reading the
    rounded value (the bh_fdr rule). Degenerate all-ties input
    (C = 0) emits NULL H_corr/p in both engines, never a crash.

    Scale: one corpus pass to distinct-value group counts; everything
    after is distinct-value-bounded (pre-quantize continuous values
    at 100 TB — the _two_sample_value_cum note); weekday extraction
    is Spark weekday() ≡ DuckDB isodow−1 (the 1=Sunday trap dodged,
    the anova precedent). Integer headroom: the tie-correction's
    n³−n runs in Spark LONG vs DuckDB HUGEINT, so past n ≈ 2×10⁶
    pooled events the Spark side needs the decimal(38,0) upgrade
    (the wilcoxon 2n(n+1)(2n+1) note — same cliff, same knob)."""
    from osm_airflow_spark.bucketing import bucketed_running

    e = load_table(spark, sf_dir, "events")
    pur = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    by_val = (
        pur.groupBy("value")
        .agg(
            *[
                F.sum(F.when(F.col("g") == k, 1).otherwise(0)).alias(f"c{k}")
                for k in range(7)
            ],
            F.count(F.lit(1)).alias("c"),
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    out, _totals = bucketed_running(by_val, "value", ["c"])
    cum_before = F.col("run_c") - F.col("c")
    agg = out.agg(
        *[
            F.sum(
                F.col(f"c{k}") * (2 * cum_before + F.col("c") + 1)
            ).alias(f"tr{k}")
            for k in range(7)
        ],
        *[F.sum(f"c{k}").alias(f"n{k}") for k in range(7)],
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias(
            "tie_term"
        ),
        F.sum("c").alias("n"),
    )
    su = None
    for k in range(7):
        trd = F.col(f"tr{k}").cast("double")
        term = F.when(
            F.col(f"n{k}") > 0, trd * trd / F.col(f"n{k}")
        ).otherwise(F.lit(0.0))
        su = term if su is None else su + term
    nd = F.col("n").cast("double")
    h_stat = F.lit(3.0) * su / (nd * (F.col("n") + 1)) - F.lit(3.0) * (
        F.col("n") + 1
    )
    tie_c = F.lit(1.0) - F.col("tie_term").cast("double") / (
        F.col("n") * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    hs = agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("tie_term").cast("long").alias("tie_term"),
        h_stat.alias("h_stat"),
        tie_c.alias("tie_c"),
    )
    hc = hs.select(
        "n",
        "tie_term",
        "h_stat",
        F.when(F.col("tie_c") > 0, F.col("h_stat") / F.col("tie_c")).alias(
            "h_corrected"
        ),
    )
    half = F.col("h_corrected") / 2
    p = F.round(F.exp(-half) * (1 + half + (half * half) / 2), 6)
    return hc.select(
        "n",
        "tie_term",
        "h_stat",
        "h_corrected",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_chi_square",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT p, SUM(o) AS r FROM cells GROUP BY p),
    cols_ AS (SELECT s, SUM(o) AS c FROM cells GROUP BY s),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT p) AS nr,
                   COUNT(DISTINCT s) AS nc
            FROM cells),
    terms AS (
      SELECT round(
               (CAST(o AS DOUBLE)
                - CAST(r AS DOUBLE) * c / n)
               * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
               / (CAST(r AS DOUBLE) * c / n), 6) AS t
      FROM cells JOIN rows_ USING (p) JOIN cols_ USING (s), tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nr AS BIGINT) AS n_rows,
           CAST(nc AS BIGINT) AS n_cols,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
           sqrt(CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE)
                / (n * least(nr - 1, nc - 1))) AS cramers_v
    FROM terms, tot
    GROUP BY n, nr, nc
    """,
)
def pipeline_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — chi-square test of independence between order
    priority and order status (the categorical-association readout:
    'does fulfilment status depend on priority?'), with Cramér's V
    as the effect size. The contingency table is one keyed aggregate
    (cells are (priorities × statuses)-bounded); row/column margins
    re-aggregate the CHECKPOINTED 15-row cell table (broadcast
    join-backs — this build never reuses exchange subtrees, so the
    barrier stops the corpus scan re-running per margin). Each
    (o−e)²/e term is a shared IEEE tree over exact counts, rounded
    to 6 dp per the term rule and decimal-summed so the cell order
    can't matter; Cramér's V is one sqrt over the agreed sum,
    emitted unrounded. Output is ONE row; everything after the first
    aggregate is control-plane sized."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)  # 15 rows; margins + terms + totals
    )
    rows_ = cells.groupBy("p").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("s").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("p").alias("nr"),
        F.countDistinct("s").alias("nc"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        6,
    )
    terms = (
        cells.join(F.broadcast(rows_), "p")
        .join(F.broadcast(cols_), "s")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("t"), "n", "nr", "nc")
    )
    chi2 = F.sum(F.col("t").cast("decimal(18,6)")).cast("double")
    return (
        terms.groupBy("n", "nr", "nc")
        .agg(chi2.alias("chi2"))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("nr").cast("long").alias("n_rows"),
            F.col("nc").cast("long").alias("n_cols"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.col("chi2"),
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ).alias("cramers_v"),
        )
    )


@query(
    "pipeline_survival_km",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             MAX(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey) AS cmax
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey,
             MIN(CASE WHEN rn = 1 THEN od END) AS t1,
             MIN(CASE WHEN rn = 2 THEN od END) AS t2,
             MAX(cmax) AS cmax
      FROM ranked WHERE rn <= 2 GROUP BY o_custkey
    ),
    g AS (SELECT MAX(cmax) AS gmax, COUNT(*) AS total FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM spells GROUP BY t
    ),
    cum AS (
      SELECT t, d, c, total,
             COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM by_time, g
    ),
    terms AS (
      SELECT t, d, c, total - before AS n_risk,
             CASE
               WHEN d > 0 AND d < total - before THEN
                 CAST(round(round(ln(1.0 - CAST(d AS DOUBLE)
                                        / (total - before)), 6)
                            * 1000000, 0) AS BIGINT)
               WHEN d > 0 THEN -99000000000
               ELSE 0 END AS micro
      FROM cum
    ),
    surv AS (
      SELECT t, d, c, n_risk,
             SUM(micro) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumm
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           round(exp(CAST(cumm AS DOUBLE) / 1000000), 6) AS survival
    FROM surv
    """,
)
def pipeline_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Kaplan–Meier survival over time-to-reorder:
    each customer's spell runs from their first order to their second
    (event) or to the end of observation (right-censored at the
    corpus max date) — the churn/repeat-purchase curve every
    lifecycle team reads, and the estimator that handles censoring
    correctly where a naive mean-gap (pipeline_median_order_gap)
    silently drops one-order customers. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)
    with nᵢ = at-risk (Kaplan & Meier 1958).

    Determinism: the product runs in LOG space as a running sum of
    per-time terms, each ln(1 − d/n) of an exact-int ratio rounded
    to 6 dp at the transcendental and SCALED TO INTEGER MICROS — so
    the running sum is exact long addition (order-independent, no
    decimal plumbing), and the final exp(Σ/1e6) is rounded at
    emission (the libm rule). A time where everyone at risk fails
    (d = n) gets the −9.9e10-micro sentinel: exp underflows to an
    EXACT double 0.0 identically in both engines. n_risk derives
    from the same exact cumulative.

    Scale: the per-customer spell extraction is a bounded window
    (orders per customer); distinct spell lengths are
    calendar-bounded (~10³ rows after years), and BOTH running
    passes over them (the at-risk cumulative, then the log-micro
    sum, which depends on the first) use the bucket-offset pattern —
    two ≤B control-plane collects, no global window. The corpus max
    date and cohort size ride as one broadcast row."""
    from pyspark.sql import Window

    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wmax = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.row_number().over(wc).alias("rn"),
        F.max(F.col("o_orderdate").cast("date")).over(wmax).alias("cmax"),
    ).where(F.col("rn") <= 2)
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("od"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("od"))).alias("t2"),
        F.max("cmax").alias("cmax"),
    ).localCheckpoint(eager=True)  # feeds the 1-row globals AND spells
    g = per_cust.agg(
        F.max("cmax").alias("gmax"), F.count(F.lit(1)).alias("total")
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "total",
    )
    by_time = (
        spells.groupBy("t", "total")
        .agg(F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c"))
        .withColumn("dc", F.col("d") + F.col("c"))
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc"])
    before = F.col("run_dc") - F.col("dc")
    n_risk = F.col("total") - F.col("before")
    ratio = F.lit(1.0) - F.col("d").cast("double") / n_risk
    micro = (
        F.when(
            (F.col("d") > 0) & (F.col("d") < n_risk),
            F.round(F.round(F.log(ratio), 6) * 1_000_000, 0).cast("long"),
        )
        .when(F.col("d") > 0, F.lit(-99_000_000_000))
        .otherwise(F.lit(0))
    )
    terms = (
        out1.withColumn("before", before)
        .select(
            "t",
            "d",
            "c",
            n_risk.alias("n_risk"),
            micro.alias("micro"),
        )
        .localCheckpoint(eager=True)  # second offset collect + window
    )
    out2, _ = bucketed_running(terms, "t", ["micro"])
    cumm = F.col("run_micro")
    return out2.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.round(F.exp(cumm.cast("double") / 1_000_000), 6).alias("survival"),
    )


def _exact_median_1row(df: DataFrame, col: str):
    """Exact median of a BOUNDED value column as a 1-row DataFrame
    (column ``med``), via the bucket-offset rank pattern — no global
    window. Median = mean of the rank-⌈n/2⌉ and rank-⌈(n+1)/2⌉
    values (equal when n is odd); computed as Σ value·hits / Σ hits
    where hits counts how many of the two target ranks fall inside
    each distinct value's rank span — bit-identical to the SQL
    two-rank formulation because two-term IEEE addition is
    commutative and the division is shared. Returns (df_1row, n)."""
    from osm_airflow_spark.bucketing import bucketed_running

    vals = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    out, totals = bucketed_running(vals, col, ["_c"])
    n = totals["_c"]
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    cum = F.col("run__c")
    lo = cum - F.col("_c") + 1
    hits = F.when((lo <= k1) & (cum >= k1), 1).otherwise(0) + F.when(
        (lo <= k2) & (cum >= k2), 1
    ).otherwise(0)
    med = out.select(F.col(col).alias("_v"), hits.alias("_h")).agg(
        (
            F.sum(F.col("_v") * F.col("_h")).cast("double") / F.sum("_h")
        ).alias("med")
    )
    return med, n


@query(
    "pipeline_theil_sen",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rdec
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT mi - (SELECT MIN(mi) FROM monthly) AS m,
             CAST(rdec AS DOUBLE) AS r, rdec
      FROM monthly
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(m) AS BIGINT) AS sx,
             CAST(SUM(m * m) AS BIGINT) AS sxx,
             CAST(SUM(rdec) AS DOUBLE) AS sy,
             CAST(SUM(m * rdec) AS DOUBLE) AS sxy
      FROM base
    ),
    pairs AS (
      SELECT (b.r - a.r) / (b.m - a.m) AS slope
      FROM base a JOIN base b ON b.m > a.m
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             COUNT(*) OVER () AS np FROM pairs
    ),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                           THEN slope END) AS DOUBLE)
             / COUNT(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                          THEN 1 END) AS ts_slope,
             MAX(np) AS n_pairs
      FROM ranked
    ),
    resid AS (
      SELECT base.r - med.ts_slope * base.m AS e FROM base, med
    ),
    rranked AS (
      SELECT e, ROW_NUMBER() OVER (ORDER BY e) AS rn,
             COUNT(*) OVER () AS np FROM resid
    ),
    rmed AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                           THEN e END) AS DOUBLE)
             / COUNT(CASE WHEN rn IN ((np + 1) // 2, (np + 2) // 2)
                          THEN 1 END) AS ts_intercept
      FROM rranked
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           ts_slope,
           ts_intercept,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS ols_slope
    FROM stats, med, rmed
    """,
)
def pipeline_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — Theil–Sen ROBUST trend of monthly revenue:
    the median of all pairwise month-to-month slopes (Theil 1950,
    Sen 1968; 29% breakdown point), with the median-residual
    intercept and the OLS slope beside it for comparison — the
    trend line a forecast pipeline trusts when a demo spike or a
    refund month would drag least squares (the heavy-tail reality
    pipeline_mann_whitney exists for, applied to trend).

    Determinism: monthly revenue stays an EXACT decimal through the
    sufficient sums (Σy, Σxy are decimal-exact; month indices are
    ints) and becomes a double once; each pairwise slope is one
    shared division of agreed doubles; both medians use the exact
    two-rank formulation (Σ value·hits / Σ hits ≡ the SQL two-rank
    mean — two-term IEEE addition is commutative, so bucket order
    cannot matter) over the bucket-offset rank machinery — no global
    window anywhere. OLS emits from the same agreed tree.

    Scale: months are calendar-bounded (~10² after a decade), so the
    pair table is months²-bounded (~10⁴) — the quadratic lives in
    control-plane-sized data, never the corpus; the one corpus pass
    is the monthly aggregate. Both medians are
    distinct-value-bounded bucket-offset passes (≤B collects)."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = (
        o.groupBy(mi.alias("mi"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rdec"))
        .localCheckpoint(eager=True)  # min(mi) + base both read it
    )
    m0 = monthly.agg(F.min("mi").alias("m0"))
    base = (
        monthly.crossJoin(F.broadcast(m0))
        .select(
            (F.col("mi") - F.col("m0")).alias("m"),
            F.col("rdec").cast("double").alias("r"),
            "rdec",
        )
        .localCheckpoint(eager=True)  # stats + both pair sides + resid
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("sx"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
        F.sum("rdec").cast("double").alias("sy"),
        F.sum(F.col("m") * F.col("rdec")).cast("double").alias("sxy"),
    )
    a = base.select(F.col("m").alias("ma"), F.col("r").alias("ra"))
    b = base.select(F.col("m").alias("mb"), F.col("r").alias("rb"))
    pairs = (
        a.join(F.broadcast(b), F.col("mb") > F.col("ma"))
        .select(
            ((F.col("rb") - F.col("ra")) / (F.col("mb") - F.col("ma"))).alias(
                "slope"
            )
        )
    )
    med, n_pairs = _exact_median_1row(pairs, "slope")
    resid = base.crossJoin(F.broadcast(med)).select(
        (F.col("r") - F.col("med") * F.col("m")).alias("e")
    )
    rmed, _ = _exact_median_1row(resid, "e")
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    return (
        stats.crossJoin(F.broadcast(med.select(F.col("med").alias("ts_slope"))))
        .crossJoin(F.broadcast(rmed.select(F.col("med").alias("ts_intercept"))))
        .select(
            n.cast("long").alias("n_months"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
            "ts_slope",
            "ts_intercept",
            ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("ols_slope"),
        )
    )


@query(
    "pipeline_spearman",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ),
    rx AS (
      SELECT x AS v, 2 * (SUM(c) OVER (ORDER BY x) - c) + c + 1 AS two_r
      FROM (SELECT x, COUNT(*) AS c FROM daily GROUP BY x)
    ),
    ry AS (
      SELECT y AS v, 2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1 AS two_r
      FROM (SELECT y, COUNT(*) AS c FROM daily GROUP BY y)
    ),
    j AS (
      SELECT CAST(rx.two_r AS BIGINT) AS u, CAST(ry.two_r AS BIGINT) AS w
      FROM daily d JOIN rx ON rx.v = d.x JOIN ry ON ry.v = d.y
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(u * w) AS BIGINT) AS suw,
             CAST(SUM(u * u) AS BIGINT) AS suu,
             CAST(SUM(w * w) AS BIGINT) AS sww
      FROM j
    )
    SELECT n AS n_days,
           CASE WHEN (n * suu - su * su) > 0 AND (n * sww - sw * sw) > 0
                THEN CAST(n * suw - su * sw AS DOUBLE)
                     / sqrt(CAST(n * suu - su * su AS DOUBLE)
                            * CAST(n * sww - sw * sw AS DOUBLE))
           END AS rho
    FROM s
    """,
)
def pipeline_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — SPEARMAN rank correlation between daily
    revenue and daily order count: the robust (monotone, outlier-
    immune) dependence measure beside pipeline_xcorr's Pearson —
    a revenue spike from one whale order drags Pearson but moves
    ranks by one slot. Spearman-with-ties = Pearson on MIDRANKS,
    computed exactly: 2x-scaled midranks are integers
    (2R(v) = 2·cum_before(v) + c(v) + 1 over the distinct-value
    cumulative — the Mann–Whitney machinery), so every sum in
    r = (nΣuw − ΣuΣw) / √((nΣu²−(Σu)²)(nΣw²−(Σw)²)) is an exact
    int64. The day count is CALENDAR-bounded (~2.4k for the 7-year
    TPC-H span at every SF), so all magnitudes stay < 2^47 ≪ 2^53:
    the long→double casts are EXACT in both engines and rho is
    emitted unrounded — no decimal→double 1-ulp exposure anywhere
    (contrast pipeline_acf, whose decimal sums exceed 2^53 and emit
    at 9 dp). Revenue ranks on exact integer CENTS (decimal(18,2)·100
    → bigint, order-isomorphic); tie guard emits NULL for a
    degenerate constant series in both engines.

    Scale: one corpus pass to the calendar-bounded daily table; each
    rank leg is a distinct-value groupBy + the bucket-offset running
    pattern (B-way parallel windows + ≤8-row offset collect, no
    global window) + a value-bounded join-back (per-distinct-value —
    the corpus-bounded join-back case of the house rule). Everything
    after the first aggregate is control-plane sized."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .localCheckpoint(eager=True)  # calendar-bounded; read 3x below
    )

    def midranks2(col: str) -> DataFrame:
        counts = daily.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        run, _tot = bucketed_running(counts, col, ["c"])
        return run.select(
            F.col(col).alias("v"),
            (2 * (F.col("run_c") - F.col("c")) + F.col("c") + 1).alias("two_r"),
        )

    rx = midranks2("x").select(F.col("v").alias("vx"), F.col("two_r").alias("u"))
    ry = midranks2("y").select(F.col("v").alias("vy"), F.col("two_r").alias("w"))
    j = daily.join(rx, daily.x == rx.vx).join(ry, daily.y == ry.vy)
    st = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("su"),
        F.sum("w").alias("sw"),
        F.sum(F.col("u") * F.col("w")).alias("suw"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    dx = F.col("n") * F.col("suu") - F.col("su") * F.col("su")
    dy = F.col("n") * F.col("sww") - F.col("sw") * F.col("sw")
    num = F.col("n") * F.col("suw") - F.col("su") * F.col("sw")
    return st.select(
        F.col("n").alias("n_days"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("rho"),
    )


@query(
    "pipeline_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT sign(b.x - a.x) * sign(b.y - a.y) AS s,
             CASE WHEN b.x = a.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (
      SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(tx) AS BIGINT) AS n1,
             CAST(SUM(ty) AS BIGINT) AS n2
      FROM p
    ),
    nd AS (SELECT COUNT(*) AS n_days FROM daily)
    SELECT nd.n_days, s.n0 AS n_pairs, s.c AS n_concordant,
           s.d AS n_discordant,
           CASE WHEN (s.n0 - s.n1) > 0 AND (s.n0 - s.n2) > 0
                THEN CAST(s.c - s.d AS DOUBLE)
                     / sqrt(CAST(s.n0 - s.n1 AS DOUBLE)
                            * CAST(s.n0 - s.n2 AS DOUBLE))
           END AS tau_b
    FROM s, nd
    """,
)
def pipeline_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — KENDALL τ-b between daily revenue and daily
    order count: the concordance twin of pipeline_spearman's
    midrank correlation (same daily table, same tie-aware contract:
    τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with n₁/n₂ the x-/y-tied pair
    counts — Kendall 1945). Spearman answers "how monotone is the
    map", τ answers "what fraction of pairs order the same way" —
    the pair-level effect size reviewers ask for next to ρ.

    Determinism: every pair statistic is an integer (sign products
    and tie indicators summed as int64), so C, D, n₀, n₁, n₂ are
    exact; magnitudes are pair-bounded (~2.4k² / 2 < 2^23 ≪ 2^53),
    the long→double casts are exact, and τ-b is one shared IEEE
    sqrt + division — emitted unrounded like spearman's rho.

    Scale: ONE corpus pass to the CALENDAR-bounded daily table
    (~2.4k rows at every SF for the 7-year TPC-H span); the O(n²)
    pair enumeration is a broadcast non-equi self-join over that
    control-plane-sized table (the pipeline_theil_sen precedent —
    BroadcastNestedLoopJoin on a bounded side, never a corpus
    cartesian), and everything after it is a 1-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .localCheckpoint(eager=True)  # calendar-bounded; read 3x below
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    s = F.signum((F.col("xb") - F.col("xa")).cast("double")) * F.signum(
        (F.col("yb") - F.col("ya")).cast("double")
    )
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        s.alias("s"),
        F.when(F.col("xb") == F.col("xa"), 1).otherwise(0).alias("tx"),
        F.when(F.col("yb") == F.col("ya"), 1).otherwise(0).alias("ty"),
    )
    st = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias("d"),
        F.sum("tx").alias("n1"),
        F.sum("ty").alias("n2"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    dx = F.col("n0") - F.col("n1")
    dy = F.col("n0") - F.col("n2")
    return st.crossJoin(F.broadcast(nd)).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("n_concordant"),
        F.col("d").alias("n_discordant"),
        F.when(
            (dx > 0) & (dy > 0),
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("tau_b"),
    )


@query(
    "pipeline_bh_fdr",
    oracle="""
    WITH base AS (
      SELECT n.n_name AS nation, c.c_nationkey AS nk,
             COUNT(*) AS n_orders,
             CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
             CAST(SUM(n_urgent) AS BIGINT) AS kk,
             COUNT(*) AS m
      FROM base
    ),
    pv AS (
      SELECT nation, nk, n_orders, n_urgent, m,
             (CAST(n_urgent AS DOUBLE) / n_orders
              - CAST(kk AS DOUBLE) / nn)
             / sqrt((CAST(kk AS DOUBLE) / nn)
                    * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders) AS z,
             round(2.0 / (1.0 + exp(1.702 * abs(
               (CAST(n_urgent AS DOUBLE) / n_orders
                - CAST(kk AS DOUBLE) / nn)
               / sqrt((CAST(kk AS DOUBLE) / nn)
                      * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders)))), 6)
               AS p_value
      FROM base, tot
    ),
    rk AS (
      SELECT a.nation, a.n_orders, a.n_urgent, a.m, a.z, a.p_value,
             CAST(COUNT(*) AS BIGINT) AS bh_rank
      FROM pv a JOIN pv b
        ON (b.p_value < a.p_value)
           OR (b.p_value = a.p_value AND b.nk <= a.nk)
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    kstar AS (
      SELECT CAST(MAX(CASE WHEN p_value <= bh_rank * 0.05 / m
                           THEN bh_rank ELSE 0 END) AS BIGINT) AS k
      FROM rk
    )
    SELECT nation, n_orders, n_urgent, z, p_value, bh_rank,
           bh_rank <= k AS rejected
    FROM rk, kstar
    """,
)
def pipeline_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — BENJAMINI-HOCHBERG false-discovery-rate
    control (Benjamini & Hochberg 1995) over a 25-way hypothesis
    family: per nation, a two-proportion z-test of "this nation's
    urgent-order share differs from global", then the BH step-up —
    sort p-values ascending, find the largest rank k with
    p(k) ≤ k/m·α (α = 0.05), reject ranks ≤ k. The multiple-testing
    correction every per-segment screen (pipeline_ab_test,
    pipeline_chi_square run one test) needs once it fans out over
    segments — without it, 25 tests at α=0.05 expect a false
    positive by chance alone.

    Determinism: z is exact-IEEE on integer counts (all < 2^53, so
    every cast is exact and both engines evaluate the identical op
    tree). The two-sided p uses the LOGISTIC approximation to the
    normal CDF, p = 2/(1 + exp(1.702·|z|)) (the classic 1.702
    probit-logit scaling constant) — exp() differs between libms in
    the last ulp, so p rounds to 6 dp and EVERY downstream decision
    (ranking, BH threshold, rejection) reads the ROUNDED value (the
    llm_quality_logit recipe). Ranks come from a tie-broken
    (p, nationkey) pair count, total-ordered in both engines.

    Shape: one corpus pass (orders ⋈ customer, the standard big-side
    shuffle with nation broadcast) to a NATION-bounded 25-row table,
    localCheckpoint'ed (3 consumers under no-exchange-reuse); global
    counts ride as a broadcast 1-row aggregate; the rank self-join
    is 25×25 broadcast control-plane work; k* is another broadcast
    1-row aggregate. Nothing after the first aggregate touches the
    corpus."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(urgent).cast("long").alias("n_urgent"),
        )
        .localCheckpoint(eager=True)  # 25 rows; 3 consumers below
    )
    tot = base.agg(
        F.sum("n_orders").cast("long").alias("nn"),
        F.sum("n_urgent").cast("long").alias("kk"),
        F.count(F.lit(1)).alias("m"),
    )
    pg = F.col("kk").cast("double") / F.col("nn")
    z = (F.col("n_urgent").cast("double") / F.col("n_orders") - pg) / F.sqrt(
        pg * (F.lit(1.0) - pg) / F.col("n_orders")
    )
    pv = base.crossJoin(F.broadcast(tot)).select(
        "nation",
        "nk",
        "n_orders",
        "n_urgent",
        "m",
        z.alias("z"),
        F.round(
            2.0 / (1.0 + F.exp(F.lit(1.702) * F.abs(z))), 6
        ).alias("p_value"),
    )
    pvb = pv.select(F.col("nk").alias("nk_b"), F.col("p_value").alias("p_b"))
    rk = (
        pv.join(
            F.broadcast(pvb),
            (F.col("p_b") < F.col("p_value"))
            | ((F.col("p_b") == F.col("p_value")) & (F.col("nk_b") <= F.col("nk"))),
        )
        .groupBy("nation", "n_orders", "n_urgent", "m", "z", "p_value")
        .agg(F.count(F.lit(1)).alias("bh_rank"))
    )
    kstar = rk.agg(
        F.max(
            F.when(
                F.col("p_value") <= F.col("bh_rank") * 0.05 / F.col("m"),
                F.col("bh_rank"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k")
    )
    return rk.crossJoin(F.broadcast(kstar)).select(
        "nation",
        "n_orders",
        "n_urgent",
        "z",
        "p_value",
        "bh_rank",
        (F.col("bh_rank") <= F.col("k")).alias("rejected"),
    )


# Fixed weekday order for pipeline_anova's wide pivot: the cross-group
# reductions must be a FIXED-ORDER IEEE tree (Python's left-assoc `+`
# mirrors SQL's), so group stats are pivoted into columns instead of
# summed by an order-free aggregate.
_ANOVA_DAYS = list(range(7))


@query(
    "pipeline_anova",
    oracle=f"""
    WITH assigned AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    stats AS (
      SELECT g,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sx END) AS s{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sxx END) AS q{d}"
                   for d in _ANOVA_DAYS)}
      FROM stats
    )
    SELECT CAST({' + '.join(f'n{d}' for d in _ANOVA_DAYS)} AS BIGINT) AS n,
           CAST(7 AS BIGINT) AS k,
           ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}) AS ss_between,
           ({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             AS ss_within,
           ((({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)})) / 6.0)
           / ((({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
               - ({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)}))
              / (({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}) - 7.0))
             AS f_stat,
           (({' + '.join(f's{d} * s{d} / n{d}' for d in _ANOVA_DAYS)})
             - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
               / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)}))
           / (({' + '.join(f'q{d}' for d in _ANOVA_DAYS)})
              - ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
                * ({' + '.join(f's{d}' for d in _ANOVA_DAYS)})
                / ({' + '.join(f'n{d}' for d in _ANOVA_DAYS)})) AS eta_sq
    FROM wide
    """,
)
def pipeline_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — one-way ANOVA of purchase value across the
    seven weekdays (Mon=0 … Sun=6 via ISO day-of-week): the k-group
    generalization of pipeline_ab_test's two-arm t — 'does revenue
    per purchase depend on the day of week?' with F = (SSB/(k−1)) /
    (SSW/(N−k)) and η² = SSB/SST as the effect size. Per-group
    sufficient statistics follow the ab_test recipe exactly (exact
    decimal Σx, term-rounded Σx²); the cross-group reductions then
    run over a 7-group WIDE PIVOT so every multi-term double sum is
    a fixed-order left-associated IEEE tree — identical expression
    shape in both engines, no order-free double aggregation
    anywhere (the 5-term agg trap the chi-square key dodges with
    per-term rounding is dodged here structurally).

    Scale: one corpus pass to 7 groups of 3 sufficient statistics;
    the pivot and the F readout are a single control-plane row.
    Weekday extraction: Spark weekday() ≡ DuckDB isodow−1 (the
    1=Sunday dayofweek trap is avoided on both sides)."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    stats = assigned.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c))).alias(f"{a}{d}")
            for d in _ANOVA_DAYS
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )

    def _chain(make):
        out = make(0)
        for d in _ANOVA_DAYS[1:]:
            out = out + make(d)
        return out

    n_tot = _chain(lambda d: F.col(f"n{d}"))
    s_tot = _chain(lambda d: F.col(f"s{d}"))
    t_tot = _chain(lambda d: F.col(f"q{d}"))
    q_tot = _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ssb = q_tot - s_tot * s_tot / n_tot
    ssw = t_tot - q_tot
    return wide.select(
        n_tot.cast("long").alias("n"),
        F.lit(7).cast("long").alias("k"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / F.lit(6.0)) / (ssw / (n_tot - F.lit(7.0)))).alias("f_stat"),
        (ssb / (t_tot - s_tot * s_tot / n_tot)).alias("eta_sq"),
    )


@query(
    "pipeline_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT CAST(digit AS INT) AS digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / total AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS exp_share,
           abs(CAST(n AS DOUBLE) / total
               - round(log10(1.0 + 1.0 / digit), 6)) AS abs_dev
    FROM counts, tot
    ORDER BY digit
    """,
)
def pipeline_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — BENFORD'S-LAW first-digit screen on order
    totals: observed first-significant-digit shares against the
    log10(1+1/d) law, the standard forensic-accounting / synthetic-
    data smell test (fabricated or uniformly-generated amounts flunk
    it; TPC-H-style uniform prices do too, visibly — the point is
    the per-digit deviation column, not a verdict). First digit is
    extracted WITHOUT transcendentals: FLOOR(x) is exact on both
    engines (CAST-to-BIGINT truncation vs rounding is the known
    trap), and the leading char of the integer's decimal string is
    engine-stable — no log10-of-x digit math whose boundary cases
    (x exactly a power of 10 after FP log) could disagree. The law's
    expected share rounds its log10 at the transcendental (term
    rule); obs_share and abs_dev are shared IEEE trees over exact
    counts.

    Scale: one corpus pass to ≤9 cells; everything after is
    control-plane. The x ≥ 1 guard drops sub-unit amounts where the
    integer-string trick has no leading digit (none in the fixture:
    min price ~1013)."""
    o = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = (
        o.where(F.col("o_totalprice") >= 1)
        .select(digit)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # totals + shares
    )
    tot = counts.agg(F.sum("n").alias("total"))
    exp_share = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    obs = F.col("n").cast("double") / F.col("total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n"),
            obs.alias("obs_share"),
            exp_share.alias("exp_share"),
            F.abs(obs - exp_share).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "pipeline_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rows_ AS (SELECT p, SUM(o) AS r FROM cells GROUP BY p),
    cols_ AS (SELECT s, SUM(o) AS c FROM cells GROUP BY s),
    tot AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
      SELECT round((CAST(o AS DOUBLE) / n)
                   * round(ln(CAST(o AS DOUBLE) * n
                              / (CAST(r AS DOUBLE) * c)), 6), 9) AS mi_t,
             round(-(CAST(o AS DOUBLE) / n)
                   * round(ln(CAST(o AS DOUBLE) / n), 6), 9) AS h_t
      FROM cells JOIN rows_ USING (p) JOIN cols_ USING (s), tot
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           COUNT(*) AS n_cells,
           CAST(SUM(CAST(mi_t AS DECIMAL(18,9))) AS DOUBLE) AS mutual_info,
           CAST(SUM(CAST(h_t AS DECIMAL(18,9))) AS DOUBLE) AS joint_entropy,
           CAST(SUM(CAST(mi_t AS DECIMAL(18,9))) AS DOUBLE)
             / CAST(SUM(CAST(h_t AS DECIMAL(18,9))) AS DOUBLE)
             AS iqr_ratio
    FROM terms, tot
    GROUP BY n
    """,
)
def pipeline_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — MUTUAL INFORMATION (in nats) between order
    priority and status on the same contingency table as
    pipeline_chi_square: I(P;S) = Σ p_ij·ln(p_ij/(p_i·p_j)), with
    the joint entropy H(P,S) and their ratio (the information
    quality ratio) as the normalized readout — the information-
    theoretic association measure that, unlike chi², is comparable
    across table sizes and is the feature-selection score used for
    categorical columns in training pipelines. Each term rounds its
    ln at the transcendental and the product at 9 dp (terms are
    ≤ ln(cells) ≈ small magnitude — well inside the shortest-repr
    safe zone), then decimal-sums so cell order can't matter.

    Scale: identical cost shape to the chi-square key — one corpus
    pass to a (priorities × statuses)-bounded checkpointed cell
    table; margins re-aggregate the 15 rows via broadcast
    join-backs; a single control-plane row out."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)  # margins + totals + terms
    )
    rows_ = cells.groupBy("p").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("s").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    od = F.col("o").cast("double")
    mi_t = F.round(
        (od / F.col("n"))
        * F.round(
            F.log(od * F.col("n") / (F.col("r").cast("double") * F.col("c"))),
            6,
        ),
        9,
    )
    h_t = F.round(-(od / F.col("n")) * F.round(F.log(od / F.col("n")), 6), 9)
    terms = (
        cells.join(F.broadcast(rows_), "p")
        .join(F.broadcast(cols_), "s")
        .crossJoin(F.broadcast(tot))
        .select(mi_t.alias("mi_t"), h_t.alias("h_t"), "n")
    )
    mi = F.sum(F.col("mi_t").cast("decimal(18,9)")).cast("double")
    h = F.sum(F.col("h_t").cast("decimal(18,9)")).cast("double")
    return (
        terms.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            mi.alias("mutual_info"),
            h.alias("joint_entropy"),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            "n_cells",
            "mutual_info",
            "joint_entropy",
            (F.col("mutual_info") / F.col("joint_entropy")).alias(
                "iqr_ratio"
            ),
        )
    )


@query(
    "pipeline_grouped_ols",
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(p.p_retailprice AS DECIMAL(18,2)) AS x,
             CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT)
               AS y
      FROM part p LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey, p.p_retailprice
    ),
    stats AS (
      SELECT brand,
             COUNT(*) AS n,
             CAST(SUM(x) AS DECIMAL(28,2)) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS DECIMAL(28,2)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,2)) * x) AS DECIMAL(28,4)) AS sxx
      FROM demand GROUP BY brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_parts,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
           round((CAST(sy AS DOUBLE)
                  - round(CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE), 9)
                    * CAST(sx AS DOUBLE)) / n, 9) AS intercept
    FROM stats
    ORDER BY brand
    """,
)
def pipeline_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — GROUPED OLS: one regression PER BRAND in a
    single pass (demand curve: total quantity sold per part vs its
    retail price, 25 independent fits here, millions on a real
    catalog) — the many-small-models shape that distinguishes a
    distributed engine from a stats library looping over groups.
    pipeline_revenue_trend_forecast fits ONE global line;
    pipeline_theil_sen fits ONE robust line; this fits every group's
    line in the same two aggregations any one of them costs.

    Exactness: x = retail price as DECIMAL(18,2) (fixture-safe cast),
    y = integer quantity sum, so every sufficient statistic
    (n, Σx, Σy, Σxy, Σx²) is exact; slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    is a ratio of exact decimals whose unscaled magnitudes pass 2^53
    at sf ≥ ~0.5 — emitted at 9 dp (the pipeline_acf decimal-ratio
    recipe); the intercept reuses the ROUNDED slope so both engines
    derive it from bit-identical inputs. Parts that never sold enter
    with y = 0 (LEFT join): a demand curve estimated only on sold
    parts would survivorship-bias the slope toward zero.

    Scale: one lineitem shuffle on partkey (the per-part demand
    aggregate), one brand-bounded groupBy (25 rows out). Nothing
    else moves; at 100 TB the demand aggregate is the only
    corpus-sized exchange and it map-side-combines."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    sold = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    demand = pt.join(sold, pt.p_partkey == F.col("k"), "left").select(
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").cast("decimal(18,2)").alias("x"),
        F.coalesce(F.col("q"), F.lit(0)).cast("long").alias("y"),
    )
    st = demand.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(28,2)").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(28,2)").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("x"))
        .cast("decimal(28,4)")
        .alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round(num.cast("double") / den.cast("double"), 9)
    intercept = F.round(
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n"),
        9,
    )
    return st.select(
        "brand",
        F.col("n").cast("long").alias("n_parts"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).orderBy("brand")


@query(
    "pipeline_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    diffs AS (
      SELECT event_type, day,
             CASE WHEN x > LAG(x) OVER w THEN 1
                  WHEN x < LAG(x) OVER w THEN -1 END AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    signs AS (
      SELECT event_type, s,
             CASE WHEN s <> LAG(s) OVER (PARTITION BY event_type
                                         ORDER BY day) THEN 1 ELSE 0 END
               AS is_break
      FROM diffs WHERE s IS NOT NULL
    ),
    counts AS (
      SELECT event_type,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n_plus,
             SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n_minus,
             SUM(is_break) + 1 AS n_runs
      FROM signs GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_plus AS BIGINT) AS n_plus,
           CAST(n_minus AS BIGINT) AS n_minus,
           CAST(n_runs AS BIGINT) AS n_runs,
           CASE WHEN n_plus = 0 OR n_minus = 0 THEN NULL ELSE
           (CAST(n_runs AS DOUBLE)
            - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
           / sqrt(2.0 * n_plus * n_minus
                  * (2.0 * n_plus * n_minus - n_plus - n_minus)
                  / (CAST(n_plus + n_minus AS DOUBLE)
                     * (n_plus + n_minus)
                     * (n_plus + n_minus - 1.0))) END AS z_score,
           CASE WHEN n_plus = 0 OR n_minus = 0 THEN NULL ELSE
           abs((CAST(n_runs AS DOUBLE)
                - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
               / sqrt(2.0 * n_plus * n_minus
                      * (2.0 * n_plus * n_minus - n_plus - n_minus)
                      / (CAST(n_plus + n_minus AS DOUBLE)
                         * (n_plus + n_minus)
                         * (n_plus + n_minus - 1.0)))) <= 1.96
           END AS random_at_05
    FROM counts
    ORDER BY event_type
    """,
)
def pipeline_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — WALD–WOLFOWITZ RUNS TEST per event type: are
    the daily up/down moves of the value series RANDOM, or do they
    streak (momentum/trend) or alternate (mean-reversion,
    over-smoothing)? The classic randomness check a metrics platform
    runs before trusting i.i.d.-assuming monitors (CUSUM, Bollinger)
    on a series — too FEW runs ⇒ regimes (z < 0), too MANY ⇒
    oscillation (z > 0). Tie days (zero diff) drop per the standard
    formulation. Everything until the final z is exact integers:
    signs from exact-decimal daily totals, runs as sign-break counts
    + 1; μ_R = 2ab/n + 1 and σ²_R = 2ab(2ab−n)/(n²(n−1)) form one
    shared IEEE tree over those ints, emitted unrounded with the
    1.96 cut applied to the same double in both engines. A
    one-direction series (a·b = 0) has σ_R = 0 and the statistic is
    undefined — NULL, never NaN (whose comparisons diverge).

    Scale: one corpus pass to the dates×types-bounded daily table;
    both lag windows are type-partitioned (bounded, no global
    window); one row per type out."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("x").over(w)
    s = F.when(F.col("x") > prev, 1).when(F.col("x") < prev, -1)
    signs = (
        daily.select("event_type", "day", s.alias("s"))
        .where(F.col("s").isNotNull())
        .select(
            "event_type",
            "s",
            F.when(F.col("s") != F.lag("s").over(w), 1)
            .otherwise(0)
            .alias("is_break"),
        )
    )
    counts = signs.groupBy("event_type").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n_minus"),
        (F.sum("is_break") + 1).alias("n_runs"),
    )
    a = F.col("n_plus").cast("double")
    b = F.col("n_minus").cast("double")
    n = a + b
    mu = 2.0 * a * b / n + 1.0
    var = 2.0 * a * b * (2.0 * a * b - n) / (n * n * (n - 1.0))
    degenerate = (F.col("n_plus") == 0) | (F.col("n_minus") == 0)
    # a one-direction series has sigma_R = 0: 0/0 is NaN, and NaN
    # compares engine-dependently — the test is undefined there, so
    # emit NULL in both engines
    z = F.when(
        ~degenerate, (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    )
    return counts.select(
        "event_type",
        F.col("n_plus").cast("long").alias("n_plus"),
        F.col("n_minus").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        z.alias("z_score"),
        F.when(~degenerate, F.abs(z) <= 1.96).alias("random_at_05"),
    ).orderBy("event_type")


_SPELL_CTE = """ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             MAX(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey) AS cmax
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, CAST(o_custkey % 2 AS BIGINT) AS arm,
             MIN(CASE WHEN rn = 1 THEN od END) AS t1,
             MIN(CASE WHEN rn = 2 THEN od END) AS t2,
             MAX(cmax) AS cmax
      FROM ranked WHERE rn <= 2 GROUP BY o_custkey
    )"""


def _reorder_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer time-to-reorder spell ingredients — first order
    date t1, second order date t2 (NULL = censored), the customer's
    own max order date cmax, and the parity arm — the shared
    extraction behind pipeline_nelson_aalen / pipeline_logrank /
    pipeline_weibull_fit (SQL twin: _SPELL_CTE; pipeline_survival_km
    predates it and stays inline — driver-proven keys are not
    churned). Checkpointed: every consumer feeds both a 1-row
    globals aggregate and the spell pass (r12 review
    consolidation)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wmax = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.row_number().over(wc).alias("rn"),
        F.max(F.col("o_orderdate").cast("date")).over(wmax).alias("cmax"),
    ).where(F.col("rn") <= 2)
    return ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("od"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("od"))).alias("t2"),
        F.max("cmax").alias("cmax"),
    ).withColumn(
        "arm", (F.col("o_custkey") % 2).cast("long")
    ).localCheckpoint(eager=True)


@query(
    "pipeline_nelson_aalen",
    oracle=f"""
    WITH {_SPELL_CTE},
    g AS (SELECT MAX(cmax) AS gmax, COUNT(*) AS total FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM spells GROUP BY t
    ),
    cum AS (
      SELECT t, d, c, total,
             total - COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM by_time, g
    ),
    terms AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d > 0 THEN
               CAST(round(round(CAST(d AS DOUBLE) / n_risk, 6)
                          * 1000000, 0) AS BIGINT)
             ELSE 0 END AS hm,
             CASE WHEN d > 0 THEN
               CAST(round(round((CAST(d AS DOUBLE) / n_risk) / n_risk, 9)
                          * 1000000000, 0) AS BIGINT)
             ELSE 0 END AS vn
      FROM cum
    ),
    runs AS (
      SELECT t, d, c, n_risk,
             SUM(hm) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumh,
             SUM(vn) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CAST(cumh AS DOUBLE) / 1000000 AS cum_hazard,
           CAST(cumv AS DOUBLE) / 1000000000 AS var_hazard,
           round(exp(-(CAST(cumh AS DOUBLE) / 1000000)), 6) AS s_fh
    FROM runs
    """,
)
def pipeline_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard over the same time-to-reorder
    spells as pipeline_survival_km: H(t) = Sigma_{t_i<=t} d_i/n_i
    (Nelson 1972, Aalen 1978) with the simple variance estimate
    Sigma d_i/n_i^2, plus the Fleming-Harrington survival translation
    S_FH = exp(-H) (the estimator of choice when at-risk counts get
    small, where KM's product form loses precision). Completes the
    survival trio: KM estimates S directly, this estimates the
    HAZARD, pipeline_logrank compares arms.

    Determinism is the KM recipe verbatim: each per-time term is a
    ratio of exact integers rounded at 6 dp (hazard) / 9 dp
    (variance -- d/n^2 at fixture n would vanish at 6 dp), scaled to
    integer micros/nanos so both running sums are exact long
    addition; the only transcendental (exp) is rounded at emission.
    d = n_risk needs no sentinel here (the term is exactly 1.0, not
    a log singularity) -- the hazard just steps by 1.

    Scale: identical machinery and cost to pipeline_survival_km --
    bounded per-customer window, calendar-bounded distinct spell
    table, two bucket-offset running passes (the second carries BOTH
    cumulative columns in one pass), globals ride a broadcast row.
    Cites reference README.md:70 ("amenable to efficient querying")
    -- lifecycle/churn readouts are that end state."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    g = per_cust.agg(
        F.max("cmax").alias("gmax"), F.count(F.lit(1)).alias("total")
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "total",
    )
    by_time = (
        spells.groupBy("t", "total")
        .agg(F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c"))
        .withColumn("dc", F.col("d") + F.col("c"))
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc"])
    n_risk = F.col("total") - (F.col("run_dc") - F.col("dc"))
    dd = F.col("d").cast("double")
    hm = F.when(
        F.col("d") > 0,
        F.round(F.round(dd / F.col("n_risk"), 6) * 1_000_000, 0).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    vn = F.when(
        F.col("d") > 0,
        F.round(
            F.round((dd / F.col("n_risk")) / F.col("n_risk"), 9)
            * 1_000_000_000,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    terms = (
        out1.withColumn("n_risk", n_risk)
        .select("t", "d", "c", "n_risk", hm.alias("hm"), vn.alias("vn"))
        .localCheckpoint(eager=True)  # second offset collect + window
    )
    out2, _ = bucketed_running(terms, "t", ["hm", "vn"])
    cumh = F.col("run_hm").cast("double") / 1_000_000
    cumv = F.col("run_vn").cast("double") / 1_000_000_000
    return out2.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        cumh.alias("cum_hazard"),
        cumv.alias("var_hazard"),
        F.round(F.exp(-cumh), 6).alias("s_fh"),
    )


@query(
    "pipeline_logrank",
    oracle=f"""
    WITH {_SPELL_CTE},
    g AS (SELECT MAX(cmax) AS gmax,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS total1,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS total0
          FROM per_cust),
    spells AS (
      SELECT CASE WHEN t2 IS NOT NULL THEN date_diff('day', t1, t2)
                  ELSE date_diff('day', t1, gmax) END AS t,
             CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev,
             arm, total1, total0
      FROM per_cust, g
    ),
    by_time AS (
      SELECT t, total1, total0,
             CAST(SUM(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
               AS d0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dc1,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS dc0
      FROM spells GROUP BY t, total1, total0
    ),
    cum AS (
      SELECT *,
        total1 - COALESCE(SUM(dc1) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        total0 - COALESCE(SUM(dc0) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
      FROM by_time
    ),
    terms AS (
      SELECT d1, d0,
        CASE WHEN d1 + d0 > 0 THEN
          CAST(round(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0), 6)
               AS DECIMAL(18,6))
        ELSE CAST(0 AS DECIMAL(18,6)) END AS e1t,
        CASE WHEN d1 + d0 > 0 AND n1 + n0 > 1 THEN
          CAST(round(
            ((CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0))
             * (CAST(n0 AS DOUBLE) / (n1 + n0)))
            * ((CAST(n1 + n0 AS DOUBLE) - (d1 + d0)) / (n1 + n0 - 1)),
            6) AS DECIMAL(18,6))
        ELSE CAST(0 AS DECIMAL(18,6)) END AS vt
      FROM cum
    ),
    s AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(d0) AS BIGINT) AS o0,
             SUM(e1t) AS e1s, SUM(vt) AS vs
      FROM terms
    ),
    z AS (
      SELECT total1 AS n_arm1, total0 AS n_arm0, o1, o0,
             CAST(e1s AS DOUBLE) AS e1_expected,
             CAST(vs AS DOUBLE) AS variance,
             CASE WHEN CAST(vs AS DOUBLE) > 0 THEN
               (CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
               / sqrt(CAST(vs AS DOUBLE))
             END AS z_score
      FROM s, g
    )
    SELECT n_arm1, n_arm0, o1, o0, e1_expected, variance, z_score,
           z_score * z_score AS chi_square,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM z
    """,
)
def pipeline_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK test (Mantel 1966) comparing time-to-reorder between
    the parity experiment arms (o_custkey % 2) -- the censoring-aware
    arm comparison pipeline_ab_test cannot do (a t-test on observed
    gaps silently drops every one-order customer; KM curves per arm
    show the difference but don't test it). At each distinct event
    time: O1 accumulates arm-1 events, E1 the hypergeometric
    expectation d*n1/n, V the hypergeometric variance
    d*(n1/n)*(n0/n)*(n-d)/(n-1); z = (O1-E1)/sqrt(V).

    Determinism: O1 is an exact long. Each E1/V term is a ratio of
    exact integers evaluated in ONE fixed-shape IEEE tree (written
    identically here and in the oracle), rounded at 6 dp and summed
    in decimal -- the house rational-term recipe -- so both sums are
    order-free exact; z/chi2 are a shared tree over their double
    casts (unscaled sums < 2^53 at any plausible corpus: E1 is
    bounded by the event count). The logistic-CDF p is rounded at
    its transcendental (bh_fdr precedent), decision reads the
    rounded value. Times with n = 1 contribute no variance (the
    standard convention); zero total variance emits NULL z/p, never
    a division crash.

    Scale: the same bounded machinery as pipeline_survival_km --
    per-customer window, calendar-bounded distinct-time table, ONE
    bucket-offset running pass carrying both arms' at-risk
    cumulatives, per-arm totals riding the broadcast globals row.
    Nothing scales past the distinct-spell-length table."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    g = per_cust.agg(
        F.max("cmax").alias("gmax"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("total1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("total0"),
    )
    spells = per_cust.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("gmax", "t1")).alias("t"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        "arm",
        "total1",
        "total0",
    )
    by_time = (
        spells.groupBy("t", "total1", "total0")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("ev")).otherwise(0))
            .cast("long")
            .alias("d1"),
            F.sum(F.when(F.col("arm") == 0, F.col("ev")).otherwise(0))
            .cast("long")
            .alias("d0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("dc1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("dc0"),
        )
        .localCheckpoint(eager=True)  # cuts + offsets + windowed pass
    )
    out1, _ = bucketed_running(by_time, "t", ["dc1", "dc0"])
    n1 = F.col("total1") - (F.col("run_dc1") - F.col("dc1"))
    n0 = F.col("total0") - (F.col("run_dc0") - F.col("dc0"))
    cum = out1.select("d1", "d0", n1.alias("n1"), n0.alias("n0"))
    d = F.col("d1") + F.col("d0")
    n = F.col("n1") + F.col("n0")
    dd = d.cast("double")
    zero6 = F.lit(0).cast("decimal(18,6)")
    e1t = F.when(
        d > 0, F.round(dd * F.col("n1") / n, 6).cast("decimal(18,6)")
    ).otherwise(zero6)
    vt = F.when(
        (d > 0) & (n > 1),
        F.round(
            ((dd * F.col("n1") / n) * (F.col("n0").cast("double") / n))
            * ((n.cast("double") - d) / (n - 1)),
            6,
        ).cast("decimal(18,6)"),
    ).otherwise(zero6)
    s = cum.select(
        "d1", "d0", e1t.alias("e1t"), vt.alias("vt")
    ).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d0").cast("long").alias("o0"),
        F.sum("e1t").alias("e1s"),
        F.sum("vt").alias("vs"),
    )
    zrow = s.crossJoin(F.broadcast(g))
    e1d = F.col("e1s").cast("double")
    vd = F.col("vs").cast("double")
    z = F.when(vd > 0, (F.col("o1").cast("double") - e1d) / F.sqrt(vd))
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return zrow.select(
        F.col("total1").alias("n_arm1"),
        F.col("total0").alias("n_arm0"),
        "o1",
        "o0",
        e1d.alias("e1_expected"),
        vd.alias("variance"),
        z.alias("z_score"),
        (z * z).alias("chi_square"),
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_wilcoxon_signed_rank",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s95,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s96
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey
    ),
    d AS (
      SELECT s96 - s95 AS diff FROM per
      WHERE s95 IS NOT NULL AND s96 IS NOT NULL AND s96 <> s95
    ),
    by_val AS (
      SELECT CAST(abs(diff) * 100 AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_pos,
             COUNT(*) AS c
      FROM d GROUP BY 1
    ),
    cum AS (SELECT *, SUM(c) OVER (ORDER BY cents) AS run_c FROM by_val),
    agg AS (
      SELECT CAST(SUM(c_pos * (2 * (run_c - c) + c + 1)) AS BIGINT)
               AS two_w,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term,
             CAST(SUM(c) AS BIGINT) AS n
      FROM cum
    ),
    z AS (
      SELECT n, two_w, tie_term,
             CAST(two_w AS DOUBLE) / 2 AS w_pos,
             CASE WHEN n > 0
                   AND 2 * n * (n + 1) * (2 * n + 1) - tie_term > 0 THEN
               CAST(2 * two_w - n * (n + 1) AS DOUBLE)
               / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie_term
                           AS DOUBLE) / 3.0)
             END AS z_score
      FROM agg
    )
    SELECT n, two_w AS two_w_pos, w_pos, tie_term, z_score,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM z
    """,
)
def pipeline_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILCOXON SIGNED-RANK test (Wilcoxon 1945) on PAIRED
    per-customer spend: 1995 total vs 1996 total for customers active
    in both years -- the within-subject before/after readout the
    two-sample keys can't express (mann_whitney compares two
    independent arms; this pairs each customer with themselves, so
    between-customer variance cancels). Zero diffs drop (the standard
    exclusion treatment); W+ sums the |diff| midranks of positive
    diffs.

    Exactness: spend totals are exact DECIMAL(18,2) sums, so diff and
    |diff| are exact and rank order is exact integer CENTS (the 2-dp
    scale makes x100 integral -- no float keys). The mann_whitney
    DOUBLED-midrank identity keeps 2W+ = Sigma c_pos(2 cum_before +
    c + 1) an exact long over the distinct-|diff| cumulative; the
    tie-corrected normal approximation reduces (x4 both sides) to
    z = (2*2W+ - n(n+1)) / sqrt((2n(n+1)(2n+1) - tie)/3) -- one
    shared IEEE tree over exact-int casts, emitted unrounded. The
    logistic-CDF p rounds at its transcendental. Degenerate inputs
    (no pairs, zero variance) emit NULL, never a crash. The inner
    int 2n(n+1)(2n+1) stays exact-in-double below n ~ 1e5 pairs;
    past that, emit z at 9 dp (the big-decimal-ratio rule, noted).

    Scale: one groupBy(customer) pass (partial-agg friendly), then
    everything is bounded by distinct |diff| values (2-dp cents --
    pre-quantized by construction); the cumulative is the
    bucket-offset pattern, no global window."""
    from osm_airflow_spark.bucketing import bucketed_running

    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    per = (
        o.where(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1995, dec)).alias("s95"),
            F.sum(F.when(yr == 1996, dec)).alias("s96"),
        )
    )
    d = per.where(
        F.col("s95").isNotNull()
        & F.col("s96").isNotNull()
        & (F.col("s96") != F.col("s95"))
    ).select((F.col("s96") - F.col("s95")).alias("diff"))
    by_val = (
        d.groupBy((F.abs("diff") * 100).cast("long").alias("cents"))
        .agg(
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
            .cast("long")
            .alias("c_pos"),
            F.count(F.lit(1)).alias("c"),
        )
        .localCheckpoint(eager=True)  # distinct-|diff|-bounded
    )
    out, _ = bucketed_running(by_val, "cents", ["c"])
    cum_before = F.col("run_c") - F.col("c")
    agg = out.agg(
        F.sum(F.col("c_pos") * (2 * cum_before + F.col("c") + 1))
        .cast("long")
        .alias("two_w"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term"),
        F.sum("c").cast("long").alias("n"),
    )
    n = F.col("n")
    inner = 2 * n * (n + 1) * (2 * n + 1) - F.col("tie_term")
    z = F.when(
        (n > 0) & (inner > 0),
        (2 * F.col("two_w") - n * (n + 1)).cast("double")
        / F.sqrt(inner.cast("double") / 3.0),
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return agg.select(
        "n",
        F.col("two_w").alias("two_w_pos"),
        (F.col("two_w").cast("double") / 2).alias("w_pos"),
        "tie_term",
        z.alias("z_score"),
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


_WEEKDAY_BLOCK_CTE = """daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    filled AS (
      SELECT s.day, COALESCE(a.rev, CAST(0 AS DECIMAL(38,2))) AS rev
      FROM spine s LEFT JOIN daily a ON a.day = s.day
    ),
    cells AS (
      SELECT CAST(FLOOR(date_diff('day', DATE '1970-01-05', day) / 7)
                  AS BIGINT) AS blk,
             (EXTRACT(isodow FROM day) - 1) AS wd, rev
      FROM filled
    ),
    complete AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY blk) AS n_in_blk FROM cells
      ) WHERE n_in_blk = 7
    ),
    rk AS (
      SELECT blk, wd,
             2 * RANK() OVER (PARTITION BY blk ORDER BY rev)
               + COUNT(*) OVER (PARTITION BY blk, rev) - 1 AS two_r
      FROM complete
    )"""


def _weekday_block_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubled within-week weekday midranks of daily revenue over
    complete Monday-aligned weeks, zero-filled from a date spine —
    the shared block machinery behind pipeline_friedman and
    pipeline_page_trend (SQL twin: _WEEKDAY_BLOCK_CTE). Returns
    (blk, wd, two_r); ranks are exact ints from two bounded
    7-row-partition windows (r12 review consolidation)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .localCheckpoint(eager=True)  # feeds span AND the fill join
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        )
    )
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("rev"), F.lit(0).cast("decimal(28,2)")).alias("rev"),
    )
    monday0 = F.to_date(F.lit("1970-01-05"))
    cells = filled.select(
        F.floor(F.datediff("day", monday0) / 7).alias("blk"),
        F.weekday("day").alias("wd"),
        "rev",
    )
    wblk = Window.partitionBy("blk")
    complete = cells.withColumn(
        "n_in_blk", F.count(F.lit(1)).over(wblk)
    ).where(F.col("n_in_blk") == 7)
    wrank = Window.partitionBy("blk").orderBy("rev")
    wpeer = Window.partitionBy("blk", "rev")
    return complete.select(
        "blk",
        "wd",
        (
            2 * F.rank().over(wrank) + F.count(F.lit(1)).over(wpeer) - 1
        ).alias("two_r"),
    )


_FR_TW = ", ".join(
    f"CAST(SUM(CASE WHEN wd = {k} THEN two_r ELSE 0 END) AS BIGINT)"
    f" AS tw{k}"
    for k in range(7)
)
_FR_SR2 = " + ".join(f"tw{k} * tw{k}" for k in range(7))


@query(
    "pipeline_friedman",
    oracle=f"""
    WITH {_WEEKDAY_BLOCK_CTE},
    agg AS (
      SELECT {_FR_TW},
             CAST(SUM(two_r * two_r) AS BIGINT) AS den_all,
             CAST(COUNT(*) / 7 AS BIGINT) AS b
      FROM rk
    ),
    chi AS (
      SELECT b AS n_weeks, {", ".join(f"tw{k}" for k in range(7))},
             CASE WHEN den_all - 448 * b > 0 THEN
               CAST(6 * (({_FR_SR2}) - 448 * b * b) AS DOUBLE)
               / (den_all - 448 * b)
             END AS chi_square
      FROM agg
    )
    SELECT n_weeks, {", ".join(f"tw{k}" for k in range(7))}, chi_square,
           round(exp(-(chi_square / 2))
                 * (1 + (chi_square / 2)
                      + ((chi_square / 2) * (chi_square / 2)) / 2), 6)
             AS p_approx,
           round(exp(-(chi_square / 2))
                 * (1 + (chi_square / 2)
                      + ((chi_square / 2) * (chi_square / 2)) / 2), 6)
             < 0.05 AS significant
    FROM chi
    """,
)
def pipeline_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN test (Friedman 1937) for a weekday effect on daily
    revenue, treating each complete Monday-aligned WEEK as a block --
    the within-block rank design that removes week-to-week level
    shifts (seasonality, growth) which pollute pipeline_kruskal_wallis'
    pooled ranks: each week ranks its own 7 days, so only the
    weekday PATTERN accumulates. Tie-adjusted form
    chi2 = (k-1)(Sigma R_j^2 - b^2 k(k+1)^2/4)/(Sigma r_ij^2 -
    bk(k+1)^2/4), dof k-1 = 6.

    Exactness: daily revenue is an exact decimal sum; within-block
    DOUBLED midranks 2r = 2*RANK + peers - 1 are exact ints from two
    BOUNDED windows (7 rows per block -- lint-clean); with ranks
    doubled, BOTH the numerator and denominator quarter-factors
    cancel, so chi2 is a ratio of exact LONGS (k(k+1)^2 = 448) --
    one double division, emitted unrounded, NO wide-pivot IEEE
    ordering to manage at all (integer addition is order-free). The
    chi2_6 survival (even dof: exp(-h)(1+h+h^2/2)) rounds at the
    transcendental, decision reads the rounded value (the kruskal
    rule). All-tied weeks (den = 448b) emit NULL, never a crash.
    Monday alignment dodges the epoch-is-a-Thursday trap (r5 ledger)
    via the 1970-01-05 Monday anchor; incomplete edge weeks drop.
    Days with no orders are ZERO-FILLED from a date spine (the
    date_spine idiom) -- a quiet calendar day is real zero revenue,
    not a missing cell, and without the fill sparse small-SF corpora
    have no complete weeks at all (measured at sf0.001).

    Scale: one groupBy(day) pass (partial-agg friendly), then
    everything is calendar-bounded (days); the 7 rank sums ride one
    global aggregate row."""
    rk = _weekday_block_ranks(spark, sf_dir)
    agg = rk.agg(
        *[
            F.sum(F.when(F.col("wd") == k, F.col("two_r")).otherwise(0))
            .cast("long")
            .alias(f"tw{k}")
            for k in range(7)
        ],
        F.sum(F.col("two_r") * F.col("two_r")).cast("long").alias("den_all"),
        (F.count(F.lit(1)) / 7).cast("long").alias("b"),
    )
    sr2 = None
    for k in range(7):
        t = F.col(f"tw{k}") * F.col(f"tw{k}")
        sr2 = t if sr2 is None else sr2 + t
    b = F.col("b")
    chi2 = F.when(
        F.col("den_all") - 448 * b > 0,
        (6 * (sr2 - 448 * b * b)).cast("double")
        / (F.col("den_all") - 448 * b),
    )
    chi = agg.select(
        b.alias("n_weeks"),
        *[F.col(f"tw{k}") for k in range(7)],
        chi2.alias("chi_square"),
    )
    half = F.col("chi_square") / 2
    p = F.round(F.exp(-half) * (1 + half + (half * half) / 2), 6)
    return chi.select(
        "n_weeks",
        *[F.col(f"tw{k}") for k in range(7)],
        "chi_square",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_holm",
    oracle="""
    WITH base AS (
      SELECT n.n_name AS nation, c.c_nationkey AS nk,
             COUNT(*) AS n_orders,
             CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
             CAST(SUM(n_urgent) AS BIGINT) AS kk,
             COUNT(*) AS m
      FROM base
    ),
    pv AS (
      SELECT nation, nk, n_orders, n_urgent, m,
             (CAST(n_urgent AS DOUBLE) / n_orders
              - CAST(kk AS DOUBLE) / nn)
             / sqrt((CAST(kk AS DOUBLE) / nn)
                    * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders) AS z,
             round(2.0 / (1.0 + exp(1.702 * abs(
               (CAST(n_urgent AS DOUBLE) / n_orders
                - CAST(kk AS DOUBLE) / nn)
               / sqrt((CAST(kk AS DOUBLE) / nn)
                      * (1.0 - CAST(kk AS DOUBLE) / nn) / n_orders)))), 6)
               AS p_value
      FROM base, tot
    ),
    rk AS (
      SELECT a.nation, a.n_orders, a.n_urgent, a.m, a.z, a.p_value,
             CAST(COUNT(*) AS BIGINT) AS hrank
      FROM pv a JOIN pv b
        ON (b.p_value < a.p_value)
           OR (b.p_value = a.p_value AND b.nk <= a.nk)
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    fstar AS (
      SELECT CAST(COALESCE(MIN(CASE WHEN p_value > 0.05 / (m - hrank + 1)
                                    THEN hrank END), MAX(m) + 1) AS BIGINT)
               AS ff
      FROM rk
    )
    SELECT nation, n_orders, n_urgent, z, p_value, hrank,
           0.05 / (m - hrank + 1) AS holm_alpha,
           hrank < ff AS rejected,
           p_value <= 0.05 / m AS bonf_rejected
    FROM rk, fstar
    """,
)
def pipeline_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension -- HOLM step-DOWN multiple-testing control (Holm
    1979) over the same 25-nation urgent-share z-test family as
    pipeline_bh_fdr, completing the correction pair: BH steps UP
    controlling FDR (find the LARGEST passing rank, reject below),
    Holm steps DOWN controlling FWER (walk the sorted p-values from
    the smallest, reject while p_(i) <= alpha/(m-i+1), STOP at the
    first failure -- later ranks stay accepted even if they
    individually pass). Plain Bonferroni rides as a third column;
    by construction bonferroni rejects subset holm rejects subset
    bh (pinned in tests).

    Determinism is the bh_fdr recipe verbatim: exact-IEEE z on
    integer counts, logistic-Phi p rounded 6 dp with EVERY decision
    reading the rounded value, tie-broken (p, nationkey) ranks from
    the 25x25 broadcast pair count. The step-down stopping point is
    MIN(rank where p > alpha/(m-rank+1)) -- a broadcast 1-row
    aggregate (the kstar shape), so 'reject' is rank < first_fail
    with no running window at all.

    Shape: identical cost to bh_fdr -- one corpus pass to the
    nation-bounded 25-row family, everything after is broadcast
    control-plane. Cites operators: pipeline_bh_fdr
    (plans/analytics.py) for the shared family design."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_nationkey").alias("nk")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(urgent).cast("long").alias("n_urgent"),
        )
        .localCheckpoint(eager=True)  # 25 rows; 3 consumers below
    )
    tot = base.agg(
        F.sum("n_orders").cast("long").alias("nn"),
        F.sum("n_urgent").cast("long").alias("kk"),
        F.count(F.lit(1)).alias("m"),
    )
    pg = F.col("kk").cast("double") / F.col("nn")
    z = (F.col("n_urgent").cast("double") / F.col("n_orders") - pg) / F.sqrt(
        pg * (F.lit(1.0) - pg) / F.col("n_orders")
    )
    pv = base.crossJoin(F.broadcast(tot)).select(
        "nation",
        "nk",
        "n_orders",
        "n_urgent",
        "m",
        z.alias("z"),
        F.round(
            2.0 / (1.0 + F.exp(F.lit(1.702) * F.abs(z))), 6
        ).alias("p_value"),
    )
    pvb = pv.select(F.col("nk").alias("nk_b"), F.col("p_value").alias("p_b"))
    rk = (
        pv.join(
            F.broadcast(pvb),
            (F.col("p_b") < F.col("p_value"))
            | (
                (F.col("p_b") == F.col("p_value"))
                & (F.col("nk_b") <= F.col("nk"))
            ),
        )
        .groupBy("nation", "n_orders", "n_urgent", "m", "z", "p_value")
        .agg(F.count(F.lit(1)).alias("hrank"))
    )
    thr = F.lit(0.05) / (F.col("m") - F.col("hrank") + 1)
    fstar = rk.agg(
        F.coalesce(
            F.min(F.when(F.col("p_value") > thr, F.col("hrank"))),
            F.max("m") + 1,
        )
        .cast("long")
        .alias("ff")
    )
    return rk.crossJoin(F.broadcast(fstar)).select(
        "nation",
        "n_orders",
        "n_urgent",
        "z",
        "p_value",
        "hrank",
        thr.alias("holm_alpha"),
        (F.col("hrank") < F.col("ff")).alias("rejected"),
        (F.col("p_value") <= F.lit(0.05) / F.col("m")).alias("bonf_rejected"),
    )


@query(
    "pipeline_page_trend",
    oracle=f"""
    WITH {_WEEKDAY_BLOCK_CTE},
    agg AS (
      SELECT CAST(SUM((wd + 1) * two_r) AS BIGINT) AS two_l,
             CAST(COUNT(*) / 7 AS BIGINT) AS b
      FROM rk
    ),
    zz AS (
      SELECT b AS n_weeks, two_l,
             CAST(two_l AS DOUBLE) / 2 AS l_stat,
             CASE WHEN b > 0 THEN
               CAST(6 * two_l - 1344 * b AS DOUBLE) / sqrt(18816.0 * b)
             END AS z_score
      FROM agg
    )
    SELECT n_weeks, two_l, l_stat, z_score,
           round(1.0 / (1 + exp(1.702 * z_score)), 6) AS p_one_sided,
           round(1.0 / (1 + exp(1.702 * z_score)), 6) < 0.05 AS significant
    FROM zz
    """,
)
def pipeline_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE'S L trend test (Page 1963) on the same within-week
    weekday ranks as pipeline_friedman -- the ORDERED-alternative
    version: Friedman asks "do weekdays differ at all?", Page asks
    "does revenue INCREASE through the week (Mon < Tue < ... < Sun)?"
    and buys the usual power win when the ordering is the real
    hypothesis. L = Sigma_j c_j R_j with c_j = 1..7 in weekday order.

    Exactness: identical block machinery to pipeline_friedman
    (spine-zero-filled days, Monday-anchored complete weeks, exact
    doubled midranks from two bounded windows). With doubled ranks
    2L = Sigma (wd+1) 2r is an exact long, and scaling the normal
    approximation by 12 clears every fraction: z = (12L - 3bk(k+1)^2)
    / sqrt(b k^2 (k+1)^2 (k-1)) = (6*2L - 1344b)/sqrt(18816b) -- one
    shared IEEE tree over exact longs, emitted unrounded. The
    one-sided p (positive z = ascending trend) uses the logistic-Phi
    recipe rounded at the transcendental; the variance is the
    standard no-ties form (midrank ties make it conservative --
    documented, the textbook treatment). b = 0 emits NULL.

    Scale: one groupBy(day) pass, then calendar-bounded; the L sum
    rides one global aggregate row."""
    rk = _weekday_block_ranks(spark, sf_dir)
    agg = rk.agg(
        F.sum((F.col("wd") + 1) * F.col("two_r")).cast("long").alias("two_l"),
        (F.count(F.lit(1)) / 7).cast("long").alias("b"),
    )
    b = F.col("b")
    z = F.when(
        b > 0,
        (6 * F.col("two_l") - 1344 * b).cast("double")
        / F.sqrt(F.lit(18816.0) * b),
    )
    p = F.round(1.0 / (1 + F.exp(1.702 * z)), 6)
    return agg.select(
        b.alias("n_weeks"),
        "two_l",
        (F.col("two_l").cast("double") / 2).alias("l_stat"),
        z.alias("z_score"),
        p.alias("p_one_sided"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_weibull_fit",
    oracle=f"""
    WITH {_SPELL_CTE},
    spells AS (
      SELECT date_diff('day', t1, t2) AS t
      FROM per_cust
      WHERE t2 IS NOT NULL AND date_diff('day', t1, t2) >= 1
    ),
    g AS (SELECT COUNT(*) AS n FROM spells),
    by_val AS (SELECT t, COUNT(*) AS c FROM spells GROUP BY t),
    cum AS (
      SELECT t, SUM(c) OVER (ORDER BY t) AS r, n FROM by_val, g
    ),
    pts AS (
      SELECT round(ln(CAST(t AS DOUBLE)), 6) AS x,
             round(ln(-ln(1.0 - (CAST(r AS DOUBLE) - 0.3)
                                / (CAST(n AS DOUBLE) + 0.4))), 6) AS y
      FROM cum
    ),
    dsums AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(x AS DECIMAL(18,6))) AS sx,
             SUM(CAST(y AS DECIMAL(18,6))) AS sy,
             SUM(CAST(round(x * x, 6) AS DECIMAL(18,6))) AS sxx,
             SUM(CAST(round(x * y, 6) AS DECIMAL(18,6))) AS sxy
      FROM pts
    ),
    fit AS (
      SELECT CAST((SELECT n FROM g) AS BIGINT) AS n_spells,
             CAST(k AS BIGINT) AS n_points,
             CASE WHEN k >= 2 AND k * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
               (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE))
               / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
             END AS beta,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, k AS kk
      FROM dsums
    )
    SELECT n_spells, n_points, beta AS shape_beta,
           CASE WHEN beta > 0 THEN
             round(exp(-(((syd - beta * sxd) / kk) / beta)), 6)
           END AS scale_eta_days
    FROM fit
    """,
)
def pipeline_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIBULL FIT of time-to-reorder by median-rank regression (the
    classic Weibull-plot estimator): linearize 1-F = exp(-(t/eta)^b)
    to ln(-ln(1-F)) = b ln t - b ln eta, estimate F at each distinct
    spell length with Bernard's approximation (r-0.3)/(n+0.4), and
    OLS the transformed points -- the PARAMETRIC member of the
    survival family (KM estimates S nonparametrically, Nelson-Aalen
    the hazard, log-rank compares arms; the Weibull shape b answers
    'is churn risk rising or falling with tenure': b < 1 = early
    churn, b > 1 = wear-out). Simple-variant contract: UNCENSORED
    spells only, same-day reorders (t = 0) excluded -- the quick
    engineering fit; censoring-aware inference stays with KM.

    Determinism: one point per distinct spell length; both logs are
    rounded 6 dp at the transcendental and the two products
    pre-rounded 6 dp before exact decimal sums (the price_elasticity
    transcendental-regressor discipline); beta is a shared IEEE tree
    over the decimal-cast sums (unscaled magnitudes are
    log-of-calendar-bounded -- nowhere near 2^53), emitted unrounded;
    eta re-rounds at its exp (the libm rule). Degenerate inputs
    (fewer than two distinct t -- a one-point 'line' whose 6-dp
    product residue would otherwise sneak past the variance guard --
    or beta <= 0) emit NULL.

    Scale: per-customer bounded window, then everything is bounded
    by distinct spell lengths (calendar); the cumulative rank uses
    the bucket-offset pattern, no global window."""
    from osm_airflow_spark.bucketing import bucketed_running

    per_cust = _reorder_per_cust(spark, sf_dir)
    spells = per_cust.where(
        F.col("t2").isNotNull() & (F.datediff("t2", "t1") >= 1)
    ).select(F.datediff("t2", "t1").alias("t"))
    by_val = (
        spells.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # distinct-spell-bounded
    )
    out, totals = bucketed_running(by_val, "t", ["c"])
    n = totals["c"]
    x = F.round(F.log(F.col("t").cast("double")), 6)
    fhat = (F.col("run_c") - 0.3) / F.lit(float(n) + 0.4)
    y = F.round(F.log(-F.log(1.0 - fhat)), 6)
    pts = out.select(x.alias("x"), y.alias("y"))
    dec6 = "decimal(18,6)"
    dsums = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(dec6)).alias("sx"),
        F.sum(F.col("y").cast(dec6)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dec6)).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(dec6)).alias("sxy"),
    )
    k = F.col("k")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    den = k * F.col("sxx").cast("double") - sxd * sxd
    beta = F.when(
        (k >= 2) & (den > 0),
        (k * F.col("sxy").cast("double") - sxd * syd) / den,
    )
    eta = F.when(
        beta > 0, F.round(F.exp(-(((syd - beta * sxd) / k) / beta)), 6)
    )
    return dsums.select(
        F.lit(n).cast("long").alias("n_spells"),
        k.cast("long").alias("n_points"),
        beta.alias("shape_beta"),
        eta.alias("scale_eta_days"),
    )


@query(
    "pipeline_jarque_bera",
    oracle="""
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  AS DECIMAL(25,6)) AS DOUBLE) AS sx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ),
    devs AS (
      SELECT e.event_type, s.n,
             CAST(round((e.value - s.sx / s.n) * (e.value - s.sx / s.n), 6)
                  AS DECIMAL(24,6)) AS d2,
             CAST(round((e.value - s.sx / s.n) * (e.value - s.sx / s.n)
                        * (e.value - s.sx / s.n), 6)
                  AS DECIMAL(30,6)) AS d3,
             CAST(round(((e.value - s.sx / s.n) * (e.value - s.sx / s.n))
                        * ((e.value - s.sx / s.n) * (e.value - s.sx / s.n)),
                        6) AS DECIMAL(30,6)) AS d4
      FROM events e JOIN stats s USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    moms AS (
      SELECT event_type, MAX(n) AS n,
             SUM(d2) AS s2, SUM(d3) AS s3, SUM(d4) AS s4
      FROM devs GROUP BY event_type
    ),
    sk AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CASE WHEN s2 > 0 THEN
               round((CAST(s3 AS DOUBLE) / n)
                     / pow(CAST(s2 AS DOUBLE) / n, 1.5), 9) END AS skewness,
             CASE WHEN s2 > 0 THEN
               round((CAST(s4 AS DOUBLE) / n)
                     / ((CAST(s2 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)) - 3.0, 9)
             END AS ex_kurtosis
      FROM moms
    ),
    jb AS (
      SELECT event_type, n, skewness, ex_kurtosis,
             (n / 6.0) * (skewness * skewness
                          + (ex_kurtosis * ex_kurtosis) / 4.0) AS jb_stat
      FROM sk
    )
    SELECT event_type, n, skewness, ex_kurtosis, jb_stat,
           round(exp(-(jb_stat / 2)), 6) AS p_approx,
           round(exp(-(jb_stat / 2)), 6) < 0.05 AS normal_rejected
    FROM jb
    """,
)
def pipeline_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test per event type (Jarque & Bera
    1980): JB = n/6 (S² + K²/4) from the sample skewness and excess
    kurtosis — the screen that decides whether pipeline_ab_test's t
    is trustworthy or the readout should fall back to
    pipeline_mann_whitney (heavy tails show up here first). chi²(2)
    survival has the EXACT closed form exp(−JB/2) (even dof, m = 1).

    Determinism recipe (three house patterns composed): the mean
    comes from the exact decimal Σx (the value_anomalies sufficient-
    stat pass); each centered power d², d³, d⁴ is a fixed-shape
    double tree rounded 6 dp at the term then decimal-summed
    (order-free — the chi_square rule); the two moment RATIOS pass
    2^53 unscaled at corpus scale, so skewness/kurtosis emit at 9 dp
    (the acf rule) and JB is computed FROM THE ROUNDED values — the
    decision chain reads only agreed numbers. Zero-variance types
    emit NULL, never a division crash.

    Scale: two corpus passes (sufficient stats; centered powers —
    separate scans under no-exchange-reuse) with the 5-row stats
    broadcast back (the corpus-bounded join-back rule); everything
    after is a 5-row fold."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(25,6)")
        .cast("double")
        .alias("sx"),
    )
    d = F.col("value") - F.col("sx") / F.col("n")
    devs = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n",
        F.round(d * d, 6).cast("decimal(24,6)").alias("d2"),
        F.round(d * d * d, 6).cast("decimal(30,6)").alias("d3"),
        F.round((d * d) * (d * d), 6).cast("decimal(30,6)").alias("d4"),
    )
    moms = devs.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("d2").alias("s2"),
        F.sum("d3").alias("s3"),
        F.sum("d4").alias("s4"),
    )
    m2 = F.col("s2").cast("double") / F.col("n")
    skew = F.when(
        F.col("s2") > 0,
        F.round(
            (F.col("s3").cast("double") / F.col("n")) / F.pow(m2, 1.5), 9
        ),
    )
    kurt = F.when(
        F.col("s2") > 0,
        F.round(
            (F.col("s4").cast("double") / F.col("n")) / (m2 * m2) - 3.0, 9
        ),
    )
    sk = moms.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        skew.alias("skewness"),
        kurt.alias("ex_kurtosis"),
    )
    jb = (F.col("n") / 6.0) * (
        F.col("skewness") * F.col("skewness")
        + (F.col("ex_kurtosis") * F.col("ex_kurtosis")) / 4.0
    )
    out = sk.withColumn("jb_stat", jb)
    p = F.round(F.exp(-(F.col("jb_stat") / 2)), 6)
    return out.select(
        "event_type",
        "n",
        "skewness",
        "ex_kurtosis",
        "jb_stat",
        p.alias("p_approx"),
        (p < 0.05).alias("normal_rejected"),
    )


# Brown–Forsythe wide-pivot chains (the anova fixed-order rule): per
# weekday d the exact-long sufficient stats of the doubled absolute
# deviation z = |2v − m2_d| are pivoted to columns so every
# cross-group double reduction is one left-associated IEEE tree.
_BF_DAYS = list(range(7))


@query(
    "pipeline_levene",
    oracle=f"""
    WITH pur AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g,
             CAST(CAST(round(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    ranked AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM pur
    ),
    m2 AS (
      SELECT g,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
                  + SUM(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
                  AS BIGINT) AS m2
      FROM ranked GROUP BY g
    ),
    z AS (
      SELECT p.g, ABS(2 * p.v - m.m2) AS z2
      FROM pur p JOIN m2 m ON m.g = p.g
    ),
    stats AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(z2) AS BIGINT) AS sz,
             CAST(SUM(z2 * z2) AS BIGINT) AS szz
      FROM z GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"CAST(MAX(CASE WHEN g = {d} THEN sz END) AS DOUBLE)"
                   f" AS s{d}, "
                   f"CAST(MAX(CASE WHEN g = {d} THEN szz END) AS DOUBLE)"
                   f" AS q{d}"
                   for d in _BF_DAYS)}
      FROM stats
    )
    SELECT CAST({' + '.join(f'n{d}' for d in _BF_DAYS)} AS BIGINT) AS n,
           CAST(7 AS BIGINT) AS k,
           ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
             - ({' + '.join(f's{d}' for d in _BF_DAYS)})
               * ({' + '.join(f's{d}' for d in _BF_DAYS)})
               / ({' + '.join(f'n{d}' for d in _BF_DAYS)}) AS ss_between,
           ({' + '.join(f'q{d}' for d in _BF_DAYS)})
             - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
             AS ss_within,
           CASE WHEN ({' + '.join(f'q{d}' for d in _BF_DAYS)})
                  - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
                  > 0 THEN
             ((({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)})
               - ({' + '.join(f's{d}' for d in _BF_DAYS)})
                 * ({' + '.join(f's{d}' for d in _BF_DAYS)})
                 / ({' + '.join(f'n{d}' for d in _BF_DAYS)})) / 6.0)
             / ((({' + '.join(f'q{d}' for d in _BF_DAYS)})
                 - ({' + '.join(f's{d} * s{d} / n{d}' for d in _BF_DAYS)}))
                / (({' + '.join(f'n{d}' for d in _BF_DAYS)}) - 7.0))
           END AS f_stat
    FROM wide
    WHERE {' AND '.join(f'n{d} IS NOT NULL' for d in _BF_DAYS)}
    """,
)
def pipeline_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN–FORSYTHE variance-homogeneity test (Brown & Forsythe
    1974 — Levene's test with the MEDIAN center, the robust form) of
    purchase value across the seven weekdays: one-way ANOVA on the
    absolute deviations from each group's median. The
    homoscedasticity GATE pipeline_anova silently assumes — run this
    first; a significant F here means anova's pooled-variance F is
    suspect and pipeline_kruskal_wallis is the safer weekday readout.

    Exactness — three house patterns composed: (1) values quantize
    once to integer CENTS (round(value,2) then an exact 2-dp→decimal
    cast — the statistic is DEFINED on cent-quantized values, dodging
    the raw-double deep-scale midpoint trap); (2) each group median
    rides the DOUBLED order-statistic identity m2 = v(lo) + v(hi)
    (lo = ⌊(n+1)/2⌋, hi = ⌊(n+2)/2⌋), so z = |2v − m2| is an exact
    integer with no halves — Spark selects v(lo)/v(hi) from the
    kruskal-style distinct-value cumulative (bucket-offset, no
    global window) with the positions as literals from
    ``bucketed_running``'s by-product totals (control-plane exact);
    (3) the 7-group F reduces over the anova WIDE PIVOT so every
    cross-group double sum is a fixed-order IEEE tree over exact-long
    casts (sz ≤ 2^31, szz ≤ 2.5·10¹⁴ at sf0.1 — the documented
    decimal(38,0) knob applies past sf ≈ 3), F unrounded. Scaling z
    by 2 and by cents cancels in F. Emits only when all 7 weekdays
    are populated (both engines filter identically); all-constant
    deviation groups (ssw = 0) emit NULL F in both engines, never an
    ANSI divide crash (pinned by the degenerate test — the hampel
    lesson applied).

    Scale: one corpus pass to the distinct-value table, one broadcast
    of the 7 medians back over the corpus for the deviation stats;
    everything else is control-plane."""
    e = load_table(spark, sf_dir, "events")
    pur = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        F.weekday("ts").alias("g"),
        (F.round("value", 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    by_val = (
        pur.groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("g") == d, 1).otherwise(0)).alias(f"c{d}")
                for d in _BF_DAYS
            ]
        )
        .localCheckpoint(eager=True)  # distinct-value-bounded
    )
    # r15 (guide §1.2): the per-day order statistics previously rode
    # bucketed_running (cuts head + offsets collect + a bucketed
    # window pass — three extra jobs over a ~2k-row distinct-value
    # table). The same v(lo)/v(hi) now come from ONE in-row fold over
    # the sorted distinct-value array: first element whose cumulative
    # day count reaches the literal position — identical selection
    # (first hit ⇔ run ≥ pos ∧ run − cnt < pos), identical m2 values,
    # oracle unchanged. The collected array is VALUE-SPACE-bounded
    # (distinct cents), never corpus-bounded; totals stay a
    # control-plane 1-row head like bucketed_running's by-product.
    totals = by_val.agg(
        *[F.sum(f"c{d}").alias(f"c{d}") for d in _BF_DAYS]
    ).head()
    if any((totals[f"c{d}"] or 0) == 0 for d in _BF_DAYS):
        # a weekday with zero purchases: the 7-group statistic is
        # undefined — emit the same zero rows as the oracle's
        # all-present filter, with the full schema
        return by_val.limit(0).select(
            F.lit(0).cast("long").alias("n"),
            F.lit(7).cast("long").alias("k"),
            F.lit(0.0).alias("ss_between"),
            F.lit(0.0).alias("ss_within"),
            F.lit(0.0).alias("f_stat"),
        )
    arr = by_val.agg(
        F.array_sort(
            F.collect_list(F.struct("v", *[f"c{d}" for d in _BF_DAYS]))
        ).alias("arr")
    )

    def order_stat(d: int, pos: int) -> Column:
        # fold state: (cum day-d count so far, first v whose cum >= pos)
        return F.aggregate(
            "arr",
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("hit"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x[f"c{d}"]).alias("cum"),
                F.coalesce(
                    acc["hit"],
                    F.when(acc["cum"] + x[f"c{d}"] >= pos, x["v"]),
                ).alias("hit"),
            ),
            lambda acc: acc["hit"],
        )

    med_cols = []
    for d in _BF_DAYS:
        n_d = totals[f"c{d}"]
        lo, hi = (n_d + 1) // 2, (n_d + 2) // 2
        med_cols.append((order_stat(d, lo) + order_stat(d, hi)).alias(f"m2_{d}"))
    med = arr.select(*med_cols)
    z = pur.join(F.broadcast(med)).select(
        "g",
        F.abs(
            2 * F.col("v")
            - F.coalesce(
                *[
                    F.when(F.col("g") == d, F.col(f"m2_{d}"))
                    for d in _BF_DAYS
                ]
            )
        ).alias("z2"),
    )
    stats = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z2").cast("long").alias("sz"),
        F.sum(F.col("z2") * F.col("z2")).cast("long").alias("szz"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c)))
            .cast(t)
            .alias(f"{a}{d}")
            for d in _BF_DAYS
            for c, a, t in (
                ("n", "n", "long"),
                ("sz", "s", "double"),
                ("szz", "q", "double"),
            )
        ]
    )

    def _chain(make):
        o = make(0)
        for d in _BF_DAYS[1:]:
            o = o + make(d)
        return o

    n_tot = _chain(lambda d: F.col(f"n{d}"))
    s_tot = _chain(lambda d: F.col(f"s{d}"))
    t_tot = _chain(lambda d: F.col(f"q{d}"))
    q_tot = _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ssb = q_tot - s_tot * s_tot / n_tot
    ssw = t_tot - q_tot
    cond = None
    for d in _BF_DAYS:
        c = F.col(f"n{d}").isNotNull()
        cond = c if cond is None else (cond & c)
    return wide.where(cond).select(
        n_tot.cast("long").alias("n"),
        F.lit(7).cast("long").alias("k"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(
            ssw > 0, (ssb / F.lit(6.0)) / (ssw / (n_tot - F.lit(7.0)))
        ).alias("f_stat"),
    )


_TUKEY_PAIRS = [(i, j) for i in range(7) for j in range(i + 1, 7)]


@query(
    "pipeline_tukey_hsd",
    oracle=f"""
    WITH assigned AS (
      SELECT (EXTRACT(isodow FROM ts) - 1) AS g, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    stats AS (
      SELECT g,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY g
    ),
    wide AS (
      SELECT
        {', '.join(f"MAX(CASE WHEN g = {d} THEN n END) AS n{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sx END) AS s{d}, "
                   f"MAX(CASE WHEN g = {d} THEN sxx END) AS q{d}"
                   for d in range(7))}
      FROM stats
      HAVING {' AND '.join(f'MAX(CASE WHEN g = {d} THEN n END) IS NOT NULL'
                           for d in range(7))}
    ),
    msw AS (
      SELECT *,
             (({' + '.join(f'q{d}' for d in range(7))})
              - ({' + '.join(f's{d} * s{d} / n{d}' for d in range(7))}))
             / (({' + '.join(f'n{d}' for d in range(7))}) - 7.0) AS ms_within
      FROM wide
    ),
    pairs AS (
      SELECT * FROM msw CROSS JOIN (VALUES
        {', '.join(f'({i}, {j})' for i, j in _TUKEY_PAIRS)}
      ) AS p(i, j)
    ),
    scored AS (
      SELECT CAST(i AS INT) AS day_i, CAST(j AS INT) AS day_j,
             (CASE {' '.join(f'WHEN i = {d} THEN n{d}' for d in range(7))}
              END) AS n_i,
             (CASE {' '.join(f'WHEN j = {d} THEN n{d}' for d in range(7))}
              END) AS n_j,
             (CASE {' '.join(f'WHEN i = {d} THEN s{d} / n{d}'
                             for d in range(7))} END) AS mean_i,
             (CASE {' '.join(f'WHEN j = {d} THEN s{d} / n{d}'
                             for d in range(7))} END) AS mean_j,
             ms_within
      FROM pairs
    )
    SELECT day_i, day_j,
           CAST(n_i AS BIGINT) AS n_i, CAST(n_j AS BIGINT) AS n_j,
           mean_i, mean_j,
           mean_i - mean_j AS mean_diff,
           CASE WHEN ms_within > 0 THEN (mean_i - mean_j)
             / sqrt(ms_within * 0.5 * (1.0 / n_i + 1.0 / n_j)) END AS q_stat,
           abs(CASE WHEN ms_within > 0 THEN (mean_i - mean_j)
               / sqrt(ms_within * 0.5 * (1.0 / n_i + 1.0 / n_j)) END) > 4.17
             AS significant
    FROM scored
    ORDER BY day_i, day_j
    """,
)
def pipeline_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY HSD post-hoc (Tukey 1949) over the weekday design: all
    21 pairwise mean contrasts with the studentized-range q statistic
    q_ij = (x̄_i − x̄_j)/√(MSW/2·(1/n_i + 1/n_j)) — the key
    pipeline_anova hands off to when its omnibus F is significant
    ('WHICH days differ?'), at the k=7/df=∞ 5% critical value 4.17
    with family-wise error held at α (the reason this beats 21 naive
    pipeline_ab_test t-tests).

    Exactness: group sufficient statistics are EXACTLY anova's
    (exact decimal Σx, term-rounded Σx²; both cast to double once);
    the 21 q trees each reference the 7-group WIDE PIVOT through
    CASE chains with identical shape in both engines, so every q is
    one shared fixed-order IEEE tree — unrounded; the decision reads
    |q| against the short literal 4.17 (NULL on a zero MSW — the
    degenerate guard, never an ANSI divide crash). Emits only when
    all 7 weekdays are populated (HAVING mirrors the Spark filter).

    Scale: one corpus pass to 7×3 sufficient statistics; the pivot,
    the 21-row pair explode and every q are control-plane sized."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(F.weekday("ts").alias("g"), "value")
    stats = assigned.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("g") == d, F.col(c))).alias(f"{a}{d}")
            for d in range(7)
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )
    cond = None
    for d in range(7):
        c = F.col(f"n{d}").isNotNull()
        cond = c if cond is None else (cond & c)
    wide = wide.where(cond)

    def _chain(make):
        o = make(0)
        for d in range(1, 7):
            o = o + make(d)
        return o

    msw = (
        _chain(lambda d: F.col(f"q{d}"))
        - _chain(lambda d: F.col(f"s{d}") * F.col(f"s{d}") / F.col(f"n{d}"))
    ) / (_chain(lambda d: F.col(f"n{d}")) - F.lit(7.0))
    pairs = wide.select(
        "*",
        msw.alias("ms_within"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), F.lit(j).alias("j")
                    )
                    for i, j in _TUKEY_PAIRS
                ]
            )
        ).alias("p"),
    ).select("*", F.col("p.i").alias("i"), F.col("p.j").alias("j"))

    def _case(side, make):
        out = None
        for d in range(7):
            w = F.when(F.col(side) == d, make(d))
            out = w if out is None else out.when(F.col(side) == d, make(d))
        return out

    n_i = _case("i", lambda d: F.col(f"n{d}"))
    n_j = _case("j", lambda d: F.col(f"n{d}"))
    mean_i = _case("i", lambda d: F.col(f"s{d}") / F.col(f"n{d}"))
    mean_j = _case("j", lambda d: F.col(f"s{d}") / F.col(f"n{d}"))
    q = F.when(
        F.col("ms_within") > 0,
        (mean_i - mean_j)
        / F.sqrt(F.col("ms_within") * 0.5 * (1.0 / n_i + 1.0 / n_j)),
    )
    return pairs.select(
        F.col("i").cast("int").alias("day_i"),
        F.col("j").cast("int").alias("day_j"),
        n_i.cast("long").alias("n_i"),
        n_j.cast("long").alias("n_j"),
        mean_i.alias("mean_i"),
        mean_j.alias("mean_j"),
        (mean_i - mean_j).alias("mean_diff"),
        q.alias("q_stat"),
        (F.abs(q) > 4.17).alias("significant"),
    )


@query(
    "pipeline_grubbs",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(28,0)) * CAST(x AS DECIMAL(28,0)))
                  AS DOUBLE) AS sx2
      FROM daily
    ),
    dev AS (
      SELECT day,
             abs(CAST(x AS DOUBLE) - sx / n) AS adev,
             n, sx, sx2
      FROM daily CROSS JOIN s
    )
    SELECT n,
           adev / sqrt((sx2 - sx * sx / n) / (n - 1)) AS g,
           strftime(day, '%Y-%m-%d') AS outlier_day
    FROM dev
    ORDER BY adev DESC, day ASC
    LIMIT 1
    """,
)
def pipeline_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — GRUBBS' OUTLIER STATISTIC (1950) on daily order
    revenue: G = max|xᵢ − x̄| / s, plus WHICH day attains it — the
    single-most-discordant-observation screen the anomaly family
    (z-score / MAD / Hampel) lacks a maximum-normed-residual form
    of. The critical-value comparison is left to the caller (it
    needs a t quantile; the engine emits the exact statistic).

    Determinism: daily revenue is the exact cent sum (decimal ×100
    → BIGINT, the win_vwap recipe); n, Σx exact; Σx² in
    DECIMAL(28,0) products (int128-exact in both engines); G is one
    fixed-order IEEE tree over the exact casts. The arg-max day
    breaks |dev| ties on the EARLIEST day (total order), and the
    top-1 rides ORDER BY + LIMIT (TakeOrderedAndProject — no global
    window, lint-clean).

    Scale + lint: the corpus is reduced to days once; the 1-row
    moment aggregate broadcasts back over the daily table (the
    standing global-scalar pattern), and the arg-max is a bounded
    top-k. Re-executing the daily subtree for the broadcast leg is
    the documented no-exchange-reuse tradeoff."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x")
    )
    x28 = F.col("x").cast("decimal(28,0)")
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(x28 * x28).cast("double").alias("sx2"),
    )
    dev = daily.join(F.broadcast(s)).select(
        "day",
        F.abs(F.col("x").cast("double") - F.col("sx") / F.col("n")).alias(
            "adev"
        ),
        "n",
        "sx",
        "sx2",
    )
    g = F.col("adev") / F.sqrt(
        (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1)
    )
    return (
        dev.orderBy(F.col("adev").desc(), F.col("day").asc())
        .limit(1)
        .select(
            "n",
            g.alias("g"),
            F.date_format("day", "yyyy-MM-dd").alias("outlier_day"),
        )
    )


@query(
    "pipeline_mcnemar",
    oracle="""
    WITH flags AS (
      SELECT o_custkey,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                      THEN 1 ELSE 0 END) AS a97,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
                      THEN 1 ELSE 0 END) AS a98
      FROM orders GROUP BY 1
    ),
    pop AS (
      SELECT COALESCE(f.a97, 0) AS a97, COALESCE(f.a98, 0) AS a98
      FROM customer c LEFT JOIN flags f ON c.c_custkey = f.o_custkey
    ),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a97 = 1 AND a98 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN a97 = 1 AND a98 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN a97 = 0 AND a98 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN a97 = 0 AND a98 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
      FROM pop
    )
    SELECT n, n11, n10, n01, n00,
           CASE WHEN n10 + n01 > 0 THEN
             CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
           END AS chi2,
           CASE WHEN n10 + n01 > 0 THEN
             CAST(GREATEST(ABS(n10 - n01) - 1, 0)
                  * GREATEST(ABS(n10 - n01) - 1, 0) AS DOUBLE)
               / (n10 + n01)
           END AS chi2_cc,
           CASE WHEN n10 + n01 > 0 THEN
             CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
               > 3.841459
           END AS significant
    FROM cells
    """,
)
def pipeline_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — McNEMAR'S TEST (1947) for marginal homogeneity of
    PAIRED binary outcomes: each customer is its own control — was
    the customer active (>=1 order) in 1997 vs in 1998? The test
    asks whether the activation flow 97-only vs 98-only is balanced,
    using ONLY the discordant cells (n10, n01) — the within-subject
    design the independent-sample two_proportion_z key cannot
    express. Emits the full 2x2 (concordant cells for context), the
    plain chi2 = (n10-n01)^2/(n10+n01), the Edwards
    continuity-corrected variant ((|n10-n01|-1)^2, clamped at 0 so a
    perfectly balanced table reads 0 rather than +1), and the 5%
    verdict against the dof=1 critical value 3.841459 (short exact
    literal). No discordant pairs => NULL statistics, never a
    divide-by-zero.

    Determinism: the population is the full customer table (LEFT
    join, unordered customers count as (0,0)); every cell is an
    exact BIGINT conditional count and both statistics are ONE IEEE
    division of exact integers (squares < 2^53 through sf ~ 1000) —
    unrounded, no transcendentals.

    Scale + lint: one orders groupBy(custkey) shuffle + one
    customer-flags join on the same key (co-partitioned at scale) +
    one 1-row global aggregate — no windows, no broadcast of
    corpus-sized sides. Parity framing follows the reference's
    dated-snapshot comparison model (osm_etl.py pgosm_date eras)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    flags = o.groupBy("o_custkey").agg(
        F.max(F.when(F.year("o_orderdate") == 1997, 1).otherwise(0)).alias(
            "f97"
        ),
        F.max(F.when(F.year("o_orderdate") == 1998, 1).otherwise(0)).alias(
            "f98"
        ),
    )
    pop = (
        c.join(flags, c["c_custkey"] == flags["o_custkey"], "left")
        .select(
            F.coalesce(F.col("f97"), F.lit(0)).alias("a97"),
            F.coalesce(F.col("f98"), F.lit(0)).alias("a98"),
        )
    )
    cells = pop.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("a97") == 1) & (F.col("a98") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((F.col("a97") == 1) & (F.col("a98") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("a97") == 0) & (F.col("a98") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("a97") == 0) & (F.col("a98") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    d = F.col("n10") - F.col("n01")
    disc = F.col("n10") + F.col("n01")
    dcc = F.greatest(F.abs(d) - 1, F.lit(0))
    chi2 = F.when(disc > 0, (d * d).cast("double") / disc)
    chi2_cc = F.when(disc > 0, (dcc * dcc).cast("double") / disc)
    return cells.select(
        "n", "n11", "n10", "n01", "n00",
        chi2.alias("chi2"),
        chi2_cc.alias("chi2_cc"),
        F.when(disc > 0, (d * d).cast("double") / disc > 3.841459).alias(
            "significant"
        ),
    )


@query(
    "pipeline_cochran_q",
    oracle="""
    WITH flags AS (
      SELECT o_custkey,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                      THEN 1 ELSE 0 END) AS a96,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                      THEN 1 ELSE 0 END) AS a97,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
                      THEN 1 ELSE 0 END) AS a98
      FROM orders GROUP BY 1
    ),
    pop AS (
      SELECT COALESCE(f.a96, 0) AS a96, COALESCE(f.a97, 0) AS a97,
             COALESCE(f.a98, 0) AS a98
      FROM customer c LEFT JOIN flags f ON c.c_custkey = f.o_custkey
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a96) AS BIGINT) AS g96,
             CAST(SUM(a97) AS BIGINT) AS g97,
             CAST(SUM(a98) AS BIGINT) AS g98,
             CAST(SUM((a96 + a97 + a98) * (a96 + a97 + a98)) AS BIGINT)
               AS sl2
      FROM pop
    )
    SELECT n, g96, g97, g98,
           g96 + g97 + g98 AS t, sl2,
           CASE WHEN 3 * (g96 + g97 + g98) - sl2 > 0 THEN
             CAST(2 * ((3 * g96 - (g96 + g97 + g98))
                         * (3 * g96 - (g96 + g97 + g98))
                       + (3 * g97 - (g96 + g97 + g98))
                         * (3 * g97 - (g96 + g97 + g98))
                       + (3 * g98 - (g96 + g97 + g98))
                         * (3 * g98 - (g96 + g97 + g98))) AS DOUBLE)
               / (3 * (3 * (g96 + g97 + g98) - sl2))
           END AS q_stat,
           CASE WHEN 3 * (g96 + g97 + g98) - sl2 > 0 THEN
             CAST(2 * ((3 * g96 - (g96 + g97 + g98))
                         * (3 * g96 - (g96 + g97 + g98))
                       + (3 * g97 - (g96 + g97 + g98))
                         * (3 * g97 - (g96 + g97 + g98))
                       + (3 * g98 - (g96 + g97 + g98))
                         * (3 * g98 - (g96 + g97 + g98))) AS DOUBLE)
               / (3 * (3 * (g96 + g97 + g98) - sl2)) > 5.991465
           END AS significant
    FROM s
    """,
)
def pipeline_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — COCHRAN'S Q TEST (1950), the k-treatment
    generalization of McNemar: did customer activation differ across
    the THREE years 1996/1997/1998, with each customer as its own
    block? Uses the integer identity
    Q = (k-1) * SUM_j (k*G_j - T)^2 / (k * (k*T - SUM_i L_i^2))
    (G_j = per-year activation total, L_i = per-customer row total,
    T = SUM G_j = SUM L_i), which clears the textbook N-bar fractions
    so EVERYTHING up to the final division is exact BIGINT
    arithmetic. All-concordant blocks (L_i in {0, k}) can zero the
    denominator => NULL, never an ANSI crash; 5% verdict against the
    dof=2 critical value 5.991465 (short exact literal).

    Determinism: exact integer cells over the full customer
    population (LEFT join, the McNemar framing); squares stay
    < 2^53 through sf ~ 300 (per-year totals ~ 1.5e7 at sf100 ->
    summands ~ 2e15); past that the documented decimal(38,0)
    upgrade applies (the kruskal n^3 knob). ONE IEEE division.

    Scale + lint: identical plan family to pipeline_mcnemar — one
    key-partitioned groupBy, one co-keyed join, one global 1-row
    aggregate; no windows, no collects."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def yr_flag(y: int) -> Column:
        return F.max(
            F.when(F.year("o_orderdate") == y, 1).otherwise(0)
        )

    flags = o.groupBy("o_custkey").agg(
        yr_flag(1996).alias("f96"),
        yr_flag(1997).alias("f97"),
        yr_flag(1998).alias("f98"),
    )
    pop = (
        c.join(flags, c["c_custkey"] == flags["o_custkey"], "left")
        .select(
            F.coalesce(F.col("f96"), F.lit(0)).alias("a96"),
            F.coalesce(F.col("f97"), F.lit(0)).alias("a97"),
            F.coalesce(F.col("f98"), F.lit(0)).alias("a98"),
        )
    )
    li = F.col("a96") + F.col("a97") + F.col("a98")
    s = pop.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a96").cast("long").alias("g96"),
        F.sum("a97").cast("long").alias("g97"),
        F.sum("a98").cast("long").alias("g98"),
        F.sum(li * li).cast("long").alias("sl2"),
    )
    t = F.col("g96") + F.col("g97") + F.col("g98")
    num = 2 * (
        (3 * F.col("g96") - t) * (3 * F.col("g96") - t)
        + (3 * F.col("g97") - t) * (3 * F.col("g97") - t)
        + (3 * F.col("g98") - t) * (3 * F.col("g98") - t)
    )
    den = 3 * (3 * t - F.col("sl2"))
    q = F.when(den > 0, num.cast("double") / den)
    return s.select(
        "n", "g96", "g97", "g98",
        t.alias("t"), "sl2",
        q.alias("q_stat"),
        F.when(den > 0, num.cast("double") / den > 5.991465).alias(
            "significant"
        ),
    )
