"""Experimentation and causal-inference pipelines (split from
plans/analytics.py in round 14): A/B analysis (Welch t, two-proportion
z, CUPED, SPRT, power, SRM), causal designs (diff-in-diff, regression
discontinuity, coarsened exact matching, uplift deciles), and
uncertainty quantification (split conformal, Poisson bootstrap CI).

Everything is groupBy/window composition over the orders/lineitem/
events fixtures; resampling uses content-derived Poisson weights
(never `rand()`) so results are deterministic and partition-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query

@query(
    "pipeline_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
      FROM events WHERE event_type = 'purchase'
    ),
    stats AS (
      SELECT grp,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 'A' THEN n END) AS na,
             MAX(CASE WHEN grp = 'A' THEN sx END) AS sxa,
             MAX(CASE WHEN grp = 'A' THEN sxx END) AS sxxa,
             MAX(CASE WHEN grp = 'B' THEN n END) AS nb,
             MAX(CASE WHEN grp = 'B' THEN sx END) AS sxb,
             MAX(CASE WHEN grp = 'B' THEN sxx END) AS sxxb
      FROM stats
    )
    SELECT na, nb,
           sxa / na AS mean_a,
           sxb / nb AS mean_b,
           sxb / nb - sxa / na AS lift,
           (sxb / nb - sxa / na)
             / sqrt(((na * sxxa - sxa * sxa) / (na * (na - 1.0))) / na
                    + ((nb * sxxb - sxb * sxb) / (nb * (nb - 1.0))) / nb)
             AS t_stat,
           abs((sxb / nb - sxa / na)
               / sqrt(((na * sxxa - sxa * sxa) / (na * (na - 1.0))) / na
                      + ((nb * sxxb - sxb * sxb) / (nb * (nb - 1.0))) / nb))
             > 1.96 AS significant
    FROM wide
    """,
)
def pipeline_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-experiment readout — Welch's two-sample t statistic over
    purchase values, arms assigned deterministically by user-id
    parity (the hash-bucketing shape of every experimentation
    platform; content-derived assignment, never ingest order): per-
    arm exact decimal sufficient statistics (the z-score recipe),
    then mean lift, t = Δmean/√(s²ᴬ/nᴬ + s²ᴮ/nᴮ), and a 1.96 cut
    applied to the same unrounded double in both engines. One keyed
    aggregate → a 2-row pivot → a 1-row readout: the entire
    experiment analysis is control-plane sized after one corpus
    pass."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.where(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        "value",
    )
    stats = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)"))
        .cast("double")
        .alias("sxx"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{g.lower()}")
            for g in ("A", "B")
            for c in ("n", "sx", "sxx")
        ]
    )
    na, nb = F.col("na"), F.col("nb")
    mean_a, mean_b = F.col("sxa") / na, F.col("sxb") / nb
    var_a = (na * F.col("sxxa") - F.col("sxa") * F.col("sxa")) / (na * (na - F.lit(1.0)))
    var_b = (nb * F.col("sxxb") - F.col("sxb") * F.col("sxb")) / (nb * (nb - F.lit(1.0)))
    t = (mean_b - mean_a) / F.sqrt(var_a / na + var_b / nb)
    return wide.select(
        "na",
        "nb",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_b - mean_a).alias("lift"),
        t.alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant"),
    )


@query(
    "pipeline_two_proportion_z",
    oracle="""
    WITH units AS (
      SELECT user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS c_t,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS c_c
      FROM units
    ),
    z AS (
      SELECT n_t, n_c, c_t, c_c,
             CAST(c_t AS DOUBLE) / n_t AS rate_t,
             CAST(c_c AS DOUBLE) / n_c AS rate_c,
             CAST(c_t + c_c AS DOUBLE) / (n_t + n_c) AS pooled
      FROM arms
    ),
    zz AS (
      SELECT n_t, n_c, c_t, c_c, rate_t, rate_c,
             CASE WHEN pooled > 0 AND pooled < 1
                  THEN (rate_t - rate_c)
                       / sqrt(pooled * (1 - pooled)
                              * (1.0 / n_t + 1.0 / n_c))
             END AS z_score
      FROM z
    )
    SELECT n_t, n_c, c_t, c_c, rate_t, rate_c, z_score,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.05
             AS significant
    FROM zz
    """,
)
def pipeline_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION z-test on CONVERSION (did the user ever make a
    HIGH-VALUE purchase, > 150?) between the parity experiment arms —
    the missing third leg of the A/B readout triple: pipeline_ab_test
    tests the MEAN, pipeline_ks_test the DISTRIBUTION, this the RATE
    (the metric most experiments actually ship on). Unit of analysis
    is the USER (one converted flag per user — per-event counting
    would double-count multi-purchase users and break the binomial
    model). The value threshold exists because EVERY fixture user
    purchases *something* (measured: bare purchase-conversion is 1.0
    in both arms → zero pooled variance → all-NULL output); > 150
    lands the rates near 0.45 at every SF with real arm variance.

    z = (p̂_t − p̂_c)/√(p̂(1−p̂)(1/n_t+1/n_c)) with the pooled p̂ —
    every ingredient an exact integer, so z is one shared IEEE tree,
    emitted UNROUNDED. Degenerate pooled rates (0 or 1: zero
    variance) emit NULL z/p in both engines, never a division crash.
    The two-sided p uses the logistic CDF approximation of Φ
    (|error| < 0.01 — the bh_fdr precedent), rounded at its
    transcendental to 6 dp with the decision reading the rounded
    value.

    Scale: one groupBy(user) pass (partial-agg friendly), then a
    1-row fold — sufficient statistics all the way down."""
    e = load_table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    arm = F.col("user_id") % 2
    arms = units.agg(
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(arm == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_t"),
        F.sum(F.when(arm == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_c"),
    )
    rate_t = F.col("c_t").cast("double") / F.col("n_t")
    rate_c = F.col("c_c").cast("double") / F.col("n_c")
    pooled = (F.col("c_t") + F.col("c_c")).cast("double") / (
        F.col("n_t") + F.col("n_c")
    )
    z = arms.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        rate_t.alias("rate_t"),
        rate_c.alias("rate_c"),
        pooled.alias("pooled"),
    )
    zz = z.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        "rate_t",
        "rate_c",
        F.when(
            (F.col("pooled") > 0) & (F.col("pooled") < 1),
            (F.col("rate_t") - F.col("rate_c"))
            / F.sqrt(
                F.col("pooled")
                * (1 - F.col("pooled"))
                * (
                    F.lit(1.0) / F.col("n_t")
                    + F.lit(1.0) / F.col("n_c")
                )
            ),
        ).alias("z_score"),
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(F.col("z_score")))), 6)
    return zz.select(
        "n_t",
        "n_c",
        "c_t",
        "c_c",
        "rate_t",
        "rate_c",
        "z_score",
        p.alias("p_approx"),
        (p < 0.05).alias("significant"),
    )


@query(
    "pipeline_uplift_by_decile",
    oracle="""
    WITH resp AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    scored AS (
      SELECT c_custkey,
             NTILE(10) OVER (ORDER BY -c_acctbal, c_custkey) AS decile,
             CASE WHEN resp.k IS NOT NULL THEN 1 ELSE 0 END AS responded
      FROM customer LEFT JOIN resp ON c_custkey = resp.k
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(responded) AS BIGINT) AS r
      FROM scored GROUP BY decile
    ),
    c AS (
      SELECT a.decile,
             CAST(MAX(a.n) AS BIGINT) AS n, CAST(MAX(a.r) AS BIGINT) AS r,
             CAST(SUM(b.n) AS BIGINT) AS cum_n,
             CAST(SUM(b.r) AS BIGINT) AS cum_r
      FROM d a JOIN d b ON b.decile <= a.decile
      GROUP BY a.decile
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt
            FROM d)
    SELECT decile, n AS n_customers, r AS n_responders,
           CAST(r AS DOUBLE) / n AS response_rate,
           cum_r AS cum_responders,
           CAST(cum_r * nt AS DOUBLE) / CAST(cum_n * rt AS DOUBLE)
             AS cum_lift,
           CAST(cum_r AS DOUBLE) / rt AS gain
    FROM c, tot
    ORDER BY decile
    """,
)
def pipeline_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — GAINS/LIFT TABLE: customers ranked by a
    score (account balance as the stand-in model score, best first),
    cut into exact deciles, each reporting response rate (placed an
    urgent order), cumulative gain (share of all responders captured
    so far) and cumulative lift vs the base rate — the
    targeting-model evaluation every campaign/ranking report leads
    with, completing the eval leg beside llm_eval_auc (threshold-free
    rank quality) and llm_eval_calibration (probability quality):
    lift is what the score is WORTH at a given outreach budget.

    Exactness: deciles come from distributed_ntile (range-contiguous
    buckets + offset ranks — bit-equal to global NTILE, no
    unpartitioned window); counts are exact ints; the cumulative leg
    is a bounded 10×10 self-join (decile ≤ decile — no window at
    all); every emitted ratio divides two exact < 2^53 integer
    products once in IEEE double. Scale: one orders pass to the
    responder set (DISTINCT custkey), one customer⋈responder join,
    the ntile machinery's bounded collects — nothing else moves."""
    from osm_airflow_spark.operators.windows import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    resp = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    scored = (
        c.join(resp, c.c_custkey == F.col("k"), "left")
        .select(
            "c_custkey",
            (-F.col("c_acctbal")).alias("neg_score"),
            F.when(F.col("k").isNotNull(), 1).otherwise(0).alias("responded"),
        )
    )
    tiled = distributed_ntile(
        scored, F.col("neg_score"), "c_custkey", "decile", 10
    )
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("responded").alias("r")
    ).localCheckpoint(eager=True)  # 10 rows; both self-join legs + totals
    tot = d.agg(
        F.sum("n").alias("nt"), F.sum("r").alias("rt")
    )
    b = d.select(
        F.col("decile").alias("d2"), F.col("n").alias("n2"), F.col("r").alias("r2")
    )
    cum = (
        d.join(F.broadcast(b), F.col("d2") <= F.col("decile"))
        .groupBy("decile")
        .agg(
            F.max("n").alias("n"),
            F.max("r").alias("r"),
            F.sum("n2").alias("cum_n"),
            F.sum("r2").alias("cum_r"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n").alias("n_customers"),
            F.col("r").alias("n_responders"),
            (F.col("r").cast("double") / F.col("n")).alias("response_rate"),
            F.col("cum_r").alias("cum_responders"),
            (
                (F.col("cum_r") * F.col("nt")).cast("double")
                / (F.col("cum_n") * F.col("rt")).cast("double")
            ).alias("cum_lift"),
            (F.col("cum_r").cast("double") / F.col("rt")).alias("gain"),
        )
        .orderBy("decile")
    )


@query(
    "pipeline_price_elasticity",
    oracle="""
    WITH obs AS (
      SELECT p.p_brand AS brand,
             round(ln(CAST(l.l_extendedprice AS DOUBLE)
                      / CAST(l.l_quantity AS DOUBLE)), 6) AS x,
             round(ln(CAST(l.l_quantity AS DOUBLE)), 6) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0
    ),
    s AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sxy,
             CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sxx
      FROM obs GROUP BY brand
    )
    SELECT brand, n_obs,
           CASE WHEN n_obs * sxx - sx * sx <> 0
                THEN (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
           END AS elasticity
    FROM s
    ORDER BY brand
    """,
)
def pipeline_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY of demand per brand — the LOG-LOG regression
    d ln(qty)/d ln(unit price) over line items (the pricing-analytics
    staple; pipeline_grouped_ols is its linear sibling — this key
    adds the transcendental-regressor discipline a log-log model
    forces).

    Determinism recipe (three house rules composed): both logs are
    rounded AT the transcendental to 6 dp (engines' ln differ by
    ulps); every product term x·y, x·x is ALSO rounded to 6 dp before
    the decimal cast (the anova Σx² term rule — the raw 12-dp product
    scale would push the sums past the 2^53 cast-exactness line), so
    all five sufficient statistics are exact decimal sums with exact
    double casts; the slope is then a fixed-order shared IEEE tree —
    emitted UNROUNDED, bit-identical by construction. Zero-variance
    brands (all lines at one log-price) emit NULL, never a division
    crash.

    Scale: one fact-table pass with a broadcast part-dim join; per-
    brand sufficient statistics shuffle 5 decimals × brands — the
    many-small-models shape; nothing downstream exceeds the brand
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.round(
        F.log(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ),
        6,
    )
    y = F.round(F.log(F.col("l_quantity").cast("double")), 6)
    obs = (
        li.where(F.col("l_quantity") > 0)
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("p_brand").alias("brand"), x.alias("x"), y.alias("y"))
    )
    d6 = "decimal(18,6)"
    s = obs.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("x").cast(d6)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d6)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(d6))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(d6))
        .cast("double")
        .alias("sxx"),
    )
    num = F.col("n_obs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_obs") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "brand",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.when(den != 0, num / den).alias("elasticity"),
    ).orderBy("brand")


@query(
    "pipeline_cem_matching",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(18,2)) AS s
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT c_custkey,
             c_mktsegment = 'AUTOMOBILE' AS treated,
             CAST(floor(c_acctbal / 250.0) AS BIGINT) AS stratum,
             COALESCE(spend.s, CAST(0 AS DECIMAL(18,2))) AS outcome
      FROM customer LEFT JOIN spend ON c_custkey = o_custkey
    ),
    strata AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treated,
             CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_control,
             CAST(SUM(CASE WHEN treated THEN outcome END) AS DECIMAL(18,2))
               AS sum_t,
             CAST(SUM(CASE WHEN NOT treated THEN outcome END)
                  AS DECIMAL(18,2)) AS sum_c
      FROM cust GROUP BY stratum
    )
    SELECT stratum, n_treated, n_control,
           CAST(sum_t AS DOUBLE) / n_treated AS mean_treated,
           CAST(sum_c AS DOUBLE) / n_control AS mean_control,
           CAST(sum_t AS DOUBLE) / n_treated
             - CAST(sum_c AS DOUBLE) / n_control AS diff
    FROM strata
    WHERE n_treated > 0 AND n_control > 0
    ORDER BY stratum
    """,
)
def pipeline_cem_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — COARSENED EXACT MATCHING (Iacus, King &
    Porro 2012): the observational-causal estimator beside the
    experimental pair (pipeline_ab_test, pipeline_did). Treatment =
    AUTOMOBILE segment membership, outcome = customer lifetime
    spend, confounder = account balance coarsened into width-250
    strata; within each stratum that holds BOTH groups, treated and
    control are exchangeable-by-construction on the coarsened
    confounder, so mean_treated − mean_control is that stratum's
    effect estimate. Per-stratum rows emit (the weighted ATT
    reduction is one more line driver-side); strata with no
    counterfactual are pruned — exactly CEM's "discard unmatched"
    step, the property that distinguishes matching from regression.

    Determinism without any rounding: each mean is ONE IEEE division
    of an exact-decimal sum cast to double (stratum spend sums stay
    < 2^53 unscaled through sf 1, so the casts are exact in both
    engines), diff subtracts two agreed doubles, and there is NO
    cross-stratum double reduction to order — per-stratum grain
    sidesteps the order-free-double-agg hazard entirely.

    Scale: one orders pass to per-customer spend (shuffle on
    custkey), one broadcast-sized strata groupBy (≤ 44 strata at any
    SF — the output is control-plane sized); the customer⋈spend join
    shuffles on the same custkey both sides. At 100 TB nothing here
    grows beyond the customer table's natural key partitioning."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("s")
    )
    cust = c.join(spend, c.c_custkey == F.col("k"), "left").select(
        (F.col("c_mktsegment") == "AUTOMOBILE").alias("treated"),
        F.floor(F.col("c_acctbal") / 250.0).cast("long").alias("stratum"),
        F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,2)")).alias("outcome"),
    )
    strata = cust.groupBy("stratum").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("n_treated"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("treated"), F.col("outcome")))
        .cast("decimal(18,2)")
        .alias("sum_t"),
        F.sum(F.when(~F.col("treated"), F.col("outcome")))
        .cast("decimal(18,2)")
        .alias("sum_c"),
    )
    mean_t = F.col("sum_t").cast("double") / F.col("n_treated")
    mean_c = F.col("sum_c").cast("double") / F.col("n_control")
    return (
        strata.where((F.col("n_treated") > 0) & (F.col("n_control") > 0))
        .select(
            "stratum",
            "n_treated",
            "n_control",
            mean_t.alias("mean_treated"),
            mean_c.alias("mean_control"),
            (mean_t - mean_c).alias("diff"),
        )
        .orderBy("stratum")
    )


@query(
    "pipeline_did",
    oracle="""
    WITH span AS (
      SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    assigned AS (
      -- midpoint in integer epoch-us: DuckDB divides INTERVALs
      -- field-wise (29 days / 2 = 14 days, the half-day DROPPED)
      -- while Spark divides total microseconds -- epoch integer
      -- arithmetic is identical in both engines
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
             CASE WHEN epoch_us(ts) * 2 < epoch_us(t0) + epoch_us(t1)
                  THEN 'pre' ELSE 'post' END AS period,
             value
      FROM events, span
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    stats AS (
      SELECT arm, period,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxx
      FROM assigned GROUP BY arm, period
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN n END) AS n_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN sx END) AS s_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'pre' THEN sxx END) AS q_a0,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN n END) AS n_a1,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN sx END) AS s_a1,
        MAX(CASE WHEN arm = 'a' AND period = 'post' THEN sxx END) AS q_a1,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN n END) AS n_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN sx END) AS s_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'pre' THEN sxx END) AS q_b0,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN n END) AS n_b1,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN sx END) AS s_b1,
        MAX(CASE WHEN arm = 'b' AND period = 'post' THEN sxx END) AS q_b1
      FROM stats
    )
    SELECT CAST(n_a0 + n_a1 + n_b0 + n_b1 AS BIGINT) AS n,
           s_b1 / n_b1 - s_b0 / n_b0 AS delta_treat,
           s_a1 / n_a1 - s_a0 / n_a0 AS delta_control,
           (s_b1 / n_b1 - s_b0 / n_b0) - (s_a1 / n_a1 - s_a0 / n_a0)
             AS did_estimate,
           sqrt(((n_a0 * q_a0 - s_a0 * s_a0) / (n_a0 * (n_a0 - 1.0))) / n_a0
                + ((n_a1 * q_a1 - s_a1 * s_a1) / (n_a1 * (n_a1 - 1.0))) / n_a1
                + ((n_b0 * q_b0 - s_b0 * s_b0) / (n_b0 * (n_b0 - 1.0))) / n_b0
                + ((n_b1 * q_b1 - s_b1 * s_b1) / (n_b1 * (n_b1 - 1.0))) / n_b1)
             AS std_err,
           ((s_b1 / n_b1 - s_b0 / n_b0) - (s_a1 / n_a1 - s_a0 / n_a0))
           / sqrt(((n_a0 * q_a0 - s_a0 * s_a0) / (n_a0 * (n_a0 - 1.0))) / n_a0
                  + ((n_a1 * q_a1 - s_a1 * s_a1) / (n_a1 * (n_a1 - 1.0))) / n_a1
                  + ((n_b0 * q_b0 - s_b0 * s_b0) / (n_b0 * (n_b0 - 1.0))) / n_b0
                  + ((n_b1 * q_b1 - s_b1 * s_b1) / (n_b1 * (n_b1 - 1.0))) / n_b1)
             AS t_stat
    FROM wide
    """,
)
def pipeline_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — DIFFERENCE-IN-DIFFERENCES on purchase values:
    arms by user-id parity (the ab_test assignment), periods by the
    exact midpoint of the corpus span (the psi_drift split) — the
    quasi-experimental readout when treatment rolls out at a point
    in time and the control arm carries the seasonal trend:
    DiD = (B̄post − B̄pre) − (Āpost − Āpre), with the four-variance
    standard error and t. Per-cell sufficient statistics follow the
    ab_test recipe (exact decimal Σx, term-rounded Σx²); everything
    cross-cell is computed off a 2×2 WIDE PIVOT so each reduction is
    a fixed-order IEEE tree (the anova discipline).

    Scale: one corpus pass to 4 cells × 3 statistics (the span ride
    is a broadcast 1-row aggregate); the readout is one
    control-plane row."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    span = purchases.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    # integer epoch-us midpoint compare: ts*2 < t0+t1 (see oracle note
    # on DuckDB's field-wise interval division)
    def us(c):
        # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
        # cast to TIMESTAMP makes unix_micros the naive-UTC epoch --
        # exactly DuckDB's epoch_us on a naive timestamp
        return F.unix_micros(F.col(c).cast("timestamp"))

    is_pre = us("ts") * 2 < us("t0") + us("t1")
    assigned = purchases.crossJoin(F.broadcast(span)).select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        F.when(is_pre, "pre").otherwise("post").alias("period"),
        "value",
    )
    stats = assigned.groupBy("arm", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 6).cast("decimal(24,6)")
        )
        .cast("double")
        .alias("sxx"),
    )
    cells = [("a", "pre", "a0"), ("a", "post", "a1"), ("b", "pre", "b0"), ("b", "post", "b1")]
    wide = stats.agg(
        *[
            F.max(
                F.when(
                    (F.col("arm") == arm) & (F.col("period") == per), F.col(c)
                )
            ).alias(f"{a}_{tag}")
            for arm, per, tag in cells
            for c, a in (("n", "n"), ("sx", "s"), ("sxx", "q"))
        ]
    )

    def mean(tag):
        return F.col(f"s_{tag}") / F.col(f"n_{tag}")

    def sem2(tag):
        n = F.col(f"n_{tag}")
        s = F.col(f"s_{tag}")
        q = F.col(f"q_{tag}")
        return ((n * q - s * s) / (n * (n - F.lit(1.0)))) / n

    delta_t = mean("b1") - mean("b0")
    delta_c = mean("a1") - mean("a0")
    did = delta_t - delta_c
    se = F.sqrt(sem2("a0") + sem2("a1") + sem2("b0") + sem2("b1"))
    n_tot = (
        F.col("n_a0") + F.col("n_a1") + F.col("n_b0") + F.col("n_b1")
    ).cast("long")
    return wide.select(
        n_tot.alias("n"),
        delta_t.alias("delta_treat"),
        delta_c.alias("delta_control"),
        did.alias("did_estimate"),
        se.alias("std_err"),
        (did / se).alias("t_stat"),
    )


@query(
    "pipeline_conformal",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS prio, o_orderkey % 5 AS fold,
             o_orderkey, CAST(o_totalprice AS DOUBLE) AS y
      FROM orders
    ),
    model AS (
      SELECT prio,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS pred
      FROM base WHERE fold <= 2 GROUP BY prio
    ),
    calib AS (
      SELECT b.prio, abs(b.y - m.pred) AS resid
      FROM base b JOIN model m USING (prio) WHERE b.fold = 3
    ),
    qhat AS (
      SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CASE WHEN (9 * (COUNT(*) + 1) + 9) // 10 <= COUNT(*)
                  THEN list_sort(list(resid))[(9 * (COUNT(*) + 1) + 9) // 10]
                  END AS q_resid
      FROM calib GROUP BY prio
    ),
    cov AS (
      SELECT b.prio, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN abs(b.y - m.pred) <= q.q_resid
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM base b
      JOIN model m USING (prio)
      JOIN qhat q USING (prio)
      WHERE b.fold = 4
      GROUP BY b.prio
    )
    SELECT m.prio, m.pred, q.n_cal, q.q_resid,
           m.pred - q.q_resid AS lo, m.pred + q.q_resid AS hi,
           c.n_test, c.n_covered,
           CAST(c.n_covered AS DOUBLE) / c.n_test AS coverage
    FROM model m
    JOIN qhat q USING (prio)
    JOIN cov c ON c.prio = m.prio
    """,
)
def pipeline_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals (Vovk et al.;
    Papadopoulos et al. 2002; Angelopoulos & Bates 2023 tutorial) —
    the distribution-free UQ wrapper every model-eval pipeline wants:
    fit on a train split, take the ceil((n+1)(1-alpha))-th smallest
    absolute residual on a held-out calibration split, and pred ± q
    then covers a fresh point with probability >= 1-alpha, for ANY
    model. alpha = 0.1; the model here is the simplest honest one
    (per-priority train mean), because the guarantee — and this
    plan — is model-agnostic.

    Splits are content-derived (o_orderkey % 5: 0-2 train, 3
    calibration, 4 test — the llm_split_assign discipline, no
    rand()). The conformal rank k = ceil(0.9·(n+1)) is computed in
    INTEGER arithmetic ((9(n+1)+9) div 10) and the k-th order
    statistic comes from array_sort(collect_list(resid))[k] — the
    blessed agg_collect_ordered shape: an exact per-group order
    statistic with NO global window; memory is one calibration
    group (fine at 5 priority classes; at 100 TB with big groups,
    swap in a fixed-width residual histogram and take the k-th via
    cumulative counts — the guarantee only needs a conservative
    upper rank). Coverage on the test fold is reported beside the
    interval; every quantity is exact decimal/integer arithmetic or
    a deterministic double op → SQL-oracled."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    model = (
        base.where(F.col("fold") <= 2)
        .groupBy("prio")
        .agg(
            (F.sum(F.col("y").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("pred")
        )
    )
    calib = (
        base.where(F.col("fold") == 3)
        .join(model, "prio")
        .select("prio", F.abs(F.col("y") - F.col("pred")).alias("resid"))
    )
    qhat = split_conformal_qhat(calib, "prio", "resid")
    cov = (
        base.where(F.col("fold") == 4)
        .join(model, "prio")
        .join(qhat.select("prio", "q_resid"), "prio")
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.abs(F.col("y") - F.col("pred")) <= F.col("q_resid"), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        model.join(qhat, "prio")
        .join(cov, "prio")
        .select(
            "prio",
            "pred",
            "n_cal",
            "q_resid",
            (F.col("pred") - F.col("q_resid")).alias("lo"),
            (F.col("pred") + F.col("q_resid")).alias("hi"),
            "n_test",
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test")).alias("coverage"),
        )
    )


def split_conformal_qhat(
    calib: DataFrame,
    group_col: str,
    resid_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Generic per-group SPLIT-CONFORMAL quantile — the reusable
    estimator behind ``pipeline_conformal`` (the
    ``poisson_bootstrap_ci`` extraction pattern, ROADMAP r12 #4):
    given a calibration frame of nonconformity scores, returns one
    row per group with (n_cal, q_resid) where q_resid is the
    k = ceil((1-alpha)(n+1))-th smallest score. ``pred ± q_resid``
    then covers a fresh point with probability >= 1-alpha for ANY
    model (Papadopoulos et al. 2002; Angelopoulos & Bates 2023).

    alpha arrives as the RATIONAL alpha_num/alpha_den so the rank is
    EXACT integer arithmetic: k = ((den-num)(n+1) + den - 1) div den.
    A float alpha would put ceil() one ulp from a cliff — e.g.
    (1-0.1)*(n+1) evaluates to 9.000000000000002 at n = 9, and
    ceil() silently demands an 11th residual from 9. At the default
    1/10 this reproduces the key's pinned (9(n+1)+9) div 10.

    k > n_cal means the guarantee needs the INFINITE interval: emit
    NULL (DuckDB's out-of-range list index is NULL; Spark's under
    ANSI is a runtime error, so the guard is correctness AND
    crash-safety — the win_hampel_outliers lesson). Memory bound is
    one calibration group (the agg_collect_ordered contract); for
    corpus-sized groups use ``conformal_qhat_histogram``, the
    bounded-memory conservative variant."""
    if not 0 < alpha_num < alpha_den:
        raise ValueError(
            f"alpha must be a proper fraction: got {alpha_num}/{alpha_den}"
        )
    keep = alpha_den - alpha_num
    k = F.expr(f"({keep} * (count(1) + 1) + {alpha_den} - 1) div {alpha_den}")
    return calib.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.when(
            k <= F.count(F.lit(1)),
            F.element_at(F.array_sort(F.collect_list(resid_col)), k.cast("int")),
        ).alias("q_resid"),
    )


# Cumulative Poisson(1) CDF at k = 0..4, as 15-significant-digit
# literals: both engines parse <= 15-digit literals to the same
# double (the house literal rule), so the thresholds ARE the spec.
# u >= all five -> weight 5 (truncation mass ~6e-4, deterministic).
_POIS1_CDF = (
    "0.367879441171442",
    "0.735758882342885",
    "0.919698602928606",
    "0.981011843123846",
    "0.996340153172656",
)
_BOOT_B = 200  # replicas; 2.5% tails -> order statistics 5 and 196


@query(
    "pipeline_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT b, c_acctbal,
             {" + ".join(
                 f"(CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#' || CAST(b AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 >= {t} THEN 1 ELSE 0 END)"
                 for t in _POIS1_CDF
             )} AS w
      FROM customer, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
    ),
    means AS (
      -- a replica whose weights all drew 0 has no resample: drop it
      -- in BOTH engines (unguarded, Spark's ANSI division crashes
      -- and DuckDB emits NULL rep_means that poison the order
      -- statistics asymmetrically). P(degenerate) = e^-n per
      -- replica, so real corpora lose none; tiny ones lose a few
      -- and the n_replicas >= 196 CI guard reports NULL bounds.
      SELECT b,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * w) AS DOUBLE)
               / SUM(w) AS rep_mean
      FROM reps GROUP BY b
      HAVING SUM(w) > 0
    ),
    summ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
             CASE WHEN COUNT(*) >= 196
                  THEN list_sort(list(rep_mean))[5] END AS ci_lo,
             CASE WHEN COUNT(*) >= 196
                  THEN list_sort(list(rep_mean))[196] END AS ci_hi
      FROM means
    ),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS est_mean
      FROM customer
    )
    SELECT p.n_rows, p.est_mean, s.n_replicas, s.ci_lo, s.ci_hi
    FROM point p, summ s
    """,
)
def pipeline_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval (Chamandy, Muralidharan,
    Najmi & Naidu 2012, "Estimating Uncertainty for Massive Data
    Streams" — Google's scale-out bootstrap; Hanley & MacGibbon 2006)
    for the mean customer account balance, with B = 200 replicas.

    The classical bootstrap resamples n rows WITH replacement — at
    100 TB that needs the global n and a shuffle per replica. The
    Poisson bootstrap replaces each row's multinomial count with an
    independent Poisson(1) weight, so EVERY (row, replica) weight is
    computed locally from the row itself: one narrow explode of B
    replica ids per row, one groupBy(replica) — fully map-parallel,
    mergeable, and streaming-friendly (the paper's point). Weights
    are content-derived (the house no-rand() rule): u = md5(custkey #
    replica) first-8-hex / 2^32 — an exact dyadic double in both
    engines — inverted through the Poisson(1) CDF as five
    15-digit-literal threshold comparisons (truncated at weight 5;
    tail mass 6e-4; deterministic). Replica means are decimal-exact
    weighted sums cast to double once; the 95% CI is the exact
    5th/196th order statistic of the 200 replica means via the
    blessed array_sort(collect_list(...)) shape — 200 elements, a
    bounded collect by construction. Everything deterministic →
    SQL-oracled (the rare thing for a bootstrap)."""
    c = load_table(spark, sf_dir, "customer")
    return poisson_bootstrap_ci(c, spark, unit_col="c_custkey", value_col="c_acctbal")


def poisson_bootstrap_ci(
    df: DataFrame,
    spark: SparkSession,
    unit_col: str,
    value_col: str,
    b: int = _BOOT_B,
    alpha: float = 0.05,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
) -> DataFrame:
    """Generic deterministic Poisson-bootstrap CI for the mean of
    ``value_col`` over units keyed by ``unit_col`` — the reusable
    estimator behind the ``pipeline_bootstrap_ci`` key (same
    md5-derived weights, same guards; the key pins it to the oracle).
    Returns one row: (n_rows, est_mean, n_replicas, ci_lo, ci_hi).

    The interval ranks DERIVE from ``(b, alpha)`` — lo = max(1,
    floor(alpha/2·b)), hi = b+1−lo (200/0.05 → 5/196, the key's
    pinned values) — so changing ``b`` alone keeps the coverage
    level instead of silently yielding NULL bounds (the
    n_replicas < hi_rank guard) or a wrong-level interval. The floor
    runs in EXACT RATIONALS (Fraction.limit_denominator recovers the
    intended decimal alpha from its double) — ``int(alpha/2.0*b)``
    would truncate one ulp below the true product (alpha=0.3, b=20:
    0.15*20 = 2.9999999999999996 → 2, not 3 — the split_conformal
    float-rank cliff, r12 review finding). Explicit
    ``lo_rank``/``hi_rank`` overrides are validated against ``b``."""
    if lo_rank is None:
        from fractions import Fraction

        fa = Fraction(alpha).limit_denominator(1_000_000)
        lo_rank = max(1, int(fa * b / 2))
    if hi_rank is None:
        hi_rank = b + 1 - lo_rank
    if not 1 <= lo_rank < hi_rank <= b:
        raise ValueError(
            f"bootstrap ranks out of range: need 1 <= lo_rank < hi_rank <= b, "
            f"got lo_rank={lo_rank}, hi_rank={hi_rank}, b={b}"
        )
    # The b-fold explode multiplies work b-times BEFORE the first
    # shuffle, so it inherits the scan's partitioning — a small
    # single-file input would hash b*n rows in ONE task. Spreading
    # the tiny input first costs a negligible shuffle and unlocks
    # full map parallelism (measured 5.6 s -> 0.14 s warm at sf0.1
    # on local[32]); at 100 TB inputs are many-file already and this
    # is a no-op-sized safety net.
    c = df.repartition(spark.sparkContext.defaultParallelism)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(unit_col).cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w_col = None
    for t in _POIS1_CDF:
        ind = F.when(u >= float(t), 1).otherwise(0)
        w_col = ind if w_col is None else (w_col + ind)
    reps = c.select(
        unit_col,
        value_col,
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
    ).select("b", value_col, w_col.alias("w"))
    # drop all-zero-weight replicas BEFORE dividing: Spark's ANSI
    # division would crash and DuckDB's NULL means would poison the
    # sorted order statistics (code-review find, reproduced on a
    # 3-customer corpus — 8/200 degenerate replicas at n = 3)
    means = (
        reps.groupBy("b")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)") * F.col("w")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select((F.col("swx").cast("double") / F.col("sw")).alias("rep_mean"))
    )
    # empty-corpus guard: zero replicas -> element_at on an empty
    # array is an ANSI runtime error in Spark (NULL in DuckDB) —
    # emit NULL bounds instead of crashing
    has_b = F.count(F.lit(1)) >= hi_rank
    summ = means.agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.when(
            has_b, F.element_at(F.array_sort(F.collect_list("rep_mean")), lo_rank)
        ).alias("ci_lo"),
        F.when(
            has_b, F.element_at(F.array_sort(F.collect_list("rep_mean")), hi_rank)
        ).alias("ci_hi"),
    )
    point = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est_mean"),
    )
    return point.crossJoin(F.broadcast(summ)).select(
        "n_rows", "est_mean", "n_replicas", "ci_lo", "ci_hi"
    )


@query(
    "pipeline_cuped",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             COUNT(*) FILTER (o_orderdate < TIMESTAMP '1997-01-01') AS x,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                      THEN CAST(o_totalprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y_dec
      FROM orders GROUP BY o_custkey
    ),
    units AS (
      SELECT c.c_custkey % 2 AS arm,
             COALESCE(p.x, 0) AS x,
             COALESCE(p.y_dec, CAST(0 AS DECIMAL(18,2))) AS y_dec
      FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(y_dec) AS DOUBLE) AS sy,
             CAST(SUM(x * y_dec) AS DOUBLE) AS sxy,
             CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS DOUBLE) AS sx_t,
             CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS DOUBLE) AS sx_c,
             CAST(SUM(CASE WHEN arm = 1 THEN y_dec
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sy_t,
             CAST(SUM(CASE WHEN arm = 0 THEN y_dec
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sy_c
      FROM units
    )
    SELECT n, n_t, n_c,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) END AS theta,
           CASE WHEN n_t > 0 AND n_c > 0 THEN
             round(sy_t / n_t - sy_c / n_c, 9) END AS delta_raw,
           CASE WHEN n_t > 0 AND n_c > 0 AND n * sxx - sx * sx <> 0 THEN
             round((sy_t / n_t - sy_c / n_c)
                   - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
                     * (sx_t / n_t - sx_c / n_c), 9) END AS delta_cuped
    FROM stats
    """,
)
def pipeline_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
    Xu, Kohavi & Walker, WSDM 2013): the industry-standard variance
    reduction for A/B tests. Each unit's post-period metric y is
    adjusted by its PRE-period covariate x (here: 1995-96 order
    count, an integer, vs 1997+ spend): y' = y - θ(x - x̄) with
    θ = cov(x,y)/var(x); the treatment contrast of y' has variance
    (1-ρ²)·var(Δ_raw) and is unbiased for any θ because assignment
    (c_custkey % 2, content-derived) is independent of x.

    One pass builds per-unit (x, y) — a conditional aggregate over
    orders, LEFT-joined so no-order customers enter as (0, 0) — and a
    second single-row aggregate folds ALL sufficient statistics
    (n, Σx, Σx², Σy, Σxy + per-arm sums) map-side: the whole
    estimator is two shuffles of sufficient statistics, never a
    per-unit residual materialization — the agg_corr_exact /
    pipeline_grouped_ols discipline. The integer covariate keeps
    every cross-moment's decimal unscaled value < 2^53 (Σxy <=
    15k·12·5.5e6·100 ≈ 1e14 at sf0.1), so each cast to double is
    exact and θ is ONE deterministic double expression, rounded 9 dp
    (FMA-contraction guard); delta_cuped reads the ROUNDED θ — every
    downstream decision off the rounded value, the bh_fdr rule.
    Variance-reduction itself needs Σy² (unscaled > 2^53 here), so
    the ρ² claim is pinned by the planted pytest, not emitted."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    split = F.lit("1997-01-01").cast("timestamp")
    zero2 = F.lit(0).cast("decimal(18,2)")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < split, 1).otherwise(0)).alias("x"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= split,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(zero2)
        ).alias("y_dec"),
    )
    units = c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left").select(
        (F.col("c_custkey") % 2).alias("arm"),
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y_dec"), zero2).alias("y_dec"),
    )
    arm_t = F.col("arm") == 1
    stats = units.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(arm_t, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(~arm_t, 1).otherwise(0)).alias("n_c"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y_dec").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y_dec")).cast("double").alias("sxy"),
        F.sum(F.when(arm_t, F.col("x")).otherwise(0)).cast("double").alias("sx_t"),
        F.sum(F.when(~arm_t, F.col("x")).otherwise(0)).cast("double").alias("sx_c"),
        F.sum(F.when(arm_t, F.col("y_dec")).otherwise(zero2)).cast("double").alias("sy_t"),
        F.sum(F.when(~arm_t, F.col("y_dec")).otherwise(zero2)).cast("double").alias("sy_c"),
    )
    n = F.col("n")
    theta = F.round(
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (n * F.col("sxx") - F.col("sx") * F.col("sx")),
        9,
    )
    mean_gap_y = F.col("sy_t") / F.col("n_t") - F.col("sy_c") / F.col("n_c")
    mean_gap_x = F.col("sx_t") / F.col("n_t") - F.col("sx_c") / F.col("n_c")
    # degenerate-input guards (NULL, never Inf/NaN — NaN compares
    # engine-dependently, the runs_test rule): a constant covariate
    # has var(x) = 0 (theta undefined), a single-arm corpus has no
    # contrast
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    both_arms = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    return stats.select(
        "n",
        "n_t",
        "n_c",
        F.when(den != 0, theta).alias("theta"),
        F.when(both_arms, F.round(mean_gap_y, 9)).alias("delta_raw"),
        F.when(both_arms & (den != 0), F.round(mean_gap_y - theta * mean_gap_x, 9)).alias(
            "delta_cuped"
        ),
    )


# Wald SPRT constants, scaled to exact integers (millionths):
# H0 p=0.5 vs H1 p=0.6; ln(1.2)=0.182322, ln(0.8)=-0.223144 (6 dp);
# alpha=beta=0.05 -> bounds +-ln(19)=+-2.944439 -> +-2944439.
_SPRT_C1 = 182322
_SPRT_C0 = 223144
_SPRT_A = 2944439


@query(
    "pipeline_sprt",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS s,
             SUM(CASE WHEN value > 10.0 THEN 0 ELSE 1 END) AS f
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    walk AS (
      SELECT event_type, day,
             SUM(s) OVER w AS n1, SUM(f) OVER w AS n0
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
      SELECT event_type, day, n1, n0,
             n1 * {_SPRT_C1} - n0 * {_SPRT_C0} AS llr_m
      FROM walk
    ),
    first_cross AS (
      SELECT event_type, MIN(day) AS dday
      FROM scored WHERE llr_m >= {_SPRT_A} OR llr_m <= -{_SPRT_A}
      GROUP BY event_type
    ),
    last_day AS (
      SELECT event_type, MAX(day) AS lday FROM scored GROUP BY event_type
    ),
    decided AS (
      SELECT l.event_type, COALESCE(fc.dday, l.lday) AS day,
             fc.dday IS NOT NULL AS crossed
      FROM last_day l LEFT JOIN first_cross fc USING (event_type)
    )
    SELECT d.event_type,
           CASE WHEN NOT d.crossed THEN 'continue'
                WHEN s.llr_m >= {_SPRT_A} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           strftime(d.day, '%Y-%m-%d') AS day_decided,
           CAST(s.n1 + s.n0 AS BIGINT) AS n_seen,
           CAST(s.n1 AS BIGINT) AS n_success,
           CAST(s.llr_m AS DOUBLE) / 1000000.0 AS llr
    FROM decided d
    JOIN scored s ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def pipeline_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945) — the
    always-valid sequential monitor: per event type, walk the stream
    in time order accumulating the Bernoulli log-likelihood ratio for
    H1 p=0.6 vs H0 p=0.5 (success = value > 10), and stop at the
    FIRST crossing of +-ln(19) (alpha = beta = 0.05) — 'peeking' is
    the design, not a sin, unlike the fixed-horizon pipeline_ab_test.
    The open-ended drift sibling of pipeline_cusum_changepoint.

    Scale discipline (the runs-test precedent): the sequential walk
    runs over the CALENDAR-BOUNDED daily table — one groupBy
    compresses the stream to (type, day) counts, the running sums
    are integer windows over days, and the group-sequential decision
    is taken at day granularity (Wald's bounds stay conservative
    under batching). The LLR is EXACT INTEGER arithmetic end to end:
    6-dp log-ratio constants scaled to millionths (n1*182322 -
    n0*223144 vs +-2944439), so no double accumulation, no FMA
    contraction at the decision boundary, nothing to round — the
    crossing day is hash-exact. First-crossing row rides a min(day)
    join-back; never-crossing types report 'continue' at the last
    day. Streaming twin: the same integer state in an
    applyInPandasWithState fold (streaming/stateful.py cusum shape)."""
    from pyspark.sql import Window

    # ts null guard: a NULL day would sort NULLS FIRST in Spark's
    # window but NULLS LAST in DuckDB's — exclude it from the walk in
    # both engines
    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.when(F.col("value") > 10.0, 1).otherwise(0).alias("s_"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum("s_").alias("s"),
            F.sum(1 - F.col("s_")).alias("f"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "day",
        F.sum("s").over(w).alias("n1"),
        F.sum("f").over(w).alias("n0"),
    ).withColumn("llr_m", F.col("n1") * _SPRT_C1 - F.col("n0") * _SPRT_C0)
    first_cross = (
        scored.where((F.col("llr_m") >= _SPRT_A) | (F.col("llr_m") <= -_SPRT_A))
        .groupBy("event_type")
        .agg(F.min("day").alias("dday"))
    )
    last_day = scored.groupBy("event_type").agg(F.max("day").alias("lday"))
    decided = last_day.join(first_cross, "event_type", "left").select(
        "event_type",
        F.coalesce(F.col("dday"), F.col("lday")).alias("day"),
        F.col("dday").isNotNull().alias("crossed"),
    )
    return decided.join(scored, ["event_type", "day"]).select(
        "event_type",
        F.when(~F.col("crossed"), F.lit("continue"))
        .when(F.col("llr_m") >= _SPRT_A, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        F.date_format("day", "yyyy-MM-dd").alias("day_decided"),
        (F.col("n1") + F.col("n0")).cast("long").alias("n_seen"),
        F.col("n1").cast("long").alias("n_success"),
        (F.col("llr_m").cast("double") / 1000000.0).alias("llr"),
    )


@query(
    "pipeline_power_analysis",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4)))
                  AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    ),
    derived AS (
      SELECT l_returnflag, n,
             sx / n AS mean_x,
             (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)) AS var_x
      FROM stats
    )
    SELECT l_returnflag, n,
           round(mean_x, 9) AS mean_qty,
           CASE WHEN n >= 2 THEN round(var_x, 9) END AS var_qty,
           CASE WHEN n >= 2 THEN
             round(2.801585 * sqrt(2.0 * var_x / n), 9) END AS mde_abs,
           CASE WHEN n >= 2 AND mean_x <> 0 THEN
             round(2.801585 * sqrt(2.0 * var_x / n) / mean_x, 9) END AS mde_rel,
           CASE WHEN n >= 2 AND mean_x <> 0 THEN
             CAST(ceil(round(
               2.0 * var_x * 2.801585 * 2.801585
                 / ((0.02 * mean_x) * (0.02 * mean_x)), 6)) AS BIGINT) END
             AS n_req_per_arm
    FROM derived
    """,
)
def pipeline_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS — the pre-experiment sizing report
    that belongs beside pipeline_ab_test / pipeline_cuped /
    pipeline_sprt: per return-flag stratum, the metric's mean and
    variance from exact decimal sufficient statistics (n, Σx, Σx² —
    the agg_stats_moments recipe, every unscaled value < 2^53 here
    so casts are exact), then the two standard design numbers for a
    two-sample z-test at alpha = 0.05 (two-sided), power = 0.80
    (z_sum = 1.959964 + 0.841621 = 2.801585, one 15-digit-safe
    literal):

      MDE at current n      = z_sum * sqrt(2 var / n)
      n per arm for 2% lift = ceil(2 var z_sum^2 / (0.02 mean)^2)

    All emissions are single deterministic double expressions over
    the exact statistics, rounded 9 dp (FMA guard); the ceil for
    n_req reads a 6-dp-ROUNDED quotient so the integer decision
    cannot sit on a contraction-dependent ulp (the bh_fdr
    rounded-decision rule). One groupBy, sufficient statistics only —
    nothing about this plan changes at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,4)"))
        .cast("double")
        .alias("sxx"),
    )
    n = F.col("n")
    mean_x = F.col("sx") / n
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n.cast("double") * (n - 1))
    zsum = F.lit(2.801585)
    mde_abs = zsum * F.sqrt(2.0 * var_x / n)
    n_req = F.ceil(
        F.round(2.0 * var_x * zsum * zsum / ((0.02 * mean_x) * (0.02 * mean_x)), 6)
    )
    # degenerate guards (NULL, never Inf/NaN): variance needs n >= 2,
    # the relative numbers need a nonzero mean
    has_var = n >= 2
    has_mean = has_var & (mean_x != 0)
    return stats.select(
        "l_returnflag",
        "n",
        F.round(mean_x, 9).alias("mean_qty"),
        F.when(has_var, F.round(var_x, 9)).alias("var_qty"),
        F.when(has_var, F.round(mde_abs, 9)).alias("mde_abs"),
        F.when(has_mean, F.round(mde_abs / mean_x, 9)).alias("mde_rel"),
        F.when(has_mean, n_req.cast("long")).alias("n_req_per_arm"),
    )


def conformal_qhat_histogram(
    calib: DataFrame,
    group_col: str = "prio",
    resid_col: str = "resid",
    bin_width: float = 1000.0,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """The 100 TB path pipeline_conformal's docstring promises: a
    FIXED-WIDTH-HISTOGRAM conformal quantile that never materializes
    a per-group sorted residual list.

    Exact split conformal needs the k-th smallest calibration
    residual (k = ceil((1-alpha)(n+1))); the sorted-collect form
    holds one group in memory. This form buckets residuals into
    fixed-width bins (one groupBy on (group, bin) — mergeable,
    bounded state) and returns the UPPER EDGE of the first bin whose
    cumulative count reaches k. Because the upper edge >= the true
    k-th order statistic, intervals built from it are CONSERVATIVE:
    coverage >= 1 - alpha still holds (Angelopoulos & Bates 2023 §2
    remark on conservative scores), at a width cost of at most one
    bin. The cumulative walk is a window over BINS per group —
    bounded by range/bin_width, never by n.

    alpha is passed as a rational (num/den) so k stays integer
    arithmetic. Returns (group, n_cal, q_hist)."""
    from pyspark.sql import Window

    b = F.floor(F.col(resid_col) / bin_width).cast("long").alias("bin")
    bins = (
        calib.select(F.col(group_col).alias("grp"), b)
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("bin")
    n_w = Window.partitionBy("grp")
    cum = bins.select(
        "grp",
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(n_w).alias("n_cal"),
    )
    # k = ceil((1-alpha)(n+1)) with alpha = num/den, in integers
    k = F.expr(
        f"(({alpha_den} - {alpha_num}) * (n_cal + 1) + {alpha_den} - 1)"
        f" div {alpha_den}"
    )
    hits = cum.where(F.col("cum") >= k)
    return (
        hits.groupBy("grp")
        .agg(
            F.any_value("n_cal").alias("n_cal"),
            ((F.min("bin") + 1) * bin_width).alias("q_hist"),
        )
        .select(F.col("grp").alias(group_col), "n_cal", "q_hist")
    )


_RDD_SIDE_SQL = """
      CAST(SUM(CASE WHEN {side} THEN 1 ELSE 0 END) AS BIGINT) AS n_{tag},
      CAST(SUM(CASE WHEN {side} THEN x ELSE 0 END) AS BIGINT) AS sx_{tag},
      CAST(SUM(CASE WHEN {side} THEN x * x ELSE 0 END) AS BIGINT)
        AS sxx_{tag},
      CAST(SUM(CASE WHEN {side} THEN y END) AS DECIMAL(18,2)) AS sy_{tag},
      CAST(SUM(CASE WHEN {side} THEN x * y END) AS DECIMAL(18,2))
        AS sxy_{tag}"""


@query(
    "pipeline_rdd",
    oracle=f"""
    WITH band AS (
      SELECT CAST(l_quantity AS BIGINT) - 25 AS x,
             CAST(l_discount AS DECIMAL(18,2)) AS y
      FROM lineitem
      WHERE l_quantity >= 15 AND l_quantity < 35
    ),
    s AS (
      SELECT
      {_RDD_SIDE_SQL.format(side="x < 0", tag="l")},
      {_RDD_SIDE_SQL.format(side="x >= 0", tag="r")}
      FROM band
    ),
    fit AS (
      SELECT n_l, n_r,
        n_l * sxx_l - sx_l * sx_l AS den_l,
        n_r * sxx_r - sx_r * sx_r AS den_r,
        sy_l * sxx_l - sx_l * sxy_l AS anum_l,
        sy_r * sxx_r - sx_r * sxy_r AS anum_r,
        n_l * sxy_l - sx_l * sy_l AS bnum_l,
        n_r * sxy_r - sx_r * sy_r AS bnum_r
      FROM s
    ),
    est AS (
      SELECT n_l, n_r,
        CASE WHEN den_l > 0
             THEN round(CAST(anum_l AS DOUBLE) / den_l, 9) END AS alpha_l,
        CASE WHEN den_r > 0
             THEN round(CAST(anum_r AS DOUBLE) / den_r, 9) END AS alpha_r,
        CASE WHEN den_l > 0
             THEN round(CAST(bnum_l AS DOUBLE) / den_l, 9) END AS slope_l,
        CASE WHEN den_r > 0
             THEN round(CAST(bnum_r AS DOUBLE) / den_r, 9) END AS slope_r
      FROM fit
    )
    SELECT n_l AS n_left, n_r AS n_right,
           alpha_l AS alpha_left, alpha_r AS alpha_right,
           slope_l AS slope_left, slope_r AS slope_right,
           alpha_r - alpha_l AS tau_rdd
    FROM est
    """,
)
def pipeline_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGRESSION DISCONTINUITY estimate (sharp RDD, local-linear
    with a rectangular kernel) of the discount jump at the
    quantity-25 cutoff: fit y on (quantity - 25) separately inside
    the bandwidth on each side, tau = the difference of the two
    intercepts AT the cutoff -- the observational-causal design for
    threshold rules (bulk-discount policies, score cutoffs, quota
    effects) beside pipeline_did (time discontinuity) and
    pipeline_cem_matching (covariate matching). The fixture has no
    real policy at 25, so tau is a null-effect readout; the planted
    test carries the recovery semantics.

    Exactness: x is an exact integer offset, y an exact
    DECIMAL(18,2); all ten side-pivoted sufficient sums are exact
    (longs / decimals) in ONE corpus pass (the anova wide-pivot
    rule), and each intercept/slope is a ratio of an exact decimal
    numerator over an exact long denominator -- numerators pass 2^53
    unscaled past sf ~3, so each ratio is emitted at 9 dp (the
    grouped_ols/acf discipline) and tau subtracts the two ROUNDED
    intercepts (exact on agreed doubles). Degenerate sides
    (den <= 0) emit NULL.

    Scale: predicate-pushed band scan, one aggregate, zero shuffles
    beyond the partial-agg combine; sufficient statistics all the
    way down. Bandwidth/cutoff are compile-time constants here; a
    production variant parameterizes them (same plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    band = li.where(
        (F.col("l_quantity") >= 15) & (F.col("l_quantity") < 35)
    ).select(
        (F.col("l_quantity").cast("long") - 25).alias("x"),
        F.col("l_discount").cast("decimal(18,2)").alias("y"),
    )
    sides = {"l": F.col("x") < 0, "r": F.col("x") >= 0}
    aggs = []
    for tag, cond in sides.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"sx_{tag}"),
            F.sum(F.when(cond, F.col("x") * F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"sxx_{tag}"),
            F.sum(F.when(cond, F.col("y")))
            .cast("decimal(18,2)")
            .alias(f"sy_{tag}"),
            F.sum(F.when(cond, F.col("x") * F.col("y")))
            .cast("decimal(18,2)")
            .alias(f"sxy_{tag}"),
        ]
    s = band.agg(*aggs)
    cols = {"n_left": F.col("n_l"), "n_right": F.col("n_r")}
    ests = {}
    for tag in ("l", "r"):
        den = F.col(f"n_{tag}") * F.col(f"sxx_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sx_{tag}")
        anum = F.col(f"sy_{tag}") * F.col(f"sxx_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sxy_{tag}")
        bnum = F.col(f"n_{tag}") * F.col(f"sxy_{tag}") - F.col(
            f"sx_{tag}"
        ) * F.col(f"sy_{tag}")
        ests[f"alpha_{tag}"] = F.when(
            den > 0, F.round(anum.cast("double") / den, 9)
        )
        ests[f"slope_{tag}"] = F.when(
            den > 0, F.round(bnum.cast("double") / den, 9)
        )
    return s.select(
        cols["n_left"].alias("n_left"),
        cols["n_right"].alias("n_right"),
        ests["alpha_l"].alias("alpha_left"),
        ests["alpha_r"].alias("alpha_right"),
        ests["slope_l"].alias("slope_left"),
        ests["slope_r"].alias("slope_right"),
        (ests["alpha_r"] - ests["alpha_l"]).alias("tau_rdd"),
    )


@query(
    "pipeline_srm",
    oracle="""
    WITH units AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c
      FROM units
    ),
    z AS (
      SELECT n_t, n_c,
             CAST(n_t AS DOUBLE) / (n_t + n_c) AS ratio_t,
             CASE WHEN n_t + n_c > 0 THEN
               CAST(n_t - n_c AS DOUBLE) / sqrt(CAST(n_t + n_c AS DOUBLE))
             END AS z_score
      FROM s
    )
    SELECT n_t, n_c, ratio_t, z_score,
           z_score * z_score AS chi_square,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) AS p_approx,
           round(2.0 / (1 + exp(1.702 * abs(z_score))), 6) < 0.001
             AS srm_detected
    FROM z
    """,
)
def pipeline_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO MISMATCH check (the standard experiment health
    gate, run BEFORE reading any metric): do the parity arms actually
    hold the intended 50/50 unit split? A mismatched ratio means the
    assignment or logging pipeline is broken and every downstream
    readout (pipeline_ab_test, cuped, two_proportion_z on the same
    arms) is invalid — the industry convention alarms at p < 0.001,
    NOT 0.05, because the null is expected to hold to high precision
    (Fabijan et al. 2019). chi2(1) = (n_t − n_c)²/n via
    z = (n_t − n_c)/√n.

    Exactness: unit counts are exact longs from one
    groupBy(user) pass; z and chi² are one shared IEEE tree over
    their double casts, emitted unrounded; the logistic-Φ p rounds
    at its transcendental with the decision reading the rounded
    value (the bh_fdr rule). Empty input emits NULL, never a
    division crash.

    Scale: one partial-agg-friendly distinct-units pass, then a
    1-row fold — nothing scales past the unit count."""
    e = load_table(spark, sf_dir, "events")
    units = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.first((F.col("user_id") % 2).cast("long")).alias("arm"))
    )
    s = units.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
    )
    n = F.col("n_t") + F.col("n_c")
    z = F.when(
        n > 0, (F.col("n_t") - F.col("n_c")).cast("double") / F.sqrt(n.cast("double"))
    )
    p = F.round(2.0 / (1 + F.exp(1.702 * F.abs(z))), 6)
    return s.select(
        "n_t",
        "n_c",
        (F.col("n_t").cast("double") / n).alias("ratio_t"),
        z.alias("z_score"),
        (z * z).alias("chi_square"),
        p.alias("p_approx"),
        (p < 0.001).alias("srm_detected"),
    )


@query(
    "pipeline_wilson_ci",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE l_returnflag = 'R') AS k
      FROM lineitem
    )
    SELECT n, k,
           CAST(k AS DOUBLE) / n AS p_hat,
           (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
            - 1.96 * sqrt(CAST(k AS DOUBLE) / n
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n) AS lo,
           (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
            + 1.96 * sqrt(CAST(k AS DOUBLE) / n
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n) AS hi
    FROM s
    """,
)
def pipeline_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext (r14) — WILSON SCORE INTERVAL (1927) for the return-rate
    proportion: the 95% CI for P(l_returnflag = 'R') that stays
    inside [0,1] and behaves at small n / extreme p̂ where the Wald
    interval collapses — the per-proportion counterpart to
    pipeline_two_proportion_z's difference test (that key reports a
    z; this one the actionable bracket).

    Determinism: n and k are exact counts; lo/hi are ONE
    fixed-order IEEE tree written identically in both engines —
    every constant (1.96, 2.0, 4.0, 1.0) a short exact literal,
    sqrt correctly rounded, no reassociation between the engines
    because the parse trees match token-for-token.

    Scale + lint: a single conditional-count aggregate over the
    scan; no join, no window; 1 row out."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    z2 = F.lit(1.96) * F.lit(1.96)
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return s.select(
        "n",
        "k",
        p.alias("p_hat"),
        ((center - half) / denom).alias("lo"),
        ((center + half) / denom).alias("hi"),
    )
