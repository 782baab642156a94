"""Join operators (SURVEY.md §2.D).

Geometry assembly in the reference is fundamentally a join problem:
"ways get their geometry from member nodes and relations get their
geometry from member nodes and ways" (/root/reference/README.md:80).
The delegate resolves references with an in-RAM node-location cache
(``--ram=8``, osm_etl.py:18); the Spark-native answer is the shuffle:
sort-merge / shuffle-hash joins scale past RAM, AQE fixes skew at
runtime, and small dimensions are broadcast.

Scale notes per operator are inline. The general rules at 100 TB:
big⋈big on a stable key → bucket both sides at write time (zero
shuffle); big⋈small → ``F.broadcast``; non-equi → never raw BNLJ at
scale, pre-bucket the range key into an equi key first (see
``join_range``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — equi inner join (the way⋈node reference-resolution shape).
    Spark picks SMJ/SHJ; at 100 TB bucket both sides by the key."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(customer, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — broadcast hash join: tiny dims (25/5 rows — OSM's region
    lookup shape) ship to every executor; zero shuffle on the fact."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
           ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — left outer join: keep elements with no match (a way whose
    member nodes fall outside the extract, README.md:80)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return customer.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — multi-way join (relation → member ways → member nodes,
    two-hop assembly). Catalyst reorders; nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — left semi join: existence filter (ways having ≥1 member
    node present in the extract). No row multiplication."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — left anti join: orphan detection (refs with no resolvable
    target — extract-completeness QA, README.md:80)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_theta",
    oracle="""
    SELECT s_suppkey,
           COUNT(*) AS n_parts_in_band,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS band_price_sum
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — theta / non-equi join (BNLJ). Kept to dim×dim size here;
    at scale a pure inequality join must be re-keyed (bucketize the
    band, equi-join on bucket, post-filter) — raw BNLJ is O(n·m)."""
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    cond = F.col("p_retailprice").between(F.col("s_acctbal") - 100, F.col("s_acctbal") + 100)
    return (
        supplier.join(part, cond)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts_in_band"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("band_price_sum"),
        )
    )


@query(
    "join_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderdate, l_shipdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — range/interval join: point-in-range with an equi
    co-key (the prunable form — spatial analogue is point-in-bbox
    within a geohash cell). The equi key keeps it a hash/merge join
    with a residual range filter: this is the shape that survives
    100 TB, unlike a raw interval BNLJ."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return li.join(orders, cond).select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@query(
    "join_asof",
    oracle="""
    SELECT event_id, ts, user_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
    FROM (
      SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — as-of join: latest snapshot ≤ a point in time — the
    relational form of the reference's ``--pgosm-date`` pinning
    (osm_etl.py:13). Implemented as join + max over a single
    lexicographic encoding: (orderdate, orderkey) packs into ONE
    decimal(38,0) as epoch_µs·10¹⁸ + orderkey, whose numeric order
    equals the (orderdate, orderkey) struct order (both components
    non-negative, orderkey < 10¹⁸ — epoch µs tops out at ~4·10¹⁵ for
    year-2100 dates, so the product stays under 10³⁵ ≪ 10³⁸). The
    aggregate still map-side-combines, so the shuffle carries one
    row per event instead of one per (event × matching order) — and
    unlike the r13 max(STRUCT(...)) form the buffer is a fixed-width
    decimal, so the whole aggregation is a HashAggregate instead of
    SortAggregate + a full Sort of the join-multiplied rows on each
    side of the exchange (r14, guide §1.2 step 2; plans/r14
    before/after). The window-rank formulation is what the oracle
    states; results are identical (decode is exact integer div/mod,
    and the session TZ is pinned UTC so the NTZ↔TZ casts round-trip
    bit-exactly)."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    ten18 = F.lit(1_000_000_000_000_000_000).cast("decimal(38,0)")
    enc = (
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("decimal(38,0)") * ten18
        + F.col("o_orderkey")
    ).alias("enc")
    return (
        e.join(o, (F.col("o_custkey") == F.col("user_id")) & (F.col("o_orderdate") <= F.col("ts")))
        .select("event_id", "ts", "user_id", enc)
        .groupBy("event_id", "ts", "user_id")
        .agg(F.max("enc").alias("best"))
        .select(
            "event_id",
            "ts",
            "user_id",
            (F.col("best") % ten18).cast("long").alias("asof_orderkey"),
            # divide only the exact multiple (best - best % 10¹⁸) so the
            # decimal division has zero remainder — no scale rounding to
            # reason about, the long cast is exact by construction
            F.timestamp_micros(
                ((F.col("best") - F.col("best") % ten18) / ten18).cast("long")
            )
            .cast("timestamp_ntz")
            .alias("asof_orderdate"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 — cross join of small inputs (the base of pairwise
    similarity in §2.K). Only ever dim×dim; a big-side cartesian is a
    design bug at scale."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_full_outer",
    oracle="""
    SELECT f.o_custkey AS custkey_f, l.o_custkey AS custkey_l,
           f.n_f, l.n_l
    FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL OUTER JOIN
         (SELECT o_custkey, COUNT(*) AS n_l FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) l
      ON f.o_custkey = l.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 (extension) — full outer join: customers present in either
    era keep their row, mismatches null-padded on the absent side
    (snapshot diffing where both sides may have exclusive keys).
    Full outer can't broadcast — always a shuffle join; both sides
    pre-aggregate so the shuffle carries one row per key."""
    o = load_table(spark, sf_dir, "orders")
    f = (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
        .select(F.col("o_custkey").alias("custkey_f"), "n_f")
    )
    l = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_l"))
        .select(F.col("o_custkey").alias("custkey_l"), "n_l")
    )
    return f.join(l, F.col("custkey_f") == F.col("custkey_l"), "full_outer")

@query(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (
      SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_event_id, ts AS click_ts, user_id
      FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.event_id, c.click_event_id, c.click_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.click_ts DESC,
                                         c.click_event_id DESC) AS rn
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.click_ts <= p.ts
                   AND c.click_ts >= p.ts - INTERVAL 1 HOUR
    )
    SELECT p.event_id, p.ts, p.user_id,
           m.click_event_id, m.click_ts,
           epoch_us(p.ts) - epoch_us(m.click_ts) AS staleness_us
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9b (extension) — as-of join with a tolerance bound and LEFT
    semantics: each purchase matches its latest click by the same
    user at most 1 hour earlier; purchases with no click inside the
    window keep NULLs (pandas ``merge_asof(tolerance=...)`` /
    kdb ``wj`` semantics — the feature-attribution shape: "the click
    that caused this purchase, if fresh enough").

    Same scale design as join_asof (map-side ``max(struct)``, one
    row per probe key into the shuffle) plus: the tolerance predicate
    makes the join band-bounded, so at 100 TB both sides can be
    bucketed by (user, coarse time bucket) and the join never scans
    history older than the tolerance — state is O(window), the batch
    twin of the stream-stream interval join. The unmatched probes are
    restored by a left join against the (already aggregated, small)
    match set. Staleness is exact integer microseconds (unix_micros
    on both engines — no float epoch, no rounding divergence)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user"),
    )
    matched = (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("ts"))
            & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("event_id")
        .agg(F.max(F.struct("click_ts", "click_event_id")).alias("best"))
        .select(
            "event_id",
            F.col("best.click_event_id").alias("click_event_id"),
            F.col("best.click_ts").alias("click_ts"),
        )
    )
    return p.join(matched, "event_id", "left").select(
        "event_id",
        "ts",
        "user_id",
        "click_event_id",
        "click_ts",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("staleness_us"),
    )


@query(
    "er_blocked_match",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
      FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS name_dist
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 (extension) — entity resolution as a blocked similarity
    join: candidate pairs share a blocking key (first name token),
    then the expensive edit-distance verify runs only within blocks —
    the classic record-linkage shape (block → compare → match, here
    at Levenshtein <= 3).

    Scale: the cross product is per-block, so cost is sum(block²),
    not corpus²; the blocking key is an equi-join — shuffle both
    sides on blk, co-partitioned compare. At 100 TB: multi-pass
    blocking (several cheap keys, union the candidates) and a skew
    guard on mega-blocks (same Observation-counted cap as the LSH
    path) keep the quadratic term bounded; Levenshtein is exact
    integer math on both engines, so the verify is oracle-exact."""
    p = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", F.split("p_name", " ").getItem(0).alias("blk"))
    )
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "blk",
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        "blk",
    )
    return (
        a.join(b, "blk")
        .where(F.col("part_a") < F.col("part_b"))
        .select(
            "part_a",
            "part_b",
            F.levenshtein("name_a", "name_b").alias("name_dist"),
        )
        .where(F.col("name_dist") <= 3)
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH months AS (
      SELECT DISTINCT date_trunc('month', o_orderdate) AS m_start
      FROM orders
    )
    SELECT strftime(m_start, '%Y-%m-%d') AS month_start,
           COUNT(*) AS n_open_orders
    FROM months JOIN orders
      ON o_orderdate < m_start + INTERVAL '1 month'
     AND m_start < o_orderdate + INTERVAL '5 days'
    GROUP BY m_start
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext D8b — interval-OVERLAP join (a.start < b.end AND b.start <
    a.end), the temporal-join shape point-in-range can't express:
    how many order fulfillment windows ([orderdate, +5 days)) touch
    each calendar month. One side is the derived month spine — tiny,
    broadcast — so the non-equi condition runs as a broadcast
    nested-loop over ≤ months-count rows per order, never a
    corpus×corpus cross. For two LARGE interval sets the scale form
    buckets both sides by overlapping coarse cells (the geohash
    trick on the time axis) and equi-joins on the cell — the
    composition SCALE.md documents; this key pins the semantics."""
    o = load_table(spark, sf_dir, "orders")
    months = (
        o.select(F.date_trunc("month", "o_orderdate").alias("m_start"))
        .distinct()
    )
    cond = (
        F.col("o_orderdate") < F.col("m_start") + F.expr("INTERVAL 1 MONTH")
    ) & (F.col("m_start") < F.col("o_orderdate") + F.expr("INTERVAL 5 DAYS"))
    return (
        o.join(F.broadcast(months), cond)
        .groupBy("m_start")
        .agg(F.count(F.lit(1)).alias("n_open_orders"))
        .select(
            F.date_format("m_start", "yyyy-MM-dd").alias("month_start"),
            "n_open_orders",
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT event_id, ts, user_id,
           o_orderkey AS nearest_orderkey, o_orderdate AS nearest_orderdate,
           gap_us
    FROM (
      SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
             abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS gap_us,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)),
                        o.o_orderdate, o.o_orderkey) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext D9c — NEAREST-match as-of join: the closest order in
    EITHER time direction, completing the as-of family (D9 backward,
    D9b backward+tolerance, D9c nearest — pandas merge_asof's three
    ``direction`` modes). Distance is |Δt| in INTEGER epoch
    MICROSECONDS (the house timestamp-arithmetic rule — never
    interval division), ties prefer the EARLIER order then the
    smaller key, so the order is total.

    Same scale shape as D9: the candidate join is an equi-join on
    the user key and the winner is a map-side MIN(struct) — the
    shuffle carries one row per event regardless of history depth.
    Nearest (unlike backward) cannot prune candidates with a time
    predicate; at 100 TB band the join by coarse time bucket
    (join on bucket and bucket±1 — the join_interval_overlap
    pattern) so each event only meets its neighborhood."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    # ntz -> timestamp is identity under the session's pinned UTC
    gap = F.abs(
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    best = F.min(F.struct(gap.alias("gap_us"), "o_orderdate", "o_orderkey")).alias("best")
    return (
        e.join(o, F.col("o_custkey") == F.col("user_id"))
        .groupBy("event_id", "ts", "user_id")
        .agg(best)
        .select(
            "event_id",
            "ts",
            "user_id",
            F.col("best.o_orderkey").alias("nearest_orderkey"),
            F.col("best.o_orderdate").alias("nearest_orderdate"),
            F.col("best.gap_us").alias("gap_us"),
        )
    )
