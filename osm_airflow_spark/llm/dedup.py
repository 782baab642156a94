"""Deduplication operators (SURVEY.md §2.K — K1/K2 + extensions).

The training-data dedup family required by the north star, over the
``documents`` fixture: exact (content hash), MinHash+LSH (near-dup
candidates at scale), SimHash (Hamming-ball near-dup), n-gram Jaccard
(exact set similarity), and embedding-cosine near-dup.

Scale notes (the whole point of these designs):
* Exact dedup is a hash-groupBy — one shuffle on the digest, no
  full-text comparison ever.
* MinHash/LSH never computes all-pairs: banding turns "compare
  everything" into an equi-join on (band, band_hash) — candidates
  only. At 100 TB, cap bucket sizes (a degenerate bucket with 10⁶
  docs means the shingle choice is wrong) and salt hot buckets.
* SimHash candidates come from the pigeonhole principle: fingerprints
  within Hamming distance d must share one of d+1 chunks — again an
  equi-join, not a cross join.
* Embedding near-dup brute-force is quadratic — kept for the fixture
  and as the correctness oracle for the LSH path in similarity.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.llm.similarity import cosine_expr
from osm_airflow_spark.registry import query

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep_id
          FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.keep_id
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 — exact dedup by content digest: keep the lowest doc_id per
    md5(text). Window + row_number (the F1 pattern) rather than
    dropDuplicates, so the survivor is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def shingle_array(words_col: str = "words", n: int = 3) -> Column:
    """Word n-gram shingles over a pre-split word array (split once,
    shingle from the array — re-splitting inside the lambda costs a
    regex scan per gram). Short docs fall back to the whole word set
    as one shingle. n-grams, not unigrams: with a small shared
    vocabulary unigram sets collide for *every* pair and LSH
    degenerates to all-pairs — the n-gram keeps bucket selectivity
    tied to phrase overlap, which is what near-duplicate means."""
    grams = F.expr(
        f"transform(sequence(0, size({words_col}) - {n}),"
        f" i -> concat_ws(' ', "
        + ", ".join(f"{words_col}[i + {j}]" for j in range(n))
        + "))"
    )
    return F.when(F.size(F.col(words_col)) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", words_col))
    )


def banded_signature_rows(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, sig, band_idx, band_hash) rows — the shingle →
    minhash → band leg of the near-dup pipeline, extracted (r10) so
    the STREAMING ingest (near_dedup_ingest_stream) persists exactly
    the rows the batch key joins on. No exchange: signatures fold
    in-array inside the input partition; the band explode multiplies
    rows by n_bands only.

    The whole shingle-hash → minhash → band chain is ONE expression
    (r14). The previous three-projection formulation
    (hs → mh_0..mh_{k-1} → array(mh_*) + band hashes) let
    ProjectCollapse inline each minhash tree into both the sig array
    and its band hash — recomputing the shingle/minhash work ~2x per
    row (transform lambdas sit outside codegen CSE). SQL has no let
    binding, so the chain binds its intermediates the only way
    expressions can: a one-element ``transform(array(x), v -> body)
    [0]`` evaluates ``x`` exactly once no matter how many times
    ``v`` appears in ``body``. Output rows are bit-identical to the
    old form (verified exceptAll both ways at sf0.1; same hash
    calls, same order); measured 1.11 s → 0.84 s for the banded leg
    at sf0.1. SQL-parsed lambdas, deliberately: Python-side
    ``F.transform(..., lambda ...)`` calls sharing one projection
    collide their lambda variable names during resolution (measured,
    this Spark build — sixteen seeds all collapsed to one value);
    the SQL parser binds each lambda independently, and the distinct
    names here (sh_/hs/i/h/sig/b) keep the nesting unambiguous."""
    rpb = n_hashes // n_bands
    band_args = ", ".join(f"sig[b*{rpb}+{r}]" for r in range(rpb))
    chain = f"""
      transform(array(transform(shs, sh_ -> xxhash64(sh_))), hs ->
        transform(
          array(transform(sequence(0, {n_hashes - 1}),
                          i -> array_min(transform(hs, h -> xxhash64(i, h))))),
          sig -> transform(sequence(0, {n_bands - 1}), b ->
            struct(sig as sig, int(b) as band_idx,
                   xxhash64({band_args}) as band_hash))
        )[0]
      )[0]
    """
    return (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .select("doc_id", F.array_distinct(shingle_array("words", shingle_n)).alias("shs"))
        .select("doc_id", F.explode(F.expr(chain)).alias("r"))
        .select("doc_id", "r.sig", "r.band_idx", "r.band_hash")
    )


def est_jaccard_expr(sig_a, sig_b, n_hashes: int = N_MINHASH) -> Column:
    """MinHash Jaccard estimate: fraction of matching signature
    slots (shared by the batch key and the streaming ingest)."""
    return (
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(n_hashes)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_bucket: int = 200,
    observation=None,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    shingle → minhash → band → bucket-join, all DataFrame ops:
    1. explode distinct word n-gram shingles;
    2. 16 seeded xxhash64 minhashes per doc (one groupBy, 16 aggs —
       partial aggregation keeps shuffle rows = docs, not shingles);
    3. split the signature into bands, hash each band;
    4. self-equi-join on (band_idx, band_hash) → candidates, with a
       bucket-size cap: a bucket holding >max_bucket docs means the
       shingle carries no signal (boilerplate), and joining it would
       be quadratic — the standard skip-mega-buckets guard (correct
       to skip for dedup since such pairs get found via their other
       bands). The dropped volume is OBSERVABLE: pass a
       ``pyspark.sql.Observation`` and after the first action it
       reports ``lsh_rows_skipped`` (doc×band rows dropped by the
       cap) and ``lsh_buckets_skipped_approx`` — recall loss from
       boilerplate mega-buckets is never silent;
    5. estimate Jaccard as the fraction of matching signature slots;
       keep pairs ≥ threshold.
    """
    banded = banded_signature_rows(docs, n_hashes, n_bands, shingle_n)

    # Pairs come from collecting each bucket and generating (i < j)
    # combinations IN-ARRAY — not a self-equi-join, which would
    # re-execute the whole shingle+minhash subtree for the second
    # side (this build never reuses exchanges; SCALE.md round-4
    # ledger). The mega-bucket cap is a size filter on the collected
    # array (r14: it was a count-over-(band, hash) Window BEFORE the
    # groupBy — same survivors, but that paid an extra Sort of every
    # banded row just to drop whole buckets the aggregate already
    # materializes; guide §2.4). Bounded state either way: a bucket's
    # members list tops out at the bucket's doc count, and degenerate
    # buckets are dropped as one array instead of row-by-row.
    #
    # The OBSERVED variant keeps the r13 formulation verbatim
    # (per-row Window cap, dedup-then-score): when every candidate is
    # capped away, AQE's empty-relation propagation rewrites the
    # now-empty subtree to an empty LocalRelation and the
    # CollectMetrics node vanishes with it — ``observation.get`` then
    # fails instead of reporting the drop counts (measured, this
    # build; SCALE.md round-14 optimization ledger). The r13 plan
    # happens to survive that rewrite, so monitored runs keep it and
    # pay its extra Sorts; the hot path (observation=None — the
    # registered key, clustering, streaming ingest) takes the
    # window-free plan below.
    if observation is not None:
        return _lsh_pairs_observed(
            banded, observation, n_hashes, threshold, max_bucket
        )
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("members")
    )
    buckets = buckets.where(
        (F.size("members") >= 2) & (F.size("members") <= max_bucket)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                "members",
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size("members")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    # Score each candidate occurrence IN the bucket partition, filter,
    # THEN dedup (doc_a, doc_b) — a pair's est_jaccard is a pure
    # function of its two full signatures, so every band that emits
    # the pair emits the same score and distinct() on the scored row
    # equals the old dedup-then-score. This turns the pair exchange
    # from first(sig)-over-(pair) SortAggregates carrying two
    # 16-element arrays into a plain HashAggregate distinct over
    # (long, long, double), and only pairs ≥ threshold are shuffled
    # at all (guide §2.3: aggregate before you shuffle, shuffle keys
    # not payloads).
    est = est_jaccard_expr(
        F.col("p.a.sig"), F.col("p.b.sig"), N_MINHASH if n_hashes is None else n_hashes
    )
    return (
        buckets.select(pair.alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            est.alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def _lsh_pairs_observed(
    banded: DataFrame,
    observation,
    n_hashes: int,
    threshold: float,
    max_bucket: int,
) -> DataFrame:
    """The r13 minhash_lsh_pairs tail, kept for observed runs only —
    same rows as the fast path (proven by the shared fixture tests);
    its per-row Window cap and first(sig) dedup survive AQE
    empty-relation propagation when the cap drops everything, which
    the fast path's deterministic distinct() does not (see caller)."""
    bucket_w = Window.partitionBy("band_idx", "band_hash")
    banded = banded.withColumn("bucket_n", F.count(F.lit(1)).over(bucket_w))
    over = F.col("bucket_n") > max_bucket
    banded = banded.observe(
        observation,
        F.count(F.when(over, 1)).alias("lsh_rows_skipped"),
        F.approx_count_distinct(
            F.when(over, F.concat_ws(":", "band_idx", "band_hash"))
        ).alias("lsh_buckets_skipped_approx"),
    )
    banded = banded.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .where(F.size("members") >= 2)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                "members",
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size("members")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    candidates = (
        buckets.select(pair.alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = est_jaccard_expr("sig_a", "sig_b", n_hashes)
    return candidates.select("doc_a", "doc_b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


@query("llm_dedup_near")  # rows-only: hash-family dependent
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — MinHash+LSH near-duplicate pairs (word shingles, 16
    hashes, 4 bands, est-Jaccard ≥ 0.8). Deterministic given the
    seeded hash family, but the family is Spark's xxhash64 →
    rows-only for the oracle; exactness is cross-checked against
    llm_dedup_ngram_jaccard in tests."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d)


def simhash_expr(words_col: Column, n_bits: int = 32) -> Column:
    """SimHash fingerprint of a word array, as one column expression.

    Per bit: sign of Σ_words (±1 by word-hash bit) — here computed by
    summing each word's bit, then testing count > half. 32 bits keeps
    the fingerprint in a positive long.
    """
    n_words = F.size(words_col)
    bits = [
        (
            F.aggregate(
                F.transform(
                    words_col,
                    lambda w: F.shiftright(F.xxhash64(w), i).bitwiseAND(F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            * 2
            > n_words
        ).cast("long")
        * F.lit(2**i)
        for i in range(n_bits)
    ]
    return reduce(lambda a, b: a + b, bits)


def _simhash_from_hashes(hs: Column, n_bits: int = 32) -> Column:
    """``simhash_expr`` over PRE-HASHED word longs (r15): same per-bit
    majority test — Σ((h >> i) & 1) · 2 > n_words — folded over the
    hash array attribute, so the word hash computes once per word
    instead of once per (word, bit)."""
    n_words = F.size(hs)
    bits = [
        (
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1)),
            )
            * 2
            > n_words
        ).cast("long")
        * F.lit(2**i)
        for i in range(n_bits)
    ]
    return reduce(lambda a, b: a + b, bits)


@query("llm_dedup_simhash")  # rows-only: hash-family dependent
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — SimHash near-dup candidates within Hamming
    distance 3. Candidates by pigeonhole: a 32-bit fingerprint is
    split into 4 chunks; pairs within distance 3 must agree on ≥1
    chunk → equi-join per chunk (no cross join). Exact Hamming check
    with bit_count afterwards."""
    d = load_table(spark, sf_dir, "documents")
    # r15 (guide §1.2 per-task work): each word hashes ONCE into an
    # attribute array; the 32 per-bit folds then read the cached longs
    # O(1) instead of re-evaluating xxhash64 per word PER BIT (32× the
    # hash work under interpreted HOF evaluation). Identical bit math
    # to simhash_expr — pinned by test_simhash_hash_once_identical.
    hashed = d.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        F.transform("w", lambda w: F.xxhash64(w)).alias("hs"),
    )
    fp = hashed.select(
        "doc_id", _simhash_from_hashes(F.col("hs")).alias("simhash")
    )

    chunks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(0xFF))
                    for b in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk_val"
    )
    right = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk_val"
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", hamming.alias("hamming_dist"))
        .where(F.col("hamming_dist") <= 3)
    )


@query(
    "llm_dedup_ngram_jaccard",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS words
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / len(list_distinct(a.words || b.words)) AS jaccard
    FROM w a, w b
    WHERE a.doc_id < b.doc_id
      AND CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
            / len(list_distinct(a.words || b.words)) >= 0.5
    """,
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — exact n-gram (word-set) Jaccard on a candidate
    subset. This is the ground-truth near-dup measure the MinHash
    path approximates; on the fixture we bound the pair count with a
    key filter (at scale candidates come from LSH, never a cross
    join). Integer set sizes → exact division → SQL-oracled."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    w = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("words"))
    a = w.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size(F.array_union("wa", "wb"))
    jac = inter / union
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


@query(
    "llm_dedup_embed",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id % 25 = 0 AND b.vec_id % 25 = 0 AND a.vec_id < b.vec_id
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
)
def llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — embedding-cosine near-duplicate pairs on a keyed
    candidate sample (``vec_id % 25`` — 4% retention, the same guard
    as llm_sim_pairwise / llm_dedup_ngram_jaccard, so the quadratic
    blowup is bounded at n²/625 and never exceeds 10% of the table;
    the fixture's max pairwise cosine is ~0.51, so 0.3 marks the
    'suspiciously similar' tail on the sampled set). Pairwise cosine
    is inherently quadratic, so the cross join is NEVER unbounded —
    sample/bucket first, always. Double-precision sequential cosine
    is bit-identical to DuckDB's list_cosine_similarity →
    SQL-oracled. The 100 TB path replaces the sampled cross join
    with LSH bucketing (similarity.llm_sim_ann_lsh candidates +
    exact-cosine verify — see llm_dedup_embed_lsh)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine_expr("ea", "eb")
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.3)
    )


@query("llm_dedup_embed_lsh")  # rows-only: candidate set is hash-family dependent
def llm_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — the 100 TB path for embedding-cosine near-dup:
    banded random-hyperplane LSH candidates + exact-cosine verify.

    Full table, no sample, and still no cross join: each vector gets
    4 independent 4-bit band signatures (content-derived planes — no
    rand(), see similarity.hyperplane_signature); candidate pairs are
    an equi-join on (band, signature); duplicates across bands are
    collapsed BEFORE embeddings are re-attached, so exact cosine runs
    once per candidate pair. Cost scales with Σ bucket², never n² —
    the plan is shuffle-partitioned on the band key end to end.
    Recall for true near-dups (cos ≥ 0.9): a pair agrees on one 4-bit
    band w.p. ((1 - θ/π)⁴); at cos 0.9 that is ~0.54 per band →
    1-(1-0.54)⁴ ≈ 0.96 over 4 bands (planted-dup recall asserted in
    tests/test_llm.py). The fixture corpus tops out at cos ~0.51, so
    the emitted threshold matches llm_dedup_embed's 0.3 tail; output
    is deterministic given the fixed plane family → rows-only."""
    from osm_airflow_spark.llm.similarity import with_hyperplane_columns

    bands, bits = 4, 4
    e = load_table(spark, sf_dir, "embeddings")
    # r15 (guide §4): all 4 band signatures in one Arrow pass —
    # bit-identical to the stacked hyperplane_signature expressions
    # (see with_hyperplane_columns).
    sigs = with_hyperplane_columns(
        e.select("vec_id", "embedding"),
        sig_specs=[(f"sig{b}", bits, b * bits) for b in range(bands)],
    ).drop("embedding")
    # (r15 negative result, ledgered: scoring in-bucket BEFORE the
    # pair dedup — the llm_dedup_near recipe — measured SLOWER here,
    # 9.9 -> 11.4 s at sf0.1: the re-attach joins are broadcast at
    # this corpus size while the interpreted cosine fold pays per
    # RAW band-duplicate candidate. Dedup-then-attach stands.)
    keyed = sigs.select(
        "vec_id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"sig{b}").alias("sig")) for b in range(bands)])
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    a = keyed.select(F.col("vec_id").alias("vec_a"), "band", "sig")
    b = keyed.select(F.col("vec_id").alias("vec_b"), "band", "sig")
    pairs = (
        a.join(b, ["band", "sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cosine_expr("ea", "eb").alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.3)
        .orderBy("vec_a", "vec_b")
    )


def cluster_pairs(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b", max_iter: int = 20) -> DataFrame:
    """Connected components over candidate pairs → (doc_id,
    cluster_id) with cluster_id = min member id.

    Label propagation as alternating DataFrame joins: each node
    adopts the smallest label among itself and its neighbors, until
    a fixpoint. Iterations needed = graph diameter (near-dup
    clusters are shallow — a handful of rounds); each round is one
    join + one groupBy, all partitioned on the node id, so the whole
    thing scales like the pair list, never like pairs².
     Cluster-scale caveat: the per-round localCheckpoint is executor-local — swap in a reliable checkpoint dir on real clusters (see bucketing.py).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # iterative rounds pay per-partition job overhead; size the graph's
    # parallelism to its edge count, not the session default
    n_edges = edges.count()
    parts = max(2, min(32, n_edges // 50_000 + 2))
    edges = edges.repartition(parts, "dst")
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)  # round 1 reads it three times
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # shortcut (pointer doubling): also adopt the label's own
        # label, collapsing chains in O(log diameter) rounds instead
        # of O(diameter)
        via = labels.select(F.col("node").alias("l_node"), F.col("label").alias("l_label"))
        # r14 (guide §1.1/§1.2): the old loop ran TWO jobs per round —
        # a changed-count probe that executed the round's full join
        # lineage, then an eager checkpoint that executed it AGAIN.
        # Carry the previous label through the round and let an
        # .observe() metric count changes DURING the checkpoint action:
        # one job per round, the whole lineage runs exactly once.
        obs = Observation()
        new_labels = (
            stepped.join(via, stepped["label"] == via["l_node"], "left")
            .select(
                "node",
                "old_label",
                F.least(F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("changed"),
            )
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if not obs.get["changed"]:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def cluster_pairs_star(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    edge contraction (the public MapReduce-CC formulation) — same
    output contract as ``cluster_pairs``: (doc_id, cluster_id = min
    member id), equivalence-tested against it.

    Why a second implementation: label propagation keeps the EDGE
    SET fixed and iterates labels (O(log d) rounds with pointer
    doubling, shuffle ∝ edges every round); star contraction instead
    REWRITES the edges toward the component minimum each round, so
    dense components collapse their edge count as they converge —
    the better shape when components are large and dense (boilerplate
    mega-clusters), at the cost of a distinct() per round.

    * large-star: every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u});
    * small-star: every neighbor v < u, plus u itself, attaches to
      m = min(Γ<(u));
    * converged when the canonical edge set stops changing — then
      every component is a star centered at its minimum, and labels
      read directly off the adjacency. Cluster-scale caveat: the per-round localCheckpoint is executor-local — swap in a reliable checkpoint dir on real clusters (see bucketing.py).
    """
    # r14 (guide §1.2/§2.4): state is kept CANONICAL ((max, min) per
    # undirected edge) across rounds. sym() only depends on the
    # undirected edge set — sym(canon(e)) == sym(e) for self-loop-free
    # e — so the star steps are unchanged, while the convergence probe
    # compares two already-canonical checkpointed sets instead of
    # re-running canon (two distinct exchanges per side) every round.
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()

    def large_star(s: DataFrame) -> DataFrame:
        mins = (
            s.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        return (
            s.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(s: DataFrame) -> DataFrame:
        le = s.where(F.col("v") < F.col("u"))
        mins = le.groupBy("u").agg(F.min("v").alias("m"))
        re_attach = (
            le.join(mins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        center = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return (
            re_attach.union(center)
            .where(F.col("a") != F.col("b"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
        )

    n_edges = edges.count()
    for _ in range(max_iter):
        # small_star's output is already canonical: both its legs
        # emit (a, b) with a > b (re-attach: b = min Γ<(u) ≤ v = a;
        # center: b = min Γ<(u) < u = a) and it ends in distinct()
        stepped = small_star(sym(large_star(sym(edges)))).localCheckpoint(
            eager=True
        )
        # set-equality probe on canonical sets: when the sizes differ
        # the sets differ (no exceptAll needed at all); when they
        # match, |A| = |B| ∧ A∖B = ∅ ⟺ A = B, so ONE one-sided
        # exceptAll over the two checkpointed sets settles it — the
        # old probe ran exceptAll BOTH ways and re-ran canon (two
        # distinct exchanges per side) inside each.
        n_stepped = stepped.count()
        changed = n_stepped != n_edges or bool(
            stepped.exceptAll(edges).limit(1).count()
        )
        edges, n_edges = stepped, n_stepped
        if not changed:
            break

    s = sym(edges)
    return (
        s.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("doc_id"),
            F.least("mv", F.col("u")).alias("cluster_id"),
        )
    )


@query("llm_dedup_cluster_best")  # rows-only: clusters come from LSH pairs
def llm_dedup_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — dedup that keeps the BEST document per near-dup
    cluster (not an arbitrary survivor): LSH candidate pairs →
    connected components → one representative per cluster by
    (longest text, lowest doc_id). The full production shape:
    candidates, clustering, quality-ranked survivor selection —
    each stage a shuffle-bounded DataFrame op."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.8)
    clusters = cluster_pairs(pairs)
    members = d.join(clusters, "doc_id", "inner")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    survivors = (
        members.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "n_chars")
    )
    singletons = (
        d.join(clusters, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"), "n_chars")
    )
    return survivors.unionByName(singletons)


@query("llm_semdedup")  # rows-only: learned k-means partition → no SQL twin
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — SemDedup (Abbas et al. 2023, arXiv:2303.09540):
    semantic dedup via embedding clustering. Instead of an all-pairs
    cosine over the corpus, k-means partitions the space, the
    quadratic step runs ONLY within each (small) cluster, and each
    near-duplicate group keeps its most-central member — the one
    closest to the cluster centroid, the paper's "keep low
    distance-to-centroid" rule (tie-broken by vec_id).

    Pipeline, every stage a bounded DataFrame op:
      1. kmeans_centroids (2 Lloyd iterations, broadcast centroids);
      2. assign vectors → nearest centroid (argmin over k, one
         broadcast crossJoin, never vector-pairs);
      3. within-cluster pairwise cosine via self-join ON cent_id —
         quadratic only in cluster size, which k is chosen to bound
         (the paper uses k ∝ N so clusters stay ~constant-sized);
      4. edges at cos >= tau → connected components (cluster_pairs,
         the label-propagation CC used by the MinHash path);
      5. survivor per component = argmin distance-to-centroid.

    Output: one row per vector — (vec_id, cent_id, group_id, kept,
    dist_to_cent); scalar-only schema. Rows-only because the learned
    quantizer has no SQL twin; the invariants (dropped ⇒ has a kept
    tau-neighbor in its cluster; kept pairs in a cluster are all
    below tau; deterministic reruns) are pytest-asserted instead."""
    from osm_airflow_spark.llm.similarity import _as_double, kmeans_centroids

    tau = 0.25
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, k=8, iters=2)

    # r14 (guide §2.4): assignment is an in-row argmin over the
    # broadcast centroid array — array_min of struct<dist_to_cent,
    # cent_id> is the identical (dist, cent_id) order the old
    # per-vector row_number window used (same zip_with/aggregate
    # IEEE fold), and the corpus-wide Exchange+Sort is gone.
    cents_arr = cents.agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "cvec"))).alias("cents")
    )
    emb_d = _as_double("embedding")
    best = F.array_min(
        F.transform(
            "cents",
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(emb_d, c["cvec"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist_to_cent"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    assigned = (
        e.crossJoin(F.broadcast(cents_arr))
        .select(
            "vec_id",
            "embedding",
            best["cent_id"].alias("cent_id"),
            best["dist_to_cent"].alias("dist_to_cent"),
        )
        .localCheckpoint(eager=True)  # cut the Lloyd lineage once; reused 3×
    )

    a = assigned.select(
        F.col("cent_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
    )
    b = assigned.select(
        F.col("cent_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
    )
    edges = (
        a.join(b, "cent_id")  # equi-join on cluster id: quadratic per cluster only
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_expr("ea", "eb").alias("cos_sim"))
        .where(F.col("cos_sim") >= tau)
    )
    groups = cluster_pairs(edges, id_a="vec_a", id_b="vec_b")

    members = assigned.join(
        groups.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
    ).select(
        "vec_id",
        "cent_id",
        # singletons form their own group
        F.coalesce("cluster_id", "vec_id").alias("group_id"),
        "dist_to_cent",
    )
    w = Window.partitionBy("group_id").orderBy(F.col("dist_to_cent"), F.col("vec_id"))
    return members.withColumn(
        "kept", F.row_number().over(w) == F.lit(1)
    ).select("vec_id", "cent_id", "group_id", "dist_to_cent", "kept")


@query(
    "llm_dedup_incremental",
    oracle="""
    WITH base AS (
      SELECT md5(text) AS h FROM documents WHERE doc_id % 10 < 8
    ),
    batch AS (
      SELECT doc_id, lang, source, n_chars, md5(text) AS h
      FROM documents WHERE doc_id % 10 >= 8
    ),
    batch_kept AS (
      SELECT b.* FROM batch b
      JOIN (SELECT h, MIN(doc_id) AS keep_id FROM batch GROUP BY h) k
        ON b.doc_id = k.keep_id
    )
    SELECT doc_id, lang, source, n_chars
    FROM batch_kept
    WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.h = batch_kept.h)
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — incremental (cross-snapshot) exact dedup: the
    production shape for a continuously-ingested corpus. A new batch
    (content-hash-derived 20% slice here) is deduplicated in two
    steps: within-batch survivor selection (min doc_id per digest —
    the K1 window pattern), then an ANTI join of surviving digests
    against the existing corpus's digest index. New docs whose
    content already exists anywhere in the base corpus are dropped
    without ever comparing full text.

    Scale: the base side reduces to a digest-only projection (16
    bytes/doc at the scan, full text never read — column pruning
    does this for free); at 100 TB the digest index is a bucketed
    table on ``h`` so the anti join is a zero-exchange bucket-local
    probe per ingest batch, and the batch side (small) broadcasts.
    One shuffle on digest within the batch; nothing corpus-sized
    moves."""
    d = load_table(spark, sf_dir, "documents")
    base = d.where(F.col("doc_id") % 10 < 8).select(F.md5("text").alias("h"))
    batch = d.where(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "lang", "source", "n_chars", F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    batch_kept = (
        batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        batch_kept.join(base, "h", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


def _error_class(e: AnalysisException) -> str | None:
    """Spark error-condition name (e.g. 'PATH_NOT_FOUND') across the
    4.x rename: getCondition() is the 4.0+ API, getErrorClass() the
    deprecated spelling; either may be absent on older builds. On a
    build exposing NEITHER accessor, fall back to the bracketed
    condition tag Spark embeds in the message — returning None there
    would flip the first-batch path from fail-open to fail-closed
    (r7 advice): a genuinely missing index dir must still read as
    PATH_NOT_FOUND, not re-raise."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is not None:
            try:
                return fn()
            except Exception:  # pragma: no cover - defensive
                continue
    if "[PATH_NOT_FOUND]" in str(e):  # pragma: no cover - old builds
        return "PATH_NOT_FOUND"
    return None


def dedup_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming corpus-ingest dedup — the production deployment of
    K1: documents arrive as a stream, each micro-batch is
    deduplicated within itself (min id per digest, the K1 window
    pattern) and then anti-joined against the PERSISTED digest index
    of everything already accepted, so content ever seen before is
    dropped no matter which batch carried it first. Survivors append
    to the corpus; their digests append to the index, which is the
    only state — 16 bytes per accepted doc, never the text.

    foreachBatch because the dedup needs a batch-side read of the
    index (stream-static join against a sink being appended by the
    same query is not expressible as a pure streaming join). Restart
    semantics: append + foreachBatch is at-least-once on a mid-batch
    crash — a production deployment makes the append idempotent
    (epoch-partitioned output, or MERGE into a transactional table);
    the exactly-once test drives the happy path via availableNow.

    At 100 TB the index is a bucketed table on the digest so each
    ingest batch probes only its buckets (the llm_dedup_incremental
    plan, streaming edition)."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn("h", F.md5(text_col))
        w = Window.partitionBy("h").orderBy(id_col)
        kept = (
            hashed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        try:
            existing = spark.read.parquet(index_dir).select("h")
            fresh = kept.join(existing, "h", "left_anti")
        except AnalysisException as e:
            # First batch: index path doesn't exist yet. ONLY the
            # missing-path error class means "no index" — an
            # existing-but-damaged index dir (e.g. after a failed
            # write) also raises AnalysisException ("unable to infer
            # schema"), and treating that as first-batch would
            # silently admit duplicates. Anything else must fail the
            # batch (r6 advice).
            if _error_class(e) != "PATH_NOT_FOUND":
                raise
            fresh = kept
        # one deterministic pass: survivors then their digests
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop("h").write.mode("append").parquet(out_dir)
        fresh.select("h").write.mode("append").parquet(index_dir)

    return (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def near_dedup_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_bucket: int = 200,
):
    """Streaming NEAR-duplicate ingest — the K2 twin of
    dedup_ingest_stream (VERDICT r9 next-round #5): documents arrive
    as a stream; each micro-batch computes MinHash signatures, finds
    near-dup pairs (est-Jaccard ≥ threshold) BOTH within the batch
    and against everything previously accepted, then appends its
    banded signature rows to the persisted band index. While no band
    bucket crosses ``max_bucket``, the union of per-batch pair
    outputs over an ingest equals the batch ``llm_dedup_near`` pairs
    over the same corpus (parity-tested over a 3-chunk ingest with
    planted cross-batch near-dups): a pair's later-arriving doc
    discovers it exactly once — new×new pairs in its own batch,
    new×seen pairs via the index join. WHERE THE CAP BITES the two
    paths legitimately diverge: the batch path sees a boilerplate
    bucket's full corpus count and drops it whole, while the stream
    caps per batch-visible bucket (within-batch count ≤ cap, seen
    side pruned to the cap's lowest doc_ids) — a bucket split across
    batches can emit pairs batch mode would skip. Both are correct
    recall/cost trades; the streaming one errs toward MORE pairs,
    never fewer than batch.

    State = the band index: (doc_id, sig, band_idx, band_hash) rows
    PARTITIONED BY band_idx — n_bands × (8 + 8·n_hashes) bytes per
    accepted doc, never the text. The new-vs-seen candidate join is
    an equi-join on (band_idx, band_hash): at 100 TB bucket the
    index by band_hash within each band_idx partition so each ingest
    batch probes only its buckets; the batch side (small)
    broadcasts. Within-batch pairs reuse the batch key's in-array
    bucket combination path (minhash_lsh_pairs), so the mega-bucket
    cap applies there; the cross join-leg caps its per-batch bucket
    contribution at ``max_bucket`` seen rows per (band, hash) —
    boilerplate buckets never go quadratic across epochs either.

    foreachBatch for the same reason as dedup_ingest_stream (the
    index is read batch-side); availableNow-driven, at-least-once on
    a mid-batch crash — production makes the two appends idempotent
    via epoch-partitioned output (the posting_stats_ingest_stream
    recipe)."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        banded = banded_signature_rows(
            batch_df, n_hashes, n_bands, shingle_n
        ).localCheckpoint(eager=True)

        within = minhash_lsh_pairs(
            batch_df,
            n_hashes=n_hashes,
            n_bands=n_bands,
            threshold=threshold,
            shingle_n=shingle_n,
            max_bucket=max_bucket,
        )

        try:
            seen = spark.read.parquet(index_dir)
        except AnalysisException as e:
            if _error_class(e) != "PATH_NOT_FOUND":
                raise
            seen = None
        if seen is not None:
            # cap the seen side per bucket BEFORE the join (same
            # boilerplate guard as the batch path; deterministic
            # doc_id order decides which rows a capped bucket keeps)
            cap_w = Window.partitionBy("band_idx", "band_hash").orderBy("doc_id")
            seen_capped = (
                seen.withColumn("rn", F.row_number().over(cap_w))
                .where(F.col("rn") <= max_bucket)
                .select(
                    "band_idx",
                    "band_hash",
                    F.col("doc_id").alias("seen_id"),
                    F.col("sig").alias("seen_sig"),
                )
            )
            est = est_jaccard_expr("sig", "seen_sig", n_hashes)
            cross = (
                banded.join(seen_capped, ["band_idx", "band_hash"])
                .where(F.col("doc_id") != F.col("seen_id"))
                .select(
                    F.least("doc_id", "seen_id").alias("doc_a"),
                    F.greatest("doc_id", "seen_id").alias("doc_b"),
                    est.alias("est_jaccard"),
                )
                .where(F.col("est_jaccard") >= threshold)
                .dropDuplicates(["doc_a", "doc_b"])
            )
            pairs = within.unionByName(cross).dropDuplicates(["doc_a", "doc_b"])
        else:
            pairs = within
        pairs.localCheckpoint(eager=True).write.mode("append").parquet(pairs_dir)
        banded.write.mode("append").partitionBy("band_idx").parquet(index_dir)

    return (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


@query(
    "llm_dedup_containment",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.words, b.words)) AS BIGINT)
             AS n_shared,
           CAST(len(a.words) AS BIGINT) AS n_a,
           CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / len(a.words) AS containment
    FROM w a, w b
    WHERE a.doc_id <> b.doc_id
      AND CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
            / len(a.words) >= 0.8
    """,
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — DIRECTIONAL containment dedup:
    |A∩B| / |A| ≥ 0.8 flags documents A that are essentially
    contained in another document B — the quote-inclusion /
    subset-duplication case symmetric Jaccard systematically misses
    (a short doc embedded in a long one has tiny Jaccard but
    containment ≈ 1; the Broder 1997 containment resemblance). Pairs
    are DIRECTIONAL (a≠b, not a<b): A-in-B and B-in-A are different
    findings and only the contained side is the dedup candidate.

    Exact integer set sizes → exact division → SQL-oracled, on the
    same keyed candidate sample as the Jaccard ground-truth key; at
    scale candidates come from the MinHash/LSH banding (the SAME
    signatures estimate containment: |A∩B|/|A| =
    J(A,B)·(|A|+|B|)/(|A|·(1+J)) from the stored set sizes — no new
    index needed, just the stored per-doc set size)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    w = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("words"))
    a = w.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb"))
    cont = inter.cast("double") / F.size("wa")
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_shared"),
            F.size("wa").cast("long").alias("n_a"),
            cont.alias("containment"),
        )
        .where(F.col("containment") >= 0.8)
    )


SUBSTR_K = 40  # minimum duplicated span, in characters (~8 words here)


@query(
    "llm_dedup_substring",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, p AS pos, substring(text, p + 1, {SUBSTR_K}) AS gram
      FROM documents, LATERAL unnest(generate_series(0, length(text) - {SUBSTR_K})) AS t(p)
      WHERE length(text) >= {SUBSTR_K}
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    marked AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM g WHERE gram IN (SELECT gram FROM dup)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + {SUBSTR_K} AS BIGINT) AS span_len
    FROM marked
    GROUP BY doc_id, island
    """,
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — EXACT-SUBSTRING dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr): emit every maximal character span of length >=
    SUBSTR_K that occurs at two or more sites in the corpus
    (cross-document or self-repetition — both count, as in the
    paper). Training pipelines CUT these spans rather than dropping
    whole documents, which is exactly what MinHash/Jaccard document-
    level dedup (llm_dedup_near / llm_dedup_ngram_jaccard) cannot
    express.

    The paper builds one giant suffix array — inherently sequential
    and memory-resident. The Spark-first equivalent: every length-K
    gram is an ANCHOR keyed by its content; a groupBy over anchors
    finds every gram with >= 2 occurrence sites (one shuffle, fully
    parallel, no suffix array); a left-semi join marks the anchored
    positions; and per-document island detection (pos -
    row_number(), the gaps-and-islands idiom) merges runs of
    consecutive duplicated anchors back into MAXIMAL spans — the
    same run-merge the suffix-array walk performs. A span of length
    L >= K duplicated elsewhere produces L-K+1 consecutive duplicated
    anchors, so islands reconstruct [start, start+L) exactly.

    Scale shape: the only shuffle wider than the corpus is the
    anchor groupBy; at 100 TB group on a 128-bit content digest
    (xxhash64 pair) of the gram instead of the 40-char string to cut
    shuffle bytes (collision probability ~n²/2¹²⁸ — negligible), and
    count DISTINCT sites map-side. The island window partitions by
    doc_id — bounded by document length, never global. Everything
    here is integer positions and exact string equality → SQL-oracled
    (47 planted duplicated spans at sf0.01). Detection leg shared
    with the cleaning key ``llm_dedup_substring_cut`` via
    ``_duplicated_spans``.
    """
    return _duplicated_spans(spark, sf_dir).select(
        "doc_id",
        F.col("s").cast("long").alias("span_start"),
        (F.col("e") - F.col("s")).cast("long").alias("span_len"),
    )


_SUBSTR_DETECT_SQL = f"""
    g AS (
      SELECT doc_id, p AS pos, substring(text, p + 1, {SUBSTR_K}) AS gram
      FROM documents, LATERAL unnest(generate_series(0, length(text) - {SUBSTR_K})) AS t(p)
      WHERE length(text) >= {SUBSTR_K}
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    marked AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM g WHERE gram IN (SELECT gram FROM dup)
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SUBSTR_K} AS e
      FROM marked GROUP BY doc_id, island
    )
"""


def _duplicated_spans(
    spark: SparkSession, sf_dir: str, use_digest: bool = False
) -> DataFrame:
    """Shared detection leg of llm_dedup_substring / _cut: (doc_id,
    s, e) half-open char spans of >=2-site duplicated length-K grams,
    already maximal per anchor island (but possibly overlapping
    ACROSS islands when anchor runs are < K chars apart).

    ``use_digest=True`` is the 100 TB form the key docstrings cite:
    the anchor groupBy/join keys on a 128-bit content digest (two
    independently-seeded xxhash64 halves) instead of the K-char gram
    string, cutting shuffle bytes ~2.5x at K=40 and more at larger K;
    collision probability ~n²/2¹²⁸ is negligible at any corpus size.
    Equivalence with the exact-string form is pytest-pinned; the
    oracled keys default to the exact form so the oracle contract
    stays string-equality."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= SUBSTR_K)
    g = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.length("text") - SUBSTR_K)).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.col("text").substr(F.col("pos") + 1, F.lit(SUBSTR_K)).alias("gram"),
    )
    if use_digest:
        g = g.select(
            "doc_id",
            "pos",
            F.xxhash64(F.lit(0), F.col("gram")).alias("h1"),
            F.xxhash64(F.lit(1), F.col("gram")).alias("h2"),
        )
        anchor_cols = ["h1", "h2"]
    else:
        anchor_cols = ["gram"]
    dup = (
        g.groupBy(*anchor_cols)
        .agg(F.count(F.lit(1)).alias("n_sites"))
        .where(F.col("n_sites") >= 2)
        .select(*anchor_cols)
    )
    marked = g.join(dup, anchor_cols, "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = marked.select(
        "doc_id", "pos", (F.col("pos") - F.row_number().over(w)).alias("island")
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + SUBSTR_K).alias("e")
    )


@query(
    "llm_dedup_substring_cut",
    oracle=f"""
    WITH {_SUBSTR_DETECT_SQL},
    flagged AS (
      SELECT doc_id, s, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_e
      FROM spans
    ),
    grouped AS (
      SELECT doc_id, s, e,
             SUM(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s) AS grp
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, MIN(s) AS s, MAX(e) AS e
      FROM grouped GROUP BY doc_id, grp
    ),
    bounds AS (
      SELECT m.doc_id, m.s, m.e,
             COALESCE(LAG(m.e) OVER (PARTITION BY m.doc_id ORDER BY m.s), 0)
               AS prev_e,
             length(d.text) AS len, d.text
      FROM merged m JOIN documents d USING (doc_id)
    ),
    segments AS (
      SELECT doc_id, prev_e AS seg_s, s AS seg_e, text FROM bounds
      UNION ALL
      SELECT doc_id, MAX(e), ANY_VALUE(len), ANY_VALUE(text)
      FROM bounds GROUP BY doc_id
    ),
    cleaned AS (
      SELECT doc_id,
             COALESCE(string_agg(
               CASE WHEN seg_e > seg_s
                    THEN substring(text, seg_s + 1, seg_e - seg_s) END,
               '' ORDER BY seg_s), '') AS cleaned_text
      FROM segments GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(c.cleaned_text, d.text) AS cleaned_text,
           CAST(length(d.text)
                - length(COALESCE(c.cleaned_text, d.text)) AS BIGINT)
             AS n_cut
    FROM documents d LEFT JOIN cleaned c USING (doc_id)
    """,
)
def llm_dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r11) — the CLEANING step of exact-substring dedup
    (Lee et al. 2022 ExactSubstr): emit the corpus with EVERY
    duplicated span (llm_dedup_substring's detection leg, shared
    helper) removed from every document. Cutting all occurrences —
    rather than electing a canonical keeper — is order-free and
    needs no cross-document coordination, which is what makes it
    embarrassingly parallel at 100 TB (a keeper election would be a
    connected-components pass over span-sharing docs; cluster_pairs
    exists if that policy is ever wanted).

    Pipeline: detection spans may overlap across anchor islands, so
    a per-doc interval MERGE (running-max gaps-and-islands — the
    same idiom as detection, one bounded window) unions them; the
    complement segments (prev_end..start gaps plus the tail) are
    substring'd and reassembled in seg-start order with the blessed
    array_sort(collect_list(struct)) shape. Documents with no spans
    pass through unchanged via LEFT join; a fully-duplicated doc
    collapses to '' (COALESCE over the no-segment group). Everything
    is integer positions and exact substrings → SQL-oracled; the
    planted test pins byte-exact cleaned texts, incl. the
    overlapping-span and total-cut edge cases."""
    docs = load_table(spark, sf_dir, "documents")
    spans = _duplicated_spans(spark, sf_dir)
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        "doc_id", "s", "e", F.max("e").over(w_prev).alias("prev_e")
    )
    w_run = Window.partitionBy("doc_id").orderBy("s")
    grouped = flagged.select(
        "doc_id",
        "s",
        "e",
        F.sum(
            F.when(F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e")), 1)
            .otherwise(0)
        )
        .over(w_run)
        .alias("grp"),
    )
    merged = grouped.groupBy("doc_id", "grp").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    bounds = merged.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "s",
        "e",
        F.coalesce(
            F.lag("e").over(Window.partitionBy("doc_id").orderBy("s")), F.lit(0)
        ).alias("prev_e"),
        F.length("text").alias("len"),
        "text",
    )
    head_gaps = bounds.select(
        "doc_id", F.col("prev_e").alias("seg_s"), F.col("s").alias("seg_e"), "text"
    )
    tails = bounds.groupBy("doc_id").agg(
        F.max("e").alias("seg_s"),
        F.any_value("len").alias("seg_e"),
        F.any_value("text").alias("text"),
    )
    segments = head_gaps.unionByName(tails.select("doc_id", "seg_s", "seg_e", "text"))
    piece = F.when(
        F.col("seg_e") > F.col("seg_s"),
        F.col("text").substr(F.col("seg_s") + 1, F.col("seg_e") - F.col("seg_s")),
    )
    cleaned = (
        segments.select("doc_id", F.col("seg_s"), piece.alias("piece"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("piece").isNotNull(),
                                F.struct(F.col("seg_s"), F.col("piece")),
                            )
                        )
                    ),
                    lambda x: x["piece"],
                ),
                "",
            ).alias("cleaned_text")
        )
    )
    return docs.join(cleaned, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cleaned_text"), F.col("text")).alias("cleaned_text"),
        (F.length("text") - F.length(F.coalesce(F.col("cleaned_text"), F.col("text"))))
        .cast("long")
        .alias("n_cut"),
    )


@query(
    "llm_edit_distance",
    oracle="""
    WITH s AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE doc_id % 97 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
           1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                 / greatest(a.n, b.n, 1) AS edit_similarity
    FROM s a JOIN s b ON b.doc_id = a.doc_id + 97
    """,
)
def llm_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r13) — exact LEVENSHTEIN distance between sampled
    document pairs: the character-level ground-truth metric the
    token-level dedup family (MinHash Jaccard, SimHash Hamming,
    winnowing fingerprints) approximates — used to adjudicate
    near-dup candidates and to score OCR/extraction noise. Both
    engines run their native integer DP (Spark's levenshtein expr,
    DuckDB's levenshtein), so the distance is exact by construction
    and the normalized similarity is one shared IEEE division of
    exact integers (greatest(..., 1) guards empty-string pairs).

    Scale: edit distance is O(|a|·|b|) PER PAIR — quadratic cost
    lives inside the row, so the contract matches llm_sim_pairwise:
    ALWAYS sample/block first (here the content-keyed doc_id % 97
    grid joined to its successor — linear pair count), never a
    corpus cross join; production adjudicates only LSH candidate
    pairs this way (the llm_dedup_near bucket output is exactly the
    right input)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.where(F.col("doc_id") % 97 == 0).select(
        "doc_id", "text", F.length("text").alias("n")
    )
    a = s.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
        F.col("n").alias("na"),
    )
    b = s.select(
        (F.col("doc_id") - 97).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
        F.col("n").alias("nb"),
    )
    lev = F.levenshtein("ta", "tb")
    return a.join(b, "doc_a").select(
        "doc_a",
        "doc_b",
        lev.cast("long").alias("edit_distance"),
        (
            1.0
            - lev.cast("double")
            / F.greatest(F.col("na"), F.col("nb"), F.lit(1))
        ).alias("edit_similarity"),
    )


@query(
    "llm_dup_size_histogram",
    oracle="""
    WITH groups AS (
      SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM documents GROUP BY md5(text)
    ),
    hist AS (
      SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
      FROM groups GROUP BY cluster_size
    ),
    tot AS (
      SELECT CAST(SUM(cluster_size * n_clusters) AS BIGINT) AS n_docs
      FROM hist
    )
    SELECT cluster_size, n_clusters,
           cluster_size * n_clusters AS n_docs_in,
           CAST(cluster_size * n_clusters AS DOUBLE) / t.n_docs
             AS doc_share,
           CAST((cluster_size - 1) * n_clusters AS DOUBLE) / t.n_docs
             AS removable_share
    FROM hist, tot t
    """,
)
def llm_dup_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 companion — DUPLICATE-CLUSTER SIZE DISTRIBUTION: how many
    exact-dup clusters exist at each multiplicity, what share of the
    corpus sits in them, and what share dedup would REMOVE (the
    capacity-planning readout run before llm_dedup_exact: a corpus
    where removable_share is 40% needs the dedup stage sized very
    differently from one at 2%). Σ removable_share over rows = the
    corpus dup ratio llm_source_profile reports per source.

    Determinism: md5 grouping and every count are exact; the two
    shares are single divisions of exact longs against the
    broadcast 1-row total (never a driver collect), unrounded.

    Scale: one corpus pass to digest groups (the dedup_exact
    shuffle), then the histogram lives on the cluster-size value
    space (tiny); output is O(distinct sizes)."""
    d = load_table(spark, sf_dir, "documents")
    groups = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    hist = groups.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    tot = hist.agg(
        F.sum(F.col("cluster_size") * F.col("n_clusters"))
        .cast("long")
        .alias("n_docs")
    )
    return hist.join(F.broadcast(tot)).select(
        "cluster_size", "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs_in"),
        (
            (F.col("cluster_size") * F.col("n_clusters")).cast("double")
            / F.col("n_docs")
        ).alias("doc_share"),
        (
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("double")
            / F.col("n_docs")
        ).alias("removable_share"),
    )
