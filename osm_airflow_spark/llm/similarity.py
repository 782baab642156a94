"""Similarity search over embedding columns (SURVEY.md §2.K — K3/K4
+ the ANN extension).

``array<float>`` embeddings are first-class columns; all similarity
math is double-precision sequential (cast each element, left-to-right
aggregate) so scores are bit-identical across engines — DuckDB's
``list_cosine_similarity(CAST(… AS DOUBLE[]))`` reproduces them
exactly, which makes even top-k ordering oracle-checkable.

Scale notes: brute-force top-k broadcasts the query vector and plans
TakeOrderedAndProject — a full scan but no shuffle; that is the
correct baseline even at 100 TB (one pass, embarrassingly parallel).
The sub-linear path is LSH bucketing (random-hyperplane signatures →
equi-join on bucket), trading recall for candidate reduction;
centroid-style IVF is the same shape with learned buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a, b) -> Column:
    """Σ aᵢ·bᵢ, double precision, strict left-to-right — the exact
    accumulation order DuckDB uses, hence bit-stable oracles."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_expr(a, b) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def l2sq_expr(a, b) -> Column:
    """Squared L2 distance between two array columns, strict
    left-to-right fold (r10 review: nine inline copies collapsed).
    Callers pass columns EXACTLY as before (pre-cast via _as_double
    where they did) so every expression tree is bit-identical to the
    inline original — driver-proven keys unaffected."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def centroid_array(centroids: DataFrame, id_name: str = "cent_id", vec_name: str = "cvec") -> DataFrame:
    """Fold a tiny (id, vec) centroid/codebook table into ONE sorted
    array row for broadcast — the in-row argmin/top-k pattern
    (r14, guide §2.4): ranking against k broadcast centroids needs
    no per-vector window, so the corpus-wide Exchange+Sort the old
    row_number formulation paid disappears into a narrow map."""
    return centroids.agg(
        F.array_sort(F.collect_list(F.struct(id_name, vec_name))).alias("cents")
    )


def probe_selection(qv: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """(query_id, qvec) × (cent_id, cvec) → each query's nprobe
    nearest centroids: the probe-ranking block both batch ANN routes
    share (llm_sim_topk_batch, query_ivf_index_batch — r10 review:
    a tie-break or pruning fix must not be able to drift between
    them). r14 (guide §2.4): the k centroids ride as ONE broadcast
    array row and each query ranks them IN-ROW — slice(array_sort)
    over struct<qd, cent_id> is the identical (qd, cent_id)
    lexicographic order the old per-query window used (l2sq_expr is
    the same IEEE fold), and the N×k Exchange+Sort is gone."""
    qvec_d = _as_double("qvec")
    ranked = F.slice(
        F.array_sort(
            F.transform(
                "cents",
                lambda c: F.struct(
                    l2sq_expr(qvec_d, c["cvec"]).alias("qd"),
                    c["cent_id"].alias("cent_id"),
                ),
            )
        ),
        1,
        nprobe,
    )
    return (
        qv.crossJoin(F.broadcast(centroid_array(cents)))
        .select("query_id", "qvec", F.explode(ranked).alias("p"))
        .select("query_id", "qvec", F.col("p.cent_id").alias("cent_id"))
    )


@query(
    "llm_sim_pairwise",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id % 50 = 0 AND b.vec_id % 50 = 0 AND a.vec_id < b.vec_id
    """,
)
def llm_sim_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 — pairwise cosine similarity on a keyed sample (pairwise is
    inherently quadratic: sample/bucket first, always)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 50 == 0)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("embedding").alias("eb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label_a", "label_b", cosine_expr("ea", "eb").alias("cos_sim"))
    )


@query(
    "llm_sim_topk",
    oracle="""
    SELECT b.vec_id, b.label,
           list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])) AS cos_sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — brute-force cosine top-k for one query vector: broadcast
    the query, score every row, TakeOrderedAndProject keeps k per
    partition then merges — no shuffle of the corpus. Bit-stable
    scores make the ordering itself oracle-checkable (ties broken by
    vec_id)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def _plane_component(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    md5 of the (plane, dim) coordinates — stable across machines,
    runs, and engines; no stored model to ship."""
    import hashlib

    h = int.from_bytes(hashlib.md5(f"{p}:{i}".encode()).digest()[:8], "big")
    return (h % 200001) / 100000.0 - 1.0


def hyperplane_signature(
    vec_col, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH signature as one integer column.

    Plane components are computed driver-side as literal arrays
    (deterministic — see _plane_component), so the per-row work is
    n_planes array dot products, not a giant per-element expression
    tree. Signature bit p = sign(v · plane_p). ``plane_offset``
    selects a disjoint plane family, so banded LSH (b bands × r bits,
    as in dedup.llm_dedup_embed_lsh) gets independent per-band
    signatures from the same deterministic generator.

    Dimension guard: ``zip_with`` pads the shorter array with nulls,
    so a vector of any length ≠ dim would silently yield a NULL dot
    product, a NULL bucket, and ZERO ANN candidates. Instead the
    expression raises on the first mismatched row — wrong dimension
    is a data error, not an empty result."""
    dv = _as_double(vec_col)
    bits = []
    for b, p in enumerate(range(plane_offset, plane_offset + n_planes)):
        plane = F.array(*[F.lit(_plane_component(p, i)) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(dv, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        bits.append((dot > 0).cast("long") * F.lit(2**b))
    sig = reduce(lambda a, b: a + b, bits)
    dim_ok = F.assert_true(
        F.size(dv) == F.lit(dim),
        F.concat(
            F.lit(f"hyperplane_signature: planes have dim={dim} but vector has "),
            F.size(dv).cast("string"),
            F.lit(" elements"),
        ),
    )
    return F.when(dim_ok.isNull(), sig)


def with_hyperplane_columns(
    df: DataFrame,
    sig_specs: list[tuple[str, int, int]] | None = None,
    margin_specs: list[tuple[str, int, int]] | None = None,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Append hyperplane LSH signature (long) and/or margin
    (array<double>) columns in ONE Arrow pass — the §4 replacement for
    stacking per-plane ``hyperplane_signature``/``hyperplane_margins``
    column expressions. Each spec is (out_col, n_planes, plane_offset).

    Why (r15, measured): a k-plane signature expression embeds k
    64-literal plane arrays and k interpreted HOF folds — for the
    12-table families that is a ~3000-literal tree whose ANALYSIS and
    codegen dominate the key (the corpus is small), and whose folds
    evaluate interpreted per element. Here the planes are NumPy
    constants inside the task and the fold vectorizes across rows.

    Bit-exactness contract (pinned by
    tests/test_llm.py::test_hyperplane_arrow_matches_expression):
    the JVM fold is aggregate(zip_with(v, plane, x*y), 0.0, acc+v) —
    a strict left fold of IEEE double mul/add from a 0.0 seed. The
    NumPy loop ``acc += X[:, k] * w[k]`` performs the identical op
    sequence per row (ufunc mul then add, no FMA, float32→float64
    widening exact), so dots — and hence ``dot > 0`` sign bits and
    margin arrays — are bit-identical to the expression form. The
    dim guard raises like the expression's assert_true."""
    sig_specs = list(sig_specs or [])
    margin_specs = list(margin_specs or [])
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql import types as T

    planes = {
        (np_, off): [
            [_plane_component(p, i) for i in range(dim)]
            for p in range(off, off + np_)
        ]
        for (_, np_, off) in sig_specs + margin_specs
    }

    fields = list(df.schema.fields)
    for name, _, _ in sig_specs:
        fields.append(T.StructField(name, T.LongType()))
    for name, _, _ in margin_specs:
        fields.append(T.StructField(name, T.ArrayType(T.DoubleType())))
    out_schema = T.StructType(fields)

    def compute(it):
        import numpy as np

        w = {
            key: np.asarray(ps, dtype=np.float64)
            for key, ps in planes.items()
        }

        def dots(X, key):
            # strict left fold per plane, vectorized across rows —
            # the exact op order of the JVM aggregate/zip_with fold
            W = w[key]
            out = np.zeros((X.shape[0], W.shape[0]))
            for p in range(W.shape[0]):
                acc = np.zeros(X.shape[0])
                for k in range(dim):
                    acc = acc + X[:, k] * W[p, k]
                out[:, p] = acc
            return out

        for pdf in it:
            if not len(pdf):
                continue
            for v in pdf[vec_col]:
                if v is None or len(v) != dim:
                    got = "NULL" if v is None else str(len(v))
                    raise ValueError(
                        f"with_hyperplane_columns: planes have dim={dim} "
                        f"but vector has {got} elements"
                    )
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = pdf.copy()
            for name, np_, off in sig_specs:
                D = dots(X, (np_, off))
                sig = np.zeros(len(pdf), dtype=np.int64)
                for b in range(np_):
                    sig |= (D[:, b] > 0).astype(np.int64) << b
                out[name] = sig
            for name, np_, off in margin_specs:
                D = dots(X, (np_, off))
                out[name] = list(D)
            yield out

    return df.mapInPandas(compute, out_schema)


@query("llm_sim_ann_lsh")  # rows-only: recall depends on the hash family
def llm_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — multi-table LSH approximate nearest neighbors: the
    sub-linear scale path for K4. L=12 independent hash tables of
    r=4 hyperplane bits each (disjoint plane families via
    plane_offset); a vector lands in one bucket per table, the query
    probes its bucket in every table, and the union of bucket hits is
    exact-cosine re-ranked. The (L, r) trade is the standard E2LSH
    dial: one r-bit table recalls p^r (p = 1 − θ/π); L tables lift it
    to 1 − (1 − p^r)^L while candidates stay ∝ L·n/2^r. A single
    8-bit table measured 0.0 recall on this fixture's near-random
    unit vectors (top-10 cosine ≈ 0.3 ⇒ p ≈ 0.6 ⇒ p^8 ≈ 1.5%) —
    multi-table is what makes hyperplane LSH usable in the
    low-similarity regime; r grows with corpus size to keep buckets
    bounded. Candidate generation is one explode (L rows per vector)
    + broadcast equi-join on (table, bucket) — never a cross join.
    Recall vs brute force is asserted in tests; bucket contents are
    hash-family-specific → rows-only."""
    n_tables, n_bits = 12, 4
    e = load_table(spark, sf_dir, "embeddings")
    # r15 (guide §4): all 12 table signatures in ONE Arrow pass —
    # bit-identical to the stacked hyperplane_signature expressions
    # (see with_hyperplane_columns), whose 12×4-plane literal tree
    # dominated this key's analysis+codegen time.
    sigged = with_hyperplane_columns(
        e.select("vec_id", "label", "embedding"),
        sig_specs=[(f"_sig{t}", n_bits, t * n_bits) for t in range(n_tables)],
    )
    sigs = F.array(
        *[
            F.struct(F.lit(t).alias("t"), F.col(f"_sig{t}").alias("b"))
            for t in range(n_tables)
        ]
    )
    tabbed = sigged.select(
        "vec_id", "label", "embedding", F.explode(sigs).alias("s")
    ).select(
        "vec_id", "label", "embedding", F.col("s.t").alias("t"), F.col("s.b").alias("b")
    )
    probes = tabbed.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"), "t", "b"
    )
    return (
        tabbed.join(F.broadcast(probes), ["t", "b"])
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query("llm_sim_ann_ivf")  # rows-only: probe set depends on centroid seed
def llm_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — IVF-style ANN: the learned-bucket twin of the LSH
    path. Coarse quantizer = 8 seed centroids (deterministically the
    embeddings with vec_id 1..8 — production would k-means these);
    every vector is assigned to its nearest centroid (one broadcast
    join + argmax, no shuffle of the corpus); a query searches its
    nprobe=3 nearest centroids' inverted lists (nprobe=1 measured
    recall 0.5/0.5 at sf0.001/0.01 — near-decorative; nprobe=2 lifted
    those but DECAYED to 0.2 at sf0.1, the r12 recall sweep's finding:
    with near-random vectors the true top-10 tightens as the corpus
    grows while the probed fraction stays fixed, so a fixed budget's
    recall falls with n. nprobe=3 scans 3/8 and restores a meaningful
    floor at every measured SF — the general lesson, recorded in
    SCALE.md: IVF probe budgets must be re-measured per corpus size,
    which is exactly what the per-SF floor table enforces)."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.where(F.col("vec_id").between(1, 8))
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    # r14 (guide §2.4): rank the 8 broadcast centroids IN-ROW.
    # struct<c, -cent_id> makes array_max/reverse(array_sort) the
    # exact (c DESC, cent_id ASC) order the old per-vector window
    # used (incl. NaN-greatest), with no corpus Exchange+Sort.
    scored_arr = F.transform(
        "cents",
        lambda c: F.struct(
            cosine_expr("embedding", c["cvec"]).alias("c"),
            (-c["cent_id"]).alias("negcent"),
        ),
    )
    best = F.array_max(scored_arr)
    base = e.crossJoin(F.broadcast(centroid_array(cents)))
    assigned = base.select(
        "vec_id", "label", "embedding", (-best["negcent"]).alias("cent_id")
    )
    q = (
        base.where(F.col("vec_id") == 0)
        .select(
            F.col("embedding").alias("qvec"),
            # nprobe=3 (see docstring)
            F.explode(F.slice(F.reverse(F.array_sort(scored_arr)), 1, 3)).alias("p"),
        )
        .select("qvec", (-F.col("p.negcent")).alias("qcent"))
    )
    return (
        assigned.join(F.broadcast(q), F.col("cent_id") == F.col("qcent"))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def hyperplane_margins(
    vec_col, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Per-plane signed dots v·plane_p as an array<double> — the
    boundary margins behind query-DIRECTED multiprobe: |dot_p| is the
    distance to hyperplane p's boundary, so flipping the bits with
    the smallest margins probes the buckets a near neighbor most
    plausibly fell into (Lv et al., VLDB 2007). Same deterministic
    plane family as hyperplane_signature (bit p = sign(dots[p]))."""
    dv = _as_double(vec_col)
    dots = []
    for p in range(plane_offset, plane_offset + n_planes):
        plane = F.array(*[F.lit(_plane_component(p, i)) for i in range(dim)])
        dots.append(
            F.aggregate(
                F.zip_with(dv, plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*dots)


@query("llm_sim_ann_multiprobe")  # rows-only: hash-family dependent
def llm_sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — query-DIRECTED multi-probe LSH ANN (Lv et al.,
    VLDB 2007): probe the T=93 buckets whose flip-sets (drawn from
    the full 163-member Hamming-≤4 ball of the query's 8-bit
    signature) have the smallest total boundary margin Σ|v·plane_b|
    over the flipped bits — a near neighbor most plausibly sits just
    across the CLOSEST hyperplane boundaries, so the budget reaches
    useful radius-4 buckets while skipping hopeless radius-≤3 ones.
    Measured on this fixture's near-random vectors (the hard regime:
    expected query↔neighbor Hamming ≈ 3.2 of 8 bits): blind
    radius-2's 37 probes → recall 0.1/0.4 at sf0.001/0.01 (the
    VERDICT r9 near-decorative floor); directed 93-of-163 → 0.4/0.6
    at the same probe count as blind radius-3's full enumeration but
    with strictly better-targeted buckets. 93/256 of the bucket
    space (~36% of the corpus) is the honest price of a single
    8-bit table in this regime — llm_sim_ann_lsh's multi-table
    family is the complementary dial. Cost stays ∝ probes·n/2^bits,
    never corpus-sized.

    Plan shape: the 163 candidate flip-sets ride IN-ROW as a
    (margin, xor-mask) struct array — array_sort + slice + explode
    picks the T winners with zero extra passes (struct sort is
    lexicographic, so margin ties break deterministically on the
    smaller mask); the corpus join stays one equi-join on the bucket
    id with a 93-row broadcast probe list."""
    e = load_table(spark, sf_dir, "embeddings")
    n_planes, budget = 8, 93
    # r15 (guide §4): bucket signature AND boundary margins in one
    # Arrow pass (bit-identical; see with_hyperplane_columns) — the
    # margins ride along for the query row instead of re-deriving the
    # 8-plane literal fold on the probes branch.
    bucketed_m = with_hyperplane_columns(
        e.select("vec_id", "label", "embedding"),
        sig_specs=[("bucket", n_planes, 0)],
        margin_specs=[("_margins", n_planes, 0)],
    )
    bucketed = bucketed_m.select("vec_id", "label", "embedding", "bucket")

    masks = [0]
    masks += [1 << b for b in range(n_planes)]
    masks += [
        (1 << b1) | (1 << b2)
        for b1 in range(n_planes)
        for b2 in range(b1 + 1, n_planes)
    ]
    masks += [
        (1 << b1) | (1 << b2) | (1 << b3)
        for b1 in range(n_planes)
        for b2 in range(b1 + 1, n_planes)
        for b3 in range(b2 + 1, n_planes)
    ]
    masks += [
        (1 << b1) | (1 << b2) | (1 << b3) | (1 << b4)
        for b1 in range(n_planes)
        for b2 in range(b1 + 1, n_planes)
        for b3 in range(b2 + 1, n_planes)
        for b4 in range(b3 + 1, n_planes)
    ]
    cands = F.array(
        *[
            F.struct(
                sum(
                    (
                        F.abs(F.element_at("m", b + 1))
                        for b in range(n_planes)
                        if mask & (1 << b)
                    ),
                    start=F.lit(0.0),
                ).alias("margin"),
                F.lit(mask).alias("mask"),
            )
            for mask in masks
        ]
    )
    probes = (
        bucketed_m.where(F.col("vec_id") == 0)
        .select("embedding", "bucket", F.col("_margins").alias("m"))
        .select(
            F.col("embedding").alias("qvec"),
            "bucket",
            F.explode(F.slice(F.array_sort(cands), 1, budget)).alias("probe"),
        )
        .select(
            "qvec",
            F.col("bucket").bitwiseXOR(F.col("probe.mask")).alias("probe_bucket"),
        )
    )
    return (
        bucketed.join(F.broadcast(probes), F.col("bucket") == F.col("probe_bucket"))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Distributed Lloyd's k-means over array<float> columns, pure
    DataFrame ops (returns (cent_id, cvec) with double elements).

    Per iteration: assign each vector to its nearest centroid
    (broadcast k centroids, argmin squared distance), then rebuild
    each centroid as the element-wise mean of its members (posexplode
    to (cent, dim, val) → avg → ordered re-collect). Two shuffles per
    iteration, both proportional to corpus × dims — the standard
    scalable formulation. Init = first k vectors by id
    (deterministic; k-means++ would sample-broadcast the same way).

    The training input is localCheckpoint-ed once up front: every
    Lloyd iteration references it, and without materialization each
    iteration re-executes the input subtree from the scan (no
    exchange reuse on this build — SCALE.md round-4 ledger). At
    100 TB pass ``sample_mod``: training then runs on the
    deterministic ``id % sample_mod == 0`` sample — Lloyd's result
    doesn't need every vector (the PQ/IVF papers train on ~100k
    samples), callers still assign the FULL corpus against the
    returned centroids, and the checkpoint holds only the sample."""
    if sample_mod:
        vectors = vectors.where((F.col(id_col) % sample_mod) == 0)
    vectors = vectors.localCheckpoint(eager=True)
    init = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cent_id"), _as_double(vec_col).alias("cvec"))
    )
    centroids = init
    for _ in range(iters):
        # r14 (guide §2.4): the assign step was crossJoin(k) + a
        # row_number window partitioned on vec_id — a full corpus×k
        # shuffle AND sort per Lloyd iteration. The k centroids are
        # broadcast anyway, so fold them into ONE array row and take
        # the argmin IN-ROW: array_min over struct<dist, cent_id> is
        # the same (dist, cent_id) lexicographic tie-break the window
        # had, l2sq_expr is the identical IEEE fold, and the exchange
        # disappears entirely — assignment is now a narrow map.
        cents_arr = centroids.agg(
            F.array_sort(F.collect_list(F.struct("cent_id", "cvec"))).alias(
                "cents"
            )
        )
        vec_d = _as_double(vec_col)
        best = F.array_min(
            F.transform(
                "cents",
                lambda c: F.struct(
                    l2sq_expr(vec_d, c["cvec"]).alias("dist"),
                    c["cent_id"].alias("cent_id"),
                ),
            )
        )
        assigned = vectors.crossJoin(F.broadcast(cents_arr)).select(
            id_col, vec_col, best["cent_id"].alias("cent_id")
        )
        centroids = (
            assigned.select("cent_id", F.posexplode(_as_double(vec_col)).alias("dim", "val"))
            .groupBy("cent_id", "dim")
            .agg(F.avg("val").alias("mean_val"))
            .groupBy("cent_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("pairs")
            )
            .select(
                "cent_id", F.expr("transform(pairs, s -> s.mean_val)").alias("cvec")
            )
        ).localCheckpoint(eager=True)
    return centroids


@query("llm_sim_ann_ivf_kmeans")  # rows-only: learned buckets
def llm_sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — IVF with a LEARNED coarse quantizer: 3 Lloyd
    iterations build 8 centroids, vectors land in centroid inverted
    lists, the query probes its nearest 2 lists (nprobe=2). The
    production ANN shape: train once, assign at ingest, probe at
    query time."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, k=8, iters=3)

    # r14 (guide §2.4): in-row ranking against the 8 broadcast
    # centroids — array_min / slice(array_sort) over struct<dist,
    # cent_id> is the same (dist, cent_id) order the old per-vector
    # window used, with no corpus Exchange+Sort.
    emb_d = _as_double("embedding")
    ranked_arr = F.array_sort(
        F.transform(
            "cents",
            lambda c: F.struct(
                l2sq_expr(emb_d, c["cvec"]).alias("dist"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    base = e.crossJoin(F.broadcast(centroid_array(cents)))
    assigned = base.select(
        "vec_id", "label", "embedding", ranked_arr[0]["cent_id"].alias("cent_id")
    )
    probes = (
        base.where(F.col("vec_id") == 0)
        .select(
            F.col("embedding").alias("qvec"),
            F.explode(F.slice(ranked_arr, 1, 2)).alias("p"),  # nprobe=2
        )
        .select("qvec", F.col("p.cent_id").alias("probe_cent"))
    )
    return (
        assigned.join(F.broadcast(probes), F.col("cent_id") == F.col("probe_cent"))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query("llm_sim_topk_batch")  # rows-only: learned buckets, recall-gated in pytest
def llm_sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r10) — BATCH ANN serving: every query in a batch
    gets its exact-rerank top-10 from ONE plan, no per-query jobs.
    This is the 100 TB pipeline shape ("pair every doc with its
    neighbors" — dedup candidate mining, hard-negative mining, kNN
    graph builds), as opposed to query_ivf_index's one-probe serving
    path (VERDICT r9 next-round #3).

    Shape: train the coarse quantizer once (3 Lloyd iterations, k=8
    — the same learned quantizer as llm_sim_ann_ivf_kmeans), assign
    the corpus to inverted lists (broadcast centroids, no corpus
    shuffle), rank ALL k centroids against ALL N queries in one
    N x k broadcast product, keep nprobe=3 probes per query via a
    per-query window (nprobe=2 measured mean recall 0.51/0.48 at
    sf0.001/0.01 — below the 0.5 bar; 3 lists = 3/8 of the corpus
    per query lifts it to 0.63/0.64), then ONE equi-join probes x
    corpus on cent_id fans each query out; exact cosine on the
    candidates and a per-query window keeps 10. Jobs do not scale
    with N: the probe table rides as a broadcast here (N*nprobe
    rows); at cluster scale with millions of queries the same plan
    shuffles both sides on cent_id — still one equi-join, never a
    cartesian, cost ~ nprobe/k of the corpus per query.

    Queries = vec_id < 16 (held out of the corpus, so a query never
    retrieves itself); output (query_id, rank, vec_id, label,
    cos_sim), total-ordered. Rows-only: learned buckets have no SQL
    twin; recall@10 vs per-query exact is floor-asserted in pytest
    (tests/test_llm.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_queries, nprobe, topk = 16, 3, 10
    queries = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = e.where(F.col("vec_id") >= n_queries)
    cents = kmeans_centroids(corpus, k=8, iters=3)
    assigned = assign_to_centroids(corpus, cents)

    probes = probe_selection(queries, cents, nprobe)
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        assigned.join(F.broadcast(probes), "cent_id")
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine_expr("embedding", "qvec").alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", "vec_id", "label", "cos_sim")
        .orderBy("query_id", "rank")
    )


@query("llm_sim_ann_pq")  # rows-only: learned codebooks, no SQL twin
def llm_sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — product quantization (PQ, Jégou et al. 2011): the
    memory-bound ANN scale path. The 64-dim vector splits into M=4
    16-dim subvectors; each subspace gets its own 8-centroid k-means
    codebook; a vector is stored as 4 one-byte codes (64 floats →
    4 bytes, 64× compression). Query-time ADC: precompute the
    query-to-centroid distance table (M×K = 32 numbers, broadcast),
    approximate each corpus vector's distance as the sum of its
    codes' table entries, take top-10.

    Every stage is a bounded DataFrame op: codebooks train on
    posexploded subvectors via the same distributed Lloyd as IVF
    (per-subspace, K tiny); encoding is one broadcast join + argmin
    window per subspace; ADC scan is an M-row explode + broadcast
    lookup + groupBy(vec) sum — shuffle ∝ corpus × M, and at 100 TB
    the codes table is what sits in memory, not the floats.

    ADC alone ranks by quantized distance, and on near-random unit
    vectors the 4-byte quantization error swamps the tiny gap between
    true neighbors and the bulk (measured recall@10 ≈ 0.1–0.5). So
    the scan keeps an ADC SHORTLIST of 50 and exact-cosine re-ranks
    only those — the FAISS-style refine step: the full-precision pass
    touches 50 rows via one broadcast semi-join against the corpus,
    never the corpus itself (measured recall@10 ≈ 0.7–0.8).
    Deterministic end to end (Lloyd init = first-K ids, argmin ties
    broken by code id); invariants are pytest-asserted."""
    m_sub, k_codes, sub_dim, shortlist = 4, 8, 16, 50
    e = load_table(spark, sf_dir, "embeddings")
    # (vec_id, m, subvec): slice the vector into M contiguous subspaces
    sub = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(_as_double("embedding"), m * sub_dim + 1, sub_dim).alias(
                            "subvec"
                        ),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.subvec").alias("subvec")
    ).localCheckpoint(eager=True)  # feeds 4 codebook trainings + encode + qtab

    # per-subspace codebooks (independent tiny k-means)
    books = []
    for m in range(m_sub):
        cb = kmeans_centroids(
            # cent_id must not ride into training: kmeans crossJoins
            # its own (cent_id, cvec) centroids against the input
            sub.where(F.col("m") == m).select("vec_id", "subvec"),
            k=k_codes,
            iters=2,
            id_col="vec_id",
            vec_col="subvec",
        ).select(F.lit(m).alias("m"), F.col("cent_id").alias("code"), "cvec")
        books.append(cb)
    codebook = books[0]
    for cb in books[1:]:
        codebook = codebook.unionByName(cb)
    codebook = codebook.localCheckpoint(eager=True)  # 4×8 rows, reused twice

    dist2 = l2sq_expr(F.col("subvec"), F.col("cvec"))
    # r14 (guide §2.4): encode via in-row argmin over the broadcast
    # per-subspace codebook array — array_min of struct<d, code> is
    # the old (d, code) window order without the (corpus×M)-row
    # Exchange+Sort the row_number formulation paid.
    cb_by_m = codebook.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("code", "cvec"))).alias("codes_arr")
    )
    best_code = F.array_min(
        F.transform(
            "codes_arr",
            lambda c: F.struct(
                l2sq_expr(F.col("subvec"), c["cvec"]).alias("d"),
                c["code"].alias("code"),
            ),
        )
    )
    codes = sub.join(F.broadcast(cb_by_m), "m").select(
        "vec_id", "m", best_code["code"].alias("code")
    )

    # ADC: query (vec_id 0) distance table, broadcast, summed by code
    qtab = (
        sub.where(F.col("vec_id") == 0)
        .join(F.broadcast(codebook), "m")
        .select("m", "code", dist2.alias("qd"))
    )
    adc_short = (
        codes.where(F.col("vec_id") != 0)
        .join(F.broadcast(qtab), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("approx_dist"))
        .orderBy(F.col("approx_dist"), F.col("vec_id"))
        .limit(shortlist)
    )
    # refine: exact cosine over the 50-row shortlist only (broadcast
    # join against the corpus scan — full precision never touches
    # more than `shortlist` vectors)
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        e.join(F.broadcast(adc_short), "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "llm_embed_quantize",
    oracle="""
    WITH scaled AS (
      SELECT label, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               / 127.0 AS scale
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(round(
             list_aggregate(list_transform(embedding,
               x -> (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale)
                  * (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale)),
               'sum'), 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_sq_err
    FROM scaled
    WHERE scale > 0
    GROUP BY label
    """,
)
def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — symmetric int8 embedding quantization with a
    reconstruction-error audit: per vector, scale = max|x|/127, code
    = round(x/scale), reconstruction = code*scale; the query reports
    per-label vector counts and total squared reconstruction error —
    the acceptance gate run before swapping a float32 ANN index for
    its 4x-smaller int8 twin.

    Exactness across engines: every element is cast float→double
    (exact) before arithmetic; the per-vector squared-error fold is a
    sequential double accumulation in BOTH engines (Spark
    ``aggregate`` and DuckDB ``list_aggregate`` walk the array in
    order, same IEEE operation sequence — and the error term is
    written as y*y, never pow(y,2), because pow may differ in the
    last ulp); the per-vector total rounds to 6 dp and the group
    total is a decimal sum, so aggregation order can't shift it.

    Scale: one narrow map over the corpus + one groupBy(label) whose
    shuffle carries |labels| rows. The quantization itself is the
    1/4-memory move for the 100 TB ANN path (llm_sim_ann_pq goes
    64x further; this is the cheap first rung)."""
    e = load_table(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(F.transform("embedding", lambda c: F.abs(c.cast("double"))))
        / F.lit(127.0)
    )
    scaled = e.select("label", "embedding", scale.alias("scale")).where(
        F.col("scale") > 0
    )
    err = F.transform(
        "embedding",
        lambda c: (
            (c.cast("double") - F.round(c.cast("double") / F.col("scale")) * F.col("scale"))
            * (c.cast("double") - F.round(c.cast("double") / F.col("scale")) * F.col("scale"))
        ),
    )
    sq_err = F.round(
        F.aggregate(err, F.lit(0.0), lambda acc, v: acc + v), 6
    )
    return (
        scaled.select("label", sq_err.alias("sq_err"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("sq_err").cast("decimal(18,6)")).cast("double").alias(
                "total_sq_err"
            ),
        )
    )


@query(
    "llm_hard_negatives",
    oracle="""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS qvec, label AS q_label
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.q_id, e.vec_id, e.label,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qvec AS DOUBLE[])) AS cos_sim
      FROM q JOIN embeddings e
        ON e.vec_id <> q.q_id AND e.label <> q.q_label
    ),
    ranked AS (
      SELECT q_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id AS negative_id, label AS negative_label, cos_sim
    FROM ranked WHERE rn <= 3
    """,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — hard-negative mining: for each (sampled) anchor
    vector, the 3 most-similar vectors with a DIFFERENT label — the
    batch that makes contrastive embedding training work (easy random
    negatives teach nothing; near-misses define the decision
    boundary). Exactly the retrieval loop behind every dual-encoder
    training pipeline.

    Shape: anchors ride broadcast against one corpus scan; per-anchor
    top-3 via WindowGroupLimit (map-side k-capping, partition =
    anchor — bounded). The label filter runs BEFORE scoring. Scores
    are the same double cosine fold as llm_sim_topk (oracle casts to
    DOUBLE[] so DuckDB folds in double too — bit-equal, no rounding
    needed). At 100 TB the corpus scan per anchor batch is amortized:
    score all anchors in one pass (done here — one join, not one
    scan per anchor), and the ANN index family replaces the exhaustive
    scan the same way it does for llm_sim_topk."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("q_label"),
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("q_id")) & (F.col("label") != F.col("q_label")),
        )
        .select(
            "q_id",
            "vec_id",
            "label",
            cosine_expr("embedding", "qvec").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "q_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            "cos_sim",
        )
    )


# --- persistent IVF index: build once / ingest-assign / probe-query ---


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (broadcast centroids, argmin L2,
    cent_id tie-break) — the ingest-time hop of a persisted IVF
    index, shared by build and incremental add. r14 (guide §2.4):
    in-row argmin over the broadcast centroid array — array_min of
    struct<dist, cent_id> is the same lexicographic tie-break the
    old per-vector row_number window had, without its corpus-wide
    Exchange+Sort; assignment is a narrow map over the scan."""
    vec_d = _as_double(vec_col)
    best = F.array_min(
        F.transform(
            "cents",
            lambda c: F.struct(
                l2sq_expr(vec_d, c["cvec"]).alias("dist"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    return vectors.crossJoin(F.broadcast(centroid_array(centroids))).select(
        *vectors.columns, best["cent_id"].alias("cent_id")
    )


def build_ivf_index(
    vectors: DataFrame,
    index_dir: str,
    k: int = 8,
    iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index: ``centroids/`` (k rows) + ``postings/``
    PARTITIONED BY cent_id, so a probe query's ``isin`` filter becomes
    PartitionFilters at the scan and reads only nprobe/k of the
    corpus (numFiles-verified in tests). This is the production ANN
    lifecycle the in-query ANN keys skip: train/assign ONCE, amortize
    over every query batch — at 100 TB re-clustering per query batch
    is the difference between an index and a job."""
    centroids = kmeans_centroids(
        vectors, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        sample_mod=sample_mod,
    )
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark = vectors.sparkSession
    cents = spark.read.parquet(f"{index_dir}/centroids")
    assign_to_centroids(vectors, cents, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cent_id").parquet(f"{index_dir}/postings")


def add_to_ivf_index(
    vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental ingest: assign new vectors against the PERSISTED
    centroids (no retraining — the quantizer is a versioned model
    artifact) and append to the partitioned postings. Append into
    dynamic partitions is conflict-free across concurrent ingest
    batches; periodic ``compact_snapshot`` handles the small files."""
    spark = vectors.sparkSession
    cents = spark.read.parquet(f"{index_dir}/centroids")
    assign_to_centroids(vectors, cents, id_col, vec_col).write.mode(
        "append"
    ).partitionBy("cent_id").parquet(f"{index_dir}/postings")


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    qvec: list[float],
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe query against a persisted index: rank the k centroids
    against the query vector (k rows — the take is control plane),
    then scan ONLY the nprobe winning partitions (partition pruning,
    not a full-corpus pass) and return exact cosine top-k within
    them, total-ordered (cos desc, id)."""
    q = [float(x) for x in qvec]
    qcol = F.array(*[F.lit(v) for v in q])
    cents = spark.read.parquet(f"{index_dir}/centroids")
    cdist = l2sq_expr(F.col("cvec"), qcol)
    probes = [
        r["cent_id"]
        for r in cents.select("cent_id", cdist.alias("d"))
        .orderBy("d", "cent_id")
        .take(nprobe)
    ]
    postings = spark.read.parquet(f"{index_dir}/postings").where(
        F.col("cent_id").isin(probes)
    )
    return (
        postings.select(
            id_col, cosine_expr(vec_col, qcol).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(topk)
    )


def query_ivf_index_batch(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = 3,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BATCH probe against a persisted IVF index (r10 — completing
    the batch-serving triple: in-query llm_sim_topk_batch, this, and
    query_graph_index_batch): every query in ``queries``
    (query_id, qvec) ranks the stored centroids in one N × k
    broadcast product, keeps its nprobe nearest lists via a
    per-query window, and ONE equi-join against the cent_id-
    partitioned postings scores exact cosine on the candidates —
    per-query window top-k out. Job count is constant in N (contrast
    query_ivf_index: one driver-side centroid take + one pruned scan
    PER query). Partition pruning note: a single probe's isin filter
    prunes to nprobe partitions; a batch's probe UNION usually
    touches most partitions, so the win here is plan/job
    amortization, not scan reduction — at 100 TB both matter and the
    single-probe path remains the low-latency server."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    qv = queries.select(
        F.col(queries.columns[0]).alias("query_id"),
        _as_double(queries.columns[1]).alias("qvec"),
    )
    probes = probe_selection(qv, cents, nprobe)
    postings = spark.read.parquet(f"{index_dir}/postings")
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        postings.join(F.broadcast(probes), "cent_id")
        .select(
            "query_id",
            id_col,
            cosine_expr(vec_col, "qvec").alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", id_col, "cos_sim")
        .orderBy("query_id", "rank")
    )


from osm_airflow_spark.llm.text import BM25_SQL_CTE, bm25_scored  # noqa: E402


@query(
    "llm_hybrid_rrf",
    oracle=f"""
    WITH {BM25_SQL_CTE},
    bm_top AS (
      SELECT doc_id, bm25 FROM bm25_scored
      ORDER BY bm25 DESC, doc_id LIMIT 100
    ),
    bm_ranked AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS bm_rank
      FROM bm_top
    ),
    cos_top AS (
      SELECT b.vec_id AS doc_id,
             list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) AS cos_sim
      FROM embeddings b,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE b.vec_id <> 0
      ORDER BY cos_sim DESC, b.vec_id LIMIT 100
    ),
    cos_ranked AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INT)
               AS cos_rank
      FROM cos_top
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           b.bm_rank, c.cos_rank,
           COALESCE(1.0 / (60.0 + b.bm_rank), 0.0)
             + COALESCE(1.0 / (60.0 + c.cos_rank), 0.0) AS rrf
    FROM bm_ranked b FULL JOIN cos_ranked c USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
)
def llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — HYBRID retrieval via reciprocal rank fusion:
    the lexical arm (BM25 top-100, llm/text.bm25_scored) and the
    dense arm (embedding-cosine top-100 against query vector 0,
    vec_id ≡ doc_id in the fixture) each produce a ranked candidate
    list; RRF fuses them as Σ 1/(60 + rank) (Cormack et al. 2009,
    the k=60 standard) and the fused top-20 is the answer. This is
    the retrieval stack RAG/data-curation pipelines actually run —
    neither arm alone survives both paraphrase and keyword queries.

    Determinism: both arms' scores are engine-bit-identical (BM25:
    idf rounded at the transcendental; cosine: the shared
    left-to-right double fold == DuckDB's list_cosine_similarity),
    so the top-100 SETS and their internal rank orders match
    exactly; RRF itself is exact-int division summed in literal
    order — the fused doubles hash-compare raw, unrounded.

    Scale: each arm is one corpus scan + TakeOrderedAndProject; the
    ranks over the ALREADY-LIMITED 100-row candidate lists come from
    a broadcast join-rank (1 + count of strictly-better rows —
    100x100-bounded BNLJ), NOT a window: a partitionBy(lit) window
    degenerates to the unpartitioned-window shape the engine-wide
    GLOBW invariant forbids, and the join-rank keeps the no-global-
    window rule unconditional. At 100 TB the arms swap in the
    posting-stats table and the IVF index respectively; the fusion
    stays byte-identical."""

    def join_rank(top, score_col: str, rank_name: str):
        a = top.select(
            F.col("doc_id"), F.col(score_col).alias("_sa")
        )
        b = top.select(
            F.col("doc_id").alias("_ob"), F.col(score_col).alias("_sb")
        )
        ahead = (F.col("_sb") > F.col("_sa")) | (
            (F.col("_sb") == F.col("_sa")) & (F.col("_ob") < F.col("doc_id"))
        )
        return (
            a.join(F.broadcast(b), ahead, "left")
            .groupBy("doc_id")
            .agg((F.count("_ob") + 1).cast("int").alias(rank_name))
        )

    bm_top = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(100)
        .localCheckpoint(eager=True)  # rank self-joins the 100-row list
    )
    bm_ranked = join_rank(bm_top, "bm25", "bm_rank")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    cos_top = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_expr("embedding", "qvec").alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(100)
        .localCheckpoint(eager=True)
    )
    cos_ranked = join_rank(cos_top, "cos_sim", "cos_rank")
    rrf = F.coalesce(1.0 / (60.0 + F.col("bm_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (60.0 + F.col("cos_rank")), F.lit(0.0)
    )
    return (
        bm_ranked.join(cos_ranked, ["doc_id"], "full")
        .select("doc_id", "bm_rank", "cos_rank", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


def _rp_sign(j: int, i: int) -> float:
    """Deterministic ±1 projection-matrix entry (Achlioptas signs):
    md5 of the (projection, dim) coordinates — the hyperplane_signature
    generator's discipline, no stored model, no rand()."""
    import hashlib

    h = int.from_bytes(hashlib.md5(f"rp:{j}:{i}".encode()).digest()[:4], "big")
    return 1.0 if h % 2 == 0 else -1.0


_RP_K, _RP_DIM = 8, 64
_RP_SIGNS = [[_rp_sign(j, i) for i in range(_RP_DIM)] for j in range(_RP_K)]


def _rp_oracle_cols() -> str:
    cols = []
    for j in range(_RP_K):
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {s:.1f}"
            for i, s in enumerate(_RP_SIGNS[j])
        )
        cols.append(f"0.0 + {chain} AS p{j}")
    return ",\n           ".join(cols)


@query(
    "llm_embed_project",
    oracle=f"""
    SELECT vec_id, label,
           {_rp_oracle_cols()}
    FROM embeddings
    """,
)
def llm_embed_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — Johnson–Lindenstrauss random projection:
    64-dim embeddings down to 8 dims with a deterministic ±1 sign
    matrix (Achlioptas 2003 — database-friendly projections: ±1
    entries preserve pairwise distances in expectation with 1/sqrt(k)
    scaling left to the consumer). The dimensionality-reduction hop
    before ANN indexing / clustering at 100 TB: 8x less memory per
    vector and every downstream cosine gets 8x cheaper, with the JL
    guarantee bounding the distortion.

    Determinism: the sign matrix is md5-derived (the
    hyperplane_signature generator family — no stored model, no
    rand()), the Spark side computes each projection as the
    left-to-right zip_with/aggregate fold, and the ORACLE spells the
    SAME fold as an explicit left-associated literal chain (0.0 +
    e1*s1 + e2*s2 + ... — SQL + is left-assoc, matching the fold's
    0.0 seed), so all 8 projected doubles are bit-identical and emit
    UNROUNDED. Scale: pure narrow map, zero shuffle, whole-stage
    codegen."""
    e = load_table(spark, sf_dir, "embeddings")
    cols = []
    for j in range(_RP_K):
        signs = F.array(*[F.lit(s) for s in _RP_SIGNS[j]])
        cols.append(
            F.aggregate(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    signs,
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias(f"p{j}")
        )
    return e.select("vec_id", "label", *cols)


@query("llm_sim_ann_ivf_rq")  # rows-only: learned coarse + residual codebooks
def llm_sim_ann_ivf_rq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — IVF + RESIDUAL quantization (the IVFADC
    composition of Jégou et al. 2011, completing the ANN family):
    a learned 8-centroid coarse quantizer routes vectors into
    inverted lists, and PQ codebooks are trained on the RESIDUALS
    v − c(v) rather than the raw vectors — residuals concentrate
    near zero, so the same 4×8 codebook budget spends its precision
    where the data actually lives (the reason FAISS's IVFPQ encodes
    residuals by default). Query: probe the nprobe=2 nearest coarse
    lists; per probed list, build the ADC table from the QUERY's
    residual against that list's centroid (the residual trick means
    each probe gets its own table); approximate distance = sum of
    code-table entries; exact-cosine re-rank an ADC shortlist of 50
    (the refine step, one broadcast join — never the corpus).

    Storage at 100 TB: 1 byte coarse id + 4 bytes PQ codes per
    vector; the floats leave memory entirely. All stages are the
    proven building blocks: kmeans_centroids (distributed Lloyd,
    checkpointed input), argmin windows partitioned by vec_id,
    broadcast codebooks, TakeOrderedAndProject shortlists.
    Deterministic end to end (first-K init, id tie-breaks);
    recall@10 floor asserted in tests like every ANN variant."""
    m_sub, k_codes, sub_dim, nprobe, shortlist = 4, 8, 16, 2, 50
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, k=8, iters=2)

    # r14 (guide §2.4): coarse assignment + probe ranking happen
    # IN-ROW against the 8 broadcast centroids — array_sort over
    # struct<dist, cent_id, cvec> is the old (dist, cent_id) window
    # order (cent_id is unique, so the carried cvec never compares),
    # and the corpus Exchange+Sort disappears. The residual fold is
    # the identical zip_with, now over the in-row best centroid.
    emb_d = _as_double("embedding")
    ranked_arr = F.array_sort(
        F.transform(
            "cents",
            lambda c: F.struct(
                l2sq_expr(emb_d, c["cvec"]).alias("dist"),
                c["cent_id"].alias("cent_id"),
                c["cvec"].alias("cvec"),
            ),
        )
    )
    base = e.crossJoin(F.broadcast(centroid_array(cents)))

    def residual_against(cvec_col) -> Column:
        return F.zip_with(emb_d, cvec_col, lambda x, y: x - y)

    res = (
        base.select(
            "vec_id",
            ranked_arr[0]["cent_id"].alias("cent_id"),
            residual_against(ranked_arr[0]["cvec"]).alias("rvec"),
        )
        .localCheckpoint(eager=True)  # feeds 4 trainings + encode
    )
    sub = res.select(
        "vec_id",
        "cent_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("rvec", m * sub_dim + 1, sub_dim).alias("subvec"),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select(
        "vec_id", "cent_id", F.col("s.m").alias("m"), F.col("s.subvec").alias("subvec")
    ).localCheckpoint(eager=True)

    books = []
    for m in range(m_sub):
        cb = kmeans_centroids(
            # cent_id must not ride into training: kmeans crossJoins
            # its own (cent_id, cvec) centroids against the input
            sub.where(F.col("m") == m).select("vec_id", "subvec"),
            k=k_codes,
            iters=2,
            id_col="vec_id",
            vec_col="subvec",
        ).select(F.lit(m).alias("m"), F.col("cent_id").alias("code"), "cvec")
        books.append(cb)
    codebook = books[0]
    for cb in books[1:]:
        codebook = codebook.unionByName(cb)
    codebook = codebook.localCheckpoint(eager=True)  # 4×8 rows

    dist2 = l2sq_expr(F.col("subvec"), F.col("cvec"))
    # r14 (guide §2.4): in-row argmin over the broadcast per-subspace
    # codebook array, same (d, code) order, no (corpus×M) window
    cb_by_m = codebook.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("code", "cvec"))).alias("codes_arr")
    )
    best_code = F.array_min(
        F.transform(
            "codes_arr",
            lambda c: F.struct(
                l2sq_expr(F.col("subvec"), c["cvec"]).alias("d"),
                c["code"].alias("code"),
            ),
        )
    )
    codes = sub.join(F.broadcast(cb_by_m), "m").select(
        "vec_id", "cent_id", "m", best_code["code"].alias("code")
    )

    # query residual PER PROBED LIST → one ADC table per probe
    qres = (
        base.where(F.col("vec_id") == 0)
        .select("embedding", F.explode(F.slice(ranked_arr, 1, nprobe)).alias("p"))
        .select(
            F.col("p.cent_id").alias("probe_cent"),
            residual_against(F.col("p.cvec")).alias("qr"),
        )
    )
    qsub = qres.select(
        "probe_cent",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("qr", m * sub_dim + 1, sub_dim).alias("subvec"),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select("probe_cent", F.col("s.m").alias("m"), F.col("s.subvec").alias("subvec"))
    qtab = qsub.join(F.broadcast(codebook), "m").select(
        "probe_cent",
        F.col("m").alias("qm"),
        F.col("code").alias("qcode"),
        dist2.alias("qd"),
    )

    adc_short = (
        codes.where(F.col("vec_id") != 0)
        .join(
            F.broadcast(qtab),
            (F.col("cent_id") == F.col("probe_cent"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("qcode")),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("approx_dist"))
        .orderBy(F.col("approx_dist"), F.col("vec_id"))
        .limit(shortlist)
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        e.join(F.broadcast(adc_short.select("vec_id")), "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def nn_descent_graph(
    vectors: DataFrame,
    k: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """NN-Descent (Dong et al. 2011): build an approximate kNN graph
    by iterating "my neighbors' neighbors are probably my neighbors".
    The distributed graph-ANN construction (the build step behind
    HNSW/DiskANN-family serving): no pairwise pass ever happens —
    init comes from LSH buckets, and each round joins the edge list
    to itself (neighbor-of-neighbor candidates, fan-out bounded by
    k^2 per node), scores candidates, and keeps the top-k per node
    with a WindowGroupLimit window partitioned by the node.

    Returns directed edges (src, dst, cos) — k best per src.
    Deterministic: LSH planes are md5-derived, every top-k breaks
    ties by (cos desc, dst asc), rounds are fixed. Scale: per-round
    shuffle ∝ corpus·k² candidate rows, each carrying only ids until
    the single broadcast-free score join; the vectors table is joined
    twice per round on its id — bucket it by id and those are
    zero-Exchange joins (the layout contract)."""
    v = vectors.select(
        F.col(id_col).alias("_vid"), _as_double(vec_col).alias("_vec")
    ).localCheckpoint(eager=True)

    # init: 3 LSH tables × 4 bits → bucket-mates as first candidates.
    # r14 (guide §1.2): sigs feeds SIX join legs (a and b per table)
    # and this build never reuses exchange subtrees, so without the
    # checkpoint the 12-plane signature computation re-ran 6×.
    # r15 (guide §4): signatures via one Arrow pass (bit-identical;
    # see with_hyperplane_columns).
    sigs = (
        with_hyperplane_columns(
            vectors.select(F.col(id_col).alias("_vid"), vec_col),
            sig_specs=[(f"b{t}", 4, t * 4) for t in range(3)],
            vec_col=vec_col,
        )
        .drop(vec_col)
        .localCheckpoint(eager=True)
    )
    # r15 (guide §2.4): the three per-table bucket self-joins fuse
    # into ONE self-join keyed (t, bk) over the unpivoted signature
    # rows — the per-table joins' union is exactly the (t, bk)
    # equi-join's output, and the dropDuplicates dedups cross-table
    # repeats identically. One join + one exchange key instead of
    # three joins unioned.
    tabbed = sigs.select(
        "_vid",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bk"))
                    for t in range(3)
                ]
            )
        ).alias("s"),
    ).select("_vid", F.col("s.t").alias("t"), F.col("s.bk").alias("bk"))
    a = tabbed.select(F.col("_vid").alias("src"), "t", "bk")
    b = tabbed.select(F.col("_vid").alias("dst"), "t", "bk")
    mates = (
        a.join(b, ["t", "bk"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    edges = mates.dropDuplicates(["src", "dst"])

    def score_topk(cand: DataFrame) -> DataFrame:
        # dst vectors attach FIRST, src vectors LAST: the src join
        # leaves the rows hash-partitioned on src, which is exactly
        # the top-k window's partitioning — one Exchange fewer per
        # refinement round than the old src-then-dst order (§2.4)
        scored = (
            cand.join(v.select(F.col("_vid").alias("dst"), F.col("_vec").alias("_dv")), "dst")
            .join(v.select(F.col("_vid").alias("src"), F.col("_vec").alias("_sv")), "src")
            .select("src", "dst", cosine_expr("_sv", "_dv").alias("cos"))
        )
        w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )

    edges = score_topk(edges).localCheckpoint(eager=True)
    for _ in range(rounds):
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        undirected = edges.select("src", "dst").unionByName(rev)
        hop2 = (
            undirected.alias("e1")
            .join(
                undirected.select(
                    F.col("src").alias("mid"), F.col("dst").alias("dst2")
                ),
                F.col("dst") == F.col("mid"),
            )
            .where(F.col("src") != F.col("dst2"))
            .select("src", F.col("dst2").alias("dst"))
        )
        cand = (
            undirected.unionByName(hop2).dropDuplicates(["src", "dst"])
        )
        edges = score_topk(cand).localCheckpoint(eager=True)
    return edges.select(
        F.col("src").alias(id_col), F.col("dst").alias("nbr"), "cos"
    )


def build_graph_index(
    vectors: DataFrame,
    index_dir: str,
    k: int = 8,
    rounds: int = 2,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a graph-ANN index (r9 — the build-once/serve-many
    lifecycle the in-query ``llm_sim_ann_graph`` key skips, mirroring
    ``build_ivf_index``): ``edges/`` is the NN-Descent kNN graph
    PARTITIONED BY ``bucket = src % n_buckets`` so a beam probe's
    bucket filter becomes PartitionFilters at the scan; ``vectors/``
    carries the raw vectors under the SAME bucketing for pruned
    candidate scoring; ``meta/`` records (entry_id, n_buckets, k) —
    the fixed deterministic entry point (lowest node id; a medoid
    would also do, determinism is what matters).

    At 100 TB this is the HNSW/DiskANN split: graph CONSTRUCTION is
    the expensive distributed job (NN-Descent, k²-bounded candidate
    shuffles), amortized over every query; SERVING touches only the
    buckets the beam walks (~beam·k rows per hop), never the corpus.
    Modulo bucketing (not hash) keeps probe-side bucket derivation a
    one-line exact twin of the writer's."""
    spark = vectors.sparkSession
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket")
    edges = nn_descent_graph(
        vectors, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col
    )
    edges.select(id_col, "nbr", "cos", bucket).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{index_dir}/edges")
    vectors.select(
        F.col(id_col), _as_double(vec_col).alias("vec"), bucket
    ).write.mode("overwrite").partitionBy("bucket").parquet(f"{index_dir}/vectors")
    entry = vectors.agg(F.min(id_col).alias("m")).first()["m"]
    spark.createDataFrame(
        [(int(entry), int(n_buckets), int(k))],
        "entry_id long, n_buckets int, k int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")


def query_graph_index(
    spark: SparkSession,
    index_dir: str,
    qvec: list[float],
    beam_w: int = 12,
    hops: int = 4,
    topk: int = 10,
    exclude_ids: tuple[int, ...] = (),
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy beam search against a PERSISTED graph index.

    The driver is the serving coordinator — exactly the role the
    query node plays in HNSW/DiskANN serving: it holds the beam
    (≤ beam_w ids + scores, bounded control-plane state) and issues
    one bucket-pruned probe per hop. Each probe reads ONLY the
    ``bucket ∈ {id % n_buckets}`` partitions of the edge/vector
    tables (PartitionFilters — numFiles-verified in
    tests/test_llm.py::test_graph_index_build_query_prune_and_recall),
    so a hop costs ~beam·k rows however big the corpus is. The
    returned DataFrame re-scores the winning candidate set via one
    final pruned scan, keeping the result a Spark plan rather than a
    driver-materialized list. Deterministic: fixed entry from meta
    (falling back to the lowest non-excluded id), ties broken
    (cos desc, id asc), fixed hop budget."""
    meta = spark.read.parquet(f"{index_dir}/meta").first()
    n_buckets = meta["n_buckets"]
    q = [float(x) for x in qvec]
    qcol = F.array(*[F.lit(v) for v in q])
    excl = set(int(i) for i in exclude_ids)

    def pruned(path: str, ids: list[int]) -> DataFrame:
        buckets = sorted({i % n_buckets for i in ids})
        return (
            spark.read.parquet(f"{index_dir}/{path}")
            .where(F.col("bucket").isin(buckets))
            .where(F.col(id_col).isin([int(i) for i in ids]))
        )

    def score(ids: list[int]) -> dict[int, float]:
        rows = (
            pruned("vectors", ids)
            .select(id_col, cosine_expr("vec", qcol).alias("cos_sim"))
            .collect()
        )
        return {r[id_col]: r["cos_sim"] for r in rows}

    entry = int(meta["entry_id"])
    if entry in excl:
        # one-time fallback scan: id column only (pruned to ~metadata
        # by Parquet column pruning), not the beam-path hot loop —
        # per-hop probes below stay bucket-pruned regardless
        entry = (
            spark.read.parquet(f"{index_dir}/vectors")
            .select(id_col)
            .where(~F.col(id_col).isin(sorted(excl)))
            .agg(F.min(id_col).alias("m"))
            .first()["m"]
        )
        if entry is None:  # every indexed id excluded (r9 review)
            raise ValueError(
                "query_graph_index: all indexed ids are excluded — "
                "no valid entry point"
            )
        entry = int(entry)
    scored: dict[int, float] = score([entry])
    beam = sorted(scored, key=lambda i: (-scored[i], i))[:beam_w]
    for _ in range(hops):
        nbrs = {
            r["nbr"]
            for r in pruned("edges", beam).select("nbr").distinct().collect()
        }
        new = sorted(n for n in nbrs if n not in scored and n not in excl)
        if not new:
            break
        scored.update(score(new))
        beam = sorted(scored, key=lambda i: (-scored[i], i))[:beam_w]
    winners = sorted(scored, key=lambda i: (-scored[i], i))[:topk]
    return (
        pruned("vectors", winners)
        .select(id_col, cosine_expr("vec", qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
    )


@query("llm_sim_ann_graph")  # rows-only: learned graph, no SQL twin
def llm_sim_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — graph-based ANN: NN-Descent builds the
    approximate kNN graph (k=8, 2 refinement rounds over LSH-seeded
    edges), then a greedy BEAM SEARCH serves the query — start from a
    fixed entry node, repeatedly expand the beam's neighbors, score
    against the query, keep the best beam, stop after a fixed hop
    budget. The HNSW/DiskANN serving shape expressed in joins: each
    hop is one equi-join of the current beam (tiny, broadcast)
    against the edge table — at 100 TB the edge table is bucketed by
    node and a hop never scans the corpus, it probes ~beam·k rows.

    Budget here: beam 24 over a k=8 graph, 6 hops from one entry —
    deliberately sub-linear (~beam·k·hops candidates regardless of
    corpus size). The original beam 12 / 4 hops measured recall 0.2
    at sf0.1 (r12 sweep): a fixed exploration budget explores a fixed
    candidate COUNT, so its recall falls as the corpus grows — the
    same L≫k budget/recall trade compact_graph_index measured and
    documented (beam 24 / hops 6 restores recall there too). Graph-ANN
    budgets grow ~log n in production; the per-SF floor table is what
    makes that requirement measurable here. Deterministic throughout
    (md5 LSH seeds, id tie-breaks, fixed entry = lowest non-query id);
    recall@10 floor asserted with the other ANN variants.

    This key rebuilds the graph inline because a query key must be
    self-contained; the production lifecycle — build once, serve many
    — is ``build_graph_index`` / ``query_graph_index`` above (r9),
    with the edge+vector tables persisted bucket-partitioned and
    probes numFiles-verified to prune."""
    beam_w, hops, topk = 24, 6, 10
    e = load_table(spark, sf_dir, "embeddings")
    edges = nn_descent_graph(e).localCheckpoint(eager=True)
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored_all = None

    def score(ids: DataFrame) -> DataFrame:
        return (
            ids.join(e, "vec_id")
            .crossJoin(F.broadcast(q))
            .select("vec_id", "label", cosine_expr("embedding", "qvec").alias("cos_sim"))
        )

    entry = (
        e.where(F.col("vec_id") != 0)
        .select(F.min("vec_id").alias("vec_id"))
    )
    beam = score(entry).localCheckpoint(eager=True)
    scored_all = beam
    # r14 (guide §1.2): the loop ran THREE eager checkpoints per hop
    # (new_scored, scored_all, beam) — pure job overhead on ≤ beam·k
    # control-plane rows. Checkpoint ONLY the accumulated score set
    # (each hop's single real action); the beam is a lazy TakeOrdered
    # over that checkpointed set, referenced exactly once by the next
    # hop's frontier join, so nothing re-executes.
    for _ in range(hops):
        nxt = (
            beam.select("vec_id")
            .join(edges, "vec_id")
            .select(F.col("nbr").alias("vec_id"))
            .where(F.col("vec_id") != 0)
            .dropDuplicates(["vec_id"])
            .join(scored_all.select("vec_id"), "vec_id", "left_anti")
        )
        scored_all = scored_all.unionByName(
            score(F.broadcast(nxt))
        ).localCheckpoint(eager=True)
        beam = scored_all.orderBy(
            F.col("cos_sim").desc(), F.col("vec_id")
        ).limit(beam_w)
    return (
        scored_all.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(topk)
    )


@query(
    "agg_vector_centroid",
    oracle="""
    SELECT label, CAST(i AS INT) AS dim,
           CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                         AS DECIMAL(18,6)))
                AS DOUBLE) / COUNT(*) AS centroid_val
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i
    """,
)
def agg_vector_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r8) — vector AGGREGATION as a relational op:
    per-label element-wise centroid of the embedding column (the
    class-prototype computation behind nearest-centroid classifiers,
    SemDedup's cluster step, and embedding-drift monitoring). Shape:
    posexplode to (label, dim, val) → one groupBy over (label, dim) —
    shuffle rows = labels x dims per partition after partial
    aggregation, never corpus x dims.

    Determinism — two measured traps live here, resolved by the
    round-term-then-decimal-sum rule: (1) casting the FLOAT straight
    to decimal diverges because Spark rounds the float's shortest
    repr ("0.1") while DuckDB rounds its exact binary value
    (0.10000000149..., measured 4e-10 drift); (2) even via DOUBLE, a
    float's exact value is dyadic and can terminate ON a
    scale-9 decimal midpoint, where the engines' tie rules differ
    (measured at sf0.1: ~10 elements flipped, 4.6e-12 mean drift).
    Rounding each element to 6 dp FIRST makes the decimal cast exact
    (the audited 'term' rationale), the decimal sum is
    order-independent, and the mean is one IEEE division by an exact
    count."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    return (
        exploded.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_val")
        )
        .select("label", "dim", "centroid_val")
    )


def _gram_micro_partials(it):
    """Per-partition exact Gram partials for ``llm_embed_covariance``
    (r15, guide §4): consumes Arrow batches of the bare ``embedding``
    column, accumulates Σ round(xᵢ·xⱼ, 6)·10⁶ over the upper triangle
    (plus the j = 0 raw-value sentinel per dim) as int64 micro-units,
    and yields ONE partial frame per partition: (i, j, s, n).

    Bit-faithfulness contract: Spark's ``round(double, 6)`` is
    BigDecimal.valueOf(x).setScale(6, HALF_UP) — i.e. HALF_UP on the
    SHORTEST DECIMAL REPR of the double (the CLAUDE.md engine-skew
    rule). The vectorized fast path rounds the ×1e6-scaled double
    (exact away from the .5 boundary); inside a ±tol midpoint band —
    where scaled-multiplication error or the repr-vs-exact gap could
    flip the digit — it falls back to Decimal(repr(x)) quantized
    HALF_UP, which is exactly Java's path (Python repr and Java
    Double.toString emit the same shortest round-trip decimal).
    Integer micro sums are order-independent, so partial-per-partition
    + final sum reproduces the old decimal(18,6) explode-sum
    value-for-value. int64 bounds the per-cell micro sum at ~9.2e18
    (Σ|p| ≤ 9.2e12 — far past the old decimal(18,6) per-TERM bound);
    past it the final ANSI long sum errors loudly, never silently.

    Latent edge (fixtures never hit it): a zero-length embedding is
    skipped here, where the old sequence(1, 0) form would have
    produced a descending [1, 0] index walk and an ANSI element_at
    error; NULL embeddings contribute nothing in both forms."""
    import numpy as np
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    six = Decimal("0.000001")

    def micros(a):
        scaled = a * 1e6
        fl = np.floor(scaled)
        frac = scaled - fl
        out = np.where(frac >= 0.5, fl + 1.0, fl)
        tol = 1e-6 + 8.0 * np.spacing(np.abs(scaled))
        sus = np.abs(frac - 0.5) < tol
        if sus.any():
            flat_a = a.reshape(-1)
            flat_o = out.reshape(-1)
            for ix in np.flatnonzero(sus.reshape(-1)):
                q = Decimal(repr(float(flat_a[ix]))).quantize(
                    six, ROUND_HALF_UP
                )
                flat_o[ix] = float(q.scaleb(6))
            out = flat_o.reshape(a.shape)
        return out.astype(np.int64)

    acc: dict = {}  # d -> [n, singles int64 (d,), pairs int64 (t,)]
    chunk = 1024  # bounds the b×d×d outer-product intermediate
    for pdf in it:
        vecs = [v for v in pdf["embedding"] if v is not None and len(v)]
        by_len: dict = {}
        for v in vecs:
            by_len.setdefault(len(v), []).append(v)
        for d, vs in by_len.items():
            if d not in acc:
                acc[d] = [0, np.zeros(d, np.int64),
                          np.zeros(d * (d + 1) // 2, np.int64)]
            a = acc[d]
            iu0, iu1 = np.triu_indices(d)
            for lo in range(0, len(vs), chunk):
                X = np.stack(
                    [np.asarray(v, dtype=np.float64)
                     for v in vs[lo:lo + chunk]]
                )
                P = np.einsum("bi,bj->bij", X, X)[:, iu0, iu1]
                a[1] += micros(X).sum(axis=0, dtype=np.int64)
                a[2] += micros(P).sum(axis=0, dtype=np.int64)
            a[0] += len(vs)
    if acc:
        ii, jj, ss, nn = [], [], [], []
        for d, (n, sm, pm) in acc.items():
            iu0, iu1 = np.triu_indices(d)
            ii.extend(range(1, d + 1))
            jj.extend([0] * d)
            ss.extend(int(x) for x in sm)
            nn.extend([n] * d)
            ii.extend(int(x) + 1 for x in iu0)
            jj.extend(int(x) + 1 for x in iu1)
            ss.extend(int(x) for x in pm)
            nn.extend([n] * len(iu0))
        yield pd.DataFrame({"i": ii, "j": jj, "s": ss, "n": nn})


@query(
    "llm_embed_covariance",
    oracle="""
    WITH pr AS (
      SELECT ti.i AS i, tj.j AS j,
             round(CAST(embedding[ti.i] AS DOUBLE)
                   * CAST(embedding[tj.j] AS DOUBLE), 6) AS p
      FROM embeddings, range(1, 65) ti(i), range(1, 65) tj(j)
      WHERE tj.j >= ti.i
    ),
    ps AS (
      SELECT i, j,
             CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             COUNT(*) AS n
      FROM pr GROUP BY i, j
    ),
    ds AS (
      SELECT i,
             CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             COUNT(*) AS n
      FROM embeddings, range(1, 65) t(i)
      GROUP BY i
    )
    SELECT CAST(ps.i AS INT) AS dim_i, CAST(ps.j AS INT) AS dim_j,
           ps.sxy / ps.n - (di.sx / di.n) * (dj.sx / dj.n) AS cov
    FROM ps
    JOIN ds di ON ps.i = di.i
    JOIN ds dj ON ps.j = dj.i
    """,
)
def llm_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — the exact embedding covariance matrix (upper
    triangle, 64·65/2 = 2080 cells): the sufficient statistic behind
    whitening, PCA, and OPQ rotation — the standard preprocessing
    before product quantization (``llm_embed_pca`` consumes it).

    Shape: ONE corpus pass builds, in-array per row, the upper-
    triangle products PLUS a j=0 sentinel entry per dimension
    carrying the raw value — so pair sums Σxᵢxⱼ and dim sums Σxᵢ
    come out of a single explode + groupBy (map-side partials reduce
    each partition to ≤2144 cells; shuffle is dims²-bounded, never
    corpus-bounded). The two broadcast join-backs that assemble
    cov = Σxy/n − (Σx/n)(Σy/n) run on the 2080/64-row AGGREGATES,
    not the corpus (the CLAUDE.md join-back rule: corpus-bounded
    branch-joins are fine; here they are dims-bounded).

    Determinism (the agg_vector_centroid recipe): every summed term
    — raw value or raw product — is a float-derived double rounded
    to 6 dp BEFORE the exact sum, so aggregation order cannot matter;
    the final covariance is one shared IEEE tree over agreed doubles,
    emitted UNROUNDED.

    r15 (guide §4): the relational outer product (2144 interpreted-HOF
    struct allocations per row feeding an explode) is replaced by the
    mapInPandas Gram partial the r9 docstring predicted: one Arrow
    pass ships ONLY the embedding column, each partition accumulates
    Σ round(xᵢxⱼ, 6)·10⁶ as exact int64 micro-units with a vectorized
    NumPy outer product (``_gram_micro_partials`` reproduces Spark's
    double ``round`` bit-for-bit — shortest-repr HALF_UP, with an
    exact-Decimal fallback inside the midpoint band), and the final
    (i, j) aggregate sums integer micros and scales back in decimal —
    the identical decimal value the old decimal(18,6) sum produced,
    hence the identical double cast. Shuffle stays dims²-bounded
    (≤2144 rows per partition partial). Oracle unchanged, hash-green
    at all three SFs."""
    e = load_table(spark, sf_dir, "embeddings")
    parts = e.select("embedding").mapInPandas(
        _gram_micro_partials, "i int, j int, s long, n long"
    )
    sums = (
        parts.groupBy("i", "j")
        .agg(
            # exact scale-back: micros → decimal(20,0) × 0.000001 →
            # decimal(27,6), bit-identical cast to double as the old
            # decimal(28,6) sum of the same value (value-based cast)
            F.expr(
                "cast(cast(sum(s) as decimal(20,0)) * 0.000001 as double)"
            ).alias("s"),
            F.sum("n").alias("n"),
        )
        # r14 (guide §1.2): sums feeds THREE consumers (pairs + the
        # mean_i/mean_j broadcast join-backs); under this build's
        # no-exchange-reuse the corpus pass re-executed 3x. Materialize
        # the ≤2144-row aggregate once. (Cluster-scale note: swap for a
        # reliable checkpoint dir — localCheckpoint is executor-local.)
        .localCheckpoint(eager=True)
    )
    singles = sums.where(F.col("j") == 0).select(
        F.col("i").alias("k"),
        (F.col("s") / F.col("n")).alias("mean"),
    )
    pairs = sums.where(F.col("j") != 0)
    mi = F.broadcast(singles.select(F.col("k"), F.col("mean").alias("mean_i")))
    mj = F.broadcast(
        singles.select(F.col("k").alias("k2"), F.col("mean").alias("mean_j"))
    )
    return (
        pairs.join(mi, pairs["i"] == mi["k"])
        .join(mj, pairs["j"] == mj["k2"])
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            (
                F.col("s") / F.col("n") - F.col("mean_i") * F.col("mean_j")
            ).alias("cov"),
        )
    )


def pca_whitening_model(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> tuple[list[list[float]], list[float]]:
    """Fit a PCA-whitening model from the exact covariance key:
    collect the 2080-cell upper triangle (dims²-bounded control
    plane — the model IS driver state, exactly like the k-means
    codebooks), mirror into the symmetric 64×64 matrix, numpy
    ``eigh``, keep the top-k eigenpairs. Sign-canonicalized (the
    largest-|loading| entry of each eigenvector is made positive,
    first index on ties) so reruns are bit-identical even though
    eigenvectors are only defined up to sign. Returns
    (components[k][64] scaled by 1/√λ — the whitening rows, λ list).
    """
    import numpy as np

    cells = llm_embed_covariance(spark, sf_dir).collect()
    d = max(r["dim_j"] for r in cells)
    cov = np.zeros((d, d))
    for r in cells:
        cov[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
        cov[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, lams = [], []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        # rank-deficient / degenerate corpora (duplicate embeddings,
        # n_rows < k) put a top eigenvalue at ~0, and the 6-dp cell
        # pre-round can push it slightly NEGATIVE — a bare lam**0.5
        # then goes complex and F.lit() downstream crashes (r9 review
        # finding). Floor it: the component's scores are ~0 anyway.
        lam = max(float(vals[idx]), 1e-12)
        comps.append([float(x) / (lam ** 0.5) for x in v])
        lams.append(lam)
    return comps, lams


@query("llm_embed_pca")  # rows-only: eigendecomposition has no SQL twin
def llm_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — PCA-whitening projection: project every
    embedding onto the top-4 whitened principal components (scores
    have ~unit variance and ~zero cross-covariance — the OPQ/
    whitening preprocessing that makes product-quantization cells
    isotropic, and the 2-D/4-D corpus-drift view every embedding
    monitor plots).

    Plan: the model (4×64 whitening matrix) is fit driver-side from
    the exact dims²-bounded covariance key, then applied as LITERAL
    coefficient arrays — the projection is k zip_with dot products
    per row inside whole-stage codegen (the llm_embed_project
    shape): one corpus scan, a broadcast-free narrow map, no UDF.
    Rows-only: eigh is float-iterative with no SQL twin; invariants
    (unit variance, zero cross-covariance, rerun determinism) are
    pytest-pinned instead
    (tests/test_llm.py::test_embed_pca_whitens)."""
    comps, _ = pca_whitening_model(spark, sf_dir, k=4)
    e = load_table(spark, sf_dir, "embeddings")
    cols = []
    for c, comp in enumerate(comps, start=1):
        plane = F.array(*[F.lit(w) for w in comp])
        cols.append(
            F.aggregate(
                F.zip_with(
                    _as_double("embedding"), plane, lambda x, w: x * w
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias(f"pc{c}")
        )
    return e.select("vec_id", "label", *cols)


@query(
    "llm_embed_outliers",
    oracle="""
    WITH cent AS (
      SELECT label, i AS dim,
             CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cval
      FROM embeddings, range(1, 65) t(i)
      GROUP BY label, i
    ),
    carr AS (SELECT label, list(cval ORDER BY dim) AS c FROM cent GROUP BY label),
    d AS (
      SELECT e.vec_id, e.label,
             CAST(list_sum(list_transform(range(1, 65),
               i -> CAST(round((CAST(e.embedding[i] AS DOUBLE) - c[i])
                               * (CAST(e.embedding[i] AS DOUBLE) - c[i]), 6)
                         AS DECIMAL(18,6)))) AS DOUBLE) AS dist2
      FROM embeddings e JOIN carr USING (label)
    )
    SELECT vec_id, label, dist2, dist2 > 1.04 AS is_outlier FROM d
    """,
)
def llm_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r9) — embedding-space outlier screen: squared L2
    distance of every vector to ITS LABEL'S centroid, flagged beyond
    a fixed threshold. The standard mislabeled/noisy-sample detector
    in training-data curation (a vector far from its class prototype
    is either mislabeled, corrupted, or genuinely hard — all worth
    surfacing), composing the agg_vector_centroid statistic into a
    per-row quality signal. Threshold 1.04 ~ the fixture's measured
    p95 (dist2 range 0.89–1.08 — near-random unit vectors), so the
    flag genuinely discriminates the tail.

    Determinism: centroids are the EXACT agg_vector_centroid recipe
    (6-dp pre-round, decimal sum, one IEEE division); each squared
    deviation is a shared IEEE expression over agreed doubles,
    pre-rounded to 6 dp and summed IN-ARRAY with an exact decimal
    accumulator (fixed order, order-independent by exactness — both
    engines fold the same 64-element list); dist2 is emitted
    unrounded and the flag compares it to a short exact literal.

    Scale: one posexplode + labels×dims groupBy builds the centroid
    table (map-side partials), collected per label into a BROADCAST
    array (labels-bounded — the class-prototype table is model
    state, like the k-means codebooks); the screen itself is then a
    broadcast join + one narrow in-array map over the corpus — a
    single scan, no corpus shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode(_as_double("embedding")).alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            (
                F.sum(F.round("val", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cval")
        )
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )
    joined = e.join(F.broadcast(carr), "label")
    dist2 = F.expr(
        "cast(aggregate(zip_with(transform(embedding, x -> cast(x as double)), c,"
        " (x, m) -> cast(round((x - m) * (x - m), 6) as decimal(18,6))),"
        " cast(0 as decimal(32,6)),"
        " (acc, t) -> cast(acc + t as decimal(32,6))) as double)"
    )
    return joined.select(
        "vec_id",
        "label",
        dist2.alias("dist2"),
        (dist2 > 1.04).alias("is_outlier"),
    )


def add_to_graph_index(
    vectors: DataFrame,
    index_dir: str,
    beam_w: int = 8,
    hops: int = 3,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental insert into a persisted graph index (r9) — the
    HNSW insert shape, BATCH-PARALLEL: every new vector runs a beam
    search over the existing graph SIMULTANEOUSLY (one DataFrame of
    (new_id, candidate) beams per hop, joined against the bucketed
    edge table and scored against the broadcast new-vector batch), so
    a batch of inserts costs hops joins, not batch-many sequential
    searches. Each new node is then connected BIDIRECTIONALLY to its
    top-k discovered neighbors — the reverse edges are what make the
    new node reachable from the entry point for future queries (the
    HNSW linking invariant); extra out-edges on existing nodes only
    widen future beams, they never break the k-bound contract of
    fresh builds (readers cap per-node fan-out at beam time).
    Vectors and both edge directions APPEND into the bucketed layout
    (conflict-free dynamic partitions, same as add_to_ivf_index);
    meta (entry, bucketing) is unchanged — the stored entry stays
    valid. No retraining, no corpus rebuild: cost ∝ batch · beam · k.
    Self-recall and full coverage pinned by
    tests/test_llm.py::test_graph_index_incremental_add."""
    spark = vectors.sparkSession
    meta = spark.read.parquet(f"{index_dir}/meta").first()
    n_buckets = int(meta["n_buckets"])
    newv = (
        vectors.select(
            F.col(id_col).alias("nid"), _as_double(vec_col).alias("nvec")
        )
        .localCheckpoint(eager=True)  # batch-bounded; feeds every hop
    )
    idx_vecs = spark.read.parquet(f"{index_dir}/vectors").select(
        F.col(id_col).alias("cand"), F.col("vec").alias("cvec")
    )
    edges = spark.read.parquet(f"{index_dir}/edges").select(
        F.col(id_col).alias("cand"), F.col("nbr")
    )

    def score(cands: DataFrame) -> DataFrame:
        return (
            cands.join(idx_vecs, "cand")
            .join(F.broadcast(newv), "nid")
            .select("nid", "cand", cosine_expr("nvec", "cvec").alias("cos"))
        )

    beam = newv.select("nid", F.lit(int(meta["entry_id"])).alias("cand"))
    scored_all = score(beam).localCheckpoint(eager=True)
    beam = scored_all
    w = Window.partitionBy("nid").orderBy(F.col("cos").desc(), F.col("cand"))
    for _ in range(hops):
        nxt = (
            beam.select("nid", "cand")
            .join(edges, "cand")
            .select("nid", F.col("nbr").alias("cand"))
            .dropDuplicates(["nid", "cand"])
            .join(scored_all.select("nid", "cand"), ["nid", "cand"], "left_anti")
        )
        new_scored = score(nxt).localCheckpoint(eager=True)
        scored_all = scored_all.unionByName(new_scored).localCheckpoint(
            eager=True
        )
        beam = (
            scored_all.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= beam_w)
            .drop("_rn")
        )
    links = (
        scored_all.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    fwd = links.select(
        F.col("nid").alias(id_col), F.col("cand").alias("nbr"), "cos"
    )
    rev = links.select(
        F.col("cand").alias(id_col), F.col("nid").alias("nbr"), "cos"
    )
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket")
    fwd.unionByName(rev).select(id_col, "nbr", "cos", bucket).write.mode(
        "append"
    ).partitionBy("bucket").parquet(f"{index_dir}/edges")
    newv.select(
        F.col("nid").alias(id_col), F.col("nvec").alias("vec")
    ).select(id_col, "vec", bucket).write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{index_dir}/vectors")


def query_graph_index_batch(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    beam_w: int = 12,
    hops: int = 4,
    topk: int = 10,
    exclude_self: bool = False,
    id_col: str = "vec_id",
) -> DataFrame:
    """BATCH beam search against a persisted graph index (r10 — the
    VERDICT r9 weak spot closed: query_graph_index's driver-held beam
    is a single-probe serving coordinator, ≥2 jobs per hop, and
    cannot batch). Here EVERY query in ``queries`` (query_id, qvec)
    walks the graph SIMULTANEOUSLY — the add_to_graph_index insert
    machinery pointed at serving: per hop, one (query, candidate)
    beam DataFrame joins the edge table, anti-joins what each query
    already scored, and scores new candidates against the BROADCAST
    query batch. Job count ∝ hops (fixed), never ∝ N queries; per-hop
    shuffle ∝ N·beam·k rows. The "pair every doc with its neighbors"
    pipeline shape on the graph index, complementing
    llm_sim_topk_batch's IVF route.

    Beam dynamics are IDENTICAL to the single-probe path (same entry,
    same per-query top-beam_w by (cos desc, id), same hop budget), so
    for one query the two return the same rows — pinned in
    tests/test_llm.py. ``exclude_self`` drops candidate == query_id
    (for re-pairing already-indexed vectors). Returns (query_id,
    rank, vec_id, cos_sim), total-ordered."""
    meta = spark.read.parquet(f"{index_dir}/meta").first()
    qv = (
        queries.select(
            F.col(queries.columns[0]).alias("qid"),
            _as_double(queries.columns[1]).alias("qvec"),
        )
        .localCheckpoint(eager=True)  # batch-bounded; feeds every hop
    )
    idx_vecs = spark.read.parquet(f"{index_dir}/vectors").select(
        F.col(id_col).alias("cand"), F.col("vec").alias("cvec")
    )
    edges = spark.read.parquet(f"{index_dir}/edges").select(
        F.col(id_col).alias("cand"), F.col("nbr")
    )

    def score(cands: DataFrame) -> DataFrame:
        return (
            cands.join(idx_vecs, "cand")
            .join(F.broadcast(qv), "qid")
            .select("qid", "cand", cosine_expr("qvec", "cvec").alias("cos"))
        )

    entry = int(meta["entry_id"])
    if exclude_self:
        # a query whose id IS the entry point needs a fallback seed —
        # the lowest other indexed id, mirroring query_graph_index's
        # excluded-entry fallback so single-query parity holds
        fallback = (
            spark.read.parquet(f"{index_dir}/vectors")
            .where(F.col(id_col) != entry)
            .agg(F.min(id_col).alias("m"))
            .first()["m"]
        )
        if fallback is None:
            # index holds ONLY the entry vector: a NULL seed would
            # silently return zero results for the entry query
            # (ADVICE r10) — make the unservable case explicit.
            raise ValueError(
                "graph index contains no non-entry vector to seed "
                "excluded-entry queries from"
            )
        seed = F.when(F.col("qid") == entry, F.lit(fallback)).otherwise(
            F.lit(entry)
        )
    else:
        seed = F.lit(entry)
    beam = qv.select("qid", seed.alias("cand"))
    scored_all = score(beam).localCheckpoint(eager=True)
    beam = scored_all
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cand"))
    for _ in range(hops):
        nxt = (
            beam.select("qid", "cand")
            .join(edges, "cand")
            .select("qid", F.col("nbr").alias("cand"))
            .dropDuplicates(["qid", "cand"])
            .join(scored_all.select("qid", "cand"), ["qid", "cand"], "left_anti")
        )
        if exclude_self:
            nxt = nxt.where(F.col("cand") != F.col("qid"))
        new_scored = score(nxt).localCheckpoint(eager=True)
        scored_all = scored_all.unionByName(new_scored).localCheckpoint(
            eager=True
        )
        beam = (
            scored_all.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= beam_w)
            .drop("_rn")
        )
    return (
        scored_all.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("cand").alias(id_col),
            F.col("cos").alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


def compact_graph_index(
    spark: SparkSession,
    index_dir: str,
    k: int | None = None,
    id_col: str = "vec_id",
) -> dict:
    """Periodic re-link compaction for the graph index (r9 roadmap
    item): repeated ``add_to_graph_index`` batches accrete duplicate
    edge rows and unbounded reverse fan-out on popular nodes — the
    read path tolerates extras (beams cap fan-out at probe time),
    but every probe of a hot node drags the whole accumulated edge
    list through the scan. Compaction restores the fresh-build
    contract: distinct edges, per-node out-degree pruned back to the
    top-k by score — PLUS a reachability keep-alive: any node whose
    every incoming edge the prune would drop keeps its single best
    incoming edge (the HNSW linking invariant that makes inserted
    nodes findable; without it, pruning a hub's reverse edges can
    orphan an entire insert batch).

    Scale shape: one dedupe groupBy and two bounded windows — the
    out-prune partitions by source (per-node edge lists, k + inserts
    bounded) and the keep-alive by target (same bound); both are the
    bounded-partition windows the house rules allow. The rewrite
    stages into ``edges_compact_stage`` and swaps with the
    compact_posting_stats crash-recoverable rename dance (live dir
    renamed ASIDE before the stage moves in; both crash windows —
    mid-rename and pre-delete — are swept by the NEXT call).
    Vectors and meta are untouched. Returns before/after edge and
    file counts.

    Serving trade (measured on the fixture, and exactly DiskANN's
    L≫k rule): compaction swaps edge VOLUME for query-time beam
    WIDTH. Pre-compaction an inserted node carries k reverse edges
    and a beam_w=12/hops=4 probe finds it from any direction;
    post-compaction it may keep only the keep-alive in-link, and the
    same probe can converge elsewhere — widening to beam_w≈3k,
    hops≈6 restored self-recall of every inserted node on the
    fixture. Compact when probe cost on hot nodes dominates; keep
    the wider beam after."""
    import os
    import shutil

    path = f"{index_dir}/edges"
    old = f"{path}_compact_old"
    staged = f"{path}_compact_stage"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crash landed between the two renames
    if os.path.exists(old):  # leftover from a prior crash
        shutil.rmtree(old)

    edges = spark.read.parquet(path)
    meta = spark.read.parquet(f"{index_dir}/meta").first()  # one read
    if k is None:
        k = int(meta["k"])
    out = {"edges_before": edges.count(),
           "files_before": len(edges.inputFiles())}

    distinct = (
        edges.groupBy(id_col, "nbr")
        .agg(F.max("cos").alias("cos"))  # dup rows carry identical cos
        .localCheckpoint(eager=True)  # feeds the prune AND the keep-alive
    )
    w_out = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("nbr"))
    pruned = (
        distinct.withColumn("_rn", F.row_number().over(w_out))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .localCheckpoint(eager=True)  # feeds the anti-join AND the union
    )
    # keep-alive: EVERY node keeps its single best incoming edge,
    # unconditionally (≤ n extra rows). Orphan-only preservation is
    # not enough for navigability: greedy search for a query near
    # node x converges to x's most-similar indexed node s, and if
    # s's pruned top-k dropped the s→x edge (x outside s's k nearest
    # even when s is x's nearest — kNN is asymmetric), x becomes
    # unfindable despite still being SOME node's target. Keeping
    # argmax-cos incoming edges pins exactly the s→x link the walk
    # needs (measured: self-recall of inserted nodes failed under
    # orphan-only keep-alive on the first version of this function).
    w_in = Window.partitionBy("nbr").orderBy(F.col("cos").desc(), F.col(id_col))
    keep_alive = (
        distinct.withColumn("_rn", F.row_number().over(w_in))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_buckets = int(meta["n_buckets"])
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket")
    final = (
        pruned.unionByName(keep_alive)
        .dropDuplicates([id_col, "nbr"])
        .select(id_col, "nbr", "cos", bucket)
    )
    final.write.mode("overwrite").partitionBy("bucket").parquet(staged)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    after = spark.read.parquet(path)
    out["edges_after"] = after.count()
    out["files_after"] = len(after.inputFiles())
    return out


@query(
    "llm_cluster_silhouette",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (SELECT vec_id AS sid, v AS svec FROM e WHERE vec_id < 8),
    da AS (
      SELECT e.vec_id, e.v, s.sid,
             list_aggregate(list_transform(list_zip(e.v, s.svec),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS d2
      FROM e, seeds s
    ),
    asg AS (
      SELECT vec_id, v, sid AS cluster
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY d2, sid) AS rn
            FROM da)
      WHERE rn = 1
    ),
    comp AS (
      SELECT cluster, g.d AS d, round(v[g.d + 1], 6) AS x
      FROM asg, generate_series(0, 63) AS g(d)
    ),
    cent AS (
      SELECT cluster, d,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
      FROM comp GROUP BY 1, 2
    ),
    cvecs AS (
      SELECT cluster AS cid, list(c ORDER BY d) AS cvec FROM cent GROUP BY 1
    ),
    dists AS (
      SELECT a.vec_id, a.cluster, cv.cid,
             sqrt(list_aggregate(list_transform(list_zip(a.v, cv.cvec),
                  p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')) AS dist
      FROM asg a, cvecs cv
    ),
    ab AS (
      SELECT vec_id, cluster,
             MAX(CASE WHEN cid = cluster THEN dist END) AS a,
             MIN(CASE WHEN cid <> cluster THEN dist END) AS b
      FROM dists GROUP BY 1, 2
    ),
    s AS (
      SELECT cluster,
             CASE WHEN greatest(a, b) > 0
                  THEN (b - a) / greatest(a, b) ELSE 0.0 END AS sil
      FROM ab
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(round(sil, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS silhouette
    FROM s GROUP BY 1
    """,
)
def llm_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (r13) — centroid-form SILHOUETTE per cluster: the
    is-this-clustering-any-good score for the engine's vector
    quantizers (the IVF/SemDedup coarse clusters are exactly this
    shape). Assignment is content-derived and SQL-expressible —
    nearest of the eight seed vectors vec_id < 8, (distance, sid)
    tie-break — so the whole key is oracled end to end, unlike the
    rows-only learned-kmeans keys whose quality this measures by
    proxy. Per vector: a = ‖x − own centroid‖, b = min other-centroid
    distance, s = (b − a)/max(a, b); emitted as per-cluster means.

    Determinism: components pre-round to 6 dp before the per-dim
    decimal centroid mean (the agg_vector_centroid recipe — float32
    granularity keeps 6-dp rounds far from midpoints, unlike scale-9
    casts); every distance is the strict left-to-right l2sq fold
    (bit-identical to DuckDB's list_aggregate); per-vector s rounds
    to 6 dp (sqrt-quotient digits are effectively random — the safe
    class) into an order-free decimal mean.

    Scale: assignment is an in-row fold over a BROADCAST 1-row seed
    array (no shuffle); centroids are one explode + (cluster, dim)
    aggregate; the scoring join-back broadcasts k centroid vectors —
    the documented corpus-bounded join-back shape (k ≪ corpus; the
    no-exchange-reuse quirk re-runs the scan, which is the cheaper
    trade here)."""
    e = load_table(spark, sf_dir, "embeddings")
    seeds = (
        e.where(F.col("vec_id") < 8)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("sid"),
                        _as_double("embedding").alias("svec"),
                    )
                )
            ).alias("seeds")
        )
    )
    best = F.array_min(
        F.transform(
            F.col("seeds"),
            lambda s: F.struct(
                l2sq_expr(_as_double("embedding"), s.getField("svec")).alias("d2"),
                s.getField("sid").alias("sid"),
            ),
        )
    )
    assigned = (
        e.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            _as_double("embedding").alias("v"),
            best.getField("sid").alias("cluster"),
        )
    )
    comp = assigned.select(
        "cluster", F.posexplode("v").alias("d", "x")
    ).select("cluster", "d", F.round("x", 6).alias("x"))
    cent = comp.groupBy("cluster", "d").agg(
        (
            F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cvecs = (
        cent.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("pairs"))
        .select(
            F.col("cluster").alias("cid"),
            F.expr("transform(pairs, p -> p.c)").alias("cvec"),
        )
    )
    cents_row = cvecs.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
    )
    dists = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.sqrt(l2sq_expr(F.col("v"), c.getField("cvec"))).alias("dist"),
            c.getField("cid").alias("cid"),
        ),
    )
    a_dist = F.element_at(
        F.filter(dists, lambda x: x.getField("cid") == F.col("cluster")), 1
    ).getField("dist")
    b_dist = F.array_min(
        F.filter(dists, lambda x: x.getField("cid") != F.col("cluster"))
    ).getField("dist")
    sil = F.when(
        F.greatest(a_dist, b_dist) > 0,
        (b_dist - a_dist) / F.greatest(a_dist, b_dist),
    ).otherwise(F.lit(0.0))
    scored = assigned.crossJoin(F.broadcast(cents_row)).select(
        "cluster", F.round(sil, 6).alias("sil")
    )
    return scored.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            F.sum(F.col("sil").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("silhouette"),
    )
