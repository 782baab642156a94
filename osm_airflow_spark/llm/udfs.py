"""UDF / UDAF / UDTF surface (SURVEY.md §2.J).

The engine's analogue of the reference's Lua flex hooks — arbitrary
user transforms plugged into the pipeline
(/root/reference/README.md:74,93). The performance ladder, enforced
by example here:

1. built-in column expressions (everything in functions/ — the 99%);
2. Arrow-vectorized pandas UDFs (J2/J4) when genuinely custom —
   ~10-100× faster than row UDFs, batch-at-a-time over Arrow;
3. row-at-a-time Python UDFs (J1) — last resort, kept for surface
   completeness; per-row pickle serde makes them the slow path at
   any scale;
4. grouped-map ``applyInPandas`` (J3) for per-group model-ish logic —
   one shuffle by group key, each group must fit in executor memory
   (salt or pre-aggregate million-row groups at 100 TB).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@F.udf(T.StringType())
def _price_band_udf(total: float) -> str:
    if total is None:
        return "unknown"
    if total >= 300000:
        return "large"
    if total >= 100000:
        return "medium"
    return "small"


@query(
    "udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS price_band
    FROM orders
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — row-at-a-time Python UDF (flex-hook analogue). The oracle
    states the same logic in SQL; in production this exact transform
    belongs in fn_conditional's built-in form."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _price_band_udf("o_totalprice").alias("price_band"))


@F.pandas_udf(T.DoubleType())
def _net_price_pandas(price: pd.Series, discount: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; same IEEE ops as the SQL twin
    return price * (1.0 - discount)


@query(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — Arrow-vectorized pandas UDF (series → series). Numpy
    performs the identical per-element IEEE arithmetic, so values
    hash-match the SQL oracle exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price_pandas("l_extendedprice", "l_discount").alias("net_price"),
    )


def _demean(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["value_demeaned"] = pdf["value"] - pdf["value"].mean()
    return pdf[["user_id", "event_id", "value", "value_demeaned"]]


@query("udf_grouped_map")  # rows-only: float mean order is impl-defined
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — grouped-map applyInPandas: per-group DataFrame→DataFrame
    (per-region normalization shape). pandas' pairwise float mean is
    summation-order-dependent → declared rows-only."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _demean, "user_id long, event_id long, value double, value_demeaned double"
    )


@F.pandas_udf(T.DoubleType())
def _mean_qty(qty: pd.Series) -> float:
    # l_quantity is integer-valued; float64 integer sums < 2^53 are
    # exact under any summation order → oracle-safe mean
    return float(qty.sum() / len(qty))


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity) / COUNT(l_quantity) AS mean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — custom aggregate as a grouped-agg pandas UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(_mean_qty("l_quantity").alias("mean_qty"))


def _l2_norm_arrow(batches):
    """Arrow-native batch transform: per-vector L2 norm. The dot
    product is accumulated SEQUENTIALLY in float64 (a Python loop,
    not numpy pairwise summation) so the result is bit-identical to
    the oracle's left-to-right list_aggregate sum — parity-grade, not
    throughput-grade; swap the loop for np.einsum when exactness can
    relax."""
    import math

    import pyarrow as pa

    for batch in batches:
        vec_ids = batch.column("vec_id").to_pylist()
        embeddings = batch.column("embedding").to_pylist()
        norms = []
        for vec in embeddings:
            acc = 0.0
            for x in vec:
                acc += float(x) * float(x)
            norms.append(math.sqrt(acc))
        yield pa.RecordBatch.from_arrays(
            [pa.array(vec_ids, pa.int64()), pa.array(norms, pa.float64())],
            names=["vec_id", "l2_norm"],
        )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x), 'sum')) AS l2_norm
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (extension) — mapInArrow: the zero-copy Arrow batch API,
    the lowest-overhead Python hook (no pandas conversion on either
    side). Demonstrated as per-vector L2 norm with an exact SQL
    oracle; at scale this is where a C-backed kernel (tokenizer,
    codec) plugs in, consuming Arrow buffers directly."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "embedding").mapInArrow(
        _l2_norm_arrow, "vec_id long, l2_norm double"
    )


@F.udtf(returnType="pos int, gram string")
class _NgramUDTF:
    """Python UDTF: one input row -> (position, n-gram) rows. The
    TABLE-function shape of the flex hook: a user transform whose
    output cardinality the engine cannot know in advance."""

    def eval(self, text: str, n: int):
        if not text:
            return
        ws = text.split(" ")
        for i in range(len(ws) - n + 1):
            yield i, " ".join(ws[i : i + n])


@query(
    "udf_table",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS INT) AS pos,
           string_split(text, ' ')[i] || ' '
             || string_split(text, ' ')[i+1] || ' '
             || string_split(text, ' ')[i+2] AS gram
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1,
                    len(string_split(text, ' ')) - 2)) AS i
      FROM documents
    )
    """,
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 (extension) — Python UDTF via DataFrame ``lateralJoin``
    (Spark 4): the table-function rung of the UDF ladder, completing
    the module's J surface (scalar → pandas → grouped → Arrow →
    TABLE-valued). One document row fans out to its positioned
    trigrams; the outer column reference (``col("text").outer()``)
    is the LATERAL correlation, so the planner runs the generator
    per row with no join key and no shuffle.

    Like J1 this is a deliberate API-surface key: the plan carries a
    BatchEvalPythonUDTF (pickle-per-batch, Python-side row
    generation — whitelisted in tools/plan_lint.py beside J1's
    BatchEvalPython), and the PRODUCTION form of this exact
    transform is the JVM-side shingle explode the dedup/LM stack
    uses (llm/dedup.shingle_array + explode — whole-stage codegen,
    no Python). String slicing only, so the oracle is exact."""
    d = load_table(spark, sf_dir, "documents")
    return d.lateralJoin(
        _NgramUDTF(F.col("text").outer(), F.lit(3))
    ).select("doc_id", "pos", "gram")
