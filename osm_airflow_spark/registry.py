"""Query-key registry: binds each operator to its DuckDB oracle.

Every operator from SURVEY.md §2 registers here exactly once, with
its Spark callable and (unless rows-only) the equivalent ANSI SQL
DuckDB runs on the same parquet tables. ``__spark_entry__.py`` simply
re-exports these dicts, so a query and its oracle can never drift
apart in separate files.

Determinism contract (SURVEY.md §7.3): every registered query must
produce bit-identical values regardless of partitioning. Helpers
below make double aggregation order-independent by summing in
decimal and casting back — see ``dsum``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a session built with defaults;
            # every conf here is runtime-settable and required either
            # for oracle comparability (UTC — DuckDB timestamps are
            # UTC-naive) or for sane local performance (200 default
            # shuffle partitions over-parallelizes these inputs).
            from osm_airflow_spark.session import configure_runtime

            configure_runtime(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Determinism helpers (engine side). Oracle side uses the same shapes in SQL.
# ---------------------------------------------------------------------------

def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column.

    Per-row cast to decimal is deterministic (binary doubles never
    tie at a half-ulp of a decimal, so rounding mode is moot);
    decimal addition is exact, so partial/final aggregation order —
    which varies with partitioning — cannot change the result. The
    final cast back to double is a single deterministic conversion.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum → double, then one
    IEEE division. (Dividing while still decimal is a trap: Spark and
    DuckDB assign different result scales to decimal division.)"""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    ).alias("avg")


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"


def import_all_operators() -> None:
    """Import every module that registers query keys (idempotent)."""
    from osm_airflow_spark.operators import (  # noqa: F401
        aggregates,
        graph,
        joins,
        projection,
        setops,
        timewindows,
        windows,
    )
    from osm_airflow_spark.functions import scalar, geo  # noqa: F401
    from osm_airflow_spark.llm import dedup, multimodal, similarity, text, udfs  # noqa: F401
    from osm_airflow_spark import sources  # noqa: F401
    from osm_airflow_spark.plans import analytics, flagship, osm_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    import_all_operators()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import_all_operators()
    return dict(ORACLES)
