"""Local driver-mimic: run each registered query on Spark AND its
oracle SQL on DuckDB at sf0.01, compare row count, column names, and
order-insensitive canonical values. Exact string canonicalization —
we target bit-identical results, not tolerances.

Usage:
    python tools/check.py [key ...]      # default: all registered keys
    SF_DIR=/root/testdata/sf0.001 python tools/check.py
    python tools/check.py --matrix [key ...]   # same keys at sf0.001,
                                               # sf0.01 AND sf0.1 in one
                                               # process — the standing
                                               # boundary-value sweep
                                               # (sf0.1 finds double→
                                               # decimal rounding drift
                                               # sf0.01 cannot)
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.io import TABLES  # noqa: E402
from osm_airflow_spark.registry import all_oracles, all_queries  # noqa: E402
from osm_airflow_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) or isinstance(v, (np.floating,)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f.is_integer():
            # Render 7.0 distinctly from int 7: the external driver's
            # canonicalizer distinguishes them, and collapsing both to
            # "7" is exactly how five HUGEINT-as-float64 oracle bugs
            # shipped green in round 5 (VERDICT r5).
            return f"{f:.1f}"
        return f"{f:.17g}"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def complex_columns(df) -> list[str]:
    """Oracled queries must emit only scalar top-level columns: the
    external driver's canonicalizer (pandas sort_values → factorize)
    crashes on array/map/struct/binary cells (numpy.ndarray is
    unhashable), which in round 1 aborted the whole sweep. Serialize
    collections with array_join/to_json in the final projection."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType))
    ]


def canon(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False))
    return cols, rows


def main(keys: list[str], sf_dir: str = SF_DIR) -> int:
    queries = all_queries()
    oracles = all_oracles()
    targets = keys or sorted(queries)

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for key in targets:
        if key not in queries:
            print(f"✗ {key}: NOT REGISTERED")
            failures.append(key)
            continue
        t0 = time.time()
        try:
            sdf_spark = queries[key](spark, sf_dir)
            if key in oracles:
                hazard = complex_columns(sdf_spark)
                if hazard:
                    print(f"✗ {key}: DRIVER-HAZARD SCHEMA (complex top-level cols): {hazard}")
                    failures.append(key)
                    continue
            sdf = sdf_spark.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {key}: SPARK ERROR: {type(e).__name__}: {e}")
            failures.append(key)
            continue
        if key not in oracles:
            print(f"~ {key}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[key]).df()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {key}: ORACLE ERROR: {type(e).__name__}: {e}")
            failures.append(key)
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            print(f"✗ {key}: SCHEMA spark={scols} oracle={ocols}")
            failures.append(key)
            continue
        # Numeric-kind drift (int column on one side, float on the other)
        # hash-fails at the external driver even when every value is
        # integral — e.g. DuckDB SUM(int)→HUGEINT→float64. Catch it by
        # dtype, not just by value rendering, so all-NULL columns and
        # empty results can't hide it.
        kind_drift = [
            c
            for c in scols
            if {sdf[c].dtype.kind, odf[c].dtype.kind} == {"i", "f"}
        ]
        if kind_drift:
            print(
                f"✗ {key}: DTYPE int-vs-float drift on {kind_drift} "
                f"(spark={[str(sdf[c].dtype) for c in kind_drift]}, "
                f"oracle={[str(odf[c].dtype) for c in kind_drift]}) — "
                f"CAST the oracle aggregate (AS BIGINT/DOUBLE) to match"
            )
            failures.append(key)
            continue
        if len(srows) != len(orows):
            print(f"✗ {key}: ROWS spark={len(srows)} oracle={len(orows)}")
            failures.append(key)
            continue
        if srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"✗ {key}: VALUES differ at sorted row {diff}:")
            print(f"    spark : {srows[diff]}")
            print(f"    oracle: {orows[diff]}")
            failures.append(key)
            continue
        print(f"✓ {key} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(targets)-len(failures)}/{len(targets)} passed")
    return 1 if failures else 0


def matrix(keys: list[str]) -> int:
    """One process, all three fixture SFs: the standing determinism
    sweep (ROADMAP round-5 item 2). sf0.001 exercises empty/degenerate
    groups, sf0.1 exercises rounding boundary values the mid fixture
    never hits; one shared JVM keeps it ~3x the single-SF cost, not
    3 JVM warmups."""
    rc = 0
    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        print(f"=== {sf_dir} ===")
        rc |= main(keys, sf_dir)
    return rc


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--matrix":
        raise SystemExit(matrix(argv[1:]))
    raise SystemExit(main(argv))
