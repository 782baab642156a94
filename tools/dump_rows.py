"""Dump order-insensitive canonical rows for named keys to a JSON
file — the A/B row-identity harness for rows-only keys (which the
oracle gate only row-counts). Run once at a baseline commit and once
on the working tree; identical files prove the restructure changed
the physical plan, not the result.

Usage:
    SF_DIR=... python tools/dump_rows.py out.json key [key ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import SF_DIR, _cell  # noqa: E402

from osm_airflow_spark.registry import all_queries  # noqa: E402
from osm_airflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, keys = sys.argv[1], sys.argv[2:]
    spark = get_spark()
    queries = all_queries()
    out: dict[str, dict] = {}
    for key in keys:
        df = queries[key](spark, SF_DIR)
        rows = [[_cell(v) for v in row] for row in df.collect()]
        rows.sort()
        out[key] = {"schema": df.columns, "n": len(rows), "rows": rows}
        print(f"{key}: {len(rows)} rows", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, sort_keys=True)


if __name__ == "__main__":
    main()
