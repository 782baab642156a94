"""Parameter sweep: time representative queries across runtime knobs
(shuffle partitions, broadcast threshold) and print one JSON line per
configuration — the measurement harness behind partition/broadcast
choices (ROADMAP item 6).

Local numbers are overhead-dominated; the harness matters because the
same sweep on a real cluster finds the knee points. Usage:

    python tools/sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_airflow_spark.registry import all_queries  # noqa: E402
from osm_airflow_spark.session import get_spark  # noqa: E402

PROBES = ["flagship_revenue_by_region", "agg_collect_ordered", "win_dedup_latest", "join_asof"]
SHUFFLE_PARTITIONS = [8, 32, 128]
BROADCAST = [("on", str(10 * 1024 * 1024)), ("off", "-1")]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sweep")
    queries = {k: all_queries()[k] for k in PROBES}
    next(iter(queries.values()))(spark, sf_dir).count()  # warm

    for parts in SHUFFLE_PARTITIONS:
        for bc_name, bc_val in BROADCAST:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc_val)
            timings = {}
            for key, fn in queries.items():
                t0 = time.time()
                fn(spark, sf_dir).count()
                timings[key] = round(time.time() - t0, 3)
            print(
                json.dumps(
                    {
                        "shuffle_partitions": parts,
                        "broadcast": bc_name,
                        "total_sec": round(sum(timings.values()), 3),
                        "queries": timings,
                    }
                )
            )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
