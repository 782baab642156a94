"""Measure the item-CF mega-popular-item hazard and its two guards
(VERDICT r11 #3 — "build it, don't just cite it").

Plants ONE hot item into EVERY order basket of sf0.1 lineitem (the
bot-SKU / default-bundle shape: a single item whose frequency equals
the basket count) and measures, for each policy:

  exact    pipeline_item_cf's pair generation, unguarded
  cap16    item_cf_capped(basket_cap=16): oversized baskets keep 16
           content-hash-sampled items
  dimsum8  item_cf_capped(dimsum_gamma=8): pairs sampled w.p.
           min(1, 8/sqrt(n_a*n_b)), Horvitz-Thompson re-weighted

Recorded per policy: emitted pair-stream rows (the work the guard
exists to bound — counted on the ACTUAL weighted stream via
item_cf_pair_stream, not estimated), hot-item share of that stream,
wall time of the full top-5 query, and result quality = mean top-5
neighbor overlap vs the exact answer over non-hot items (the hot
item's own list is the one the guards deliberately perturb).

Merges an "item_cf_hot" section into SKEWBENCH.json (preserving the
join-skew sections) and prints a markdown table for SCALE.md.

Usage: python tools/itemcf_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from osm_airflow_spark.io import load_table
    from osm_airflow_spark.plans.analytics import (
        item_cf_capped,
        item_cf_pair_stream,
    )
    from osm_airflow_spark.session import get_spark

    spark = get_spark()
    HOT = -1
    li = load_table(spark, SF_DIR, "lineitem")
    bi = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    hot = bi.select("ok").distinct().withColumn("pk", F.lit(HOT))
    bih = bi.unionByName(hot).localCheckpoint(eager=True)  # freeze the plant
    n_baskets = bih.select("ok").distinct().count()

    # gamma choice is THE DIMSUM knob: it must sit ABOVE the normal
    # pair scale sqrt(n_a*n_b) so only mega-popular pairs sample
    # below p=1 — gamma=8 (below the fixture's typical sqrt(30*30))
    # thins everything and scrambles sparse top-5 lists; gamma=50
    # leaves normal pairs exact and still thins the planted hot item
    # ~40x (p = 50/sqrt(150k*30) ~ 0.024).
    policies = {
        "exact": {},
        "cap16": {"basket_cap": 16},
        "dimsum8": {"dimsum_gamma": 8.0},
        "dimsum50": {"dimsum_gamma": 50.0},
    }
    results: dict[str, dict] = {}
    exact_topk: dict[int, set] = {}
    for name, kw in policies.items():
        stream = item_cf_pair_stream(bih, **kw)
        vol = stream.groupBy(F.col("item_a") == HOT).count().collect()
        hot_rows = sum(r["count"] for r in vol if r[0])
        all_rows = sum(r["count"] for r in vol)
        t0 = time.monotonic()
        rows = item_cf_capped(bih, **kw).collect()
        wall = time.monotonic() - t0
        topk: dict[int, set] = {}
        for r in rows:
            topk.setdefault(r["item_a"], set()).add(r["item_b"])
        if name == "exact":
            exact_topk = topk
            overlap = 1.0
        else:
            common = [
                len(topk.get(i, set()) & nb) / len(nb)
                for i, nb in exact_topk.items()
                if i != HOT and nb
            ]
            overlap = sum(common) / len(common)
        results[name] = {
            "pair_rows": all_rows,
            "hot_pair_rows": hot_rows,
            "hot_share": round(hot_rows / all_rows, 4),
            "wall_s": round(wall, 2),
            "items_with_neighbors": len(topk),
            "mean_top5_overlap_vs_exact": round(overlap, 4),
        }
        print(name, results[name], flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SKEWBENCH.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc["item_cf_hot"] = {
        **results,
        "_meta": {
            "sf_dir": SF_DIR,
            "n_baskets": n_baskets,
            "hot_item": "planted in every basket",
        },
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")

    print("\n| policy | pair rows | hot share | wall s | top5 overlap |")
    print("| --- | --- | --- | --- | --- |")
    for name, r in results.items():
        print(
            f"| {name} | {r['pair_rows']:,} | {r['hot_share']:.2%} "
            f"| {r['wall_s']} | {r['mean_top5_overlap_vs_exact']:.3f} |"
        )


if __name__ == "__main__":
    main()
