#!/usr/bin/env python
"""Perf probe for the DuckDB-anchored bench shapes: time each under AQE
on/off in one JVM (AQE is a dynamic conf), min-of-5, bench conditions
(cache on, shuffle=8)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_CACHE"] = "1"

from pei_nwdaf_data_ingestion_spark import catalog, registry
from pei_nwdaf_data_ingestion_spark.session import get_spark

registry.load_all()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_anchored", shuffle_partitions=8)
for t in catalog.TABLES:
    catalog.load(spark, SF, t).count()

SHAPES = [
    "agg_groupby_hash",
    "join_multiway",
    "win_rank_topk",
    "json_extract",
    "win_tumbling_1h",
    "explode_unnest",
    "agg_distinct",
    "join_anti",
    "topk_orderby_limit",
]


def clock(name: str, runs: int = 5) -> float:
    fn = registry.QUERIES[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


for aqe in ("true", "false"):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    tot = 0.0
    print(f"--- AQE={aqe}")
    for s in SHAPES:
        t = clock(s)
        tot += t
        print(f"{s:22s} {t:.3f}s", flush=True)
    print(f"{'TOTAL':22s} {tot:.3f}s")

spark.stop()
