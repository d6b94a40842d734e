#!/usr/bin/env python
"""One-off perf probe for the dedup_ppjoin_prefix bench regression (r5
verdict item 1): time the query under cache-layout x shuffle-partition
variants in ONE JVM, min-of-3 each, mirroring bench.py conditions."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE", "0")

from pei_nwdaf_data_ingestion_spark import catalog, registry
from pei_nwdaf_data_ingestion_spark.session import get_spark

registry.load_all()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe", shuffle_partitions=8)
fn = registry.QUERIES["dedup_ppjoin_prefix"]

for t in catalog.TABLES:
    catalog.load(spark, SF, t).count()


def clock(label: str, runs: int = 3) -> None:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s", flush=True)


def set_cache(mode: str, nparts: int) -> None:
    """mode: off | coalesce1 | repart"""
    for df in catalog._CACHE.values():
        df.unpersist(blocking=True)
    catalog._CACHE.clear()
    if mode == "off":
        os.environ["SPARK_GRAFT_CACHE"] = "0"
        return
    os.environ["SPARK_GRAFT_CACHE"] = "1"
    for t in catalog.TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        key = (spark.sparkContext.applicationId, path)
        df = catalog._read(spark, path, t)
        if mode == "coalesce1":
            n = min(
                spark.sparkContext.defaultParallelism,
                max(1, os.path.getsize(path) >> 20),
            )
            df = df.repartition(n) if n > 1 else df.coalesce(1)
        else:
            df = df.repartition(nparts)
        catalog._CACHE[key] = df.cache()
        catalog._CACHE[key].count()


for shuf in (8, 32):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuf))
    set_cache("off", 0)
    clock(f"cache=off       shuffle={shuf}")
    set_cache("coalesce1", 0)
    clock(f"cache=coalesce1 shuffle={shuf}")
    set_cache("repart", 32)
    clock(f"cache=repart32  shuffle={shuf}")
    set_cache("repart", 8)
    clock(f"cache=repart8   shuffle={shuf}")

spark.stop()
