#!/usr/bin/env python
"""Capture `.explain("formatted")` output for the named queries into
plans/<tag>/<id>_<suffix>.txt (round-15 optimization evidence: the judge
checks plan claims against these files without running Spark).

Usage: python tools/capture_plans.py <tag> <suffix> <query-id>...
       e.g. python tools/capture_plans.py r15 before dedup_ppjoin_prefix

Plans are captured at $PLAN_SF_DIR (default sf0.1) under the bench's AQE
posture (off unless the id is in bench.AQE_ON) so the captured shape is
the one the bench actually times.  NOTE: frames materialized through
localCheckpoint print as `Scan ExistingRDD` - for those ids the builder
helpers (the `_*_plan` split pattern) are the plan-pin surface; the
capture still records the executed top-level shape.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pei_nwdaf_data_ingestion_spark import registry
from pei_nwdaf_data_ingestion_spark.session import get_spark

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit("usage: capture_plans.py <tag> <suffix> <query-id>...")
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    registry.load_all()
    import bench

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        spark.conf.set(
            "spark.sql.adaptive.enabled",
            "true" if name in bench.AQE_ON else "false",
        )
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
