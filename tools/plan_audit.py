#!/usr/bin/env python
"""Plan-audit sweep over EVERY registered query (r14 lesson, made a
tool for the r15 optimization round): build each query's DataFrame at a
small scale factor with AQE off and grep the formatted physical plan for
scale-killers and Python-boundary surprises.

Flags per query:
  - CartesianProduct (accidental all-pairs; BroadcastNestedLoopJoin is
    reported informationally - the repo's deliberate 1-row broadcast
    cross joins plan as BNLJ with a bounded build side)
  - BatchEvalPython (row-at-a-time Python UDF - none expected outside
    the declared mapInPandas decode surface)
  - ArrowEvalPython / MapInPandas / MapInArrow counts (the Python budget
    - expected only on the multimodal decode surface)
  - Exchange count (shuffle budget per operator)

Prints one line per query and a summary; exit 1 if a NEW Cartesian or
BatchEvalPython shows up outside the allowlist below.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pei_nwdaf_data_ingestion_spark import registry
from pei_nwdaf_data_ingestion_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# Cartesian products that are DELIBERATE (tiny bounded frames - e.g. a
# 1-row broadcast total crossed onto a report) get allowlisted here only
# after manual review of the plan.
CARTESIAN_ALLOW: set[str] = set()
BATCH_EVAL_ALLOW: set[str] = set()


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="plan-audit", shuffle_partitions=4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    bad: list[str] = []
    rows: list[tuple[str, int, int, int, int, int]] = []
    for name, fn in sorted(registry.QUERIES.items()):
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - audit must sweep on
            print(f"{name}: BUILD ERROR {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}")
            bad.append(name)
            continue
        # plain substring counts: each physical node appears once in the
        # numbered tree and once as a detail header, so //2 = node count
        # (join nodes print their args between name and id, so a
        # name-paren pattern would never match)
        cart = plan.count("CartesianProduct") // 2
        bnlj = plan.count("BroadcastNestedLoopJoin") // 2
        bep = plan.count("BatchEvalPython") // 2
        aep = plan.count("ArrowEvalPython") // 2
        mip = (plan.count("MapInPandas") + plan.count("MapInArrow")) // 2
        # shuffle exchanges only (ADVICE r15 item 4): "Exchange (" also
        # substring-matches BroadcastExchange/ReusedExchange detail
        # headers, which conflated shuffle, broadcast and reused nodes in
        # the informational budget column
        exch = (
            plan.count("Exchange (")
            - plan.count("BroadcastExchange (")
            - plan.count("ReusedExchange (")
        )
        rows.append((name, exch, cart, bep, aep, mip, bnlj))
        flags = []
        if cart and name not in CARTESIAN_ALLOW:
            flags.append(f"CARTESIAN x{cart}")
        if bep and name not in BATCH_EVAL_ALLOW:
            flags.append(f"BatchEvalPython x{bep}")
        if flags:
            bad.append(name)
            print(f"{name}: {' '.join(flags)}")
    print("-" * 60)
    print(f"swept {len(rows)} query plans at {SF}")
    print("top shuffle budgets:")
    for name, exch, *_ in sorted(rows, key=lambda r: -r[1])[:12]:
        print(f"  {name}: {exch} Exchange")
    py = [(n, m) for n, e, c, b, a, m, j in rows if m]
    bn = [(n, j) for n, e, c, b, a, m, j in rows if j]
    print(f"queries with BroadcastNestedLoopJoin (1-row-broadcast cross "
          f"joins by construction - informational): {len(bn)}")
    print(f"queries with Python map stages: {len(py)}")
    if bad:
        print(f"FLAGGED: {bad}")
        sys.exit(1)
    print("no Cartesian/BatchEvalPython flags")


if __name__ == "__main__":
    main()
