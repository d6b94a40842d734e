#!/usr/bin/env python
"""Fast targeted oracle probe (verify skill recipe): compare the named
queries against their DuckDB oracles at sf0.01 under a non-UTC session,
row-count + sorted columns + exact dtypes + order-insensitive value hash.

Usage: python tools/probe_queries.py q1 q2 ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from pei_nwdaf_data_ingestion_spark import catalog, registry

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")

registry.load_all()
names = sys.argv[1:] or sys.exit("usage: probe_queries.py <query-id>...")

spark = (
    SparkSession.builder.master("local[8]")
    .appName("probe")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()
)
con = duckdb.connect()
for t in catalog.TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def value_hash(df) -> str:
    import hashlib

    recs = []
    for _, row in df.iterrows():
        parts = []
        for c in sorted(df.columns):
            v = row[c]
            if isinstance(v, float):
                parts.append("%.9g" % v)
            else:
                parts.append(str(v))
        recs.append("|".join(parts))
    return hashlib.md5("\n".join(sorted(recs)).encode()).hexdigest()


fails = 0
for name in names:
    fn = registry.QUERIES.get(name)
    if fn is None:
        print(f"{name}: NOT REGISTERED")
        fails += 1
        continue
    sdf = fn(spark, SF).toPandas()
    oracle = registry.ORACLES.get(name)
    if oracle is None:
        print(f"{name}: rows-only, {len(sdf)} rows")
        continue
    odf = con.execute(oracle).fetchdf()
    ok_rows = len(sdf) == len(odf)
    ok_cols = sorted(sdf.columns) == sorted(odf.columns)
    dt_s = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
    dt_o = {c: str(odf[c].dtype) for c in sorted(odf.columns)} if ok_cols else {}
    ok_dt = dt_s == dt_o
    ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
    status = "OK" if (ok_rows and ok_cols and ok_dt and ok_hash) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(
        f"{name}: {status} rows={len(sdf)}/{len(odf)} cols_match={ok_cols} "
        f"dtypes_match={ok_dt} hash_match={ok_hash}"
    )
    if not ok_dt and ok_cols:
        for c in dt_s:
            if dt_s[c] != dt_o.get(c):
                print(f"  dtype {c}: spark={dt_s[c]} oracle={dt_o.get(c)}")

spark.stop()
sys.exit(1 if fails else 0)
