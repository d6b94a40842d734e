"""Targeted oracle probe for a named subset of queries (verify skill's
fast path): same comparison as driver_sim, only for ids given on argv."""
import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pei_nwdaf_data_ingestion_spark import registry

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

registry.load_all()
names = sys.argv[1:] or sorted(registry.QUERIES)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
ddb = duckdb.connect()
for t in TABLES:
    ddb.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def vhash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    recs = []
    for row in pdf.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                parts.append("NULL")
            elif isinstance(v, (float, np.floating)):
                parts.append("%.9g" % v)
            else:
                parts.append(str(v))
        recs.append("|".join(parts))
    recs.sort()
    return hashlib.sha256("\n".join(recs).encode()).hexdigest()[:16]


fails = 0
for name in names:
    try:
        sdf = registry.QUERIES[name](spark, SF).toPandas()
        if name not in registry.ORACLES:
            print(f"ok(rows-only) {name}: {len(sdf)} rows")
            continue
        odf = ddb.execute(registry.ORACLES[name]).df()
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            for c in sorted(sdf.columns):
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    problems.append(f"dtype[{c}] {sdf[c].dtype} vs {odf[c].dtype}")
            if not problems and vhash(sdf) != vhash(odf):
                problems.append("value-hash mismatch")
        if problems:
            fails += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok {name}: {len(sdf)} rows")
    except Exception as exc:  # noqa: BLE001
        fails += 1
        print(f"ERROR {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")

print(f"{fails} failures / {len(names)} probed")
sys.exit(1 if fails else 0)
