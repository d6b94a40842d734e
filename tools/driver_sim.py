"""Driver simulation: vanilla SparkSession, sf0.01, every oracled query
hash-compared against DuckDB (order-insensitive, dtype-exact)."""
import os, sys, time, hashlib
import duckdb
import pandas as pd
import numpy as np
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DRIVER_SIM_CORES / DRIVER_SIM_PARTITIONS override the layout: running
# the whole gate under a different core count + shuffle width (e.g. 3/3)
# is the partitioning-invariance probe - any result that depends on task
# layout, partition count or per-partition fold order fails the rerun.
_CORES = os.environ.get("DRIVER_SIM_CORES", "8")
_PARTS = os.environ.get("DRIVER_SIM_PARTITIONS", "8")
_builder = (
    SparkSession.builder.master(f"local[{_CORES}]")
    .config("spark.sql.shuffle.partitions", _PARTS)
    .config("spark.sql.session.timeZone", "America/New_York")  # non-UTC probe
    .config("spark.driver.memory", "8g")
)
# DRIVER_SIM_CONF="k=v,k=v" layers arbitrary session confs on top - e.g.
# spark.sql.adaptive.enabled=false is the AQE-off invariance probe (results
# must not depend on runtime re-planning / coalescing decisions)
for _kv in filter(None, os.environ.get("DRIVER_SIM_CONF", "").split(",")):
    _k, _, _v = _kv.partition("=")
    _builder = _builder.config(_k.strip(), _v.strip())
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

ddb = duckdb.connect()
for t in TABLES:
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

# smoke: entry()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(sorted(v)) if isinstance(v, (list, np.ndarray)) and False else str(v))
    return pdf

def vhash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    recs = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, (list, np.ndarray)):
                v = list(v)
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        recs.append("\x1f".join(vals))
    recs.sort()
    return hashlib.sha256("\x1e".join(recs).encode()).hexdigest()[:16]

qs, os_ = e.queries(), e.oracle_sql()
fail = []
for name in sorted(qs):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as ex:
        fail.append((name, f"SPARK ERROR {ex}"))
        print(f"FAIL {name}: spark error {ex}")
        continue
    if name not in os_:
        print(f"ok(rows-only) {name}: {len(sdf)} rows  {time.time()-t0:.1f}s")
        continue
    try:
        odf = ddb.execute(os_[name]).df()
    except Exception as ex:
        fail.append((name, f"ORACLE ERROR {ex}"))
        print(f"FAIL {name}: oracle error {ex}")
        continue
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    else:
        sd = {c: str(sdf[c].dtype) for c in sdf.columns}
        od = {c: str(odf[c].dtype) for c in odf.columns}
        dt = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
        if dt:
            problems.append(f"dtypes {dt}")
        if vhash(sdf) != vhash(odf):
            problems.append("value-hash mismatch")
    if problems:
        fail.append((name, "; ".join(problems)))
        print(f"FAIL {name}: {'; '.join(problems)}")
    else:
        print(f"ok {name}: {len(sdf)} rows  {time.time()-t0:.1f}s")

print(f"\n{'='*60}\n{len(fail)} failures / {len(qs)} queries")
for n, p in fail:
    print(f"  {n}: {p}")
sys.exit(1 if fail else 0)
