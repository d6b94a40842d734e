"""Property-based differential fuzz over the scalar/relational surface
(VERDICT r11 item 6): a seeded generator produces random
filter/project/aggregate/join specs, compiles each spec BOTH to a
PySpark DataFrame plan and to DuckDB SQL over the same parquet
fixtures, and asserts the two engines agree order-insensitively.

The 275 static oracles pin every registered query but only on the value
regions the fixtures happen to exercise; the fuzz sweep hits the
regions a static corpus misses - NULL-injected keys (nullif), negative
arithmetic, modulo bucketing, empty filter results, LIKE prefixes,
lexicographic string ranges, left-join null fan-out, global aggregates
over zero rows.  Round 13 adds three blocks (VERDICT r12 item 4):
higher-order array lambdas + map extraction, DECIMAL aggregation x
rollup/cube/grouping-sets, and outer-join x window compositions - whose
first sweeps each caught a real cross-engine divergence, now pinned in
comments at their fix sites (empty-list array_to_string NULL vs '';
empty-input rollup grand-total row; duplicate-key ROLLUP subtotal
rendering).

Determinism rules (the repo's cross-engine discipline, SURVEY 2.0):
only exact arithmetic reaches an aggregate - doubles are quantized to
integer cents (floor(x*100+0.5)) before sum/min/max; no float
accumulation, no round(), no integer division (Spark `div` truncates
toward zero while DuckDB `//` floors - the one scalar op the two
engines define differently on negatives, so the generator simply never
emits it).  Every spec is a pure function of its seed: a failure
reports the seed, and re-running that seed reproduces the exact spec.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_frames_match
from pei_nwdaf_data_ingestion_spark.catalog import load

N_SPECS = 220  # >= 200 per the verification plan; ~0.2 s each

# ---------------------------------------------------------------------------
# table metadata: exact-int columns, quantizable doubles, strings
# ---------------------------------------------------------------------------

TABLES = {
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "floats": ["l_quantity", "l_extendedprice", "l_discount"],
        "strs": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "floats": ["o_totalprice"],
        "strs": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "floats": ["c_acctbal"],
        "strs": ["c_name", "c_mktsegment"],
    },
    "events": {
        "ints": ["event_id", "user_id"],
        "floats": ["value"],
        "strs": ["event_type"],
    },
    "documents": {
        "ints": ["doc_id", "n_chars"],
        "floats": [],
        "strs": ["lang", "source"],
    },
}

# equi-join edges (left table key, right table, right key); right side
# columns get unambiguous aliases in both compilations
JOINS = {
    "lineitem": ("l_orderkey", "orders", "o_orderkey"),
    "orders": ("o_custkey", "customer", "c_custkey"),
}

# plausible constant pools per int column family (fixture key ranges are
# small at sf0.001; constants deliberately straddle the range so filters
# produce full, partial and EMPTY results)
INT_CONSTS = [0, 1, 2, 3, 5, 7, 10, 25, 100, 500, 1500, 6000, 10**6]
STR_CONSTS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
    "c_name": ["Customer#000000001", "Customer#000000999"],
    "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
    "event_type": ["click", "view", "purchase", "signup"],
    "lang": ["en", "de", "fr", "es", "zh"],
    "source": ["web", "wiki", "news", "forum"],
}

# ---------------------------------------------------------------------------
# expression AST: each node compiles to (spark Column, duckdb SQL string)
# ---------------------------------------------------------------------------


def _sq(v) -> str:
    """SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def compile_expr(node, spark_cols):
    """node -> (pyspark Column, duckdb SQL fragment).  `spark_cols` maps
    column name -> pyspark Column (post-join frames alias via this)."""
    kind = node[0]
    if kind == "col":
        return spark_cols[node[1]], node[1]
    if kind == "lit":
        v = node[1]
        return F.lit(v), _sq(v)
    if kind in ("add", "sub", "mul", "mod"):
        sa, da = compile_expr(node[1], spark_cols)
        sb, db = compile_expr(node[2], spark_cols)
        op = {"add": "+", "sub": "-", "mul": "*", "mod": "%"}[kind]
        sc = {
            "add": sa + sb,
            "sub": sa - sb,
            "mul": sa * sb,
            "mod": sa % sb,
        }[kind]
        return sc, f"({da} {op} {db})"
    if kind == "cents":
        # exact integer quantization of a double - the repo-wide spelling
        sa, da = compile_expr(node[1], spark_cols)
        return (
            F.floor(sa * 100.0 + 0.5).cast("long"),
            f"CAST(floor({da} * 100.0 + 0.5) AS BIGINT)",
        )
    if kind == "length":
        sa, da = compile_expr(node[1], spark_cols)
        return F.length(sa).cast("long"), f"CAST(length({da}) AS BIGINT)"
    if kind == "upper":
        sa, da = compile_expr(node[1], spark_cols)
        return F.upper(sa), f"upper({da})"
    if kind == "substr":
        sa, da = compile_expr(node[1], spark_cols)
        return F.substring(sa, 1, node[2]), f"substr({da}, 1, {node[2]})"
    if kind == "nullif":
        sa, da = compile_expr(node[1], spark_cols)
        sb, db = compile_expr(node[2], spark_cols)
        return F.nullif(sa, sb), f"nullif({da}, {db})"
    if kind == "coalesce":
        sa, da = compile_expr(node[1], spark_cols)
        sb, db = compile_expr(node[2], spark_cols)
        return F.coalesce(sa, sb), f"coalesce({da}, {db})"
    raise ValueError(f"unknown expr node {kind}")


def compile_pred(node, spark_cols):
    kind = node[0]
    if kind == "cmp":
        _, op, a, b = node
        sa, da = compile_expr(a, spark_cols)
        sb, db = compile_expr(b, spark_cols)
        sc = {
            "<": sa < sb,
            "<=": sa <= sb,
            ">": sa > sb,
            ">=": sa >= sb,
            "=": sa == sb,
            "<>": sa != sb,
        }[op]
        return sc, f"({da} {op} {db})"
    if kind == "in":
        sa, da = compile_expr(node[1], spark_cols)
        vals = node[2]
        return sa.isin(vals), f"({da} IN ({', '.join(_sq(v) for v in vals)}))"
    if kind == "like":
        sa, da = compile_expr(node[1], spark_cols)
        return sa.like(node[2]), f"({da} LIKE {_sq(node[2])})"
    if kind == "isnull":
        sa, da = compile_expr(node[1], spark_cols)
        return sa.isNull(), f"({da} IS NULL)"
    if kind == "notnull":
        sa, da = compile_expr(node[1], spark_cols)
        return sa.isNotNull(), f"({da} IS NOT NULL)"
    if kind == "or":
        sa, da = compile_pred(node[1], spark_cols)
        sb, db = compile_pred(node[2], spark_cols)
        return sa | sb, f"({da} OR {db})"
    raise ValueError(f"unknown pred node {kind}")


# ---------------------------------------------------------------------------
# spec generator: pure function of the seed
# ---------------------------------------------------------------------------


def gen_expr_int(rng, meta):
    """An exact-integer-valued expression over the table's columns."""
    roll = rng.random()
    c = ("col", rng.choice(meta["ints"]))
    if roll < 0.35:
        return c
    if roll < 0.5 and meta["floats"]:
        return ("cents", ("col", rng.choice(meta["floats"])))
    if roll < 0.62:
        return ("add", c, ("lit", rng.choice(INT_CONSTS)))
    if roll < 0.74:  # negative region on purpose
        return ("sub", c, ("lit", rng.choice(INT_CONSTS)))
    if roll < 0.84:
        return ("mul", c, ("lit", rng.choice([2, 3, 7])))
    if roll < 0.94:
        return ("mod", c, ("lit", rng.choice([2, 3, 5, 7, 11])))
    # NULL-injected then repaired: coalesce(nullif(c, k), -1)
    k = rng.choice(INT_CONSTS[:8])
    return ("coalesce", ("nullif", c, ("lit", k)), ("lit", -1))


def gen_expr_str(rng, meta):
    c = ("col", rng.choice(meta["strs"]))
    roll = rng.random()
    if roll < 0.5:
        return c
    if roll < 0.7:
        return ("upper", c)
    return ("substr", c, rng.choice([1, 2, 3]))


def gen_pred(rng, meta):
    roll = rng.random()
    if roll < 0.45:
        e = gen_expr_int(rng, meta)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return ("cmp", op, e, ("lit", rng.choice(INT_CONSTS)))
    if roll < 0.6:
        col = rng.choice(meta["strs"])
        pool = STR_CONSTS[col]
        return ("in", ("col", col), rng.sample(pool, min(len(pool), 2)))
    if roll < 0.7:
        col = rng.choice(meta["strs"])
        pref = STR_CONSTS[col][0][: rng.choice([1, 2])]
        return ("like", ("col", col), pref + "%")
    if roll < 0.78:
        col = rng.choice(meta["strs"])
        op = rng.choice([">=", "<"])  # binary-collation lexicographic
        return ("cmp", op, ("col", col), ("lit", STR_CONSTS[col][0]))
    if roll < 0.86:
        c = ("col", rng.choice(meta["ints"]))
        k = rng.choice(INT_CONSTS[:8])
        node = ("nullif", c, ("lit", k))
        return (rng.choice(["isnull", "notnull"]), node)
    if roll < 0.93 and meta["floats"]:
        c = ("col", rng.choice(meta["floats"]))
        return ("cmp", rng.choice(["<", ">="]), c, ("lit", rng.choice([0.05, 10.0, 25.5, 500.0])))
    a = gen_pred(rng, meta)
    b = gen_pred(rng, meta)
    if a[0] == "or" or b[0] == "or":
        return a if b[0] == "or" else b
    return ("or", a, b)


def gen_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(TABLES))
    meta = dict(TABLES[table])
    spec = {"seed": seed, "table": table, "filters": [], "join": None}
    # optional equi join (30%): widens the column pool
    if table in JOINS and rng.random() < 0.3:
        lk, rt, rk = JOINS[table]
        how = rng.choice(["inner", "left"])
        spec["join"] = (lk, rt, rk, how)
        rmeta = TABLES[rt]
        meta = {
            "ints": meta["ints"] + rmeta["ints"],
            "floats": meta["floats"] + rmeta["floats"],
            "strs": meta["strs"] + rmeta["strs"],
        }
        # on a LEFT join, right-side columns are NULL for unmatched rows -
        # deliberately kept in the pools (the NULL fan-out region)
    spec["meta"] = meta
    for _ in range(rng.choice([0, 1, 1, 2])):
        spec["filters"].append(gen_pred(rng, meta))
    if rng.random() < 0.55:
        # aggregate: 0-2 keys, 1-3 exact aggs
        keys = []
        for _ in range(rng.choice([0, 1, 1, 2])):
            if rng.random() < 0.6:
                keys.append(("col", rng.choice(meta["strs"])))
            else:
                keys.append(
                    ("mod", ("col", rng.choice(meta["ints"])), ("lit", rng.choice([3, 5, 7])))
                )
        aggs = []
        for _ in range(rng.choice([1, 2, 2, 3])):
            akind = rng.choice(["count", "countd", "sum", "min", "max"])
            if akind in ("sum", "min", "max"):
                aggs.append((akind, gen_expr_int(rng, meta)))
            elif akind == "countd":
                aggs.append((akind, ("col", rng.choice(meta["ints"] + meta["strs"]))))
            else:
                aggs.append((akind, None))
        spec["group"] = {"keys": keys, "aggs": aggs}
    else:
        # plain projection of 1-4 expressions
        projs = []
        for _ in range(rng.choice([1, 2, 3, 4])):
            if rng.random() < 0.6:
                projs.append(gen_expr_int(rng, meta))
            else:
                projs.append(gen_expr_str(rng, meta))
        spec["project"] = projs
    return spec


# ---------------------------------------------------------------------------
# spec -> (spark DataFrame, duckdb SQL)
# ---------------------------------------------------------------------------


def compile_spec(spec, spark, sf_dir):
    table = spec["table"]
    df = load(spark, sf_dir, table)
    from_sql = table
    if spec["join"]:
        lk, rt, rk, how = spec["join"]
        rdf = load(spark, sf_dir, rt)
        df = df.join(rdf, df[lk] == rdf[rk], how)
        from_sql = f"{table} {'LEFT ' if how == 'left' else ''}JOIN {rt} ON {table}.{lk} = {rt}.{rk}"
    cols = {c: df[c] for c in df.columns}
    where = []
    for p in spec["filters"]:
        sc, dc = compile_pred(p, cols)
        df = df.filter(sc)
        where.append(dc)
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    if "group" in spec:
        keys, aggs = spec["group"]["keys"], spec["group"]["aggs"]
        kcols, ksql = [], []
        for i, k in enumerate(keys):
            sc, dc = compile_expr(k, cols)
            kcols.append(sc.alias(f"k{i}"))
            ksql.append(f"{dc} AS k{i}")
        acols, asql = [], []
        for i, (akind, e) in enumerate(aggs):
            al = f"a{i}"
            if akind == "count":
                acols.append(F.count("*").alias(al))
                asql.append(f"CAST(count(*) AS BIGINT) AS {al}")
            elif akind == "countd":
                sc, dc = compile_expr(e, cols)
                acols.append(F.countDistinct(sc).alias(al))
                asql.append(f"CAST(count(DISTINCT {dc}) AS BIGINT) AS {al}")
            elif akind == "sum":
                sc, dc = compile_expr(e, cols)
                acols.append(F.sum(sc).cast("long").alias(al))
                asql.append(f"CAST(sum({dc}) AS BIGINT) AS {al}")
            else:  # min / max
                sc, dc = compile_expr(e, cols)
                fn = F.min if akind == "min" else F.max
                acols.append(fn(sc).cast("long").alias(al))
                asql.append(f"CAST({akind}({dc}) AS BIGINT) AS {al}")
        if kcols:
            sdf = df.groupBy(*kcols).agg(*acols)
            sel = ", ".join(ksql + asql)
            gb = " GROUP BY " + ", ".join(f"k{i}" for i in range(len(keys)))
        else:
            sdf = df.agg(*acols)
            sel = ", ".join(asql)
            gb = ""
        sql = f"SELECT {sel} FROM {from_sql}{where_sql}{gb}"
        return sdf, sql
    pcols, psql = [], []
    for i, e in enumerate(spec["project"]):
        sc, dc = compile_expr(e, cols)
        # exact-int projections land as BIGINT on both engines (Spark
        # int32 + int64 mixes otherwise diverge only in dtype, but keep
        # the contract crisp); strings stay strings
        if e[0] in ("col", "add", "sub", "mul", "mod", "cents", "length", "coalesce", "nullif") and not (
            e[0] == "col" and e[1] in spec["meta"]["strs"]
        ):
            sc, dc = sc.cast("long"), f"CAST({dc} AS BIGINT)"
        pcols.append(sc.alias(f"p{i}"))
        psql.append(f"{dc} AS p{i}")
    sdf = df.select(*pcols)
    sql = f"SELECT {', '.join(psql)} FROM {from_sql}{where_sql}"
    return sdf, sql


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

BASE_SEED = 0xD1FF  # fixed: the whole sweep is reproducible byte-for-byte


@pytest.mark.parametrize("block", range(4))
def test_fuzz_differential_block(spark, ddb, block):
    """220 generated specs in 4 blocks of 55 - a failure names the seed;
    `gen_spec(seed)` reproduces the exact spec for a local repro."""
    per_block = (N_SPECS + 3) // 4
    for i in range(per_block):
        seed = BASE_SEED + block * per_block + i
        spec = gen_spec(seed)
        sdf, sql = compile_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        # nullif(col, k) on a column where k never occurs projects NULLs
        # only via the left-join region; pandas renders all-NULL int
        # columns as object/float - the conftest normalizer handles it
        assert_frames_match(spdf, odf, f"fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# window-function fuzz: same differential discipline over the OVER() surface
# ---------------------------------------------------------------------------

# (table, unique order key SQL expr) - the key must be a total order or
# row_number/lag/running frames are nondeterministic cross-engine.
# lineitem is deliberately ABSENT: the fixture does not enforce the
# TPC-H (l_orderkey, l_linenumber) composite key (4599 distinct of 6000
# rows at sf0.001, and even the 4-column key has a duplicate), so no
# expression over it totally orders the table
UNIQUE_KEYS = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "events": "event_id",
    "documents": "doc_id",
}

N_WIN_SPECS = 60


def gen_win_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(UNIQUE_KEYS))
    meta = TABLES[table]
    part = (
        ("col", rng.choice(meta["strs"]))
        if rng.random() < 0.6
        else ("mod", ("col", rng.choice(meta["ints"])), ("lit", rng.choice([3, 5, 7])))
    )
    desc = rng.random() < 0.4
    funcs = []
    for _ in range(rng.choice([1, 2, 2, 3])):
        k = rng.choice(["row_number", "rank_mod", "lag", "lead", "runsum", "runcount", "pmin", "pmax"])
        arg = gen_expr_int(rng, meta) if k in ("lag", "lead", "runsum", "pmin", "pmax") else None
        funcs.append((k, arg))
    return {"seed": seed, "table": table, "part": part, "desc": desc, "funcs": funcs}


def compile_win_spec(spec, spark, sf_dir):
    from pyspark.sql import Window

    table = spec["table"]
    df = load(spark, sf_dir, table)
    cols = {c: df[c] for c in df.columns}
    ukey_sql = UNIQUE_KEYS[table]
    ukey_sc = F.expr(ukey_sql)
    pk_sc, pk_sql = compile_expr(spec["part"], cols)
    order_sc = ukey_sc.desc() if spec["desc"] else ukey_sc.asc()
    order_sql = f"{ukey_sql} {'DESC' if spec['desc'] else 'ASC'}"
    over = f"(PARTITION BY {pk_sql} ORDER BY {order_sql})"
    w = Window.partitionBy(pk_sc).orderBy(order_sc)
    sels = [ukey_sc.cast("long").alias("uk"), pk_sc.alias("pk")]
    sqls = [f"CAST({ukey_sql} AS BIGINT) AS uk", f"{pk_sql} AS pk"]
    for i, (k, arg) in enumerate(spec["funcs"]):
        al = f"w{i}"
        if k == "row_number":
            sels.append(F.row_number().over(w).cast("long").alias(al))
            sqls.append(f"CAST(row_number() OVER {over} AS BIGINT) AS {al}")
        elif k == "rank_mod":
            # rank over a NON-unique key is still deterministic (rank is a
            # function of the order-key multiset): ties on purpose
            rk_sql = f"({ukey_sql} % 7)"
            rw = Window.partitionBy(pk_sc).orderBy(F.expr(rk_sql))
            sels.append(F.rank().over(rw).cast("long").alias(al))
            sqls.append(
                f"CAST(rank() OVER (PARTITION BY {pk_sql} ORDER BY {rk_sql} ASC) AS BIGINT) AS {al}"
            )
        elif k in ("lag", "lead"):
            sc, dc = compile_expr(arg, cols)
            fn = F.lag if k == "lag" else F.lead
            sels.append(fn(sc.cast("long"), 1).over(w).alias(al))
            sqls.append(f"{k}(CAST({dc} AS BIGINT), 1) OVER {over} AS {al}")
        elif k == "runsum":
            sc, dc = compile_expr(arg, cols)
            rw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            sels.append(F.sum(sc).over(rw).cast("long").alias(al))
            sqls.append(
                f"CAST(sum({dc}) OVER ({over[1:-1]} ROWS BETWEEN UNBOUNDED"
                f" PRECEDING AND CURRENT ROW) AS BIGINT) AS {al}"
            )
        elif k == "runcount":
            rw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            sels.append(F.count("*").over(rw).cast("long").alias(al))
            sqls.append(
                f"CAST(count(*) OVER ({over[1:-1]} ROWS BETWEEN UNBOUNDED"
                f" PRECEDING AND CURRENT ROW) AS BIGINT) AS {al}"
            )
        else:  # pmin / pmax over the whole partition
            sc, dc = compile_expr(arg, cols)
            pw = Window.partitionBy(pk_sc)
            fn = F.min if k == "pmin" else F.max
            sels.append(fn(sc).over(pw).cast("long").alias(al))
            sqls.append(
                f"CAST({k[1:]}({dc}) OVER (PARTITION BY {pk_sql}) AS BIGINT) AS {al}"
            )
    sdf = df.select(*sels)
    sql = f"SELECT {', '.join(sqls)} FROM {table}"
    return sdf, sql


WIN_SEED = 0xB0CA


@pytest.mark.parametrize("block", range(2))
def test_fuzz_window_block(spark, ddb, block):
    per_block = N_WIN_SPECS // 2
    for i in range(per_block):
        seed = WIN_SEED + block * per_block + i
        spec = gen_win_spec(seed)
        sdf, sql = compile_win_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"win fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# set-op / distinct / having / total-order-limit fuzz
# ---------------------------------------------------------------------------

N_SET_SPECS = 60


def gen_set_spec(seed: int) -> dict:
    rng = random.Random(seed)
    kind = rng.choice(["setop", "distinct", "having", "limit"])
    if kind == "limit":
        table = rng.choice(sorted(UNIQUE_KEYS))
    else:
        table = rng.choice(sorted(TABLES))
    meta = TABLES[table]
    spec = {"seed": seed, "kind": kind, "table": table}
    if kind == "setop":
        spec["op"] = rng.choice(["union_all", "union", "intersect", "except"])
        spec["proj"] = [gen_expr_int(rng, meta), ("col", rng.choice(meta["strs"]))]
        spec["f1"] = gen_pred(rng, meta)
        spec["f2"] = gen_pred(rng, meta)
    elif kind == "distinct":
        spec["proj"] = [
            gen_expr_int(rng, meta) if rng.random() < 0.5 else ("col", rng.choice(meta["strs"]))
            for _ in range(rng.choice([1, 2]))
        ]
        spec["filters"] = [gen_pred(rng, meta)] if rng.random() < 0.5 else []
    elif kind == "having":
        spec["key"] = ("col", rng.choice(meta["strs"]))
        spec["agg"] = rng.choice(["count", "sum"])
        spec["agg_e"] = gen_expr_int(rng, meta)
        spec["hcmp"] = (rng.choice([">", "<="]), rng.choice([1, 5, 25, 200]))
    else:  # limit: total order via (expr, unique key) tiebreak
        spec["proj_e"] = gen_expr_int(rng, meta)
        spec["desc"] = rng.random() < 0.5
        spec["n"] = rng.choice([1, 5, 17, 50])
    return spec


def compile_set_spec(spec, spark, sf_dir):
    table = spec["table"]
    df = load(spark, sf_dir, table)
    cols = {c: df[c] for c in df.columns}
    kind = spec["kind"]
    if kind == "setop":
        (e0s, e0d) = compile_expr(spec["proj"][0], cols)
        (e1s, e1d) = compile_expr(spec["proj"][1], cols)
        sel = [e0s.cast("long").alias("x0"), e1s.alias("x1")]
        sel_sql = f"CAST({e0d} AS BIGINT) AS x0, {e1d} AS x1"
        p1s, p1d = compile_pred(spec["f1"], cols)
        p2s, p2d = compile_pred(spec["f2"], cols)
        a = df.filter(p1s).select(*sel)
        b = df.filter(p2s).select(*sel)
        qa = f"SELECT {sel_sql} FROM {table} WHERE {p1d}"
        qb = f"SELECT {sel_sql} FROM {table} WHERE {p2d}"
        op = spec["op"]
        if op == "union_all":
            return a.unionAll(b), f"({qa}) UNION ALL ({qb})"
        if op == "union":
            return a.union(b).distinct(), f"({qa}) UNION ({qb})"
        if op == "intersect":
            return a.intersect(b), f"({qa}) INTERSECT ({qb})"
        # subtract == SQL EXCEPT (set difference over DISTINCT rows);
        # exceptAll().distinct() would differ - multiset-minus keeps a
        # row whose count in `a` merely exceeds its count in `b`
        return a.subtract(b), f"({qa}) EXCEPT ({qb})"
    if kind == "distinct":
        sels, sqls = [], []
        for i, e in enumerate(spec["proj"]):
            sc, dc = compile_expr(e, cols)
            if e[0] != "col" or e[1] not in TABLES[table]["strs"]:
                sc, dc = sc.cast("long"), f"CAST({dc} AS BIGINT)"
            sels.append(sc.alias(f"x{i}"))
            sqls.append(f"{dc} AS x{i}")
        w = ""
        for p in spec["filters"]:
            ps, pd_ = compile_pred(p, cols)
            df = df.filter(ps)
            w = f" WHERE {pd_}"
        return (
            df.select(*sels).distinct(),
            f"SELECT DISTINCT {', '.join(sqls)} FROM {table}{w}",
        )
    if kind == "having":
        ks, kd = compile_expr(spec["key"], cols)
        es, ed = compile_expr(spec["agg_e"], cols)
        op, n = spec["hcmp"]
        if spec["agg"] == "count":
            agg_s, agg_d = F.count("*"), "count(*)"
        else:
            agg_s, agg_d = F.sum(es), f"sum({ed})"
        g = df.groupBy(ks.alias("k")).agg(agg_s.cast("long").alias("a"))
        cond = {"<=": g["a"] <= n, ">": g["a"] > n}[op]
        sql = (
            f"SELECT {kd} AS k, CAST({agg_d} AS BIGINT) AS a FROM {table}"
            f" GROUP BY k HAVING CAST({agg_d} AS BIGINT) {op} {n}"
        )
        return g.filter(cond), sql
    # limit with a (expr, unique-key) TOTAL order: the same row set on
    # both engines whatever the physical plan does
    uk = UNIQUE_KEYS[table]
    es, ed = compile_expr(spec["proj_e"], cols)
    direc = "DESC" if spec["desc"] else "ASC"
    ordered = df.select(
        es.cast("long").alias("x"), F.expr(uk).cast("long").alias("uk")
    ).orderBy(
        F.col("x").desc() if spec["desc"] else F.col("x").asc(),
        F.col("uk").asc(),
    )
    sql = (
        f"SELECT CAST({ed} AS BIGINT) AS x, CAST({uk} AS BIGINT) AS uk"
        f" FROM {table} ORDER BY x {direc}, uk ASC LIMIT {spec['n']}"
    )
    return ordered.limit(spec["n"]), sql


SET_SEED = 0x5E70


@pytest.mark.parametrize("block", range(2))
def test_fuzz_setops_block(spark, ddb, block):
    per_block = N_SET_SPECS // 2
    for i in range(per_block):
        seed = SET_SEED + block * per_block + i
        spec = gen_set_spec(seed)
        sdf, sql = compile_set_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"setop fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# NULL-group-key / 3-way-join fuzz: the grouping and multi-join regions
# ---------------------------------------------------------------------------

N_NULLKEY_SPECS = 60

# lineitem -> orders -> customer star chain (the TPC-H spine)
THREEWAY = ("lineitem", "l_orderkey", "orders", "o_orderkey", "o_custkey", "customer", "c_custkey")


def gen_nullkey_spec(seed: int) -> dict:
    rng = random.Random(seed)
    spec = {"seed": seed}
    if rng.random() < 0.5:
        # 3-way inner join, then agg or projection over the merged pool
        spec["kind"] = "join3"
        meta = {
            "ints": TABLES["lineitem"]["ints"] + TABLES["orders"]["ints"] + TABLES["customer"]["ints"],
            "floats": TABLES["lineitem"]["floats"] + TABLES["orders"]["floats"] + TABLES["customer"]["floats"],
            "strs": TABLES["lineitem"]["strs"] + TABLES["orders"]["strs"] + TABLES["customer"]["strs"],
        }
        spec["filters"] = [gen_pred(rng, meta)] if rng.random() < 0.6 else []
        if rng.random() < 0.6:
            spec["group"] = {
                "keys": [("col", rng.choice(meta["strs"]))],
                "aggs": [("count", None), ("sum", gen_expr_int(rng, meta))],
            }
        else:
            spec["project"] = [gen_expr_int(rng, meta), gen_expr_str(rng, meta)]
        spec["meta"] = meta
    else:
        # single-table agg with a NULL-INJECTED group key: nullif(col, k)
        # groups the k-rows into ONE NULL group on both engines
        spec["kind"] = "nullkey"
        table = rng.choice(sorted(TABLES))
        spec["table"] = table
        meta = TABLES[table]
        c = rng.choice(meta["ints"])
        spec["key"] = ("nullif", ("mod", ("col", c), ("lit", rng.choice([3, 5, 7]))), ("lit", rng.choice([0, 1, 2])))
        aggs = [("count", None)]
        if rng.random() < 0.7:
            aggs.append(("sum", gen_expr_int(rng, meta)))
        if rng.random() < 0.4:
            # count(expr) skips NULLs identically on both engines
            aggs.append(("count_col", ("nullif", ("col", rng.choice(meta["ints"])), ("lit", rng.choice(INT_CONSTS[:6])))))
        spec["aggs"] = aggs
        spec["meta"] = meta
    return spec


def compile_nullkey_spec(spec, spark, sf_dir):
    if spec["kind"] == "join3":
        lt, lk, mt, mk, mk2, rt, rk = THREEWAY
        a, b, c = load(spark, sf_dir, lt), load(spark, sf_dir, mt), load(spark, sf_dir, rt)
        df = a.join(b, a[lk] == b[mk]).join(c, b[mk2] == c[rk])
        from_sql = (
            f"{lt} JOIN {mt} ON {lt}.{lk} = {mt}.{mk} "
            f"JOIN {rt} ON {mt}.{mk2} = {rt}.{rk}"
        )
        cols = {col: df[col] for col in df.columns}
        where = []
        for p in spec["filters"]:
            ps, pd_ = compile_pred(p, cols)
            df = df.filter(ps)
            where.append(pd_)
        wsql = (" WHERE " + " AND ".join(where)) if where else ""
        if "group" in spec:
            ks, kd = compile_expr(spec["group"]["keys"][0], cols)
            es, ed = compile_expr(spec["group"]["aggs"][1][1], cols)
            sdf = df.groupBy(ks.alias("k0")).agg(
                F.count("*").alias("a0"), F.sum(es).cast("long").alias("a1")
            )
            sql = (
                f"SELECT {kd} AS k0, CAST(count(*) AS BIGINT) AS a0,"
                f" CAST(sum({ed}) AS BIGINT) AS a1 FROM {from_sql}{wsql}"
                f" GROUP BY k0"
            )
            return sdf, sql
        e0s, e0d = compile_expr(spec["project"][0], cols)
        e1s, e1d = compile_expr(spec["project"][1], cols)
        sdf = df.select(e0s.cast("long").alias("p0"), e1s.alias("p1"))
        sql = (
            f"SELECT CAST({e0d} AS BIGINT) AS p0, {e1d} AS p1"
            f" FROM {from_sql}{wsql}"
        )
        return sdf, sql
    table = spec["table"]
    df = load(spark, sf_dir, table)
    cols = {c: df[c] for c in df.columns}
    ks, kd = compile_expr(spec["key"], cols)
    acols, asql = [], []
    for i, (kind, e) in enumerate(spec["aggs"]):
        al = f"a{i}"
        if kind == "count":
            acols.append(F.count("*").alias(al))
            asql.append(f"CAST(count(*) AS BIGINT) AS {al}")
        elif kind == "count_col":
            sc, dc = compile_expr(e, cols)
            acols.append(F.count(sc).alias(al))
            asql.append(f"CAST(count({dc}) AS BIGINT) AS {al}")
        else:
            sc, dc = compile_expr(e, cols)
            acols.append(F.sum(sc).cast("long").alias(al))
            asql.append(f"CAST(sum({dc}) AS BIGINT) AS {al}")
    sdf = df.groupBy(ks.cast("long").alias("k0")).agg(*acols)
    sql = (
        f"SELECT CAST({kd} AS BIGINT) AS k0, {', '.join(asql)}"
        f" FROM {table} GROUP BY k0"
    )
    return sdf, sql


NK_SEED = 0x9A11


@pytest.mark.parametrize("block", range(2))
def test_fuzz_nullkey_block(spark, ddb, block):
    per_block = N_NULLKEY_SPECS // 2
    for i in range(per_block):
        seed = NK_SEED + block * per_block + i
        spec = gen_nullkey_spec(seed)
        sdf, sql = compile_nullkey_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"nullkey fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# scalar string-function fuzz: the SURVEY 2.6 surface, differential
# ---------------------------------------------------------------------------

N_SCALAR_SPECS = 60

# each entry: key -> (spark_builder, sql_builder) over one string expr;
# NULL-propagation parity notes inline - anything the engines define
# differently (concat() NULL-skip in DuckDB, initcap word rules,
# greatest/least NULL handling) is deliberately absent
SCALAR_FNS = [
    "trim", "ltrim", "rtrim", "replace", "left", "right", "reverse",
    "instr", "repeat", "concat_pipe", "translate", "md5", "ascii",
    "lower", "split_part",
]


def gen_scalar_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(TABLES))
    meta = TABLES[table]
    col = rng.choice(meta["strs"])
    fns = [rng.choice(SCALAR_FNS) for _ in range(rng.choice([2, 3, 3, 4]))]
    return {
        "seed": seed,
        "table": table,
        "col": col,
        "fns": fns,
        "lit": rng.choice(["x", "-", "Z_", "##"]),
        "n": rng.choice([1, 2, 3, 5]),
    }


def compile_scalar_spec(spec, spark, sf_dir):
    table, col, lit, n = spec["table"], spec["col"], spec["lit"], spec["n"]
    df = load(spark, sf_dir, table)
    # base: pad the raw column so the trim family has something to strip
    base_s = F.concat(F.lit(" "), df[col], F.lit(" "))
    base_d = f"(' ' || {col} || ' ')"
    sels, sqls = [], []
    for i, fn in enumerate(spec["fns"]):
        al = f"s{i}"
        if fn == "trim":
            sc, dc = F.trim(base_s), f"trim({base_d})"
        elif fn == "ltrim":
            sc, dc = F.ltrim(base_s), f"ltrim({base_d})"
        elif fn == "rtrim":
            sc, dc = F.rtrim(base_s), f"rtrim({base_d})"
        elif fn == "replace":
            sc = F.replace(df[col], F.lit("a"), F.lit(lit))
            dc = f"replace({col}, 'a', {_sq(lit)})"
        elif fn == "left":
            sc, dc = F.left(df[col], F.lit(n)), f"left({col}, {n})"
        elif fn == "right":
            sc, dc = F.right(df[col], F.lit(n)), f"right({col}, {n})"
        elif fn == "reverse":
            sc, dc = F.reverse(df[col]), f"reverse({col})"
        elif fn == "instr":
            # 1-based position, 0 when absent - identical contracts
            sc = F.instr(df[col], "e").cast("long")
            dc = f"CAST(instr({col}, 'e') AS BIGINT)"
        elif fn == "repeat":
            sc, dc = F.repeat(df[col], n), f"repeat({col}, {n})"
        elif fn == "concat_pipe":
            # || propagates NULL on BOTH engines (DuckDB's concat()
            # function would SKIP NULLs - deliberately not used)
            sc = F.concat(df[col], F.lit(lit))
            dc = f"({col} || {_sq(lit)})"
        elif fn == "translate":
            sc = F.translate(df[col], "aeiou", "12345")
            dc = f"translate({col}, 'aeiou', '12345')"
        elif fn == "md5":
            sc, dc = F.md5(df[col].cast("binary")), f"md5({col})"
        elif fn == "ascii":
            sc = F.ascii(df[col]).cast("long")
            dc = f"CAST(ascii({col}) AS BIGINT)"
        elif fn == "lower":
            sc, dc = F.lower(df[col]), f"lower({col})"
        else:  # split_part: 1-based field of a '-' split
            sc = F.split_part(df[col], F.lit("-"), F.lit(n))
            dc = f"split_part({col}, '-', {n})"
        sels.append(sc.alias(al))
        sqls.append(f"{dc} AS {al}")
    sdf = df.select(*sels)
    sql = f"SELECT {', '.join(sqls)} FROM {table}"
    return sdf, sql


SC_SEED = 0x5CA1


@pytest.mark.parametrize("block", range(2))
def test_fuzz_scalar_block(spark, ddb, block):
    per_block = N_SCALAR_SPECS // 2
    for i in range(per_block):
        seed = SC_SEED + block * per_block + i
        spec = gen_scalar_spec(seed)
        sdf, sql = compile_scalar_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"scalar fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# temporal fuzz: the date/time scalar surface over the proven parity duals
# ---------------------------------------------------------------------------

N_TIME_SPECS = 60

TS_COLS = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}

# (key, spark format, duckdb strftime format) - the repo's established
# rendering duals (e.g. relational.py events_retention_cohort)
TIME_FMTS = [
    ("day", "yyyy-MM-dd", "%Y-%m-%d"),
    ("month", "yyyy-MM", "%Y-%m"),
    ("hour_of_day", "HH", "%H"),
    ("minute", "yyyy-MM-dd HH:mm", "%Y-%m-%d %H:%M"),
]

TIME_FIELDS = ["year", "month", "dayofmonth", "hour"]
TRUNC_UNITS = ["hour", "day", "month"]


def gen_time_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(TS_COLS))
    ops = []
    for _ in range(rng.choice([2, 3, 3])):
        k = rng.choice(["epoch_us", "epoch_ms", "fmt", "field", "trunc", "shift"])
        if k == "fmt":
            ops.append(("fmt", rng.choice(TIME_FMTS)))
        elif k == "field":
            ops.append(("field", rng.choice(TIME_FIELDS)))
        elif k == "trunc":
            ops.append(("trunc", rng.choice(TRUNC_UNITS)))
        elif k == "shift":
            ops.append(("shift", rng.choice([1, 6, 24])))
        else:
            ops.append((k, None))
    return {"seed": seed, "table": table, "ops": ops}


def compile_time_spec(spec, spark, sf_dir):
    table = spec["table"]
    ts = TS_COLS[table]
    df = load(spark, sf_dir, table)
    sels, sqls = [], []
    for i, (k, arg) in enumerate(spec["ops"]):
        al = f"t{i}"
        if k == "epoch_us":
            sc, dc = F.unix_micros(df[ts]), f"epoch_us({ts})"
        elif k == "epoch_ms":
            sc, dc = F.unix_millis(df[ts]), f"epoch_ms({ts})"
        elif k == "fmt":
            _, sfmt, dfmt = arg
            sc = F.date_format(df[ts], sfmt)
            dc = f"strftime({ts}, {_sq(dfmt)})"
            sels.append(sc.alias(al))
            sqls.append(f"{dc} AS {al}")
            continue
        elif k == "field":
            fn = {
                "year": F.year,
                "month": F.month,
                "dayofmonth": F.dayofmonth,
                "hour": F.hour,
            }[arg]
            dual = {"dayofmonth": "day"}.get(arg, arg)
            sc = fn(df[ts]).cast("long")
            dc = f"CAST({dual}({ts}) AS BIGINT)"
        elif k == "trunc":
            # timestamps compared as epoch micros (integer-exact)
            sc = F.unix_micros(F.date_trunc(arg, df[ts]))
            dc = f"epoch_us(date_trunc({_sq(arg)}, {ts}))"
        else:  # shift: + INTERVAL n HOUR, rendered as epoch micros
            sc = F.unix_micros(df[ts] + F.expr(f"INTERVAL {arg} HOUR"))
            dc = f"epoch_us({ts} + INTERVAL {arg} HOUR)"
        sels.append(sc.cast("long").alias(al))
        sqls.append(f"CAST({dc} AS BIGINT) AS {al}")
    sdf = df.select(*sels)
    sql = f"SELECT {', '.join(sqls)} FROM {table}"
    return sdf, sql


TM_SEED = 0x71ED


@pytest.mark.parametrize("block", range(2))
def test_fuzz_time_block(spark, ddb, block):
    per_block = N_TIME_SPECS // 2
    for i in range(per_block):
        seed = TM_SEED + block * per_block + i
        spec = gen_time_spec(seed)
        sdf, sql = compile_time_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"time fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# higher-order-function fuzz (round 13, VERDICT r12 item 4): the
# transform/filter/aggregate lambda surface plus map extraction, always
# reduced to SCALARS before comparison (raw array columns render
# differently in pandas - numpy array vs list - so every spec terminates
# in a reduction: fold, len, min/max, join-to-string, element access)
# ---------------------------------------------------------------------------

N_HOF_SPECS = 60

# parity rules probed before inclusion (this round): Spark sequence(1,n)
# == DuckDB generate_series(1,n) (both inclusive); transform/filter/
# aggregate == list_transform/list_filter/list_sum (aggregate from 0L ==
# coalesce(list_sum, 0) since the fold is integer addition);
# try_element_at == l[k] (both NULL out of range - plain element_at
# RAISES under ANSI mode); array_join == array_to_string;
# element_at(map,k) == map_extract(map,k)[1] (DuckDB map_extract returns
# a LIST; map[k] does not cast cleanly).


def gen_hof_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(TABLES))
    meta = TABLES[table]
    spec = {
        "seed": seed,
        "table": table,
        "base_col": rng.choice(meta["ints"]),
        "base_mod": rng.choice([3, 4, 5, 6]),
        "chain": [],
        "reds": [],
    }
    for _ in range(rng.choice([0, 1, 1, 2])):
        if rng.random() < 0.6:
            spec["chain"].append(
                ("transform", rng.choice([2, 3, 5]), rng.choice([0, 1, 7]))
            )
        else:
            spec["chain"].append(
                ("filter", rng.choice([2, 3]), rng.choice([0, 1]))
            )
    kinds = ["sumagg", "size", "amax", "amin", "ajoin", "elem", "contains"]
    for _ in range(rng.choice([1, 2, 2, 3])):
        k = rng.choice(kinds)
        spec["reds"].append((k, rng.choice([1, 2, 3, 6])))
    if rng.random() < 0.35:
        spec["map"] = (
            rng.choice(meta["ints"]),
            rng.choice(meta["ints"]),
            rng.choice(["a", "b", "zz"]),  # zz: absent key -> NULL both
        )
    return spec


def compile_hof_spec(spec, spark, sf_dir):
    table = spec["table"]
    df = load(spark, sf_dir, table)
    c, m = spec["base_col"], spec["base_mod"]
    arr_s = F.sequence(F.lit(1), (df[c] % m) + 1)
    arr_d = f"generate_series(1, ({c} % {m}) + 1)"
    # closure factories, NOT default-arg lambdas: pyspark derives the HOF
    # arity from the lambda's parameter count, so `lambda x, a=a: ...`
    # reads as a 3-arg lambda and fails analysis
    def _tx(a, b):
        return lambda x: x * a + b

    def _fl(mm, r):
        return lambda x: x % mm == r

    for op in spec["chain"]:
        if op[0] == "transform":
            _, a, b = op
            arr_s = F.transform(arr_s, _tx(a, b))
            arr_d = f"list_transform({arr_d}, x -> x * {a} + {b})"
        else:
            _, mm, r = op
            arr_s = F.filter(arr_s, _fl(mm, r))
            arr_d = f"list_filter({arr_d}, x -> x % {mm} = {r})"
    sels, sqls = [], []
    for i, (k, arg) in enumerate(spec["reds"]):
        al = f"h{i}"
        if k == "sumagg":
            sels.append(
                F.aggregate(
                    arr_s, F.lit(0).cast("long"), lambda acc, x: acc + x
                ).alias(al)
            )
            sqls.append(
                f"CAST(coalesce(list_sum({arr_d}), 0) AS BIGINT) AS {al}"
            )
        elif k == "size":
            sels.append(F.size(arr_s).cast("long").alias(al))
            sqls.append(f"CAST(len({arr_d}) AS BIGINT) AS {al}")
        elif k == "amax":
            sels.append(F.array_max(arr_s).cast("long").alias(al))
            sqls.append(f"CAST(list_max({arr_d}) AS BIGINT) AS {al}")
        elif k == "amin":
            sels.append(F.array_min(arr_s).cast("long").alias(al))
            sqls.append(f"CAST(list_min({arr_d}) AS BIGINT) AS {al}")
        elif k == "ajoin":
            # found by this block's first sweep: DuckDB array_to_string of
            # an EMPTY list is NULL where Spark array_join is '' - the
            # coalesce pins the engines to Spark's (SQL-concat-like)
            # convention
            sels.append(
                F.array_join(
                    F.array_sort(arr_s).cast("array<string>"), ","
                ).alias(al)
            )
            sqls.append(
                f"coalesce(array_to_string(list_transform(list_sort("
                f"{arr_d}), x -> x::VARCHAR), ','), '') AS {al}"
            )
        elif k == "elem":
            sels.append(
                F.try_element_at(arr_s, F.lit(arg)).cast("long").alias(al)
            )
            sqls.append(f"CAST(({arr_d})[{arg}] AS BIGINT) AS {al}")
        else:  # contains
            sels.append(F.array_contains(arr_s, F.lit(arg)).alias(al))
            sqls.append(f"list_contains({arr_d}, {arg}) AS {al}")
    if "map" in spec:
        c1, c2, key = spec["map"]
        sels.append(
            F.element_at(
                F.create_map(
                    F.lit("a"), df[c1].cast("long"),
                    F.lit("b"), df[c2].cast("long"),
                ),
                key,
            ).alias("hm")
        )
        sqls.append(
            f"CAST(map_extract(map(['a','b'], [{c1}, {c2}]),"
            f" {_sq(key)})[1] AS BIGINT) AS hm"
        )
    sdf = df.select(*sels)
    sql = f"SELECT {', '.join(sqls)} FROM {table}"
    return sdf, sql


HOF_SEED = 0x40F5


@pytest.mark.parametrize("block", range(2))
def test_fuzz_hof_block(spark, ddb, block):
    per_block = N_HOF_SPECS // 2
    for i in range(per_block):
        seed = HOF_SEED + block * per_block + i
        spec = gen_hof_spec(seed)
        sdf, sql = compile_hof_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"hof fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# DECIMAL aggregation x rollup/cube/grouping-sets fuzz (round 13): the
# fixed-point money discipline (quantize -> DECIMAL(18,s) -> exact agg ->
# VARCHAR render, the agg_decimal_money recipe) swept across the
# multi-grouping shapes.  grouping_id() == GROUPING(...) disambiguates
# subtotal NULLs from data NULLs on both engines (probed this round);
# avg is deliberately absent (Spark widens to DECIMAL(22,6), DuckDB
# returns DOUBLE - no exact dual).
# ---------------------------------------------------------------------------

N_DECGRP_SPECS = 60

DEC_TABLES = {t: m for t, m in TABLES.items() if m["floats"]}


def gen_decgrp_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(DEC_TABLES))
    meta = TABLES[table]
    keys = []
    for _ in range(rng.choice([1, 1, 2])):
        if rng.random() < 0.6:
            k = ("str", rng.choice(meta["strs"]))
        else:
            k = ("mod", rng.choice(meta["ints"]), rng.choice([3, 5]))
        # no duplicate key expressions: ROLLUP(x, x) renders the level-1
        # subtotal's second column as the VALUE in DuckDB (text-matched to
        # the still-grouped first x) but NULL in Spark (two distinct
        # Column objects) - found by this block's first sweep
        if k not in keys:
            keys.append(k)
    aggs = []
    for _ in range(rng.choice([1, 2, 2])):
        aggs.append(
            (
                rng.choice(["sum", "min", "max"]),
                rng.choice(meta["floats"]),
                rng.choice([2, 4]),               # quantization scale
                rng.choice([1, 1, 3, 7]),         # integer multiplier
            )
        )
    return {
        "seed": seed,
        "table": table,
        "keys": keys,
        "aggs": aggs,
        "mode": rng.choice(["group", "rollup", "cube", "sets"]),
        "filter": gen_pred(rng, meta) if rng.random() < 0.4 else None,
    }


def compile_decgrp_spec(spec, spark, sf_dir):
    table = spec["table"]
    df = load(spark, sf_dir, table)
    cols = {c: df[c] for c in df.columns}
    where_sql = ""
    if spec["filter"] is not None:
        sc, dc = compile_pred(spec["filter"], cols)
        df = df.filter(sc)
        where_sql = f" WHERE {dc}"
    kexprs, kcols, ksql, knames = [], [], [], []
    for i, k in enumerate(spec["keys"]):
        al = f"k{i}"
        if k[0] == "str":
            ke = df[k[1]]
            ksql.append(k[1])
        else:
            _, c, m = k
            ke = (df[c] % m).cast("long")
            ksql.append(f"CAST({c} % {m} AS BIGINT)")
        kexprs.append(ke)
        kcols.append(ke.alias(al))
        knames.append(al)
    acols, asql = [], []
    for i, (fn, c, scale, mult) in enumerate(spec["aggs"]):
        al = f"a{i}"
        q = 10 ** scale
        dec_s = (F.floor(df[c] * float(q) + 0.5) / float(q)).cast(
            f"decimal(18,{scale})"
        )
        dec_d = (
            f"CAST(floor({c} * {q}.0 + 0.5) / {q}.0 AS DECIMAL(18,{scale}))"
        )
        if mult != 1:
            dec_s = dec_s * F.lit(mult)
            dec_d = f"({dec_d} * {mult})"
        sfn = {"sum": F.sum, "min": F.min, "max": F.max}[fn]
        acols.append(sfn(dec_s).cast("string").alias(al))
        asql.append(f"CAST({fn}({dec_d}) AS VARCHAR) AS {al}")
    acols.append(F.count("*").alias("n"))
    asql.append("CAST(count(*) AS BIGINT) AS n")
    mode = spec["mode"]
    if mode != "group":
        acols.append(F.grouping_id().cast("long").alias("g"))
        asql.append(f"CAST(GROUPING({', '.join(ksql)}) AS BIGINT) AS g")
    if mode == "group":
        gd = df.groupBy(*kcols)
        gb = f" GROUP BY {', '.join(ksql)}"
    elif mode == "rollup":
        gd = df.rollup(*kcols)
        gb = f" GROUP BY ROLLUP({', '.join(ksql)})"
    elif mode == "cube":
        gd = df.cube(*kcols)
        gb = f" GROUP BY CUBE({', '.join(ksql)})"
    else:  # grouping sets: each key alone plus the grand total.
        # groupingSets must see the SAME (unaliased) Column objects in the
        # sets and the grouping columns - aliased copies silently fail to
        # match and every key comes back NULL with a widened grouping_id
        # (found by this block's first run); output columns are renamed
        # positionally below instead
        sets = [[ke] for ke in kexprs] + [[]]
        gd = df.groupingSets(sets, *kexprs)
        sets_sql = ", ".join(f"({s})" for s in ksql) + ", ()"
        gb = f" GROUP BY GROUPING SETS ({sets_sql})"
    sdf = gd.agg(*acols)
    if mode == "sets":
        out_names = knames + [f"a{i}" for i in range(len(spec["aggs"]))] + [
            "n", "g",
        ]
        sdf = sdf.toDF(*out_names)
    sel = ", ".join(
        [f"{s} AS k{i}" for i, s in enumerate(ksql)] + asql
    )
    having = ""
    if mode != "group":
        # found by this block's first sweep: over EMPTY input (a filter
        # that matches nothing) DuckDB follows the SQL standard and emits
        # the () grouping-set row with count 0, while Spark's
        # rollup/cube/groupingSets return ZERO rows.  Dropping the n=0
        # row on both sides pins a common semantics without losing
        # information - on non-empty input every group has n >= 1
        sdf = sdf.filter(F.col("n") > 0)
        having = " HAVING count(*) > 0"
    sql = f"SELECT {sel} FROM {table}{where_sql}{gb}{having}"
    return sdf, sql


DG_SEED = 0xDEC5


@pytest.mark.parametrize("block", range(2))
def test_fuzz_decimal_grouping_block(spark, ddb, block):
    per_block = N_DECGRP_SPECS // 2
    for i in range(per_block):
        seed = DG_SEED + block * per_block + i
        spec = gen_decgrp_spec(seed)
        sdf, sql = compile_decgrp_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(
            spdf, odf, f"decgrp fuzz seed {seed} ({sql[:120]})"
        )


# ---------------------------------------------------------------------------
# outer-join x window composition fuzz (round 13): LEFT joins with a
# PRE-FILTERED build side (so unmatched rows actually occur and the
# right columns go NULL) feeding window functions whose partition key
# ranges over the NULL fan-out region.  Order key stays the left table's
# verified-unique key, so every frame is a total order; NULL partition
# keys form one partition on both engines.
# ---------------------------------------------------------------------------

N_OJWIN_SPECS = 40


def gen_ojwin_spec(seed: int) -> dict:
    rng = random.Random(seed)
    # orders LEFT JOIN customer is the only N:1 edge whose left key is
    # verified-unique (lineitem has no total order; customer->orders
    # fans out and breaks the window order)
    build_filter = rng.choice(
        [
            ("acctbal", rng.choice([0.0, 1000.0, 5000.0, 9000.0])),
            ("nation_mod", rng.choice([2, 3, 5]), rng.choice([0, 1])),
        ]
    )
    part = rng.choice(
        [
            ("coalesce_seg", "~none~"),
            ("nation_mod_null", rng.choice([3, 5])),
            ("status",),
        ]
    )
    funcs = []
    for _ in range(rng.choice([1, 2, 2, 3])):
        funcs.append(
            rng.choice(["row_number", "runsum_price", "lag_bal", "pcount", "pmax_bal"])
        )
    return {
        "seed": seed,
        "build_filter": build_filter,
        "part": part,
        "desc": rng.random() < 0.4,
        "funcs": funcs,
    }


def compile_ojwin_spec(spec, spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    bf = spec["build_filter"]
    if bf[0] == "acctbal":
        c = c.filter(F.col("c_acctbal") > bf[1])
        build_sql = f"SELECT * FROM customer WHERE c_acctbal > {bf[1]}"
    else:
        _, m, r = bf
        c = c.filter(F.col("c_nationkey") % m == r)
        build_sql = f"SELECT * FROM customer WHERE c_nationkey % {m} = {r}"
    df = o.join(c, o["o_custkey"] == c["c_custkey"], "left")
    from_sql = (
        f"orders LEFT JOIN ({build_sql}) c ON orders.o_custkey = c.c_custkey"
    )
    p = spec["part"]
    if p[0] == "coalesce_seg":
        pk_sc = F.coalesce(c["c_mktsegment"], F.lit(p[1]))
        pk_sql = f"coalesce(c_mktsegment, {_sq(p[1])})"
    elif p[0] == "nation_mod_null":
        # NULL-able partition key on purpose: unmatched rows share the
        # NULL partition on both engines
        pk_sc = (c["c_nationkey"] % p[1]).cast("long")
        pk_sql = f"CAST(c_nationkey % {p[1]} AS BIGINT)"
    else:
        pk_sc = o["o_orderstatus"]
        pk_sql = "o_orderstatus"
    order_sc = o["o_orderkey"].desc() if spec["desc"] else o["o_orderkey"].asc()
    order_sql = f"o_orderkey {'DESC' if spec['desc'] else 'ASC'}"
    over = f"(PARTITION BY {pk_sql} ORDER BY {order_sql})"
    w = Window.partitionBy(pk_sc).orderBy(order_sc)
    cents_price_s = F.floor(o["o_totalprice"] * 100.0 + 0.5).cast("long")
    cents_price_d = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
    bal_s = F.coalesce(
        F.floor(c["c_acctbal"] * 100.0 + 0.5).cast("long"), F.lit(-1)
    )
    bal_d = "coalesce(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT), -1)"
    sels = [
        o["o_orderkey"].cast("long").alias("uk"),
        pk_sc.alias("pk"),
    ]
    sqls = [f"CAST(o_orderkey AS BIGINT) AS uk", f"{pk_sql} AS pk"]
    for i, k in enumerate(spec["funcs"]):
        al = f"w{i}"
        if k == "row_number":
            sels.append(F.row_number().over(w).cast("long").alias(al))
            sqls.append(f"CAST(row_number() OVER {over} AS BIGINT) AS {al}")
        elif k == "runsum_price":
            rw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            sels.append(F.sum(cents_price_s).over(rw).cast("long").alias(al))
            sqls.append(
                f"CAST(sum({cents_price_d}) OVER ({over[1:-1]} ROWS BETWEEN"
                f" UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS {al}"
            )
        elif k == "lag_bal":
            sels.append(F.lag(bal_s, 1).over(w).alias(al))
            sqls.append(f"lag({bal_d}, 1) OVER {over} AS {al}")
        elif k == "pcount":
            pw = Window.partitionBy(pk_sc)
            sels.append(F.count("*").over(pw).cast("long").alias(al))
            sqls.append(
                f"CAST(count(*) OVER (PARTITION BY {pk_sql}) AS BIGINT) AS {al}"
            )
        else:  # pmax_bal: partition max of the NULL-repaired balance
            pw = Window.partitionBy(pk_sc)
            sels.append(F.max(bal_s).over(pw).cast("long").alias(al))
            sqls.append(
                f"CAST(max({bal_d}) OVER (PARTITION BY {pk_sql}) AS BIGINT)"
                f" AS {al}"
            )
    sdf = df.select(*sels)
    sql = f"SELECT {', '.join(sqls)} FROM {from_sql}"
    return sdf, sql


OJ_SEED = 0x01D1


@pytest.mark.parametrize("block", range(2))
def test_fuzz_ojwin_block(spark, ddb, block):
    per_block = N_OJWIN_SPECS // 2
    for i in range(per_block):
        seed = OJ_SEED + block * per_block + i
        spec = gen_ojwin_spec(seed)
        sdf, sql = compile_ojwin_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"ojwin fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# correlated / IN-subquery decorrelation fuzz (round 14, VERDICT r13
# item 6): the one rewrite surface the earlier blocks never touched.
# Specs are compiled to ONE SQL text executed by BOTH engines - for this
# family that is the point: Spark must DECORRELATE (scalar correlated
# subqueries become left outer aggregated joins, [NOT] IN becomes
# [null-aware] semi/anti joins, [NOT] EXISTS becomes semi/anti joins)
# while DuckDB runs its own unnesting, so any rewrite bug diverges on
# the same text.  NOT IN draws from a nullif-injected subquery on
# purpose - one NULL in the subquery must empty the whole result (the
# UNKNOWN-propagation trap) on both engines identically.
# ---------------------------------------------------------------------------

N_SUBQ_SPECS = 48


def gen_subq_spec(seed: int) -> dict:
    rng = random.Random(seed)
    kind = rng.choice(
        ["scalar_cnt", "scalar_max", "in", "not_in", "not_in_null",
         "exists", "not_exists"]
    )
    return {
        "seed": seed,
        "kind": kind,
        # outer-side thinning filter so EXISTS/IN probe full, partial
        # and empty match regions
        "mod": rng.choice([2, 3, 5, 7]),
        "res": rng.choice([0, 1]),
        # subquery-side predicate constant
        "bal": rng.choice([0.0, 1000.0, 4500.0, 9000.0]),
        "qty": rng.choice([10.0, 25.0, 45.0]),
        # the key nullif-ed into the NOT IN subquery (an existing custkey
        # guarantees a real NULL at sf0.001; 10**9 never matches so that
        # branch also exercises the no-NULL path)
        "null_key": rng.choice([1, 2, 3, 10**9]),
    }


def compile_subq_spec(spec, spark, sf_dir):
    # same text, two engines: Spark's analyzer must decorrelate it
    for t in ("orders", "customer", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    outer = f"o_custkey % {spec['mod']} = {spec['res']}"
    k = spec["kind"]
    if k == "scalar_cnt":
        sql = (
            "SELECT CAST(o_orderkey AS BIGINT) AS uk, "
            "CAST((SELECT count(*) FROM lineitem "
            f"WHERE l_orderkey = o_orderkey AND l_quantity > {spec['qty']})"
            " AS BIGINT) AS sub "
            f"FROM orders WHERE {outer}"
        )
    elif k == "scalar_max":
        # scalar correlated MAX over a quantized measure; empty group ->
        # NULL on both engines
        sql = (
            "SELECT CAST(o_orderkey AS BIGINT) AS uk, "
            "(SELECT max(CAST(floor(l_extendedprice * 100.0 + 0.5) AS "
            "BIGINT)) FROM lineitem WHERE l_orderkey = o_orderkey) AS sub "
            f"FROM orders WHERE {outer}"
        )
    elif k in ("in", "not_in"):
        neg = "NOT " if k == "not_in" else ""
        sql = (
            "SELECT CAST(o_orderkey AS BIGINT) AS uk, o_orderstatus AS st "
            f"FROM orders WHERE {outer} AND o_custkey {neg}IN "
            f"(SELECT c_custkey FROM customer WHERE c_acctbal > {spec['bal']})"
        )
    elif k == "not_in_null":
        sql = (
            "SELECT CAST(o_orderkey AS BIGINT) AS uk "
            f"FROM orders WHERE {outer} AND o_custkey NOT IN "
            f"(SELECT nullif(c_custkey, {spec['null_key']}) FROM customer "
            f"WHERE c_acctbal > {spec['bal']})"
        )
    else:
        neg = "NOT " if k == "not_exists" else ""
        sql = (
            "SELECT CAST(o_orderkey AS BIGINT) AS uk "
            f"FROM orders WHERE {outer} AND {neg}EXISTS "
            "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"AND l_quantity > {spec['qty']})"
        )
    return spark.sql(sql), sql


SQ_SEED = 0x5B0C


@pytest.mark.parametrize("block", range(2))
def test_fuzz_subquery_block(spark, ddb, block):
    per_block = N_SUBQ_SPECS // 2
    for i in range(per_block):
        seed = SQ_SEED + block * per_block + i
        spec = gen_subq_spec(seed)
        sdf, sql = compile_subq_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"subq fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# pivot / unpivot fuzz (round 14): Spark's relational pivot (groupBy +
# .pivot(values) + agg) against the portable conditional-aggregation
# spelling, and DataFrame.unpivot (melt) against its UNION ALL dual.
# Pinned semantics this block enforces (probed before writing it):
#   - a pivot CELL is NULL when the (group, value) combination has NO
#     rows; count() over a present-but-all-NULL measure is 0, NOT NULL -
#     the SQL dual needs the two-level CASE below, a plain
#     count(CASE...) conflates the two;
#   - Spark unpivot KEEPS NULL measure values (melt semantics), unlike
#     SQL-standard UNPIVOT which drops them - the UNION ALL dual keeps
#     them too.
# ---------------------------------------------------------------------------

N_PIVOT_SPECS = 40

PIVOT_TABLES = {
    "events": ("user_id", "event_type", "value",
               ["click", "view", "purchase", "signup"]),
    "orders": ("o_custkey", "o_orderstatus", "o_totalprice",
               ["O", "F", "P"]),
    "lineitem": ("l_orderkey", "l_returnflag", "l_quantity",
                 ["A", "N", "R"]),
}


def gen_pivot_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(PIVOT_TABLES))
    return {
        "seed": seed,
        "table": table,
        "mode": rng.choice(["pivot", "pivot", "unpivot"]),
        "agg": rng.choice(["sum", "max", "count"]),
        # nullif-inject NULLs into the measure so count's 0-vs-NULL cell
        # semantics and unpivot's NULL retention are actually exercised
        "null_mod": rng.choice([0, 3, 5]),
        "mod": rng.choice([2, 3, 5]),
        "res": rng.choice([0, 1]),
        "n_vals": rng.choice([2, 3]),
    }


def compile_pivot_spec(spec, spark, sf_dir):
    table = spec["table"]
    key, pcol, measure, all_vals = PIVOT_TABLES[table]
    vals = all_vals[: spec["n_vals"]]
    df = load(spark, sf_dir, table).filter(
        F.col(key) % spec["mod"] == spec["res"]
    )
    where = f"WHERE {key} % {spec['mod']} = {spec['res']}"
    cents_s = F.floor(F.col(measure) * 100.0 + 0.5).cast("long")
    cents_d = f"CAST(floor({measure} * 100.0 + 0.5) AS BIGINT)"
    if spec["null_mod"]:
        cents_s = F.when(
            cents_s % spec["null_mod"] != 0, cents_s
        )  # NULL otherwise
        cents_d = (
            f"CASE WHEN {cents_d} % {spec['null_mod']} <> 0 "
            f"THEN {cents_d} END"
        )
    if spec["mode"] == "unpivot":
        base = df.select(
            F.col(key).cast("long").alias("k"),
            cents_s.alias("m0"),
            (cents_s * 2).alias("m1"),
        )
        sdf = base.unpivot(["k"], ["m0", "m1"], "name", "val")
        sql = (
            f"WITH b AS (SELECT CAST({key} AS BIGINT) AS k, "
            f"{cents_d} AS m0, ({cents_d}) * 2 AS m1 FROM {table} {where}) "
            "SELECT k, 'm0' AS name, m0 AS val FROM b "
            "UNION ALL SELECT k, 'm1' AS name, m1 AS val FROM b"
        )
        return sdf, sql
    agg = spec["agg"]
    sfn = {"sum": F.sum, "max": F.max, "count": F.count}[agg]
    sdf = (
        df.select(F.col(key).cast("long").alias("k"), F.col(pcol), cents_s.alias("c"))
        .groupBy("k")
        .pivot(pcol, vals)
        .agg(sfn(F.col("c")).cast("long"))
    )
    cells = []
    for v in vals:
        inner = f"CASE WHEN {pcol} = '{v}' THEN {cents_d} END"
        if agg == "count":
            # NULL iff the (k, v) combination has no rows AT ALL; else
            # the count of non-NULL measures (0 allowed)
            cell = (
                f"CASE WHEN count(CASE WHEN {pcol} = '{v}' THEN 1 END) = 0 "
                f"THEN NULL ELSE count({inner}) END"
            )
        else:
            cell = f"{agg}({inner})"
        cells.append(f'CAST({cell} AS BIGINT) AS "{v}"')
    sql = (
        f"SELECT CAST({key} AS BIGINT) AS k, {', '.join(cells)} "
        f"FROM {table} {where} GROUP BY 1"
    )
    return sdf, sql


PV_SEED = 0x9140


@pytest.mark.parametrize("block", range(2))
def test_fuzz_pivot_block(spark, ddb, block):
    per_block = N_PIVOT_SPECS // 2
    for i in range(per_block):
        seed = PV_SEED + block * per_block + i
        spec = gen_pivot_spec(seed)
        sdf, sql = compile_pivot_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"pivot fuzz seed {seed} ({sql[:120]})")


# ---------------------------------------------------------------------------
# unionByName-with-missing-columns fuzz (round 14): branches project
# DIFFERENT, differently-ORDERED column subsets of one table and meet in
# unionByName(allowMissingColumns=True); the oracle NULL-pads each
# branch explicitly.  Name-matching (not positional) is the surface
# under test, so every branch shuffles its projection order.  An
# optional distinct on top exercises set semantics over the NULL-padded
# frame (NULLs compare equal in DISTINCT on both engines).
# ---------------------------------------------------------------------------

N_UNION_SPECS = 32

UB_COLS = {
    "orders": [("uk", "CAST(o_orderkey AS BIGINT)", "long"),
               ("ck", "CAST(o_custkey AS BIGINT)", "long"),
               ("st", "o_orderstatus", "string"),
               ("cents", "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)",
                "long")],
    "events": [("uk", "CAST(event_id AS BIGINT)", "long"),
               ("ck", "CAST(user_id AS BIGINT)", "long"),
               ("st", "event_type", "string"),
               ("cents", "CAST(floor(value * 100.0 + 0.5) AS BIGINT)",
                "long")],
}
UB_KEYS = {"orders": "o_orderkey", "events": "event_id"}


def gen_union_spec(seed: int) -> dict:
    rng = random.Random(seed)
    table = rng.choice(sorted(UB_COLS))
    n_branches = rng.choice([2, 2, 3])
    branches = []
    for _ in range(n_branches):
        names = [c[0] for c in UB_COLS[table]]
        # every branch keeps the key (so rows stay distinguishable) plus
        # a random non-empty subset of the rest, in shuffled order
        rest = [n for n in names[1:] if rng.random() < 0.6]
        cols = ["uk"] + (rest or [names[1]])
        rng.shuffle(cols)
        branches.append({
            "cols": cols,
            "mod": rng.choice([2, 3, 4]),
            "res": rng.choice([0, 1]),
        })
    return {
        "seed": seed,
        "table": table,
        "branches": branches,
        "distinct": rng.random() < 0.3,
    }


def compile_union_spec(spec, spark, sf_dir):
    table = spec["table"]
    meta = {c[0]: c for c in UB_COLS[table]}
    all_names = [c[0] for c in UB_COLS[table]]
    key = UB_KEYS[table]
    base = load(spark, sf_dir, table)
    # build the Spark side from the SAME SQL expressions via expr() so
    # the two compilations cannot drift
    sdf_branches = []
    sql_branches = []
    union_names: list = []
    for b in spec["branches"]:
        for c in b["cols"]:
            if c not in union_names:
                union_names.append(c)
    for b in spec["branches"]:
        cols = b["cols"]
        where = f"{key} % {b['mod']} = {b['res']}"
        sdf_b = base.filter(F.expr(where)).select(
            *[F.expr(meta[c][1]).alias(c) for c in cols]
        )
        sdf_branches.append(sdf_b)
        padded = []
        # oracle pads to the FULL union schema in a fixed order; Spark's
        # unionByName(allowMissingColumns=True) must produce the same
        # NULL fill regardless of each branch's projection order
        for c in union_names:
            if c in cols:
                padded.append(f"{meta[c][1]} AS {c}")
            else:
                dt = {"long": "BIGINT", "string": "VARCHAR"}[meta[c][2]]
                padded.append(f"CAST(NULL AS {dt}) AS {c}")
        sql_branches.append(
            f"SELECT {', '.join(padded)} FROM {table} WHERE {where}"
        )
    sdf = sdf_branches[0]
    for nxt in sdf_branches[1:]:
        sdf = sdf.unionByName(nxt, allowMissingColumns=True)
    sql = " UNION ALL ".join(sql_branches)
    if spec["distinct"]:
        sdf = sdf.distinct()
        sql = f"SELECT DISTINCT * FROM ({sql})"
    return sdf, sql


UB_SEED = 0x0B1A


@pytest.mark.parametrize("block", range(2))
def test_fuzz_unionbyname_block(spark, ddb, block):
    per_block = N_UNION_SPECS // 2
    for i in range(per_block):
        seed = UB_SEED + block * per_block + i
        spec = gen_union_spec(seed)
        sdf, sql = compile_union_spec(spec, spark, SF_DIR)
        try:
            spdf = sdf.toPandas()
            odf = ddb.execute(sql).df()
        except Exception as ex:  # pragma: no cover - diagnostics only
            raise AssertionError(
                f"seed {seed}: engine error on spec {spec}: {ex}\nSQL: {sql}"
            ) from ex
        assert_frames_match(spdf, odf, f"union fuzz seed {seed} ({sql[:120]})")
