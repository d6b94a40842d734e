"""Scalar function surface: string / date / math / conditional / null /
cast / JSON / array / map families (SURVEY.md section 2.6).

[REF] families cite the reference's actual use (regex unit parse
receiver.py:66-75, ISO-8601 parse receiver.py:78-84, round receiver.py:75,
JSON codec receiver.py:443 + registry.py:47-49); the rest complete the
standard surface.

Everything here is a pure column expression - JVM-side, whole-stage
codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pround
from ..registry import query


@query(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, '-', c_name) AS seg_name,
           trim('  ' || c_name || ' ') AS name_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           string_split(c_name, '#')[2] AS name_num,
           replace(c_name, 'Customer', 'Cust') AS name_replaced
    FROM customer
    """,
)
def str_funcs(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_num"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_replaced"),
    )


@query(
    "str_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%a%'
      AND p_type NOT LIKE 'SMALL%'
      AND regexp_matches(p_brand, 'Brand#[0-9]+')
    """,
)
def str_like(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return p.filter(
        F.col("p_name").like("%a%")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_brand").rlike("Brand#[0-9]+")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           quarter(o_orderdate) AS order_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(floor(epoch_ms(o_orderdate) / 1000) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """ISO parse / truncate / extract family (reference parses ISO-8601 to
    unix seconds at receiver.py:78-84; epoch_s mirrors that exactly)."""
    o = load(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        # o_orderdate is TIMESTAMP_NTZ (parquet ms, no tz); cast to session-UTC
        # instant before unix_millis - same wall-clock DuckDB's epoch_ms assumes
        F.floor(F.unix_millis(d.cast("timestamp")) / 1000).cast("long").alias("epoch_s"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0 AS disc_amount,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           floor((power(l_quantity, 2)) * 100.0 + 0.5) / 100.0 AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           floor((sqrt(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS price_sqrt,
           floor((ln(l_extendedprice + 1)) * 1000000.0 + 0.5) / 1000000.0 AS price_ln
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("disc_amount"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        pround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        pround(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        pround(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
    )


@query(
    "cond_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 40000 THEN 'high'
                WHEN o_totalprice > 15000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END AS status_name,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def cond_case(spark: SparkSession, sf: str) -> DataFrame:
    """CASE/WHEN surface - the reference's tag-precedence conditional
    (ipv4 over ipv6, receiver.py:92-96) is this exact shape."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 40000, "high")
        .when(F.col("o_totalprice") > 15000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_name"),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "null_funcs",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           CAST(nullif(o_orderstatus, 'O') IS NULL AS INTEGER) AS was_open,
           ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_filled
    FROM orders
    """,
)
def null_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe access family - the reference's chained `.get()` semantics
    (receiver.py:151-155) map to exactly these null-propagating exprs."""
    o = load(spark, sf, "orders")
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_null.alias("status_or_null"),
        F.coalesce(status_null, F.lit("OPEN")).alias("status_filled"),
        status_null.isNull().cast("int").alias("was_open"),
        F.ifnull(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")).alias(
            "prio_filled"
        ),
    )


@query(
    "cast_funcs",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(l_quantity AS DOUBLE) AS qty_dbl,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day
    FROM lineitem
    """,
)
def cast_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Cast lattice (reference casts at receiver.py:113,125,128).  double->int
    goes through floor() first: Spark truncates, DuckDB rounds - floor makes
    both explicit and identical."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_big"),
        F.col("l_quantity").cast("double").alias("qty_dbl"),
        F.floor("l_extendedprice").cast("long").alias("price_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           floor((avg(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 100.0 + 0.5) / 100.0 AS k_avg
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction (reference decodes JSON registry columns at
    registry.py:47-49).  get_json_object returns string -> explicit cast on
    both sides (SURVEY.md 7.4 convention 5)."""
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("k_sum"),
        pround(F.avg(k), 2).alias("k_avg"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
             AS vocab_sorted,
           CAST(list_contains(string_split(text, ' '), 'data') AS INTEGER) AS has_data,
           string_split(text, ' ')[1] AS first_token
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Array surface over tokenized documents (reference builds/indexes
    list-of-struct arrays at receiver.py:148-156,158).  Array outputs are
    sorted + stringified per determinism convention."""
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.concat_ws(",", F.array_sort(F.array_distinct(toks))).alias("vocab_sorted"),
        F.array_contains(toks, "data").cast("int").alias("has_data"),
        toks.getItem(0).alias("first_token"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS user_val,
           'type,user' AS keys_sorted,
           2 AS map_size
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Map build + lookup + key enumeration (reference tags/metrics dicts,
    receiver.py:130-135, key union at :397).  The oracle states the expected
    values directly - build->extract is an identity the oracle can assert
    without map syntax (maps are compared via scalar projections, SURVEY.md
    7.4 convention 4)."""
    ev = load(spark, sf, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "user").alias("user_val"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.size(m).alias("map_size"),
    )


@query(
    "str_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS BIGINT) AS dist_name_brand,
           CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS dist_palindrome,
           greatest(strlen(p_name), strlen(p_type)) AS max_len,
           least(strlen(p_name), strlen(p_type)) AS min_len,
           repeat(p_brand, 2) AS brand2
    FROM part
    """,
)
def str_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance + min/max-across-columns string surface (dedup/entity-
    resolution building blocks; levenshtein is the verify step after
    cheap blocking in record-linkage pipelines)."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").cast("long").alias("dist_name_brand"),
        F.levenshtein("p_name", F.reverse("p_name")).cast("long").alias("dist_palindrome"),
        F.greatest(F.length("p_name"), F.length("p_type")).cast("long").alias("max_len"),
        F.least(F.length("p_name"), F.length("p_type")).cast("long").alias("min_len"),
        F.repeat("p_brand", 2).alias("brand2"),
    )


@query(
    "bit_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS k_and,
           o_orderkey | 4096 AS k_or,
           xor(o_orderkey, 65535) AS k_xor,
           o_orderkey << 2 AS k_shl,
           o_orderkey >> 3 AS k_shr,
           CAST(bit_count(o_orderkey) AS BIGINT) AS k_bits
    FROM orders
    """,
)
def bit_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise arithmetic surface (hash bucketing, bitmap flags, the
    SimHash/MinHash band math all reduce to these)."""
    o = load(spark, sf, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(65535)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).cast("long").alias("k_bits"),
    )


@query(
    "array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           floor((list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                              (a, b) -> a + b)) * 10000.0 + 0.5) / 10000.0 AS vec_sum,
           floor((list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)[1])
                 * 10000.0 + 0.5) / 10000.0 AS first_doubled,
           CAST(len(list_filter(embedding, x -> x > 0.9)) > 0 AS INTEGER) AS any_gt_09,
           CAST(len(list_filter(embedding, x -> x > -10)) = len(embedding) AS INTEGER)
             AS all_gt_neg10
    FROM embeddings
    """,
)
def array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions - transform / filter / aggregate
    (left fold, order-deterministic) / exists / forall - the lambda surface
    the dedup and similarity operators are built from, declared on its own
    so the primitive family is directly oracle-checked."""
    e = load(spark, sf, "embeddings")
    v = F.col("embedding")
    dv = F.transform(v, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        pround(F.aggregate(dv, F.lit(0.0), lambda a, b: a + b), 4).alias("vec_sum"),
        pround(F.element_at(F.transform(dv, lambda x: x * 2.0), 1), 4).alias(
            "first_doubled"
        ),
        F.exists(v, lambda x: x > 0.9).cast("int").alias("any_gt_09"),
        F.forall(v, lambda x: x > -10).cast("int").alias("all_gt_neg10"),
    )


@query(
    "date_series",
    oracle="""
    SELECT o_orderkey, CAST(k.k AS BIGINT) AS day_offset,
           strftime(CAST(o_orderdate AS DATE) + to_days(CAST(k.k AS INTEGER)),
                    '%Y-%m-%d') AS day
    FROM orders
    CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
    WHERE o_orderkey <= 1000
    """,
)
def date_series(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-series generation (date-dim expansion): each order expands
    into a 3-day horizon via sequence + explode - the canonical way to
    build date spines / fill gaps without a stored calendar table."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("day_offset"),
    ).select(
        "o_orderkey",
        F.col("day_offset").cast("long").alias("day_offset"),
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), F.col("day_offset").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
    )


@query(
    "json_roundtrip",
    oracle="""
    SELECT event_id,
           user_id AS uid,
           event_type AS utype,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS first_val,
           CAST(2 AS BIGINT) AS n_vals
    FROM events
    """,
)
def json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JSON construct -> parse -> nested extract round-trip: build a nested
    document with to_json, re-parse with an explicit from_json schema
    (never schema inference mid-pipeline, SURVEY.md 7.4), extract typed
    nested fields and array elements.  The oracle states the identity the
    round-trip must preserve."""
    ev = load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    doc = F.to_json(
        F.struct(
            F.struct(
                F.col("user_id").alias("id"), F.col("event_type").alias("type")
            ).alias("user"),
            F.array(cents, cents * 2).alias("vals"),
        )
    )
    schema = "struct<user: struct<id: bigint, type: string>, vals: array<bigint>>"
    parsed = F.from_json(doc, schema)
    return ev.select(
        "event_id",
        parsed["user"]["id"].alias("uid"),
        parsed["user"]["type"].alias("utype"),
        F.element_at(parsed["vals"], 1).alias("first_val"),
        F.size(parsed["vals"]).cast("long").alias("n_vals"),
    )


@query(
    "time_funcs",
    oracle="""
    SELECT event_id,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS m,
           CAST(second(ts) AS BIGINT) AS s,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(CAST(ts AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
    FROM events
    """,
)
def time_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Time-component extraction + calendar arithmetic.  Cross-engine
    traps pinned here: Spark's dayofweek is 1-based Sunday, DuckDB's
    0-based (normalized to DuckDB's convention); both engines clamp
    month-add to month end (Jan 31 + 1mo = Feb 29)."""
    ev = load(spark, sf, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.hour(ts).cast("long").alias("h"),
        F.minute(ts).cast("long").alias("m"),
        F.second(ts).cast("long").alias("s"),
        (F.dayofweek(ts) - 1).cast("long").alias("dow"),
        F.date_format(F.last_day(ts.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(ts.cast("date"), 1), "yyyy-MM-dd").alias(
            "next_month"
        ),
    )
