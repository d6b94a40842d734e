"""Reference-semantics queries ('ref_*') - the fidelity layer.

Each query re-expresses one behavior of the reference ingestion pipeline
(receiver.py:89-203,354-458; registry.py:55-109) over the fixture tables:
`events` plays the ingested record stream, `customer` plays the subscription
dimension (FIXTURES.md role mapping).

The exact golden-payload fidelity tests (bitrate table, epoch 1776680100,
drop rules) live in tests/test_reference_fidelity.py; these queries prove
the same expressions behave identically to an independent engine (DuckDB)
at table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..pipeline.normalize import (
    any_tag_present,
    parse_bitrate_mbps,
    parse_iso8601_unix_seconds,
)
from ..functions import pround
from ..registry import query

# Fixed-literal fallback epoch (2026-04-20T10:15:00Z, the reference test
# corpus golden value) - declared queries must not use current_timestamp
# (SURVEY.md 7.4); the now() fallback of receiver.py:128 lives only in the
# streaming path.
FALLBACK_EPOCH = 1776680100


@query(
    "ref_unit_parse",
    oracle="""
    SELECT p_partkey,
           printf('%.2f %s', floor((p_retailprice) * 100.0 + 0.5) / 100.0,
                  ['bps', 'Kbps', 'Mbps', 'Gbps', 'Tbps'][(p_partkey % 5) + 1])
             AS raw_bitrate,
           floor(((floor((p_retailprice) * 100.0 + 0.5) / 100.0) *
                 [1e-6, 1e-3, 1.0, 1e3, 1e6][(p_partkey % 5) + 1]) * 1000000.0 + 0.5) / 1000000.0
             AS mbps
    FROM part
    """,
)
def ref_unit_parse(spark: SparkSession, sf: str) -> DataFrame:
    """Bitrate unit parse '48.57 Mbps' -> Mbps float (receiver.py:66-75).
    Strings are constructed deterministically from `part`, then parsed back
    with the production expression; the oracle states the expected algebra
    directly, so the regex+map pipeline is what's under test."""
    p = load(spark, sf, "part")
    units = F.array(*[F.lit(u) for u in ["bps", "Kbps", "Mbps", "Gbps", "Tbps"]])
    unit = F.element_at(units, (F.col("p_partkey") % 5 + 1).cast("int"))
    raw = F.format_string("%.2f %s", pround("p_retailprice", 2), unit)
    return p.select(
        "p_partkey",
        raw.alias("raw_bitrate"),
        parse_bitrate_mbps(raw).alias("mbps"),
    )


@query(
    "ref_ts_parse",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
           CAST(epoch(strptime(replace(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), 'Z', '+00:00'),
                               '%Y-%m-%dT%H:%M:%S%z')) AS BIGINT) AS unix_s
    FROM events
    """,
)
def ref_ts_parse(spark: SparkSession, sf: str) -> DataFrame:
    """ISO-8601 (Z-suffixed) -> unix seconds with Z->+00:00 normalization
    (receiver.py:78-84).  Golden value check (1776680100) is in the fidelity
    tests; here every event timestamp round-trips through the string form."""
    ev = load(spark, sf, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return ev.select(
        "event_id",
        iso.alias("iso"),
        parse_iso8601_unix_seconds(iso).alias("unix_s"),
    )


@query(
    "ref_ts_coalesce",
    oracle="""
    SELECT event_id,
           coalesce(CASE WHEN event_id % 7 <> 0
                         THEN CAST(floor(epoch_ms(ts) / 1000) AS BIGINT) END,
                    1776680100) AS ts_resolved,
           CAST(event_id % 7 = 0 AS INTEGER) AS used_fallback
    FROM events
    """,
)
def ref_ts_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time with fallback (receiver.py:127-131,158,189: first
    trajectory/comm timestamp else now()).  Fallback is a fixed literal per
    the determinism convention; nulls are injected on event_id % 7."""
    ev = load(spark, sf, "events")
    secs = F.floor(F.unix_millis("ts") / 1000).cast("long")
    maybe = F.when(F.col("event_id") % 7 != 0, secs)
    return ev.select(
        "event_id",
        F.coalesce(maybe, F.lit(FALLBACK_EPOCH)).alias("ts_resolved"),
        (F.col("event_id") % 7 == 0).cast("int").alias("used_fallback"),
    )


@query(
    "ref_context_enrich",
    oracle="""
    SELECT event_id, user_id, c_mktsegment AS ctx_dnn,
           c_nationkey AS ctx_sst, event_type, value
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def ref_context_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """Context-enrichment join: stream x tiny subscription dim, inner (the
    reference 403-drops unknown notif_ids, receiver.py:363-374).  The dim is
    explicitly broadcast - the Spark dual of the reference's in-memory
    registry cache (registry.py:92-95); zero shuffle on the stream side."""
    ev = load(spark, sf, "events")
    dim = load(spark, sf, "customer")
    return ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey, "inner").select(
        "event_id",
        "user_id",
        F.col("c_mktsegment").alias("ctx_dnn"),
        F.col("c_nationkey").alias("ctx_sst"),
        "event_type",
        "value",
    )


@query(
    "ref_event_dispatch",
    oracle="""
    SELECT event_id, event_type,
           floor((CASE event_type
                   WHEN 'signup'   THEN value
                   WHEN 'click'    THEN value * 1000
                   WHEN 'view'     THEN value / 60
                   WHEN 'purchase' THEN value * 100
                 END) * 100.0 + 0.5) / 100.0 AS metric
    FROM events
    WHERE event_type IN ('signup', 'click', 'view', 'purchase')
    """,
)
def ref_event_dispatch(spark: SparkSession, sf: str) -> DataFrame:
    """Event-type dispatch (receiver.py:199-203,377-383): route rows to a
    per-type transform; unsupported types ('error' here, DISPERSION in the
    reference :380-382) are dropped.  One static when/otherwise plan replaces
    per-record dict dispatch."""
    ev = load(spark, sf, "events")
    supported = ["signup", "click", "view", "purchase"]
    metric = (
        F.when(F.col("event_type") == "signup", F.col("value"))
        .when(F.col("event_type") == "click", F.col("value") * 1000)
        .when(F.col("event_type") == "view", F.col("value") / 60)
        .when(F.col("event_type") == "purchase", F.col("value") * 100)
    )
    return ev.filter(F.col("event_type").isin(supported)).select(
        "event_id", "event_type", pround(metric, 2).alias("metric")
    )


@query(
    "ref_validity_filter",
    oracle="""
    WITH tagged AS (
      SELECT event_id, event_type,
             CASE WHEN user_id % 3 = 0 THEN '10.0.' || CAST(user_id AS VARCHAR) END
               AS ueIpv4Addr,
             CASE WHEN user_id % 5 = 0 THEN 'imsi-' || CAST(user_id AS VARCHAR) END
               AS supi
      FROM events)
    SELECT event_id, event_type, ueIpv4Addr, supi
    FROM tagged
    WHERE ueIpv4Addr IS NOT NULL OR supi IS NOT NULL
    """,
)
def ref_validity_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Drop record when no identity tag present (receiver.py:100-101,
    145-146,177-178,386-389).  Tags are injected sparsely, then the
    any-tag-present predicate filters."""
    ev = load(spark, sf, "events")
    ipv4 = F.when(
        F.col("user_id") % 3 == 0, F.concat(F.lit("10.0."), F.col("user_id").cast("string"))
    )
    supi = F.when(
        F.col("user_id") % 5 == 0, F.concat(F.lit("imsi-"), F.col("user_id").cast("string"))
    )
    tagged = ev.select(
        "event_id", "event_type", ipv4.alias("ueIpv4Addr"), supi.alias("supi")
    )
    return tagged.filter(any_tag_present(F.col("ueIpv4Addr"), F.col("supi")))


@query(
    "ref_policy_hash",
    oracle="""
    SELECT event_id,
           sha256(CAST(user_id AS VARCHAR)) AS user_sha256,
           md5(event_type) AS type_md5
    FROM events
    """,
)
def ref_policy_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Policy 'hashing' transform (README.md:10; applied via the external
    policy service in the reference, receiver.py:414-431) as native column
    hashes - the RPC disappears."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.sha2(F.col("user_id").cast("string"), 256).alias("user_sha256"),
        F.md5("event_type").alias("type_md5"),
    )


@query(
    "ref_policy_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS name_redacted,
           'REDACTED' AS acctbal_redacted
    FROM customer
    """,
)
def ref_policy_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Policy 'redaction' transform (README.md:10): digit masking + full
    literal replacement."""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_redacted"),
        F.lit("REDACTED").alias("acctbal_redacted"),
    )


@query(
    "ref_policy_project",
    oracle="""
    SELECT event_id, event_type,
           sha256(CAST(user_id AS VARCHAR)) AS user_hashed
    FROM events
    """,
)
def ref_policy_project(spark: SparkSession, sf: str) -> DataFrame:
    """Policy field filtering (receiver.py:427-433: keys intersected with
    the policy result): an allow-list projection that drops value/props/ts
    and hashes the user identity."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.sha2(F.col("user_id").cast("string"), 256).alias("user_hashed"),
    )


@query(
    "ref_upsert_lastwins",
    oracle="""
    SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def ref_upsert_lastwins(spark: SparkSession, sf: str) -> DataFrame:
    """Last-write-wins keyed upsert (registry.py:76-88 INSERT OR REPLACE;
    asserted tests/test_registry.py:34-40): latest row per key via
    row_number over (ts desc, unique id desc)."""
    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.unix_millis("ts").alias("ts_ms"))
    )


@query(
    "ref_dynamic_fields",
    oracle="""
    SELECT field, count(*) AS n_records
    FROM (SELECT unnest(json_keys(props)) AS field FROM events)
    GROUP BY field
    """,
)
def ref_dynamic_fields(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic metric-field discovery (receiver.py:45-46,394-397): union of
    JSON keys across all records.  Batch dual of the foreachBatch
    accumulator in the streaming path."""
    ev = load(spark, sf, "events")
    return (
        ev.select(F.explode(F.json_object_keys("props")).alias("field"))
        .groupBy("field")
        .agg(F.count("*").alias("n_records"))
    )


@query(
    "ref_batch_pack",
    oracle="""
    SELECT user_id, CAST(len(recs) AS BIGINT) AS n_records,
           to_json(recs) AS batch_json
    FROM (
      SELECT user_id,
             list(struct_pack(event_id := event_id, event_type := event_type,
                              value_cents := CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                              ts_ms := epoch_ms(ts)) ORDER BY event_id) AS recs
      FROM events GROUP BY user_id)
    """,
)
def ref_batch_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Batch gather: all records of one key -> ONE JSON-array message
    (receiver.py:376-387,443: one Kafka produce per notification).  The
    array is sorted by event_id so output is deterministic, and every field
    is integral or string (value as integer cents) so the compact JSON
    rendering is byte-identical across engines - which makes the wire
    payload itself oracle-checkable."""
    ev = load(spark, sf, "events")
    rec = F.struct(
        F.col("event_id"),
        F.col("event_type"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("value_cents"),
        F.unix_millis("ts").alias("ts_ms"),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(rec)).alias("records"))
        .select(
            "user_id",
            F.size("records").cast("long").alias("n_records"),
            # ignoreNullFields=false: a record with an unknown field keeps
            # an explicit "field":null on the wire (matching DuckDB's
            # to_json and any schema-ful consumer; Spark's default silently
            # drops the key - NULL-input sweep, round 8)
            F.to_json(
                F.col("records"), {"ignoreNullFields": "false"}
            ).alias("batch_json"),
        )
    )
