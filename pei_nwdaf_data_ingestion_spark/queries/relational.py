"""Relational core: scans, filters, joins, aggregations, set ops, top-K.

All [EXT] per SURVEY.md section 2 - the reference delegates querying to
downstream consumers (reference receiver.py:445 is the last hop), so this is
the relational surface that makes the ingested data queryable.

Scale notes:
- joins are written declaratively; Catalyst + AQE pick broadcast vs
  sort-merge and split skewed partitions.  Small dims (region/nation/
  supplier) are explicitly `broadcast()` where the cardinality is known.
- every aggregation is a partial (map-side) + final hash agg automatically;
  no collect()-based logic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import gated_broadcast, load
from ..functions import band_join, pround
from ..registry import query


# ---------------------------------------------------------------------------
# scans / filters
# ---------------------------------------------------------------------------


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf: str) -> DataFrame:
    """Projection + computed column; Catalyst prunes the parquet scan to the
    four referenced columns (check ReadSchema in explain)."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
    )


@query(
    "scan_filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1000.0
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority NOT LIKE '3%'
    """,
)
def scan_filter_pred(spark: SparkSession, sf: str) -> DataFrame:
    """Conjunctive/disjunctive predicate surface; all three conjuncts push
    down to the parquet scan (PushedFilters)."""
    o = load(spark, sf, "orders")
    return o.filter(
        (F.col("o_totalprice") > 1000.0)
        & F.col("o_orderstatus").isin("O", "F")
        & ~F.col("o_orderpriority").like("3%")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "explode_unnest",
    oracle="""
    SELECT dim,
           count(*) AS n,
           floor((avg(CAST(embedding[dim] AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS avg_val
    FROM embeddings
    CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) dims
    -- explode/flatten SKIPS NULL arrays (Spark posexplode contract);
    -- spell it so the positional-index dual agrees (NULL-input sweep, r8)
    WHERE embedding IS NOT NULL
    GROUP BY dim
    """,
)
def explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """Nested-array flatten (the reference's eventNotifs[] x infos[] loop,
    receiver.py:377-387, generalized): posexplode + per-position agg."""
    e = load(spark, sf, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy((F.col("pos") + 1).cast("long").alias("dim"))
        .agg(
            F.count("*").alias("n"),
            pround(F.avg(F.col("val").cast("double")), 4).alias("avg_val"),
        )
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events,
           floor((sum(value)) * 100.0 + 0.5) / 100.0 AS value_sum
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe join via salting (functions.salted_join): the fact side's
    hot keys are split across 8 sub-partitions keyed by a row-local hash,
    the dim side replicated 8x - result is row-identical to the plain join
    (the oracle IS the plain join), only the shuffle layout differs.  The
    pattern for broadcast-ineligible skewed joins where AQE's skew-split
    thresholds don't fire."""
    from ..functions import salted_join

    ev = load(spark, sf, "events").select("event_id", "user_id", "value")
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, c, on=["user_id"], salt_from="event_id", n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        pround(F.sum("value"), 2).alias("value_sum"),
    )


@query(
    "join_null_keys",
    oracle="""
    WITH k AS (SELECT DISTINCT CASE WHEN user_id % 5 = 0 THEN NULL
                                    ELSE user_id END AS key
               FROM events)
    SELECT
      (SELECT count(*) FROM k) AS n_keys,
      (SELECT count(*) FROM k a JOIN k b ON a.key = b.key) AS eq_matches,
      (SELECT count(*) FROM k a JOIN k b
        ON a.key IS NOT DISTINCT FROM b.key) AS nullsafe_matches
    """,
)
def join_null_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Null-key join semantics: `=` never matches NULL keys (they silently
    drop out - the classic join-count trap), `eqNullSafe` (<=> / IS NOT
    DISTINCT FROM) matches them.  One row of counts proving both engines
    agree on both semantics."""
    ev = load(spark, sf, "events")
    k = ev.select(
        F.when(F.col("user_id") % 5 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("key")
    ).distinct()
    a, b = k.alias("a"), k.alias("b")
    n_keys = k.agg(F.count("*").alias("n_keys"))
    eq = a.join(b, F.col("a.key") == F.col("b.key")).agg(
        F.count("*").alias("eq_matches")
    )
    ns = a.join(b, F.col("a.key").eqNullSafe(F.col("b.key"))).agg(
        F.count("*").alias("nullsafe_matches")
    )
    # three 1-row aggregates stitched with cross joins: one declarative plan,
    # zero driver-side actions (the previous spelling ran 3 eager jobs)
    return n_keys.crossJoin(eq).crossJoin(ns)


@query(
    "join_multiway",
    oracle="""
    SELECT r_name, n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN orders   ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf: str) -> DataFrame:
    """5-table star.  supplier/nation/region are tiny dims -> explicit
    broadcast keeps the big fact table shuffle-free on those hops.  The
    lineitem-orders hop rides the shared gated_broadcast size gate (r13):
    under the gate the whole star is one shuffle-free broadcast chain
    ending in a partial agg (the bench runs AQE-off, where the static
    planner sized the cached orders side past the 10 MB default and fell
    back to a shuffled join); past the gate the hint drops away and
    Catalyst/AQE plan the orders hop from real stats - at 100x both
    fact sides hash-partition on l_orderkey as before."""
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    o = load(spark, sf, "orders")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(gated_broadcast(o, sf, "orders"), li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           floor((coalesce(sum(o_totalprice), 0.0)) * 100.0 + 0.5) / 100.0 AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            pround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH s AS (SELECT user_id, count(*) AS n_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
         p AS (SELECT user_id, count(*) AS n_purchase FROM events
               WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(s.user_id, p.user_id) AS user_id,
           coalesce(n_signup, 0) AS n_signup,
           coalesce(n_purchase, 0) AS n_purchase
    FROM s FULL OUTER JOIN p ON s.user_id = p.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    # rename join keys up front: both sides derive from the same scan, so
    # qualified refs would be ambiguous after a self-joining full outer
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("s_uid"))
        .agg(F.count("*").alias("n_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_uid"))
        .agg(F.count("*").alias("n_purchase"))
    )
    return s.join(p, s.s_uid == p.p_uid, "full").select(
        F.coalesce("s_uid", "p_uid").alias("user_id"),
        F.coalesce("n_signup", F.lit(0)).alias("n_signup"),
        F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 40000.0)
    """,
)
def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 40000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
)
def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """NOT EXISTS as left_anti with the build side pre-filtered (customers
    with no big-ticket order).  The filter keeps the fixture result
    non-empty - the unfiltered anti matched every customer away (every
    fixture customer has orders), a 0-row pass that proved nothing
    (VERDICT r3 'What's wrong' #3)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT r_regionkey AS band, count(*) AS n_customers,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS bal_sum
    FROM customer JOIN region
      ON c_nationkey >= r_regionkey * 5 AND c_nationkey < (r_regionkey + 1) * 5
    GROUP BY r_regionkey
    """,
)
def join_theta_range(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi band join: planned as BroadcastNestedLoopJoin with the
    5-row band table broadcast - the only sane physical shape for theta."""
    c = load(spark, sf, "customer")
    r = load(spark, sf, "region")
    cond = (c.c_nationkey >= r.r_regionkey * 5) & (c.c_nationkey < (r.r_regionkey + 1) * 5)
    return (
        c.join(F.broadcast(r), cond)
        .groupBy(F.col("r_regionkey").alias("band"))
        .agg(
            F.count("*").alias("n_customers"),
            pround(F.sum("c_acctbal"), 2).alias("bal_sum"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name, r_regionkey, n_nationkey
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cartesian product of two tiny dims (5 x 25 = 125 rows).
    Only sane when at least one side is broadcast-small - Spark requires
    the explicit crossJoin call precisely so an accidental cartesian of
    two fact tables cannot slip in; at scale the small side broadcasts
    and the join is a per-row flatMap, no shuffle."""
    r = load(spark, sf, "region").select("r_name", "r_regionkey")
    n = load(spark, sf, "nation").select("n_name", "n_nationkey")
    return r.crossJoin(F.broadcast(n)).select(
        "r_name", "n_name", "r_regionkey", "n_nationkey"
    )


@query(
    "join_asof_lastsignup",
    oracle="""
    SELECT event_id, user_id, event_type,
           max(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_signup_ms
    FROM events
    """,
)
def join_asof_lastsignup(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (latest earlier signup per key) via a running-max window -
    no shuffle beyond the single hash partition on user_id; the same
    formulation scales because state per key is O(1)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.max(
            F.when(F.col("event_type") == "signup", F.unix_millis("ts"))
        ).over(w).alias("last_signup_ms"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_in_window,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS price_sum
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus
    """,
)
def join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Equi key + temporal band: the equi conjunct keeps this a hash join
    (the range is a post-join filter), so it scales like a normal join."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_in_window"),
            pround(F.sum("l_extendedprice"), 2).alias("price_sum"),
        )
    )


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((avg(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price,
           floor((min(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS min_price,
           floor((max(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS max_price,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        pround(F.avg("l_extendedprice"), 2).alias("avg_price"),
        pround(F.min("l_extendedprice"), 2).alias("min_price"),
        pround(F.max("l_extendedprice"), 2).alias("max_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_groupby_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor((avg(l_quantity)) * 100.0 + 0.5) / 100.0 AS avg_qty,
           floor((avg(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price,
           floor((avg(l_discount)) * 100.0 + 0.5) / 100.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_hash(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape - the flagship query (entry() runs this).  Partial
    hash agg on the scan side collapses 600k rows to ~6 groups before any
    shuffle, so this is scan-bound at every scale."""
    li = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(F.sum(disc_price), 2).alias("sum_disc_price"),
            pround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 2).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 2).alias("avg_price"),
            pround(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select("user_id", "event_type").distinct()


@query("agg_approx_distinct")  # rows-only: HLL estimate is engine-dependent
def agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) - the 100TB path for
    cardinality; exact countDistinct is the oracle-checked variant."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            pround(F.sum("o_totalprice"), 2).alias("spent"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- Spark emits NO rollup rows on an empty input where ANSI emits the
    -- 0-count grand-total row; n > 0 filters nothing on populated input
    -- (every emitted cell aggregates >= 1 row) and reconciles the empty
    -- case (empty-input sweep, round 8)
    HAVING count(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(pround(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n, floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- empty-input reconciliation: see agg_rollup (round 8)
    HAVING count(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), pround(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@query(
    "agg_maxby",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderstatus, o_orderkey) AS latest_status,
           min_by(o_orderpriority, o_orderkey) AS first_priority,
           max(o_orderkey) AS latest_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_maxby(spark: SparkSession, sf: str) -> DataFrame:
    """max_by/min_by keyed on the unique o_orderkey so ties are impossible
    (determinism convention, SURVEY.md 7.4).  NULL values are SKIPPED
    (the extremum is taken over rows whose value is known): DuckDB's
    max_by/min_by do this implicitly, Spark's return the value AT the
    extremal key even when NULL - nulling the ordering key alongside the
    value makes the skip explicit and identical (NULL-input sweep, r8)."""
    o = load(spark, sf, "orders")

    def known(val: str):
        return F.when(F.col(val).isNotNull(), F.col("o_orderkey"))

    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", known("o_orderstatus")).alias("latest_status"),
        F.min_by("o_orderpriority", known("o_orderpriority")).alias(
            "first_priority"
        ),
        F.max("o_orderkey").alias("latest_orderkey"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
           count(*) AS n,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    -- empty-input reconciliation: see agg_rollup (round 8)
    HAVING count(*) > 0
    """,
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as rollup/cube alone) via
    spark.sql, with grouping_id to disambiguate real NULL keys from
    superaggregate rows.  One shuffle; the sets are expanded map-side."""
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n,
               floor((sum(l_extendedprice)) * 100.0D + 0.5D) / 100.0D AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
           floor((quantile_cont(value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
           floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS median_val
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` = DuckDB
    `quantile_cont`, both linear interpolation over the sorted group).  The
    approximate sketch path is agg_approx_distinct's HLL cousin
    `percentile_approx` - used in streaming_queries for splits, not
    declared (engine-specific estimates)."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        pround(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        pround(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        pround(F.median("value"), 4).alias("median_val"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT event_type, count(*) AS n,
           floor((stddev_samp(value)) * 10000.0 + 0.5) / 10000.0 AS sd,
           floor((var_samp(value)) * 10000.0 + 0.5) / 10000.0 AS var,
           floor((corr(value, CAST(user_id AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS corr_vu,
           floor((covar_samp(value, CAST(user_id AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS covar_vu
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Second-moment aggregates (stddev/variance/correlation/covariance);
    both engines use numerically-stable one-pass updates, and 4-dp
    rounding absorbs summation-order drift (SURVEY.md 7.4 convention)."""
    ev = load(spark, sf, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        pround(F.stddev_samp("value"), 4).alias("sd"),
        pround(F.var_samp("value"), 4).alias("var"),
        pround(F.corr(F.col("value"), u), 4).alias("corr_vu"),
        pround(F.covar_samp(F.col("value"), u), 4).alias("covar_vu"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100.0 + 0.5) / 100.0 AS "F",
           floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100.0 + 0.5) / 100.0 AS "O"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an explicit value list (fixed output schema - at scale
    never let pivot() infer distinct values with an extra pass); the SQL
    dual is the classic conditional aggregation."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(pround(F.sum("l_quantity"), 2))
    )


@query(
    "agg_unpivot",
    oracle="""
    -- the true dual of unpivot+groupBy: melt first, THEN group, so an
    -- empty input yields zero groups - the old two-global-aggs spelling
    -- fabricated 2 rows on empty input (empty-input sweep, round 8)
    SELECT measure, count(*) AS n,
           floor((sum(val)) * 100.0 + 0.5) / 100.0 AS total
    FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice' AS measure, l_extendedprice AS val
      FROM lineitem)
    GROUP BY measure
    """,
)
def agg_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (wide measures -> long (measure, value) rows) then
    aggregate; the melt happens map-side with no shuffle - only the
    re-aggregation shuffles, on a 2-value key."""
    li = load(spark, sf, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"), pround(F.sum("val"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# sort / limit / set ops
# ---------------------------------------------------------------------------


@query(
    "topk_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orderby_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-K: planned as TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort - this is the shape that survives 100TB.
    Unique-key tiebreak per determinism convention."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "order_nulls",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 199 = 0 THEN NULL ELSE o_totalprice END AS price
    FROM orders
    ORDER BY price ASC NULLS FIRST, o_orderkey
    LIMIT 100
    """,
)
def order_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit NULLS FIRST ordering under a LIMIT, so null placement
    decides which rows survive the cut.  Engines disagree on the default
    (Spark: nulls first ASC; DuckDB: nulls last) - every ordered query
    that can see nulls must pin placement explicitly, exactly as both
    sides do here.  Unique-key tiebreak per the determinism convention."""
    o = load(spark, sf, "orders")
    price = F.when(F.col("o_orderkey") % 199 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.select("o_orderkey", price.alias("price"))
        .orderBy(F.col("price").asc_nulls_first(), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"), F.lit("customer").alias("src")
    )
    s = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'error'
    """,
)
def set_except(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT over (user, day) pairs: click-days with no error that day.
    The pair projection overlaps-but-differs between the two sides, so
    the fixture yields a real result set - the plain user_id EXCEPT was
    empty (every clicking user also errors somewhere), a 0-row pass that
    proved nothing (VERDICT r3 'What's wrong' #3)."""
    ev = load(spark, sf, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    a = ev.filter(F.col("event_type") == "click").select("user_id", day)
    b = ev.filter(F.col("event_type") == "error").select("user_id", day)
    # subtract == SQL EXCEPT (set semantics); exceptAll would be EXCEPT ALL
    return a.subtract(b)


@query(
    "agg_boolean",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_big,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 99) AS any_huge,
           CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_even_user
    FROM events
    GROUP BY event_type
    """,
)
def agg_boolean(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean/conditional aggregates (count_if = FILTER clause dual,
    bool_and/bool_or) - predicate accounting without a pre-filter pass."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_big"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_huge"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_user"),
    )


@query(
    "set_union_byname",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
           CAST(NULL AS VARCHAR) AS brand
    FROM customer
    UNION ALL
    SELECT p_partkey AS id, p_name AS name, CAST(NULL AS VARCHAR) AS segment,
           p_brand AS brand
    FROM part
    """,
)
def set_union_byname(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True) aligns
    by column NAME and null-pads what either side lacks - the append path
    when sources disagree on schema (the reference's dynamic metric columns
    have exactly this shape, receiver.py:394-397)."""
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    p = load(spark, sf, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
    )
    return c.unionByName(p, allowMissingColumns=True)


@query(
    "join_range_bucketed",
    oracle="""
    SELECT p.event_id, count(e.event_id) AS n_errors
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'error') e
      ON e.ts >= p.ts - INTERVAL 5 MINUTE
     AND e.ts <= p.ts + INTERVAL 5 MINUTE
    GROUP BY p.event_id
    """,
)
def join_range_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Fact-to-fact range join with NO equi key (errors within +-5 min of
    each purchase, across ALL users) - the shape Spark would otherwise plan
    as a broadcast-nested-loop / cartesian, which dies at fact x fact
    scale.  Re-expressed as the standard band-bucketing composition: both
    sides bucket by floor(epoch / band); the probe side fans out to its 3
    adjacent buckets (any pair within one band width shares one of them),
    the join becomes a plain EQUI join on the bucket + residual band
    predicate, and each qualifying pair meets exactly once (at the build
    row's unique bucket - no post-join dedup).  Scales like any hash join:
    shuffle on the bucket key, 3x fan-out on the probe side only.
    Catalyst cannot derive this rewrite itself, so it lives as the
    library surface functions.band_join (property-tested vs the naive
    all-pairs filter in tests/test_properties.py); the plan is pinned
    equi-join (never nested-loop) in tests/test_plan_quality.py."""
    # band in MICROseconds: unix_timestamp() truncates to whole seconds,
    # which admits pairs up to 1s outside the true +-5 min window and
    # breaks parity with the oracle's INTERVAL arithmetic
    band = 300 * 1_000_000
    ev = load(spark, sf, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.unix_micros("ts").alias("e_us"),
    )
    joined = band_join(purch, err, "p_us", "e_us", band, how="left")
    return joined.groupBy(F.col("p_id").alias("event_id")).agg(
        # count(e_id) ignores the nulls from unmatched fan-out rows; each
        # real pair appears once, so no distinct needed -- but the 3x
        # fan-out makes unmatched purchases contribute 3 null rows, which
        # count() would not count anyway
        F.count("e_id").alias("n_errors")
    )
