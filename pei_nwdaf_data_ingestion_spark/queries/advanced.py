"""Advanced relational + pipeline operators beyond the round-1 core:
subqueries, deterministic sampling, mode/histogram aggregates, partial
re-aggregation, sketch merging, and duplicate-cluster connected components.

All [EXT] per SURVEY.md section 2 - the reference delegates querying to
downstream consumers (reference receiver.py:445 is the last hop); these
complete the analytics surface a training-data pipeline needs at 100 TB:
reproducible sampling, mergeable sketches, and transitive dedup clustering
are the scale workhorses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pround
from ..graph import connected_components
from ..registry import QUERIES, query
from .llm import _spread


# ---------------------------------------------------------------------------
# subqueries (Catalyst decorrelates these into joins - RewriteCorrelated
# ScalarSubquery / RewritePredicateSubquery, SURVEY.md 4.2)
# ---------------------------------------------------------------------------


@query(
    "subq_scalar_correlated",
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 12
    """,
)
def subq_scalar_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery; Catalyst decorrelates it into an
    aggregate + join (one shuffle on the correlation key), never a per-row
    re-execution.  The correlated measure is an exact integer count so the
    predicate boundary is parity-safe."""
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 12
        """
    )


@query(
    "subq_in_notin",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity <= 2)
    """,
)
def subq_in_notin(spark: SparkSession, sf: str) -> DataFrame:
    """IN / NOT IN predicate subqueries; Catalyst rewrites them to left-semi
    and null-aware left-anti joins.  l_partkey is non-null in the fixture,
    so NOT IN's three-valued-logic trap (any NULL empties the result) does
    not bite; join_null_keys pins the NULL-key semantics explicitly."""
    load(spark, sf, "part").createOrReplaceTempView("part")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity <= 2)
        """
    )


# ---------------------------------------------------------------------------
# deterministic sampling (reproducible train/eval splits at 100 TB: the
# sample is a pure function of the key, not of engine/partitioning/seed
# state, so it is stable across engines, re-runs, and cluster sizes)
# ---------------------------------------------------------------------------


@query(
    "sample_hash_det",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')
    """,
)
def sample_hash_det(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~25% sample by first hex digit of md5(key).  Unlike
    df.sample() (seeded per-partition RNG - changes with repartitioning),
    a key-hash sample is reproducible anywhere, composable (digit ranges
    give nested splits), and pushes down as an ordinary predicate."""
    d = load(spark, sf, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.filter(digit.isin("0", "1", "2", "3")).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# aggregates: mode, histogram, partial re-aggregation, sketches
# ---------------------------------------------------------------------------


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM c)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break (count DESC, value ASC)
    - native mode() leaves ties engine-defined, so it is formulated as
    count + row_number (SURVEY.md 7.4 determinism convention).  Two
    shuffles: group count, then the tiny per-group ranking."""
    o = load(spark, sf, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000.0 AS bucket_lo,
           count(*) AS n,
           floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0 AS min_price,
           floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0 AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width numeric histogram via floor-division bucketing - the
    map-side expression form of width_bucket, so the whole histogram is one
    partial+final hash agg over ~20 groups (no sort, no per-bucket scan)."""
    o = load(spark, sf, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000.0).cast("long")
    return (
        o.select(
            bucket.alias("bucket"),
            (bucket * 25000.0).alias("bucket_lo"),
            "o_totalprice",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n"),
            pround(F.min("o_totalprice"), 2).alias("min_price"),
            pround(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "agg_partial_reagg",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*) AS n,
           floor((sum(value)) * 100.0 + 0.5) / 100.0 AS value_sum,
           floor(((floor((sum(value)) * 100.0 + 0.5) / 100.0) / count(*))
                 * 100.0 + 0.5) / 100.0 AS value_avg,
           min(value) AS value_min,
           max(value) AS value_max
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_partial_reagg(spark: SparkSession, sf: str) -> DataFrame:
    """Algebraic re-aggregation: hourly partials (count/sum/min/max) are
    rolled up to daily WITHOUT touching raw rows again - avg is re-derived
    as sum-of-sums / sum-of-counts.  The oracle aggregates the raw rows
    directly, proving the partials are lossless.  This is the hypertable /
    materialized-rollup pattern: at 100 TB the hourly layer is ~1e5x
    smaller than raw, and every coarser window reads it instead."""
    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n_h"),
        F.sum("value").alias("sum_h"),
        F.min("value").alias("min_h"),
        F.max("value").alias("max_h"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_h").alias("n"),
            pround(F.sum("sum_h"), 2).alias("value_sum"),
            # avg from the ROUNDED sum: raw sum-of-sums differs from the
            # oracle's direct sum by an ulp (different add order), which can
            # flip the 2dp rounding of the quotient; the rounded sums are
            # pinned equal, so the quotient is bit-identical on both sides
            pround(pround(F.sum("sum_h"), 2) / F.sum("n_h"), 2).alias("value_avg"),
            F.min("min_h").alias("value_min"),
            F.max("max_h").alias("value_max"),
        )
    )


@query("agg_hll_sketch_merge")  # rows-only: HLL estimates are engine-specific
def agg_hll_sketch_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): one
    sketch per event_type, then the ALL row is produced by MERGING the
    per-type sketches - the raw rows are never rescanned.  This is the
    100 TB pattern: persist sketch partials per partition/day, answer any
    coarser distinct-count by union.  Accuracy vs exact is asserted in
    tests (typical HLL error at lgK=12 is ~1.6%)."""
    ev = load(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    by_type = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return by_type.unionAll(merged)


@query("agg_approx_quantile")  # rows-only: sketch estimates are engine-specific
def agg_approx_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (percentile_approx): single pass, bounded memory, mergeable across
    partitions - the scale path where exact percentile (agg_percentile)
    would need a full sort per group.  Accuracy asserted in tests."""
    ev = load(spark, sf, "events")
    qs = F.percentile_approx(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(qs.alias("q")).select(
        "event_type",
        F.col("q")[0].alias("p25"),
        F.col("q")[1].alias("p50"),
        F.col("q")[2].alias("p75"),
    )


# ---------------------------------------------------------------------------
# duplicate clustering: near-dup pairs -> connected components
# ---------------------------------------------------------------------------

def _components_ctes() -> str:
    """Shared oracle CTE chain: LSH-verified edges -> min-neighbor
    contraction -> recursive min-label fixpoint on the residue -> per-doc
    labels (CTE `comp`: doc_id, component_id).

    The contraction (m(v) = min(v, neighbors); edges relabeled through m,
    self-loops dropped) mirrors graph.connected_components' pre-pass and
    preserves components exactly - and it is what makes the oracle RUN at
    scale-shifted fixtures: on the sf0.1 near-clique (2.9M verified
    edges pre-cap - the r8 stop-band cap shrinks the set to ~149k, and
    the contraction pays either way) the naive recursive CTE accumulates
    every (node, smaller-reachable-label) pair - ~n^2/2 reach rows joined
    against 5.8M directed edges per iteration, tens of billions of
    intermediate rows - while the contracted residue is 1949 edges."""
    from .llm import minhash_verified_pairs_ctes

    return f"""{minhash_verified_pairs_ctes()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM vpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM vpairs),
m AS (
  SELECT src AS node, least(src, min(dst)) AS m
  FROM edges GROUP BY src),
redge AS (
  SELECT DISTINCT least(ma.m, mb.m) AS src, greatest(ma.m, mb.m) AS dst
  FROM vpairs p
  JOIN m ma ON ma.node = p.doc_a
  JOIN m mb ON mb.node = p.doc_b
  WHERE ma.m <> mb.m),
redges AS (
  SELECT src, dst FROM redge
  UNION ALL
  SELECT dst AS src, src AS dst FROM redge),
reach(node, lbl) AS (
  SELECT src AS node, src AS lbl FROM (SELECT DISTINCT src FROM redges) s
  UNION
  SELECT e.src AS node, r.lbl AS lbl
  FROM redges e JOIN reach r ON e.dst = r.node),
rcomp AS (
  SELECT node, min(lbl) AS component_id FROM reach GROUP BY node),
comp AS (
  SELECT m.node AS doc_id,
         coalesce(rc.component_id, m.m) AS component_id
  FROM m LEFT JOIN rcomp rc ON rc.node = m.m)"""


def _components_oracle() -> str:
    return f"""
WITH RECURSIVE {_components_ctes()}
SELECT doc_id, component_id FROM comp
"""


@query("dedup_cluster_components", oracle=_components_oracle())
def dedup_cluster_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive duplicate clusters over the LSH-VERIFIED edge set: the
    near-dup edges come from dedup_minhash_lsh's banded candidate +
    exact-Jaccard-verify pipeline (threshold 0.8, corpus-global - no
    (lang, source) blocking), and each doc is labeled with the smallest
    doc_id in its connected component (graph.connected_components -
    large-star/small-star, O(log n) rounds regardless of cluster-chain
    diameter).  Dedup at scale NEEDS this step: pairwise output alone
    double-counts docs in clusters of size > 2, and canonical-doc
    selection is per-component.

    Until round 6 the edge set came from blocked all-pairs Jaccard -
    lossless but QUADRATIC within each (lang, source) block, the one
    scale-unsafe stage the round-6 audit flagged (VERDICT r6 item 4): at
    100 TB a hot block is billions of docs and the pairwise join never
    finishes, while the LSH candidate path costs O(corpus) hashes plus
    bucket-local verification.  Round 8 adds the hot-bucket stop-band cap
    (_MH_BUCKET_CAP): boilerplate-signature buckets stop generating their
    quadratic pair space (sf0.1: 2.9M -> ~149k verified edges) and
    contribute verified STAR edges (bucket-min -> member) instead - linear
    in bucket size, exactly sufficient for THIS consumer (connectivity,
    not the pair listing, is what clustering needs), and already a label-
    propagation fixpoint, so the star rounds converge immediately (the 2654-doc boilerplate
    cluster still resolves to one component; dedup_lsh_recall_audit
    quantifies the pair-listing recall the cap trades away).  The DuckDB
    oracle recomputes the IDENTICAL signatures, bands, hot buckets,
    stars and verified edges (shared CTE text with dedup_minhash_lsh's
    oracle), then the same fixpoint as a recursive CTE - so the hash
    check covers edge generation AND label propagation.

    Since r12 the contracted residue resolves through graph.py's
    size-gated driver union-find (the contraction collapses 147k
    verified edges to ~2k residue edges at sf0.1; a residue under
    _CC_LOCAL_SOLVE_EDGES is a bounded driver table by the
    gated_broadcast rule, labeled bit-identically to the star-round
    fixpoint - tests pin equality against the distributed path with
    the gate forced shut)."""
    from .llm import _minhash_verified_pairs

    pairs = _minhash_verified_pairs(spark, sf).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    # lowest-band emission already guarantees ordered, deduped, loop-free
    # edges, so CC skips its entry canonicalization shuffle; the verified
    # graph is still dense around the capped clusters (~149k edges over
    # ~4k docs at sf0.1 since the stop-band cap; 2.9M uncapped), so the
    # min-neighbor contraction pre-pass collapses it before the star
    # rounds ever see it
    labels, _ = connected_components(
        pairs, assume_canonical=True, pre_contract=True
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component_id")
    )


# ---------------------------------------------------------------------------
# MERGE-style keyed upsert
# ---------------------------------------------------------------------------


@query(
    "merge_upsert",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN o_custkey % 7 = 0 THEN -o_custkey ELSE o_custkey END AS key,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS spend_cents
      FROM orders GROUP BY 1)
    SELECT coalesce(s.key, c.c_custkey) AS cust_key,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN s.key IS NULL THEN 'keep' ELSE 'update' END AS action,
           coalesce(c.c_name, 'new-' || CAST(s.key AS VARCHAR)) AS name,
           floor((CASE WHEN c.c_custkey IS NULL THEN s.spend_cents / 100000.0
                       WHEN s.key IS NULL THEN c.c_acctbal
                       ELSE c.c_acctbal + s.spend_cents / 100000.0 END)
                 * 100.0 + 0.5) / 100.0 AS acctbal,
           coalesce(s.n_orders, 0) AS n_orders
    FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.key
    """,
)
def merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE-style keyed dim upsert - the production dual of the
    reference's `INSERT OR REPLACE INTO nef_subscriptions`
    (reference registry.py:76-88), generalized to the three MERGE
    branches: WHEN MATCHED THEN UPDATE (balance credited from the source
    feed), WHEN NOT MATCHED BY TARGET THEN INSERT, WHEN NOT MATCHED BY
    SOURCE THEN keep.  The source feed is an orders rollup; keys divisible
    by 7 are remapped negative so the fixture exercises the insert branch.

    Spark-first MERGE without a table format: full-outer join on the key +
    per-branch coalesce/CASE projection.  A full-outer join cannot
    broadcast, so both sides shuffle once on the merge key - exactly the
    co-partitioning Delta/Iceberg MERGE performs; the update expression
    reads BOTH sides (c_acctbal + delta), which a union+row_number
    last-wins (ref_upsert_lastwins) cannot express.  Money stays integral
    (per-row cents before the sum) so the aggregate is order-independent
    and bit-identical cross-engine."""
    c = load(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    o = load(spark, sf, "orders")
    src = (
        o.groupBy(
            F.when(F.col("o_custkey") % 7 == 0, -F.col("o_custkey"))
            .otherwise(F.col("o_custkey"))
            .alias("key")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5))
            .cast("long")
            .alias("spend_cents"),
        )
    )
    merged = c.join(src, c.c_custkey == src.key, "full_outer")
    delta = F.col("spend_cents") / 100000.0
    return merged.select(
        F.coalesce("key", "c_custkey").alias("cust_key"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.coalesce(
            "c_name", F.concat(F.lit("new-"), F.col("key").cast("string"))
        ).alias("name"),
        pround(
            F.when(F.col("c_custkey").isNull(), delta)
            .when(F.col("key").isNull(), F.col("c_acctbal"))
            .otherwise(F.col("c_acctbal") + delta),
            2,
        ).alias("acctbal"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# corpus statistics: n-gram top-k, token co-occurrence
# ---------------------------------------------------------------------------


@query(
    "text_ngram_topk",
    oracle="""
    WITH grams AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
             AS gram
      FROM documents)
    SELECT gram, count(*) AS n
    FROM grams GROUP BY gram
    ORDER BY n DESC, gram LIMIT 20
    """,
)
def text_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: map-side 1->N shingle expansion, one
    hash agg, TakeOrderedAndProject for the limit (no global sort
    materialized).  Tie-break on the gram string keeps the cut
    deterministic (SURVEY.md 7.4)."""
    from .llm import _bigrams

    d = load(spark, sf, "documents")
    return (
        d.select(F.explode(_bigrams(F.split("text", " "))).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


@query(
    "text_cooccurrence",
    oracle="""
    WITH dtok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
      FROM dtok a JOIN dtok b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok),
    dfreq AS (SELECT tok, count(*) AS df FROM dtok GROUP BY tok),
    total AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tok_a, tok_b, n_ab,
           floor((CAST(n_ab * n_docs AS DOUBLE) / CAST(da.df * db.df AS DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS lift
    FROM pairs
    CROSS JOIN total
    JOIN dfreq da ON pairs.tok_a = da.tok
    JOIN dfreq db ON pairs.tok_b = db.tok
    WHERE n_ab >= 5
    """,
)
def text_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Document-level token co-occurrence with lift = P(a,b)/(P(a)P(b))
    (PMI = ln(lift); lift avoids cross-engine log() ulp drift).  Pair
    generation is MAP-SIDE - nested array transforms emit each doc's
    token combinations without a self-join shuffle; only the O(vocab^2)
    pair counts shuffle, which is tiny regardless of corpus size.  The
    doc-frequency dim joins broadcast."""
    d = load(spark, sf, "documents")
    # corpus size as a broadcast 1-row aggregate (no eager driver count job)
    n = d.agg(F.count("*").alias("n_docs"))
    tok_expr = F.array_sort(F.array_distinct(F.split("text", " ")))
    # materialize the token array ONCE per row before the nested lambdas:
    # higher-order functions are interpreted (not codegen'd) and re-evaluate
    # any embedded expression subtree per element, so inlining the
    # split+distinct+sort into the lambda re-tokenized each doc ~n_tok
    # times (measured 2x the stage time at sf0.1)
    toks = F.col("toks")
    combos = F.flatten(
        F.transform(
            toks,
            lambda x: F.transform(
                F.filter(toks, lambda y: y > x),
                lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
            ),
        )
    )
    dt = d.select("doc_id", tok_expr.alias("toks"))
    pairs = (
        dt.select(F.explode(combos).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    dfreq = (
        dt.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    da = F.broadcast(dfreq.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a")))
    db = F.broadcast(dfreq.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b")))
    return (
        pairs.join(da, "tok_a")
        .join(db, "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            pround(
                (F.col("n_ab") * F.col("n_docs")).cast("double")
                / (F.col("df_a") * F.col("df_b")).cast("double"),
                4,
            ).alias("lift"),
        )
    )


def _canonical_oracle() -> str:
    return f"""
WITH RECURSIVE {_components_ctes()},
lab AS (
  SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS comp, d.n_chars
  FROM documents d LEFT JOIN comp c USING (doc_id)),
rep AS (
  SELECT comp, doc_id AS canonical_id
  FROM (SELECT comp, doc_id,
               row_number() OVER (PARTITION BY comp
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab)
  WHERE rn = 1)
SELECT l.doc_id, r.canonical_id,
       CAST(l.doc_id = r.canonical_id AS INT) AS kept
FROM lab l JOIN rep r ON l.comp = r.comp
"""


@query("dedup_canonical_select", oracle=_canonical_oracle())
def dedup_canonical_select(spark: SparkSession, sf: str) -> DataFrame:
    """The dedup KEEP-LIST - the step that actually shrinks the corpus:
    every doc mapped to its cluster's canonical representative (longest
    doc wins, doc_id tiebreak; singletons represent themselves) plus a
    kept flag.  Composes dedup_cluster_components' transitive clusters
    (without this, near-dup pairs alone can't tell which doc of a
    3+-cluster to keep) with a per-component window rank.  Shuffle
    profile: the CC rounds + one labels join + one component-keyed window
    - all key-partitioned, nothing driver-side; at 100 TB the window key
    (component) is bounded by cluster size, not corpus size."""
    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    labels = QUERIES["dedup_cluster_components"](spark, sf)
    lab = d.join(labels, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("component_id", "doc_id").alias("comp"),
    )
    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), "doc_id")
    rep = (
        lab.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("comp", F.col("doc_id").alias("canonical_id"))
    )
    return lab.join(rep, "comp").select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# event analytics: funnel, retention, gaps-and-islands (round 5)
# ---------------------------------------------------------------------------


@query(
    "events_funnel_conversion",
    oracle="""
    WITH per_ud AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
      FROM events GROUP BY 1, 2),
    with_c AS (
      SELECT p.user_id, p.d, p.s_ts,
             min(CASE WHEN e.event_type = 'click' AND e.ts > p.s_ts
                      THEN e.ts END) AS c_ts
      FROM per_ud p JOIN events e
        ON e.user_id = p.user_id AND CAST(e.ts AS DATE) = p.d
      GROUP BY 1, 2, 3),
    with_p AS (
      SELECT c.user_id, c.d, c.s_ts, c.c_ts,
             min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.c_ts
                      THEN e.ts END) AS p_ts
      FROM with_c c JOIN events e
        ON e.user_id = c.user_id AND CAST(e.ts AS DATE) = c.d
      GROUP BY 1, 2, 3, 4)
    SELECT CASE WHEN s_ts IS NULL THEN 0
                WHEN c_ts IS NULL THEN 1
                WHEN p_ts IS NULL THEN 2
                ELSE 3 END AS stage,
           count(*) AS n_user_days,
           floor(avg(CASE WHEN p_ts IS NOT NULL
                          THEN CAST(epoch_us(p_ts) - epoch_us(s_ts) AS DOUBLE)
                               / 60000000.0 END) * 100.0 + 0.5) / 100.0
             AS avg_minutes_to_convert
    FROM with_p
    GROUP BY 1
    """,
)
def events_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel over daily (user, day) instances: signup -> later
    click that day -> later purchase that day.  A later-step event only
    counts if it happens strictly after the previous step's first
    occurrence - the property that separates funnel analysis from plain
    per-type counts - and the day grain makes the funnel repeatable (all
    four stages populated on the fixture: 2395/1278/286/47 at sf0.01).
    ONE hash aggregation keyed by (user, day) computes all three stage
    timestamps: the signup min plus per-instance click/purchase
    timestamp lists, with the later-step dependency (only events
    strictly after the previous step's first occurrence count) resolved
    by array_min over a filtered list instead of a join back to events.
    The r15 rewrite: the previous spelling joined events back to the
    per-instance frame twice (three scans of events, five exchanges of
    event-scale data); this one shuffles events ONCE, and the per-key
    lists are bounded by one user-day's events.  Skew bound (ADVICE
    r15): a pathological hot key (a bot with millions of same-day
    clicks) still materializes its whole timestamp list in one row -
    at that regime switch to a two-pass conditional min-agg (aggregate
    s_ts, then min(ts > s_ts) keyed a second time) instead of
    collected lists.  NULL-key (user, day) groups are filtered up
    front to reproduce the join spelling exactly (equi-joins drop NULL
    keys; so does the oracle's)."""
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "ts", F.col("ts").cast("date").alias("d")
    )
    g = (
        ev.filter(F.col("user_id").isNotNull() & F.col("d").isNotNull())
        .groupBy("user_id", "d")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("s_ts"),
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ).alias("clicks"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchases"),
        )
    )
    # min click strictly after s_ts; filter drops non-true predicates, so
    # a NULL s_ts yields an empty list and array_min([]) = NULL - exactly
    # the join spelling's min(when(ts > NULL)) = NULL
    c_ts = F.array_min(F.filter(F.col("clicks"), lambda t: t > F.col("s_ts")))
    p = g.withColumn("c_ts", c_ts).select(
        "user_id",
        "d",
        "s_ts",
        "c_ts",
        F.array_min(
            F.filter(F.col("purchases"), lambda t: t > F.col("c_ts"))
        ).alias("p_ts"),
    )
    stage = (
        F.when(F.col("s_ts").isNull(), 0)
        .when(F.col("c_ts").isNull(), 1)
        .when(F.col("p_ts").isNull(), 2)
        .otherwise(3)
    )
    minutes = F.when(
        F.col("p_ts").isNotNull(),
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).cast("double")
        / 60_000_000.0,
    )
    return p.groupBy(stage.alias("stage")).agg(
        F.count("*").alias("n_user_days"),
        pround(F.avg(minutes), 2).alias("avg_minutes_to_convert"),
    )


@query(
    "agg_retention_cohort",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(f.d0 AS VARCHAR) AS cohort_day,
           CAST(a.d - f.d0 AS BIGINT) AS day_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN first_day f USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each later day they return - the (cohort, offset, n)
    matrix every growth dashboard draws.  Day grain (not week) because
    engines disagree on week-start conventions; dates render as strings
    for hash stability.  Two hash aggs + one key join; the distinct and
    both groupBys shuffle on user_id/cohort keys only."""
    ev = load(spark, sf, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    activity = ev.distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            F.col("d0").cast("string").alias("cohort_day"),
            F.datediff("d", "d0").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "win_gap_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             event_id - row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id) AS grp
      FROM events)
    SELECT user_id, min(event_id) AS island_start,
           max(event_id) AS island_end,
           count(*) AS island_len
    FROM seq
    GROUP BY user_id, grp
    """,
)
def win_gap_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive event_ids per user via
    the classic id-minus-rank trick (consecutive ids share `id - rn`).
    One window + one hash agg, both partitioned by user - the canonical
    SQL-pattern stress test for window/agg partitioning reuse (the agg
    runs on the window's existing partitioning, no second shuffle of the
    full set)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events").select("user_id", "event_id")
    w = W.partitionBy("user_id").orderBy("event_id")
    seq = ev.withColumn(
        "grp", F.col("event_id") - F.row_number().over(w)
    )
    return seq.groupBy("user_id", "grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count("*").alias("island_len"),
    ).drop("grp")


@query(
    "agg_regression_trend",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0 AS x,
             value AS y
      FROM events),
    mn AS (SELECT min(x) AS x0 FROM pts),
    sums AS (
      SELECT event_type,
             count(*) AS n,
             sum(x - x0) AS sx, sum(y) AS sy,
             sum((x - x0) * y) AS sxy,
             sum((x - x0) * (x - x0)) AS sxx
      FROM pts CROSS JOIN mn
      GROUP BY event_type)
    SELECT event_type, n,
           floor(((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)) * 10000.0
                 + 0.5) / 10000.0 AS slope_per_hour,
           floor(((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0))
                   * sx) / n)
                 * 10000.0 + 0.5) / 10000.0 AS intercept
    FROM sums
    """,
)
def agg_regression_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group OLS trend (slope per hour + intercept of event value over
    time) via the closed-form sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    - the partition-mergeable spelling (each statistic is an algebraic
    aggregate, so map-side partial agg applies and a 100 TB trend is one
    hash agg, no second pass).  x is re-based to hours since the corpus
    minimum so the normal-equation differences stay well-conditioned
    (epoch-scale x would cancel 17 significant digits and break
    cross-engine parity); the same explicit algebra runs on both engines
    rather than regr_slope(), whose internal order of operations is
    engine-defined."""
    ev = load(spark, sf, "events")
    pts = ev.select(
        "event_type",
        (F.unix_micros("ts").cast("double") / 3_600_000_000.0).alias("x"),
        F.col("value").alias("y"),
    )
    mn = pts.agg(F.min("x").alias("x0"))
    sums = (
        pts.crossJoin(F.broadcast(mn))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x") - F.col("x0")).alias("sx"),
            F.sum("y").alias("sy"),
            F.sum((F.col("x") - F.col("x0")) * F.col("y")).alias("sxy"),
            F.sum((F.col("x") - F.col("x0")) * (F.col("x") - F.col("x0"))).alias(
                "sxx"
            ),
        )
    )
    # denominator NULLed via nullif IDENTICALLY on both engines: a group
    # whose timestamps are all equal (e.g. single-row) has n*sxx == sx*sx,
    # and Spark's NaN/Infinity rendering differs from DuckDB's (ADVICE r5)
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return sums.select(
        "event_type",
        "n",
        pround(slope, 4).alias("slope_per_hour"),
        pround(intercept, 4).alias("intercept"),
    )


@query(
    "events_attribution_lasttouch",
    oracle="""
    WITH ce AS (
      SELECT event_id, ts, user_id, event_type, value,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_ts
      FROM events
      WHERE event_type IN ('click', 'purchase'))
    SELECT event_id AS purchase_id,
           user_id,
           CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                THEN last_click_id END AS attributed_click_id,
           CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                THEN epoch_us(ts) - epoch_us(last_click_ts) END AS lag_us,
           floor(value * 100.0 + 0.5) / 100.0 AS value_rounded
    FROM ce
    WHERE event_type = 'purchase'
    """,
)
def events_attribution_lasttouch(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the same user's
    most recent PRECEDING click within 7 days - the marketing-analytics
    as-of shape.  Spelled as union + running last_value(ignorenulls) over
    ONE (user_id, ts) window instead of a purchases-x-clicks range join:
    a single shuffle on user_id, no join, no band fan-out - at 100 TB this
    is the difference between sorting each user's events once and
    building a join index over two fact tables (join_asof_lastsignup
    covers the dim-join spelling; this is the fact-internal one).
    Ordering key is (ts, event_id) so same-timestamp ties resolve
    identically on both engines."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    seven_days_us = 7 * 24 * 3600 * 1_000_000
    ce = (
        ev.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    in_window = F.unix_micros("last_click_ts") >= (
        F.unix_micros("ts") - F.lit(seven_days_us)
    )
    return ce.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(in_window, F.col("last_click_id")).alias("attributed_click_id"),
        F.when(
            in_window, F.unix_micros("ts") - F.unix_micros("last_click_ts")
        ).alias("lag_us"),
        pround("value", 2).alias("value_rounded"),
    )


@query(
    "events_journey_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions,
           floor((count(*) * 1.0
                  / sum(count(*)) OVER (PARTITION BY prev_type))
                 * 10000.0 + 0.5) / 10000.0 AS p_next
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_journey_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order user-journey Markov matrix: counts and conditional
    probabilities of event-type transitions within each user's (ts,
    event_id)-ordered stream - the product-analytics complement to the
    funnel (which fixes the path) and gaps-and-islands (which ignores the
    type).  Two shuffles total at any scale: the per-user lag window, then
    the 25-cell transition agg; the normalizing row-count-per-prev_type is
    a window over the AGGREGATED frame (25 rows), not the event stream.
    Same-timestamp ties order by event_id on both engines."""
    seq = load(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        pround(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(tot), 4
        ).alias("p_next"),
    )
