"""Round-6 corpus / graph / time-series operators (SURVEY.md 2.9 extension
families): compaction planning, token-budget splitting, curriculum ordering,
perceptual-hash dedup, link-graph analytics (degree + PageRank), count
anomaly detection, and the nearest-direction as-of join.

Everything here follows the engine's two standing disciplines:
- cross-engine exactness via integer arithmetic wherever a float sum would
  be order-dependent (micro-scaled ints + `div`, the text_perplexity_proxy
  trick), and functions.pround for the floats that remain;
- 100 TB posture stated per operator: which shuffles exist, which side
  broadcasts, and what replaces any single-partition stage at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pround
from ..registry import query

# ---------------------------------------------------------------------------
# corpus pipeline
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 2048  # chars per compaction bin (fixture-scaled)


@query(
    "pipeline_compaction_bins",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM documents)
    SELECT source,
           CAST(floor(cum_before / {_COMPACT_TARGET}.0) AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
           CAST(min(doc_id) AS BIGINT) AS doc_min,
           CAST(max(doc_id) AS BIGINT) AS doc_max
    FROM c
    GROUP BY source, bin_id
    """,
)
def pipeline_compaction_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction manifest - the lakehouse maintenance job a
    100 TB ingest REQUIRES (streaming ingest writes many small files;
    unmerged they poison every downstream scan with per-file open cost).
    Each source's files, taken in doc_id order, are cut into target-size
    bins at running-byte-offset boundaries - the same streaming
    concatenation plan OPTIMIZE/bin-packing compaction executes.  One
    shuffle (the per-source window); the groupBy reuses the window's
    partitioning so the agg is shuffle-free.  A pathologically hot source
    would make the window partition skewed - the fix at scale is
    sub-bucketing the source by date, which only renames the partition
    key.  All columns are integers - bit-identical on both engines."""
    d = load(spark, sf, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return (
        d.select(
            "source",
            "doc_id",
            "n_chars",
            F.floor(cum_before / float(_COMPACT_TARGET)).alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_chars").alias("bin_bytes"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
    )


@query(
    "pipeline_token_budget_split",
    oracle="""
    WITH toks AS (
      SELECT doc_id, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      FROM documents),
    tot AS (SELECT CAST(sum(t) AS BIGINT) AS total FROM toks),
    c AS (
      SELECT doc_id, t,
             CAST(sum(t) OVER (ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM toks)
    SELECT CASE WHEN cum <= floor(total * 0.9) THEN 'train' ELSE 'val' END
             AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t) AS BIGINT) AS n_tokens
    FROM c CROSS JOIN tot
    GROUP BY 1
    """,
)
def pipeline_token_budget_split(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget train/val split: shuffle the corpus deterministically
    (md5 of content - reproducible across runs AND engines, unlike
    rand()), then cut at 90% of the total token budget by running count -
    how a pretrain corpus is actually split when the budget is expressed
    in tokens, not documents.  The running sum is DISTRIBUTED
    (functions.global_running_sum: range shuffle on the unique (h,
    doc_id) key, per-range local cumsum, P-row prefix-offset join
    broadcast back - the zipWithIndex recipe), so no single-partition
    sort exists anywhere in the plan (TestNoGlobalWindow); semantics are
    identical to the oracle's one-window SQL spelling.  The total-budget
    scalar is a broadcast 1-row cross join on both paths."""
    from ..functions import global_running_sum

    d = load(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("t"),
    )
    tot = toks.agg(F.sum("t").alias("total"))
    c = global_running_sum(toks, "t", ["h", "doc_id"], out="cum")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("cum") <= F.floor(F.col("total") * 0.9), "train")
            .otherwise("val")
            .alias("split"),
            "t",
        )
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("n_tokens"))
    )


@query(
    "pipeline_curriculum_order",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS nd
      FROM documents
      -- a NULL text has no difficulty score, and engines disagree on
      -- where NULL ordering keys land (Spark first, DuckDB last) - an
      -- un-rankable doc is excluded explicitly (NULL sweep, round 8)
      WHERE text IS NOT NULL),
    x AS (
      SELECT doc_id, nt,
             CAST(floor((nd * 1.0 / nt) * 1000000.0 + 0.5) AS BIGINT)
               AS ttr_micro
      FROM t),
    p AS (
      SELECT nt, ttr_micro,
             CAST(ntile(4) OVER (ORDER BY ttr_micro, doc_id) AS BIGINT)
               AS phase
      FROM x)
    SELECT phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS sum_tokens,
           CAST(sum(ttr_micro) // count(*) AS BIGINT) AS avg_ttr_micro
    FROM p
    GROUP BY phase
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum phases for staged pretraining: rank documents by
    type-token ratio (lexical diversity - the cheap difficulty proxy) and
    deal them into 4 equal phases with ntile.  The ratio is micro-scaled
    to an INTEGER before it becomes an ordering key or an average, so
    ordering ties and the per-phase mean are bit-identical on both
    engines (no float-sum order dependence).  The ntile is computed from
    a DISTRIBUTED global rank (functions.global_rank - range shuffle +
    prefix offsets, no Exchange SinglePartition anywhere, per
    TestNoGlobalWindow) with the exact SQL ntile arithmetic applied to
    the rank (functions.ntile_expr), so output equals the oracle's
    ntile() window row-for-row.  avg_ttr_micro uses integer
    floor-division (`div`), not a double mean."""
    from ..functions import global_rank, ntile_expr

    d = load(spark, sf, "documents")
    toks = F.split("text", " ")
    # un-rankable NULL-text docs excluded (see the oracle's comment)
    x = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
    ).select(
        "doc_id",
        "nt",
        F.floor((F.col("nd") * 1.0 / F.col("nt")) * 1000000.0 + 0.5).alias(
            "ttr_micro"
        ),
    )
    tot = x.agg(F.count("*").alias("n_total"))
    p = (
        global_rank(x, ["ttr_micro", "doc_id"], out="rn")
        .crossJoin(F.broadcast(tot))
        .select(
            "nt",
            "ttr_micro",
            ntile_expr("rn", "n_total", 4).cast("long").alias("phase"),
        )
    )
    return p.groupBy("phase").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("sum_tokens"),
        F.expr("CAST(sum(ttr_micro) div count(*) AS BIGINT)").alias(
            "avg_ttr_micro"
        ),
    )


# ---------------------------------------------------------------------------
# perceptual-hash dedup
# ---------------------------------------------------------------------------

_PHASH_LETTERS = "abcdefghijklmnop"


def _phash16(text_col):
    """16-bit content fingerprint: bit k = parity of the count of letter k
    in the text - the engine-portable stand-in for a perceptual hash
    (deterministic, content-derived, locality-preserving under small
    edits, and computable as pure column arithmetic on BOTH engines)."""
    bits = []
    for k, ch in enumerate(_PHASH_LETTERS):
        cnt = F.length(text_col) - F.length(F.replace(text_col, F.lit(ch), F.lit("")))
        bits.append((cnt % 2) * (1 << k))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


@query(
    "dedup_phash_hamming",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             """
    + " + ".join(
        f"((len(text) - len(replace(text, '{c}', ''))) % 2) * {1 << k}"
        for k, c in enumerate(_PHASH_LETTERS)
    )
    + """ AS ph
      FROM documents),
    b AS (SELECT doc_id, CAST(ph AS BIGINT) AS ph,
                 ph // 256 AS hi, ph % 256 AS lo FROM p),
    cand AS (
      SELECT a.doc_id AS da, c.doc_id AS db, a.ph AS pa, c.ph AS pb
      FROM b a JOIN b c ON a.hi = c.hi AND a.doc_id < c.doc_id
      UNION
      SELECT a.doc_id, c.doc_id, a.ph, c.ph
      FROM b a JOIN b c ON a.lo = c.lo AND a.doc_id < c.doc_id)
    SELECT CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= 3
    GROUP BY 1
    """,
)
def dedup_phash_hamming(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash near-dup detection, the image-dedup shape (pHash +
    Hamming-ball search) run over the text fixture's 16-bit parity
    fingerprint: band the hash into two bytes, candidate = any pair
    sharing EITHER band, verify with bit_count(xor).  The pigeonhole
    guarantee of b bands is Hamming <= b-1 (here: <= 1 with full recall,
    pinned by tests/test_properties.py); candidates at distance 2-3
    surface only when the flipped bits cluster in one band - the
    standard LSH-banding recall trade-off, and the reason a production
    64-bit pHash uses 4x16-bit bands (guarantee <= 3).  Both banding
    joins are plain equi self-joins on a byte key (256 buckets), so the
    candidate stage is hash-partitioned and never all-pairs.  Output is
    the verified-candidate histogram by Hamming distance."""
    d = load(spark, sf, "documents")
    # one exploded (band_idx, band_val) row per band per doc, so BOTH
    # banding joins collapse into ONE equi self-join on the composite
    # key: the two sides' exchange subtrees are then textually identical
    # and ReuseExchange evaluates the 16-letter parity fingerprint (32
    # string traversals per doc) ONCE for the whole query - the previous
    # two-join + union spelling planned two distinct exchanges per side
    # and re-ran _phash16 under each (4 evaluations).  Candidate set is
    # unchanged: a pair sharing either band meets itself on that band's
    # row, and the distinct() already deduped both-band matches.
    b = d.select(
        "doc_id",
        _phash16(F.col("text")).alias("ph"),
    ).select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"), F.expr("ph div 256").alias("bv")
                ),
                F.struct(F.lit(1).alias("band"), (F.col("ph") % 256).alias("bv")),
            )
        ).alias("bd"),
    ).select("doc_id", "ph", F.col("bd.band").alias("band"), F.col("bd.bv").alias("bv"))
    a, c = b.alias("a"), b.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bv") == F.col("c.bv"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("c.doc_id").alias("db"),
            F.col("a.ph").alias("pa"),
            F.col("c.ph").alias("pb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.select(ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# link-graph analytics
# ---------------------------------------------------------------------------

_PART_NODE_OFFSET = 1_000_000  # disjoint node-id spaces: supplier | part+1e6
# projected-edge count up to which the graph queries run their broadcast
# regimes (triangle edge-iterator here, clustering-coeff build sides in
# audit_ops - public so consumers share one gate).  ~2M two-int rows
# ~= 32 MB build side.  Module constant so tests can pin regimes equal.
TRI_BCAST_CAP = 2_000_000
# max forward-neighbor array length the edge-iterator will pack into one
# row (ADVICE r14: total edge count alone does not bound row width - a
# <=2M-edge graph with one extreme hub would still broadcast).  1M longs
# ~= 8 MB per row, comfortably inside a task but the upper edge of sane.
TRI_MAX_DEG_CAP = 1_000_000
# co-purchase projection + gate scalars, built once per (application, sf)
# like _EDGE_INDEX (bench.py clears it next to the other index caches) -
# repeated invocations previously re-ran the part-blocked self-join,
# distinct, checkpoint AND the gate-count job every time
_TRI_PROJ_CACHE: dict[tuple[str, str], tuple[DataFrame, int, int]] = {}


def _edge_set(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct supplier->part co-purchase edges from lineitem - the
    fixture's natural bipartite link graph (same construction as
    dedup_cluster_components' edge derivation)."""
    li = load(spark, sf, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_partkey") + _PART_NODE_OFFSET).alias("p"),
    ).distinct()


# degree-annotated edge index, built once per (application, sf) like the
# IVF/PQ indexes: an iterative algorithm must not re-derive its adjacency
# structure every iteration (3 PageRank rounds would otherwise nest 4
# copies of the distinct+union+deg-join subtree into one plan - measured
# 2x wall on the warm bench path before this cache)
_EDGE_INDEX: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _edge_index(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    """(edges-with-outdeg, deg) for the bidirected graph, materialized
    once per application so each PageRank/LPA iteration scans the stored
    adjacency instead of recomputing it.

    The adjacency is repartition("src").persist() rather than
    localCheckpoint (r12): a checkpoint replaces the plan with a raw
    ExistingRDD scan whose outputPartitioning Catalyst cannot see, so
    EVERY iteration re-shuffled the static 2|E| side of its join; an
    InMemoryRelation keeps the hash partitioning visible and each
    round's join exchanges only the (small, changing) rank/label side
    (measured sf0.1: pagerank 2.20 -> 1.80 s, LPA 5.98 -> 4.59 s on the
    same box).  At 100x this is the difference between shuffling the
    edge list k times and shuffling it once - the adjacency partitioning
    is the one a production graph pipeline would bake into its storage
    layout.  deg stays a lazy checkpoint (tiny, partitioning
    irrelevant).  bench.py's uncached sweep unpersists + clears this
    cache next to the IVF/PQ index caches."""
    key = (spark.sparkContext.applicationId, sf)
    cached = _EDGE_INDEX.get(key)
    if cached is not None:
        return cached
    e0 = _edge_set(spark, sf)
    edges = e0.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionAll(
        e0.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").repartition("src").persist()
    deg = deg.localCheckpoint(eager=False)
    _EDGE_INDEX[key] = (ed, deg)
    return ed, deg


_GRAPH_EDGES_SQL = """
      SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p FROM lineitem
"""


@query(
    "graph_degree_stats",
    oracle=f"""
    WITH e0 AS ({_GRAPH_EDGES_SQL}),
    sd AS (SELECT s, count(*) AS deg FROM e0 GROUP BY s),
    pd AS (SELECT p, count(*) AS deg FROM e0 GROUP BY p)
    SELECT 'supplier' AS side, CAST(deg AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM sd GROUP BY deg
    UNION ALL
    SELECT 'part', CAST(deg AS BIGINT), CAST(count(*) AS BIGINT)
    FROM pd GROUP BY deg
    """,
)
def graph_degree_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Degree distribution of the bipartite link graph, both sides - the
    first diagnostic before any graph algorithm at scale (a power-law
    tail here is what forces salting / vertex-cut strategies later).
    Two hash aggs over the distinct edge set, union of two tiny
    histogram frames; the distinct is the only data-volume shuffle."""
    e0 = _edge_set(spark, sf)
    sd = e0.groupBy("s").agg(F.count("*").alias("deg"))
    pd_ = e0.groupBy("p").agg(F.count("*").alias("deg"))
    return (
        sd.groupBy("deg")
        .agg(F.count("*").alias("n_nodes"))
        .select(F.lit("supplier").alias("side"), F.col("deg").alias("degree"), "n_nodes")
        .unionAll(
            pd_.groupBy("deg")
            .agg(F.count("*").alias("n_nodes"))
            .select(F.lit("part").alias("side"), F.col("deg").alias("degree"), "n_nodes")
        )
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * sum(r.rank // d.outdeg)) // 100 AS BIGINT)
               AS rank
      FROM edges e
      JOIN {prev} r ON e.src = r.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst)"""


@query(
    "graph_pagerank_iter",
    oracle=f"""
    WITH e0 AS ({_GRAPH_EDGES_SQL}),
    edges AS (SELECT s AS src, p AS dst FROM e0
              UNION ALL SELECT p, s FROM e0),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
    {_pagerank_iter_sql("r0", "i1")},
    {_pagerank_iter_sql("i1", "i2")},
    {_pagerank_iter_sql("i2", "i3")}
    SELECT node,
           CASE WHEN node >= 1000000 THEN 'part' ELSE 'supplier' END AS kind,
           rank AS rank_micro
    FROM i3
    ORDER BY rank DESC, node
    LIMIT 20
    """,
)
def graph_pagerank_iter(spark: SparkSession, sf: str) -> DataFrame:
    """Three damped PageRank iterations (alpha = 0.85) over the bidirected
    link graph, in MICRO-RANK INTEGER arithmetic: contributions are
    rank div outdeg, the damping is (85 * sum) div 100 - integer sums are
    order-independent, so three chained iterations stay bit-identical to
    the oracle (a float PageRank diverges across engines at the ulp level
    per iteration; this is the text_perplexity_proxy discipline applied
    to an iterative algorithm).  The degree-annotated adjacency is built
    ONCE per application and lineage-truncated (_edge_index) - iteration
    plans scan the materialized index, they never re-derive it.  Each
    iteration is one hash join on src (ranks are re-partitioned by the
    join, which AQE sizes at runtime) + one sum shuffle on dst - the
    canonical Pregel step as two exchanges.  Bidirection guarantees no
    dangling mass.  At 100x the
    edge set, the joins stay hash-partitioned on the same keys and the
    per-iteration cost scales linearly; degree skew is the degree-stats
    diagnostic's job (graph_degree_stats) and is handled by salting the
    hot dst keys, which redistributes the SAME integer sum.

    The 3-round unroll exists for static-CTE oracle parity; the
    production `while delta > eps` spelling is graph.pagerank_converged
    (identical integer arithmetic, localCheckpoint per round, max-iter
    bound, converged flag) - pytest-pinned bit-equal to this query at
    the same iteration count (tests/test_pipeline_components.py,
    TestConvergenceGatedTwins)."""
    ed, deg = _edge_index(spark, sf)
    r = deg.select(F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("rank"))
    for _ in range(3):
        r = (
            ed.join(r, ed["src"] == r["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(150000) + F.expr("(85 * s) div 100")).cast("long").alias("rank"),
            )
        )
    return (
        r.select(
            "node",
            F.when(F.col("node") >= _PART_NODE_OFFSET, "part")
            .otherwise("supplier")
            .alias("kind"),
            F.col("rank").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), F.asc("node"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# time-series anomaly + nearest as-of
# ---------------------------------------------------------------------------


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, day, n,
             CAST(count(*) OVER w AS BIGINT) AS k,
             CAST(sum(n) OVER w AS BIGINT) AS s1,
             CAST(sum(n * n) OVER w AS BIGINT) AS s2
      FROM d
      WINDOW w AS (PARTITION BY event_type))
    SELECT event_type, day, n,
           floor(((n - s1 * 1.0 / k)
                  / sqrt(nullif((s2 - s1 * 1.0 * s1 / k) / (k - 1), 0.0)))
                 * 10000.0 + 0.5) / 10000.0 AS z,
           abs(floor(((n - s1 * 1.0 / k)
                  / sqrt(nullif((s2 - s1 * 1.0 * s1 / k) / (k - 1), 0.0)))
                 * 10000.0 + 0.5) / 10000.0) > 2.0 AS is_anomaly
    FROM s
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Daily-volume anomaly detection per event type: z-score of each
    day's count against the type's 30-day distribution.  Mean and
    variance come from ALGEBRAIC sufficient statistics (k, sum n,
    sum n^2) - integer sums over the aggregated daily frame, so they are
    exact and order-independent where stddev_samp()'s float accumulation
    would drift between engines (the agg_regression_trend discipline).
    One data-volume shuffle (the daily count agg); the stats window runs
    over ~150 aggregated rows.  The variance denominator is nullif-
    guarded (single-day groups yield NULL z, not a crash - ADVICE r5).
    The anomaly flag compares the ROUNDED z so the boundary decision is
    the same computation on both engines."""
    ev = load(spark, sf, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    s = d.select(
        "event_type",
        "day",
        "n",
        F.count("*").over(w).alias("k"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    mean = F.col("s1") * 1.0 / F.col("k")
    # k-1 nullif-guarded too: a single-day type crashes ANSI division
    # where DuckDB yields NULL (degenerate-corpus sweep, round 7)
    var = (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("k")) / F.nullif(
        (F.col("k") - 1).cast("double"), F.lit(0.0)
    )
    z = pround((F.col("n") - mean) / F.sqrt(F.nullif(var, F.lit(0.0))), 4)
    return s.select(
        "event_type",
        "day",
        "n",
        z.alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH pe AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('purchase', 'error')),
    c AS (
      SELECT *,
        last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
          OVER wp AS prev_ts,
        last_value(CASE WHEN event_type = 'error' THEN event_id END
                   IGNORE NULLS) OVER wp AS prev_id,
        first_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
          OVER wn AS next_ts,
        first_value(CASE WHEN event_type = 'error' THEN event_id END
                    IGNORE NULLS) OVER wn AS next_id
      FROM pe
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    g AS (
      SELECT event_id, user_id,
             prev_id, next_id,
             epoch_us(ts) - epoch_us(prev_ts) AS gap_prev,
             epoch_us(next_ts) - epoch_us(ts) AS gap_next
      FROM c WHERE event_type = 'purchase')
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN gap_prev IS NOT NULL AND gap_prev <= 3600000000
                     AND (gap_next IS NULL OR gap_next > 3600000000
                          OR gap_prev <= gap_next)
                THEN prev_id
                WHEN gap_next IS NOT NULL AND gap_next <= 3600000000
                THEN next_id END AS matched_error_id,
           CASE WHEN gap_prev IS NOT NULL AND gap_prev <= 3600000000
                     AND (gap_next IS NULL OR gap_next > 3600000000
                          OR gap_prev <= gap_next)
                THEN 'prev'
                WHEN gap_next IS NOT NULL AND gap_next <= 3600000000
                THEN 'next' END AS direction,
           CASE WHEN gap_prev IS NOT NULL AND gap_prev <= 3600000000
                     AND (gap_next IS NULL OR gap_next > 3600000000
                          OR gap_prev <= gap_next)
                THEN gap_prev
                WHEN gap_next IS NOT NULL AND gap_next <= 3600000000
                THEN gap_next END AS gap_us
    FROM g
    """,
)
def join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'
    semantics): each purchase matched to the CLOSEST error event of the
    same user within a 1-hour tolerance, looking both backward and
    forward; ties prefer the earlier (backward) match.  Spelled as the
    union-stream + two running ignore-nulls windows over ONE (user_id,
    (ts, event_id)) sort - a single shuffle, no join operator at all,
    same posture as events_attribution_lasttouch but with the forward
    frame added.  Gaps are integer microseconds; every tolerance and
    tie comparison is integer, so match decisions are bit-identical on
    both engines."""
    tol_us = 3_600_000_000
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    err_id = F.when(F.col("event_type") == "error", F.col("event_id"))
    c = (
        ev.withColumn("prev_ts", F.last(err_ts, ignorenulls=True).over(wp))
        .withColumn("prev_id", F.last(err_id, ignorenulls=True).over(wp))
        .withColumn("next_ts", F.first(err_ts, ignorenulls=True).over(wn))
        .withColumn("next_id", F.first(err_id, ignorenulls=True).over(wn))
        .filter(F.col("event_type") == "purchase")
    )
    g = c.select(
        "event_id",
        "user_id",
        "prev_id",
        "next_id",
        (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_prev"),
        (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("gap_next"),
    )
    prev_ok = F.col("gap_prev").isNotNull() & (F.col("gap_prev") <= tol_us)
    next_ok = F.col("gap_next").isNotNull() & (F.col("gap_next") <= tol_us)
    take_prev = prev_ok & (
        F.col("gap_next").isNull()
        | (F.col("gap_next") > tol_us)
        | (F.col("gap_prev") <= F.col("gap_next"))
    )
    return g.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(take_prev, F.col("prev_id"))
        .when(next_ok, F.col("next_id"))
        .alias("matched_error_id"),
        F.when(take_prev, "prev").when(next_ok, "next").alias("direction"),
        F.when(take_prev, F.col("gap_prev"))
        .when(next_ok, F.col("gap_next"))
        .alias("gap_us"),
    )


@query(
    "events_session_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    i AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM s),
    p AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM i GROUP BY user_id, sess)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def events_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 full session paths (ordered event-type sequences within
    30-minute-gap sessions) - the path-mining complement to
    events_journey_transitions (which only sees pairs) over
    win_session_gap's session rule.  One (user_id, ts) window shuffle
    shared by the gap flag and the island id (same partitioning, one
    sort); the path string is built by a per-session sorted collect -
    bounded by session length, not stream length - then a hash agg over
    distinct paths.  Ties in the top-20 break on the path string itself,
    so the LIMIT is deterministic on both engines."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1_800_000_000
    s = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    i = s.withColumn(
        "sess",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    p = (
        i.groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "pipeline_filter_funnel",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    mt AS (
      SELECT doc_id, max(c) AS maxtok FROM (
        SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token)
      GROUP BY doc_id),
    t AS (
      SELECT d.doc_id,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
             CAST(floor((len(list_distinct(string_split(d.text, ' '))) * 1.0
                         / len(string_split(d.text, ' '))) * 1000000.0 + 0.5)
                  AS BIGINT) AS ttr_micro,
             mt.maxtok
      FROM documents d JOIN mt ON d.doc_id = mt.doc_id),
    f AS (
      SELECT nt >= 30 AS p1,
             ttr_micro >= 300000 AS p2,
             maxtok * 5 <= nt AS p3
      FROM t),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n3
      FROM f)
    SELECT 1 AS stage, 'min_length' AS rule, n0 AS n_in,
           n0 - n1 AS n_dropped, n1 AS n_out FROM a
    UNION ALL
    SELECT 2, 'lexical_diversity', n1, n1 - n2, n2 FROM a
    UNION ALL
    SELECT 3, 'repetition_cap', n2, n2 - n3, n3 FROM a
    """,
)
def pipeline_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential quality-gate funnel report (the C4/RefinedWeb-style
    cleaning ledger): how many documents each rule drops GIVEN the
    previous rules passed - min length, lexical diversity (type-token
    ratio), repetition cap (no token may exceed 1/5 of the document).
    The per-doc max-token-frequency is the only explode; everything else
    is per-row column math, and the funnel itself is ONE aggregate row
    fanned into 3 report rows (broadcast-sized).  All counts integer.
    At 100 TB this is the report that justifies every byte the pipeline
    deletes - it runs in the same pass as pipeline_pretrain_filter."""
    d = load(spark, sf, "documents")
    toks = F.split("text", " ")
    mt = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxtok"))
    )
    t = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("nt"),
        F.floor(
            (F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)) * 1000000.0
            + 0.5
        ).alias("ttr_micro"),
    ).join(mt, "doc_id")
    p1 = F.col("nt") >= 30
    p2 = F.col("ttr_micro") >= 300000
    p3 = F.col("maxtok") * 5 <= F.col("nt")
    a = t.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(p1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(p1 & p2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(p1 & p2 & p3, 1).otherwise(0)).alias("n3"),
    )
    # ONE aggregate row fanned into the 3 report rows with stack() - the
    # previous union-of-selects spelling re-planned the whole
    # explode+join+agg subtree once per stage (3x the scans; caught by
    # the same plan audit that fixed pipeline_contract_audit)
    return a.select(
        F.expr(
            "stack(3,"
            " 1, 'min_length', n0, n0 - n1, n1,"
            " 2, 'lexical_diversity', n1, n1 - n2, n2,"
            " 3, 'repetition_cap', n2, n2 - n3, n3)"
            " AS (stage, rule, n_in, n_dropped, n_out)"
        )
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS a FROM events),
    u AS (
      SELECT user_id,
             CAST(floor((a - max(epoch_us(ts))) / 86400000000.0) AS BIGINT)
               AS rec_days,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events CROSS JOIN anchor
      WHERE event_type = 'purchase'
      GROUP BY user_id, a),
    q AS (
      SELECT quantile_cont(rec_days, 0.25) AS r1, quantile_cont(rec_days, 0.5) AS r2,
             quantile_cont(rec_days, 0.75) AS r3,
             quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
             quantile_cont(freq, 0.75) AS f3,
             quantile_cont(monetary_cents, 0.25) AS m1,
             quantile_cont(monetary_cents, 0.5) AS m2,
             quantile_cont(monetary_cents, 0.75) AS m3
      FROM u),
    s AS (
      SELECT monetary_cents,
             CAST(1 + (CASE WHEN rec_days > r1 THEN 1 ELSE 0 END)
                    + (CASE WHEN rec_days > r2 THEN 1 ELSE 0 END)
                    + (CASE WHEN rec_days > r3 THEN 1 ELSE 0 END) AS BIGINT) AS r,
             CAST(1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
                    + (CASE WHEN freq > f2 THEN 1 ELSE 0 END)
                    + (CASE WHEN freq > f3 THEN 1 ELSE 0 END) AS BIGINT) AS f,
             CAST(1 + (CASE WHEN monetary_cents > m1 THEN 1 ELSE 0 END)
                    + (CASE WHEN monetary_cents > m2 THEN 1 ELSE 0 END)
                    + (CASE WHEN monetary_cents > m3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m
      FROM u CROSS JOIN q)
    SELECT r * 100 + f * 10 + m AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents_total
    FROM s GROUP BY 1
    """,
)
def events_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation - the
    marketing-analytics workhorse: per purchasing user, days since last
    purchase (against the stream's own max-ts anchor, so the query is
    replayable - no current_timestamp), purchase count, and lifetime
    value in INTEGER cents (per-event flooring before the sum keeps the
    per-user total order-independent); each metric scored 1-4 against
    its own exact quartile BOUNDARIES (percentile / quantile_cont - the
    interpolation both engines share) and composed into a 3-digit
    segment code.  Boundary scoring instead of ntile is deliberate: the
    9 boundaries are ONE 1-row agg broadcast everywhere - no global
    sort, no single-partition window, and the same plan at any user
    count (TestNoGlobalWindow pins the invariant).  One data shuffle
    (the per-user agg); the anchor scalar is a broadcast 1-row cross
    join."""
    ev = load(spark, sf, "events")
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("a"))
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "a")
        .agg(
            F.floor(
                (F.col("a") - F.max(F.unix_micros("ts"))) / 86400000000.0
            ).alias("rec_days"),
            F.count("*").alias("freq"),
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    q = u.agg(
        *[
            F.percentile(col, F.lit(p)).alias(f"{pre}{i}")
            for col, pre in (
                ("rec_days", "r"),
                ("freq", "f"),
                ("monetary_cents", "m"),
            )
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(col: str, pre: str):
        v = F.col(col)
        return (
            F.lit(1)
            + F.when(v > F.col(f"{pre}1"), 1).otherwise(0)
            + F.when(v > F.col(f"{pre}2"), 1).otherwise(0)
            + F.when(v > F.col(f"{pre}3"), 1).otherwise(0)
        ).cast("long")

    s = u.crossJoin(F.broadcast(q)).select(
        "monetary_cents",
        score("rec_days", "r").alias("r"),
        score("freq", "f").alias("f"),
        score("monetary_cents", "m").alias("m"),
    )
    return (
        s.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum("monetary_cents").alias("monetary_cents_total"),
        )
    )


@query(
    "time_gapfill_interp",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_id,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, min(hour_id) AS h0, max(hour_id) AS h1
      FROM h GROUP BY 1),
    grid AS (
      SELECT b.event_type, unnest(generate_series(b.h0, b.h1)) AS hour_id
      FROM bounds b),
    j AS (
      SELECT g.event_type, g.hour_id, h.n,
             last_value(CASE WHEN h.n IS NOT NULL THEN h.n END IGNORE NULLS)
               OVER wp AS prev_n,
             last_value(CASE WHEN h.n IS NOT NULL THEN g.hour_id END
                        IGNORE NULLS) OVER wp AS prev_h,
             first_value(CASE WHEN h.n IS NOT NULL THEN h.n END IGNORE NULLS)
               OVER wn AS next_n,
             first_value(CASE WHEN h.n IS NOT NULL THEN g.hour_id END
                         IGNORE NULLS) OVER wn AS next_h
      FROM grid g LEFT JOIN h
        ON g.event_type = h.event_type AND g.hour_id = h.hour_id
      WINDOW
        wp AS (PARTITION BY g.event_type ORDER BY g.hour_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY g.event_type ORDER BY g.hour_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, hour_id,
           n IS NULL AS was_gap,
           floor((CASE WHEN n IS NOT NULL THEN n * 1.0
                       ELSE prev_n + (next_n - prev_n) * 1.0
                            * (hour_id - prev_h) / (next_h - prev_h) END)
                 * 10000.0 + 0.5) / 10000.0 AS n_filled
    FROM j
    """,
)
def time_gapfill_interp(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap filling with linear interpolation - the hypertable
    / TSDB `time_bucket_gapfill + interpolate` shape: densify each event
    type's hourly count series over its own [min, max] hour range, then
    fill missing buckets by interpolating between the nearest known
    neighbors (two running ignore-nulls windows, one backward one
    forward - the same frames as join_asof_nearest).  The grid is
    sequence+explode (map-side 1->N, no driver loop); the dense-grid
    left join is an equi join on (type, hour).  One window shuffle on
    event_type covers both frames and the join's right side reuses the
    hourly agg.  Interp inputs are exact integers (counts + hour ids),
    so the interpolated double is computed identically on both engines
    and pround-ed.  At 100 TB the grid per key is bounded by the time
    range, not the row count - the classic reason gapfill scales."""
    ev = load(spark, sf, "events")
    h = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / 3_600_000_000.0).cast("long").alias("hour_id"),
    ).agg(F.count("*").alias("n"))
    bounds = h.groupBy("event_type").agg(
        F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hour_id")
    )
    j = grid.join(h, ["event_type", "hour_id"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_n = F.when(F.col("n").isNotNull(), F.col("n"))
    known_h = F.when(F.col("n").isNotNull(), F.col("hour_id"))
    j = (
        j.withColumn("prev_n", F.last(known_n, ignorenulls=True).over(wp))
        .withColumn("prev_h", F.last(known_h, ignorenulls=True).over(wp))
        .withColumn("next_n", F.first(known_n, ignorenulls=True).over(wn))
        .withColumn("next_h", F.first(known_h, ignorenulls=True).over(wn))
    )
    interp = F.col("prev_n") + (F.col("next_n") - F.col("prev_n")) * 1.0 * (
        F.col("hour_id") - F.col("prev_h")
    ) / (F.col("next_h") - F.col("prev_h"))
    return j.select(
        "event_type",
        "hour_id",
        F.col("n").isNull().alias("was_gap"),
        pround(
            F.when(F.col("n").isNotNull(), F.col("n") * 1.0).otherwise(interp), 4
        ).alias("n_filled"),
    )


@query(
    "events_forecast_snaive",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day, n,
             lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
      FROM d)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_eval,
           CAST(sum(abs(n - f)) AS BIGINT) AS total_abs_err,
           floor((sum(abs(n - f)) * 1.0 / count(*)) * 10000.0 + 0.5)
             / 10000.0 AS mae
    FROM l WHERE f IS NOT NULL
    GROUP BY event_type
    """,
)
def events_forecast_snaive(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-naive forecast backtest (forecast(d) = actual(d-7), the
    baseline every real forecaster must beat): per event type, the mean
    absolute error of the week-ago-naive forecast over all evaluable
    days.  lag(7) over the aggregated daily frame - the window runs over
    ~30 rows per type, never the raw stream; absolute errors are INTEGER
    day-count diffs summed exactly, and the MAE division happens once on
    exact integers (pround-ed).  One data-volume shuffle (the daily
    agg).  Day keys order lexicographically = chronologically
    (yyyy-MM-dd), so lag(7) is the same row on both engines."""
    ev = load(spark, sf, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.withColumn("f", F.lag("n", 7).over(w)).filter(F.col("f").isNotNull())
    err = F.abs(F.col("n") - F.col("f"))
    return l.groupBy("event_type").agg(
        F.count("*").alias("n_days_eval"),
        F.sum(err).alias("total_abs_err"),
        pround(F.sum(err) * 1.0 / F.count("*"), 4).alias("mae"),
    )


@query(
    "events_funnel_latency",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
      SELECT su.user_id,
             min(epoch_us(e.ts) - epoch_us(su.signup_ts)) AS lag_us,
             strftime(date_trunc('day', su.signup_ts), '%Y-%m-%d') AS cohort
      FROM su JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
           AND e.ts >= su.signup_ts
      GROUP BY su.user_id, su.signup_ts)
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_converted,
           floor((quantile_cont(lag_us, 0.5) / 3600000000.0) * 10000.0 + 0.5)
             / 10000.0 AS p50_hours,
           floor((quantile_cont(lag_us, 0.9) / 3600000000.0) * 10000.0 + 0.5)
             / 10000.0 AS p90_hours
    FROM conv GROUP BY cohort
    """,
)
def events_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert distribution per signup cohort: for each user, the
    lag from first signup to first subsequent purchase, quantiled within
    the signup-day cohort - the latency view the conversion funnel
    (events_funnel_conversion counts) doesn't show.  Two hash aggs keyed
    user_id with an equi join between them on the SAME key (co-
    partitioned, no extra exchange under AQE); lags are exact integer
    microseconds and the p50/p90 interpolation (Spark percentile =
    DuckDB quantile_cont) runs over per-cohort frames of converted
    users.  The >= filter rides in the join condition, so never-
    converting users exit before the agg."""
    ev = load(spark, sf, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        su.join(
            pu,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "signup_ts")
        .agg(
            F.min(
                F.unix_micros("p_ts") - F.unix_micros("signup_ts")
            ).alias("lag_us")
        )
        .select(
            F.date_format(F.date_trunc("day", "signup_ts"), "yyyy-MM-dd").alias(
                "cohort"
            ),
            "lag_us",
        )
    )
    return conv.groupBy("cohort").agg(
        F.count("*").alias("n_converted"),
        pround(F.percentile("lag_us", F.lit(0.5)) / 3_600_000_000.0, 4).alias(
            "p50_hours"
        ),
        pround(F.percentile("lag_us", F.lit(0.9)) / 3_600_000_000.0, 4).alias(
            "p90_hours"
        ),
    )


@query(
    "events_audience_overlap",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type, user_id FROM events),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
      FROM s GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_overlap
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b, na.n_users AS n_a, nb.n_users AS n_b,
           i.n_overlap,
           floor((i.n_overlap * 1.0
                  / (na.n_users + nb.n_users - i.n_overlap))
                 * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM inter i
    JOIN n na ON na.event_type = i.type_a
    JOIN n nb ON nb.event_type = i.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the distinct user
    sets of every event-type pair - the segmentation diagnostic behind
    'do clickers also purchase'.  The distinct (type, user) projection is
    the only data-volume shuffle; the pair intersection is a self-join
    on user_id (hash-partitioned, 5 types -> each user contributes
    <= 10 pairs map-side) and the Jaccard denominators come from a
    broadcast 5-row count dim joined twice.  All counts integer; the
    ratio is a single division of exact ints, pround-ed.  At 100 TB with
    high-cardinality types the same query degrades gracefully to
    HLL-sketch unions (agg_hll_sketch_merge is the declared sketch
    path)."""
    ev = load(spark, sf, "events")
    s = ev.select("event_type", "user_id").distinct()
    n = s.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = s.select(F.col("event_type").alias("type_a"), "user_id")
    b = s.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("ub"))
    inter = (
        a.join(b, (F.col("user_id") == F.col("ub")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_overlap"))
    )
    na = F.broadcast(n.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")))
    nb = F.broadcast(n.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")))
    return (
        inter.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_overlap",
            pround(
                F.col("n_overlap")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS vsum_cents_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-row rolling 24-hour window (RANGE frame over event-time
    microseconds) - the TSDB 'value over trailing day' shape that a ROWS
    frame cannot express (row counts per day vary).  Spelled as a numeric
    RANGE frame over epoch microseconds on BOTH engines (Spark's
    rangeBetween takes longs, DuckDB's RANGE takes the same integral
    bounds), so frame membership - including all same-timestamp peers -
    is decided by integer comparison identically.  Summed values are
    per-event integer cents (exact, order-independent).  One shuffle:
    the user_id window partitioning.  At 100 TB the range frame is the
    argument FOR watermark-windowed streaming duals (win_sliding): the
    batch window sorts each user once and scans with two pointers."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count("*").over(w).alias("n_24h"),
        F.sum(cents).over(w).alias("vsum_cents_24h"),
    )


@query(
    "agg_decimal_money",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) / 100.0
                         AS DECIMAL(18,2))) AS VARCHAR) AS total_price,
           CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) / 10000.0
                         AS DECIMAL(18,4))) AS VARCHAR) AS total_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_money(spark: SparkSession, sf: str) -> DataFrame:
    """Exact fixed-point money aggregation: doubles quantized to cents /
    basis points, cast to DECIMAL, and summed in decimal arithmetic -
    zero float error at ANY row count, the accounting-grade path (a
    double sum of 100 TB of prices drifts; a decimal sum cannot).  The
    quantize-before-cast uses the same floor(x*scale+0.5) rule as every
    pround, so both engines construct identical decimals; decimal sums
    are exact integer arithmetic and therefore order-independent across
    partitions (unlike the float sums this query exists to replace).
    Rendered as strings because the exact decimal IS the result - the
    driver compares it digit-for-digit.  Plain map-side-combined hash
    agg, one shuffle of 3 groups x 2 int128s."""
    li = load(spark, sf, "lineitem")
    price_dec = (F.floor(F.col("l_extendedprice") * 100.0 + 0.5) / 100.0).cast(
        "decimal(18,2)"
    )
    disc_dec = (F.floor(F.col("l_discount") * 10000.0 + 0.5) / 10000.0).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(price_dec).cast("string").alias("total_price"),
            F.sum(disc_dec).cast("string").alias("total_discount"),
        )
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH tf AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    rk AS (
      SELECT CAST(floor(ln(row_number() OVER (ORDER BY c DESC, token))
                        * 1000.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(c) * 1000.0 + 0.5) AS BIGINT) AS y
      FROM tf),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM rk)
    SELECT n AS n_terms,
           floor(((n * sxy - sx * sy) * 1.0
                  / nullif(n * sxx - sx * sx, 0)) * 1000000.0 + 0.5)
             / 1000000.0 AS zipf_slope
    FROM s
    """,
)
def text_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of log(count)
    vs log(rank) - the one-number corpus-health check (natural text sits
    near -1; synthetic or templated corpora flatten).  Log coordinates
    are milli-scaled INTEGERS before any sum (the agg_regression_trend /
    perplexity discipline), so the OLS sufficient statistics are exact
    and order-independent; the slope is a single division of exact ints,
    nullif-guarded, pround-ed.  One explode + hash agg for term counts
    (map-side combined); the frequency rank uses the DISTRIBUTED global
    rank (functions.global_rank with descending count order - no
    single-partition sort, per TestNoGlobalWindow) over the |vocab|
    frame - vocabulary, not corpus, sized; at 100 TB the rank input is
    the df-capped term dictionary, exactly like text_keyword_topk's df
    stage."""
    from ..functions import global_rank

    d = load(spark, sf, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    rk = global_rank(
        tf, ["c", "token"], out="rn", ascending=[False, True]
    ).select(
        F.floor(F.log(F.col("rn").cast("double")) * 1000.0 + 0.5).alias("x"),
        F.floor(F.log("c") * 1000.0 + 0.5).alias("y"),
    )
    s = rk.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    return s.select(
        F.col("n").alias("n_terms"),
        pround(num * 1.0 / den, 6).alias("zipf_slope"),
    )


@query(
    "pipeline_snapshot_diff",
    oracle="""
    WITH v2 AS (
      SELECT doc_id, md5(text) AS h
      FROM documents
      WHERE len(string_split(text, ' ')) >= 30),
    v1 AS (
      SELECT doc_id, source, md5(text) AS h
      FROM documents)
    SELECT v1.source,
           CAST(count(*) AS BIGINT) AS n_v1,
           CAST(sum(CASE WHEN v2.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN v2.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM v1 LEFT JOIN v2 ON v1.doc_id = v2.doc_id AND v1.h = v2.h
    GROUP BY v1.source
    """,
)
def pipeline_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-version diff audit: compare corpus snapshot v1 (raw) with
    v2 (the min-length quality gate applied - pipeline_filter_funnel's
    first rule) by (doc_id, content-hash) and report per-source kept/
    removed counts - the manifest diff a data-versioning layer (Delta
    history, LakeFS) prints for a dataset release note.  Content
    equality is by md5, so a doc whose text CHANGED between versions
    counts as removed+absent rather than kept (the join requires both
    id and hash to match).  One equi join on doc_id (hash-partitioned
    both sides, AQE-broadcastable when the diff side is small) + one
    per-source agg.  All counts integer."""
    d = load(spark, sf, "documents")
    v2 = d.filter(F.size(F.split("text", " ")) >= 30).select(
        F.col("doc_id").alias("v2_id"), F.md5("text").alias("v2_h")
    )
    v1 = d.select("doc_id", "source", F.md5("text").alias("h"))
    j = v1.join(
        v2, (F.col("doc_id") == F.col("v2_id")) & (F.col("h") == F.col("v2_h")), "left"
    )
    return j.groupBy("source").agg(
        F.count("*").alias("n_v1"),
        F.sum(F.when(F.col("v2_id").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("v2_id").isNotNull(), 1).otherwise(0)).alias("n_kept"),
    )


# one written-out copy per (application, sf, format) - a source-format
# round-trip is an ingest-time event, not a per-query one; dirs removed at
# interpreter exit
_SRC_DUMP: dict[tuple[str, str, str], str] = {}


def _dump_dir(spark: SparkSession, sf: str, fmt: str, build) -> str:
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf, fmt)
    if key not in _SRC_DUMP:
        d = tempfile.mkdtemp(prefix=f"src_{fmt}_")
        build(d)
        _SRC_DUMP[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _SRC_DUMP[key]


@query(
    "scan_json_source",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS vsum_cents
    FROM events
    GROUP BY event_type
    """,
)
def scan_json_source(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-lines source connector parity: the events table round-trips
    through newline-delimited JSON (the wire format the reference's HTTP
    ingest actually receives, receiver.py:357) and the aggregate over the
    JSON-sourced frame must equal the parquet-sourced oracle exactly.
    Timestamps and money leave the JSON as integers (epoch micros /
    cents) - the schema-explicit, locale-proof encoding - so the
    round-trip is bit-exact and the JSON reader runs with a user schema
    (no sampling-based inference job, which at 100 TB is a full extra
    scan).  The dump happens once per application; the query's own work
    is the schema-bound JSON scan + one hash agg."""
    ev = load(spark, sf, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    d = _dump_dir(
        spark, sf, "json",
        lambda p: ev.coalesce(1).write.mode("overwrite").json(p),
    )
    src = spark.read.schema(
        "event_id long, ts_us long, user_id long, event_type string, cents long"
    ).json(d)
    return src.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("vsum_cents")
    )


@query(
    "scan_orc_source",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS qty_cents
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def scan_orc_source(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source connector parity (round 13): lineitem round-trips
    through ORC - the other columnar lakehouse format Spark reads
    natively - and the aggregate over the ORC-sourced frame must equal
    the parquet-sourced DuckDB oracle exactly.  The dump carries ALL 11
    lineitem columns (ADVICE r13: a pre-projected dump exercised no real
    pruning on the read side), so the ORC scan genuinely prunes to the 3
    columns the query reads - ReadSchema on the OrcScan shows only
    l_returnflag/l_linestatus/l_quantity.  Doubles round-trip ORC
    bit-exact and the quantity is reduced to integer cents on the read
    side, so the comparison stays bit-exact.  The dump happens once per
    application; the query's own work is the pruned ORC scan + one
    map-side-combined hash agg."""
    li = load(spark, sf, "lineitem")
    d = _dump_dir(
        spark, sf, "orc",
        lambda p: li.coalesce(1).write.mode("overwrite").orc(p),
    )
    src = spark.read.orc(d)
    return src.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long")
        ).alias("qty_cents"),
    )


@query(
    "scan_xml_source",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS first_order_us
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def scan_xml_source(spark: SparkSession, sf: str) -> DataFrame:
    """XML source connector parity (round 14): orders round-trips through
    the XML datasource built into Spark since 4.0 (rowTag records - the
    B2B/legacy interchange format an ingestion edge still receives) and
    the per-(status, priority) rollup over the XML-sourced frame must
    equal the parquet-sourced DuckDB oracle exactly.  Same discipline as
    the JSON/CSV connectors: the reader gets an EXPLICIT schema (XML
    schema inference is a full extra parse pass - at 100 TB that is the
    whole job twice), and timestamps/money ride the text format as epoch
    micros / integer cents, the locale-proof encoding that makes the
    round-trip bit-exact.  The dump happens once per application; the
    query's own work is the schema-bound XML scan + one
    map-side-combined hash agg.  (Avro remains environment-blocked -
    TESTDATA.md; XML closes the last natively-readable format.)"""
    od = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias(
            "price_cents"
        ),
        F.unix_micros("o_orderdate").alias("odate_us"),
        "o_orderpriority",
    )
    d = _dump_dir(
        spark, sf, "xml",
        lambda p: od.coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(p),
    )
    src = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "price_cents long, odate_us long, o_orderpriority string"
        )
        .option("rowTag", "order")
        .format("xml")
        .load(d)
    )
    return src.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("price_cents").alias("price_cents"),
        F.min("odate_us").alias("first_order_us"),
    )


# Arrow Flight source: one server per (application, sf) serving the
# customer table as N DoGet endpoints - shut down at interpreter exit
_FLIGHT_SRC: dict[tuple[str, str], str] = {}
_FLIGHT_SRC_SERVERS: list = []
_FLIGHT_SRC_SLICES = 4


def _flight_source_location(spark: SparkSession, sf: str) -> str:
    """Start (once per application, sf) an Arrow Flight server exposing
    the customer table as _FLIGHT_SRC_SLICES row-slice endpoints; return
    its gRPC location.  The server reads the parquet with pyarrow
    directly - it stands in for the external Flight-speaking system
    (Dremio, an ADBC service, another Spark cluster) a production
    deployment would read from."""
    import atexit
    import os

    import pyarrow.flight as fl
    import pyarrow.parquet as pq

    key = (spark.sparkContext.applicationId, sf)
    loc = _FLIGHT_SRC.get(key)
    if loc is not None:
        return loc
    path = os.path.join(sf, "customer.parquet")
    n_slices = _FLIGHT_SRC_SLICES

    class _Srv(fl.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")
            self._table = None

        def _tbl(self):
            if self._table is None:
                self._table = pq.read_table(
                    path, columns=["c_custkey", "c_nationkey", "c_acctbal"]
                )
            return self._table

        def get_flight_info(self, context, descriptor):
            t = self._tbl()
            endpoints = [
                fl.FlightEndpoint(
                    f"slice-{i}".encode(),
                    [fl.Location.for_grpc_tcp("127.0.0.1", self.port)],
                )
                for i in range(n_slices)
            ]
            return fl.FlightInfo(
                t.schema, descriptor, endpoints, t.num_rows, -1
            )

        def do_get(self, context, ticket):
            i = int(ticket.ticket.decode().split("-")[1])
            t = self._tbl()
            step = -(-t.num_rows // n_slices)  # ceil
            return fl.RecordBatchStream(t.slice(i * step, step))

    srv = _Srv()
    loc = f"grpc://127.0.0.1:{srv.port}"
    _FLIGHT_SRC[key] = loc
    _FLIGHT_SRC_SERVERS.append(srv)
    atexit.register(srv.shutdown)
    return loc


@query(
    "scan_flight_source",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS bal_cents
    FROM customer
    GROUP BY c_nationkey
    """,
)
def scan_flight_source(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow Flight source connector parity (round 15): the customer
    table is served by an Arrow Flight endpoint (pyarrow.flight ships
    with this image's pyarrow - the egress half landed as
    flight_foreach_batch) and read back DISTRIBUTED, the way every
    production Flight consumer works: the driver's one get_flight_info
    call fetches the endpoint list (N tickets), the tickets fan out one
    per task, and each task DoGets its own slice over its own gRPC
    connection inside mapInPandas - record batches flow server ->
    executor as Arrow both on the wire and into pandas, no driver
    materialization, no Python row loop.  At 100 TB the endpoint list is
    the unit of parallelism (a real Flight service returns one endpoint
    per shard/split); the per-(nation) rollup over the Flight-sourced
    frame must equal the parquet-sourced DuckDB oracle exactly - doubles
    round-trip Arrow bit-exact, money reduces to integer cents
    Spark-side."""
    loc = _flight_source_location(spark, sf)
    import pyarrow.flight as fl

    client = fl.connect(loc)
    try:
        info = client.get_flight_info(fl.FlightDescriptor.for_path("customer"))
        tickets = [ep.ticket.ticket.decode() for ep in info.endpoints]
    finally:
        client.close()

    tdf = spark.createDataFrame(
        [(t,) for t in tickets], "ticket string"
    ).repartition(len(tickets))

    def _fetch(batches):
        import pyarrow.flight as _fl

        for pdf in batches:
            for t in pdf["ticket"]:
                cli = _fl.connect(loc)
                try:
                    for chunk in cli.do_get(_fl.Ticket(t.encode())):
                        yield chunk.data.to_pandas()
                finally:
                    cli.close()

    # schema mirrors the parquet file exactly (c_nationkey is int32 there;
    # widening it would dtype-mismatch the oracle)
    src = tdf.mapInPandas(
        _fetch, schema="c_custkey long, c_nationkey int, c_acctbal double"
    )
    return src.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long")
        ).alias("bal_cents"),
    )


@query(
    "scan_csv_source",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def scan_csv_source(spark: SparkSession, sf: str) -> DataFrame:
    """CSV source connector parity: the documents metadata round-trips
    through headered CSV and the per-(lang, source) rollup must equal
    the parquet-sourced oracle.  Read with an EXPLICIT schema and
    header=true - never inferSchema, which costs a full extra pass and
    can flip types between runs at scale.  Only scalar metadata columns
    ride the CSV (the text column stays in columnar formats where it
    belongs - CSV is the interchange format for manifests, not
    payloads)."""
    dm = load(spark, sf, "documents").select("doc_id", "lang", "source", "n_chars")
    d = _dump_dir(
        spark, sf, "csv",
        lambda p: dm.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(p),
    )
    src = spark.read.schema(
        "doc_id long, lang string, source string, n_chars long"
    ).option("header", True).csv(d)
    return src.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "text_bpe_merge_step",
    oracle="""
    WITH tf AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(token) - 1),
                                   i -> substr(token, i, 2))) AS pair,
             c
      FROM tf WHERE len(token) >= 2)
    SELECT pair, CAST(sum(c) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 10
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf: str) -> DataFrame:
    """One byte-pair-encoding merge iteration (Sennrich et al., ACL'16 -
    the algorithm behind every modern tokenizer vocabulary): count
    adjacent character pairs across the corpus weighted by token
    frequency and emit the top-10 merge candidates.  The trainer's full
    loop repeats this step after applying the winning merge; ONE step is
    the oracle-checkable unit, and its data shape is the whole story:
    pair counting runs over the DISTINCT-term dictionary (|vocab| rows)
    weighted by pre-aggregated term counts - never over the raw corpus -
    so a 100 TB corpus costs one term-count agg (map-side combined) and
    a vocabulary-sized pair explode.  Pair generation is a codegen
    substring transform (1->len-1 map-side fan-out, no UDF); counts are
    exact integers; top-10 ties break on the pair string."""
    d = load(spark, sf, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    pairs = tf.filter(F.length("token") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("token") - 1),
                lambda i: F.col("token").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(10)
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    proj AS (
      SELECT DISTINCT a.s AS s1, b.s AS s2
      FROM e0 a JOIN e0 b ON a.p = b.p AND a.s < b.s),
    tri AS (
      SELECT 1 AS one
      FROM proj ab
      JOIN proj bc ON bc.s1 = ab.s2
      JOIN proj ac ON ac.s1 = ab.s1 AND ac.s2 = bc.s2)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM proj) AS n_proj_edges
    FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting on the supplier co-purchase projection (suppliers
    sharing a part) - the clustering-coefficient numerator and the
    canonical second graph benchmark after PageRank.  Ordered-edge
    enumeration (s1 < s2 < s3 via two equi joins) counts each triangle
    EXACTLY once - the compact-forward algorithm, no post-division by 6.
    The projection itself is the part-blocked pairwise join (same
    blocking discipline as dedup_near_jaccard); at 100 TB the known
    hazard is hub parts creating quadratic pair fan-out, and the
    production mitigation - cap or sample per-part neighbor lists - is
    the same df-cap documented in dedup_winnowing.  Everything is an
    equi join on integer keys; the count is exact.

    Execution shape (r14 rework - this was the repo's slowest query at
    36 s warm): the projection MATERIALIZES once (eager localCheckpoint;
    the old plan recomputed the part-blocked self-join + distinct for
    all four consumers), and inside the gated regime the triangles are
    COUNTED, never enumerated - the edge-iterator algorithm: per-node
    sorted forward-neighbor arrays (s2 > s1, so each triangle a<b<c is
    counted exactly once at edge (a,b) as c in N+(a) intersect N+(b)),
    broadcast to both endpoints of every projected edge, summed as
    size(array_intersect(...)).  The fixture's projection is the
    complete K1000 (499,500 edges closing into 166.2M triangles); the
    old compact-forward spelling pushed all 166M wedge rows through two
    joins - the count needs only the 500k per-edge intersection sizes.
    Measured sf0.1 warm: 36 s -> ~5 s (DuckDB enumerates it in 2.9 s).
    Past the gate - projection beyond the broadcast regime OR any hub
    node whose forward-neighbor array would exceed TRI_MAX_DEG_CAP
    (ADVICE r14: both scalars come from one combinable degree agg over
    the checkpointed blocks) - the shuffle compact-forward spelling
    below is the 100 TB fallback, with the documented hub-cap mitigation
    bounding the wedge fan-out.  Projection + gate scalars cache per
    (application, sf): repeat invocations skip the build and the gate
    job entirely."""
    key = (spark.sparkContext.applicationId, sf)
    cached = _TRI_PROJ_CACHE.get(key)
    if cached is None:
        li = load(spark, sf, "lineitem")
        e0 = li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")).distinct()
        a = e0.select(F.col("p").alias("pa"), F.col("s").alias("sa"))
        b = e0.select(F.col("p").alias("pb"), F.col("s").alias("sb"))
        proj = (
            a.join(b, (F.col("pa") == F.col("pb")) & (F.col("sa") < F.col("sb")))
            .select(F.col("sa").alias("s1"), F.col("sb").alias("s2"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # one combinable agg over the checkpointed blocks delivers BOTH
        # gate scalars: sum of forward degrees = total projected edges,
        # max forward degree = widest neighbor array a broadcast row
        # would have to hold (bounded: scalars, counted not collected)
        stats = (
            proj.groupBy("s1")
            .agg(F.count("*").alias("d"))
            .agg(F.sum("d").alias("n"), F.max("d").alias("mx"))
            .first()
        )
        n_proj = int(stats["n"] or 0)
        max_deg = int(stats["mx"] or 0)
        _TRI_PROJ_CACHE[key] = (proj, n_proj, max_deg)
    else:
        proj, n_proj, max_deg = cached
    if n_proj <= TRI_BCAST_CAP and max_deg <= TRI_MAX_DEG_CAP:
        adj = proj.groupBy("s1").agg(
            F.sort_array(F.collect_list("s2")).alias("nbrs")
        )
        tri = (
            proj.join(
                F.broadcast(
                    adj.select(F.col("s1").alias("u"), F.col("nbrs").alias("nu"))
                ),
                F.col("s1") == F.col("u"),
            )
            .join(
                F.broadcast(
                    adj.select(F.col("s1").alias("v"), F.col("nbrs").alias("nv"))
                ),
                F.col("s2") == F.col("v"),
            )
            .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
            .agg(
                F.coalesce(F.sum("c"), F.lit(0))
                .cast("long")
                .alias("n_triangles")
            )
        )
    else:
        ab = proj.select(F.col("s1").alias("x1"), F.col("s2").alias("x2"))
        bc = proj.select(F.col("s1").alias("y1"), F.col("s2").alias("y2"))
        ac = proj.select(F.col("s1").alias("z1"), F.col("s2").alias("z2"))
        tri = (
            ab.join(bc, F.col("y1") == F.col("x2"))
            .join(
                ac,
                (F.col("z1") == F.col("x1")) & (F.col("z2") == F.col("y2")),
            )
            .agg(F.count("*").alias("n_triangles"))
        )
    return tri.select(
        "n_triangles", F.lit(n_proj).cast("long").alias("n_proj_edges")
    )


@query(
    "agg_mad_robust",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(med.m * 10000.0 + 0.5) / 10000.0 AS median_val,
           floor(quantile_cont(abs(e.value - med.m), 0.5) * 10000.0 + 0.5)
             / 10000.0 AS mad
    FROM events e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type, med.m
    """,
)
def agg_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Median absolute deviation per group - the robust dispersion stat
    that survives the outliers stddev drowns in (the anomaly detector's
    production-grade alternative to events_anomaly_zscore's z-score).
    Inherently two-pass (the deviations need the median first): pass 1
    computes per-group medians (5 rows), broadcast back into pass 2's
    deviation percentile - two shuffles on the same group key, the
    textbook MAD plan at any scale.  Both percentiles are the exact
    interpolated kind both engines share (Spark percentile = DuckDB
    quantile_cont); |x - m| is computed from identical doubles."""
    ev = load(spark, sf, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(
            F.count("*").alias("n"),
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias(
                "mad_raw"
            ),
        )
        .select(
            "event_type",
            "n",
            pround("m", 4).alias("median_val"),
            pround("mad_raw", 4).alias("mad"),
        )
    )


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS vsum_cents
    FROM events
    WHERE strftime(date_trunc('day', ts), '%Y-%m-%d') = '2024-01-15'
    GROUP BY event_type
    """,
)
def scan_partition_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-pruned scan as a user-facing operator: the events table
    is laid out once per application as day-partitioned parquet (the
    100 TB fact layout), and a single-day query reads ONLY that day's
    directory - the filter becomes a PartitionFilter (directory pruning,
    zero data touched outside the day) rather than a row predicate.
    tests/test_plan_quality.py pins the PartitionFilters/no-post-scan-
    Condition plan shape for this layout; the oracle runs the same day
    predicate over the unpartitioned parquet, proving layout changes
    results not at all.  Money rides as integer cents."""
    ev = load(spark, sf, "events")
    with_day = ev.withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    d = _dump_dir(
        spark, sf, "events_by_day",
        lambda p: with_day.write.mode("overwrite").partitionBy("day").parquet(p),
    )
    # explicit schema: a 0-row input dumps no partition dirs at all, and a
    # schema-less read of the empty layout cannot bind (empty-input sweep,
    # round 8); on populated layouts the declared schema changes nothing -
    # PartitionFilters pruning is pinned by test_plan_quality either way
    src = (
        spark.read.schema(with_day.schema)
        .parquet(d)
        .filter(F.col("day") == "2024-01-15")
    )
    return src.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias(
            "vsum_cents"
        ),
    )


@query(
    "merge_scd2_history",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    ch AS (
      SELECT user_id, event_type, ts, event_id, next_ts
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type),
    v AS (
      SELECT user_id, event_type, ts AS valid_from, event_id,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM ch)
    SELECT user_id,
           event_type AS attr_value,
           CAST(epoch_us(valid_from) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(valid_to) AS BIGINT) AS valid_to_us,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM v
    """,
)
def merge_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: collapse each
    user's event stream into attribute VERSIONS - a new row only when the
    value changes, carrying [valid_from, valid_to) and an is_current
    flag - the warehouse transform behind every dimension table with
    history.  Two windows over ONE (user_id, (ts, event_id)) sort (the
    change filter reuses the partitioning for the validity lead), open
    intervals NULL-terminated.  Interval bounds leave as exact integer
    microseconds.  At 100 TB this runs per dimension key exactly like
    any sessionization - one shuffle, state bounded by versions, not
    events."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    ch = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.lead("ts").over(w2).alias("valid_to"),
    )
    return v.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    ch AS (
      SELECT user_id, event_type, ts, event_id FROM seq
      WHERE prev_type IS NULL OR prev_type <> event_type),
    v AS (
      SELECT user_id, event_type AS attr_value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM ch),
    p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id, v.attr_value,
           CAST(epoch_us(p.ts) - epoch_us(v.valid_from) AS BIGINT)
             AS version_age_us
    FROM p JOIN v
      ON p.user_id = v.user_id
         AND p.ts >= v.valid_from
         AND (v.valid_to IS NULL OR p.ts < v.valid_to)
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 history: each
    purchase picks the attribute version valid AT its timestamp - the
    query pattern every ML feature store and audit report runs against a
    versioned dimension, and the reason SCD2 exists.  The containment
    predicate rides INSIDE a user_id equi join (versions per user are
    few), so the plan is a plain hash join + residual filter - never an
    interval cross product; at 100 TB the version side is the small one
    and broadcasts or co-partitions on the same key as the fact.  Each
    purchase matches EXACTLY one version (intervals partition the
    timeline), asserted by construction: the half-open [from, to)
    bounds."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    v = ch.select(
        F.col("user_id").alias("v_user"),
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "attr_value",
        (F.unix_micros("ts") - F.unix_micros("valid_from")).alias(
            "version_age_us"
        ),
    )


@query(
    "agg_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_key_rows,
             quantile_cont(n, 0.5) AS p50,
             quantile_cont(n, 0.99) AS p99
      FROM c)
    SELECT n_keys, n_rows, max_key_rows,
           floor(p50 * 100.0 + 0.5) / 100.0 AS p50_key_rows,
           floor(p99 * 100.0 + 0.5) / 100.0 AS p99_key_rows,
           CAST(floor((max_key_rows * 1000000.0 / n_rows) + 0.5) AS BIGINT)
             AS max_share_ppm
    FROM s
    """,
)
def agg_key_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the per-key row-count
    distribution (p50/p99/max and the hottest key's parts-per-million
    share) for lineitem's join key - the number you read BEFORE choosing
    between a plain hash join, functions.salted_join, or AQE skew
    handling.  One hash agg to per-key counts, then a 1-row stats agg
    over the |keys| frame; exact percentile interpolation both engines.
    This is the operator form of the planning rule every 100 TB join in
    this repo documents: measure skew, then pick the join."""
    li = load(spark, sf, "lineitem")
    c = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    s = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.percentile("n", F.lit(0.5)).alias("p50"),
        F.percentile("n", F.lit(0.99)).alias("p99"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        pround("p50", 2).alias("p50_key_rows"),
        pround("p99", 2).alias("p99_key_rows"),
        F.floor((F.col("max_key_rows") * 1000000.0 / F.col("n_rows")) + 0.5).alias(
            "max_share_ppm"
        ),
    )


@query(
    "dedup_containment",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split(text, ' ')) AS toks
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
           CAST(len(a.toks) AS BIGINT) AS n_a,
           floor((len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks))
                 * 10000.0 + 0.5) / 10000.0 AS containment_a_in_b
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks) >= 0.9
          AND len(a.toks) * 2 <= len(b.toks)
    """,
)
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment (asymmetric Jaccard) near-dup detection: |A ∩ B| / |A|
    >= 0.9 where A is at most half B's size - the quote-inclusion /
    boilerplate-wrapper duplicates symmetric Jaccard structurally CANNOT
    catch (a 50-token quote inside a 500-token page has Jaccard ~0.1 but
    containment ~1.0).  Same (lang, source) blocking discipline as
    dedup_near_jaccard, with the size-asymmetry gate IN the join
    predicate so the pair explosion prunes before any array work;
    ordered pairs (A strictly smaller) are the semantics, not a dedup
    shortcut.  At 100 TB the blocked pairwise gives way to the same
    MinHash banding as Jaccard - containment just changes the estimator
    (MinHash of A intersected with B's band buckets)."""
    d = load(spark, sf, "documents")
    t = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    a = t.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("la"),
        F.col("source").alias("sa"),
        F.col("toks").alias("ta"),
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lb"),
        F.col("source").alias("sb"),
        F.col("toks").alias("tb"),
    )
    common = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    contain = common * 1.0 / F.size("ta")
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("doc_a") != F.col("doc_b"))
            & (F.size("ta") * 2 <= F.size("tb")),
        )
        .filter(contain >= 0.9)
        .select(
            "doc_a",
            "doc_b",
            common.cast("long").alias("n_common"),
            F.size("ta").cast("long").alias("n_a"),
            pround(contain, 4).alias("containment_a_in_b"),
        )
    )


@query(
    "sim_embed_norm_audit",
    oracle="""
    WITH n AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      -- a NULL vector has no norm to audit (missingness is a contract-
      -- audit concern, not a norm statistic) - NULL sweep, round 8
      FROM embeddings WHERE embedding IS NOT NULL),
    med AS (SELECT quantile_cont(nrm, 0.5) AS m FROM n),
    mad AS (
      SELECT quantile_cont(abs(n.nrm - med.m), 0.5) AS d, med.m AS m
      FROM n CROSS JOIN med GROUP BY med.m)
    SELECT n.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN abs(n.nrm - mad.m) > 3 * mad.d
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           floor(min(n.nrm) * 10000.0 + 0.5) / 10000.0 AS norm_min,
           floor(max(n.nrm) * 10000.0 + 0.5) / 10000.0 AS norm_max
    FROM n CROSS JOIN mad
    GROUP BY n.label
    """,
)
def sim_embed_norm_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-pipeline health audit: per-label vector-norm extremes
    and the count of robust outliers (|norm - median| > 3 MAD) - the QC
    gate run before any index build, because a batch of near-zero or
    exploded norms means the encoder broke upstream (and cosine quietly
    hides it).  Norms are the sequential-fold exact dot; the global
    median and MAD are two 1-row aggregates broadcast back (the
    agg_mad_robust two-pass, corpus-wide); min/max per label are exact
    double order statistics - no float sums anywhere."""
    e = load(spark, sf, "embeddings")
    n = e.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "label",
        F.sqrt(_dot_local(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    med = n.agg(F.percentile("nrm", F.lit(0.5)).alias("m"))
    mad = (
        n.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("nrm") - F.col("m")), F.lit(0.5)).alias("d"),
            F.first("m").alias("m"),
        )
    )
    return (
        n.crossJoin(F.broadcast(mad))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(
                F.when(
                    F.abs(F.col("nrm") - F.col("m")) > 3 * F.col("d"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            pround(F.min("nrm"), 4).alias("norm_min"),
            pround(F.max("nrm"), 4).alias("norm_max"),
        )
    )


def _dot_local(a, b):
    """Sequential-fold double dot product (llm._dot's discipline, local
    copy to keep corpus_ops import-free of llm)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@query(
    "events_active_users_rolling",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)
               AS day_id,
             user_id
      FROM events),
    bounds AS (
      SELECT min(day_id) AS d0, max(day_id) AS d1 FROM pairs),
    grid AS (
      SELECT unnest(generate_series(b.d0, b.d1)) AS day_id FROM bounds b),
    dau AS (
      SELECT day_id, CAST(count(*) AS BIGINT) AS dau FROM pairs GROUP BY 1),
    wau AS (
      SELECT t AS day_id, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM (SELECT unnest(generate_series(day_id, day_id + 6)) AS t, user_id
            FROM pairs)
      GROUP BY t),
    mau AS (
      SELECT t AS day_id, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM (SELECT unnest(generate_series(day_id, day_id + 27)) AS t, user_id
            FROM pairs)
      GROUP BY t)
    SELECT g.day_id,
           coalesce(dau.dau, 0) AS dau,
           coalesce(wau.wau, 0) AS wau,
           coalesce(mau.mau, 0) AS mau
    FROM grid g
    LEFT JOIN dau ON dau.day_id = g.day_id
    LEFT JOIN wau ON wau.day_id = g.day_id
    LEFT JOIN mau ON mau.day_id = g.day_id
    """,
)
def events_active_users_rolling(spark: SparkSession, sf: str) -> DataFrame:
    """Exact rolling active-user counts - DAU plus trailing 7-day WAU and
    28-day MAU per day, the product-analytics headline metric.  Rolling
    DISTINCT cannot be window-summed (users overlap across days), so the
    exact spelling is contribution fan-out: each distinct (day, user)
    pair is exploded to the 7 (resp. 28) target days it keeps the user
    active for - map-side 1->N with NO self-join - then one distinct
    count per target day.  The (day, user) projection is the only
    data-volume shuffle; fan-out rows are |pairs| x window days, the
    same work a TSDB's sliding HLL would do, but exact (the sketch
    alternative for 100 TB is stream_sliding_hll's
    approx_count_distinct, declared separately).  Day grid from
    sequence+explode; trailing windows at the stream head are partial
    by definition; days past the last activity are clipped by the
    grid."""
    ev = load(spark, sf, "events")
    pairs = ev.select(
        F.floor(F.unix_micros("ts") / 86_400_000_000.0).cast("long").alias("day_id"),
        "user_id",
    ).distinct()
    bounds = pairs.agg(F.min("day_id").alias("d0"), F.max("day_id").alias("d1"))
    grid = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day_id"))
    dau = pairs.groupBy("day_id").agg(F.count("*").alias("dau"))

    def rolling(days: int, name: str) -> DataFrame:
        return (
            pairs.select(
                F.explode(
                    F.sequence(F.col("day_id"), F.col("day_id") + (days - 1))
                ).alias("day_id"),
                "user_id",
            )
            .distinct()
            .groupBy("day_id")
            .agg(F.count("*").alias(name))
        )

    out = (
        grid.join(dau, "day_id", "left")
        .join(rolling(7, "wau"), "day_id", "left")
        .join(rolling(28, "mau"), "day_id", "left")
        .select(
            "day_id",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
            F.coalesce("mau", F.lit(0)).alias("mau"),
        )
    )
    return out


@query(
    "pipeline_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 4)) AS INTEGER) % 64
               AS bucket
      FROM tok),
    c AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY doc_id, bucket)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_nonzero,
           CAST(max(n) AS BIGINT) AS max_bucket_count,
           string_agg(bucket || ':' || n, ',' ORDER BY bucket) AS features
    FROM c
    GROUP BY doc_id
    """,
)
def pipeline_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al., ICML'09): tokens
    hashed into a fixed 64-bucket count vector per document - the
    vocabulary-free featurizer that needs NO dictionary build, no
    broadcast, and no extra pass, which is why it is the default for
    100 TB text -> features.  The bucket hash is the first 16 bits of
    md5 mod 64 - engine-portable (xxhash64/DuckDB hash() differ across
    engines; md5 does not).  One explode + two hash aggs, all map-side
    combinable; the sparse vector renders canonically (bucket-sorted
    'b:n' pairs) so the feature row itself is oracle-checkable."""
    d = load(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    b = tok.select(
        "doc_id",
        (F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("int") % 64).alias(
            "bucket"
        ),
    )
    c = b.groupBy("doc_id", "bucket").agg(F.count("*").alias("n"))
    return c.groupBy("doc_id").agg(
        F.count("*").alias("n_nonzero"),
        F.max("n").alias("max_bucket_count"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "n"))),
                lambda x: F.concat_ws(":", x["bucket"], x["n"]),
            ),
            ",",
        ).alias("features"),
    )


@query(
    "pipeline_target_encoding",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM events GROUP BY event_type),
    g AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_all,
             CAST(sum(sum_cents) AS BIGINT) AS cents_all
      FROM s)
    SELECT s.event_type, s.n,
           floor(((s.sum_cents + 20.0 * (g.cents_all * 1.0 / g.n_all))
                  / (s.n + 20.0)) * 100.0 + 0.5) / 100.0
             AS encoded_cents,
           floor((g.cents_all * 1.0 / g.n_all) * 100.0 + 0.5) / 100.0
             AS prior_cents
    FROM s CROSS JOIN g
    """,
)
def pipeline_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """Smoothed target encoding (the categorical-feature workhorse):
    each category's mean target shrunk toward the global prior with
    pseudo-count m=20 - (sum + m*prior) / (n + m) - so rare categories
    don't memorize their few labels.  Sufficient statistics are INTEGER
    cents (exact, order-independent); the global prior is a 1-row agg
    OVER the category frame (not a second data pass) broadcast back.
    Two tiny shuffles total; at 100 TB the per-category stats frame is
    |categories| rows and the encode itself is a broadcast join against
    the fact table - this query emits the encoding table that join
    consumes.  Production footnote: leakage-free variants (K-fold /
    leave-one-out) reuse the same sufficient statistics per fold."""
    ev = load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(cents).alias("sum_cents")
    )
    g = s.agg(
        F.sum("n").alias("n_all"), F.sum("sum_cents").alias("cents_all")
    )
    prior = F.col("cents_all") * 1.0 / F.col("n_all")
    return s.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        pround((F.col("sum_cents") + 20.0 * prior) / (F.col("n") + 20.0), 2).alias(
            "encoded_cents"
        ),
        pround(prior, 2).alias("prior_cents"),
    )


@query(
    "scan_csv_quarantine",
    oracle="""
    SELECT lang,
           CAST(sum(CASE WHEN doc_id % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(sum(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(sum(CASE WHEN doc_id % 10 <> 3 THEN n_chars ELSE 0 END)
                AS BIGINT) AS sum_chars_clean
    FROM documents
    GROUP BY lang
    """,
)
def scan_csv_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """Malformed-record QUARANTINE on the CSV ingest path: a feed where
    every doc_id ending in 3 carries an unparsable numeric field (the
    deterministic stand-in for the corrupt rows every real feed
    contains) is read in PERMISSIVE mode with an explicit
    columnNameOfCorruptRecord - bad rows land in the quarantine column
    with their raw line preserved (replayable after a fix), clean rows
    flow through typed.  This is the ingestion error contract the
    reference enforces with HTTP 400s per record (receiver.py:129-139
    validation + tests/test_receiver.py malformed-payload cases) -
    re-expressed as the dead-letter pattern a file/Kafka batch source
    needs, where there is no caller to 400 at.  FAILFAST would kill the
    job on row one; DROPMALFORMED silently loses data - PERMISSIVE +
    quarantine count is the only posture that is both complete and
    auditable.  The per-lang report proves (a) no row is lost (clean +
    quarantined = total, oracle-checked against the source of truth)
    and (b) corrupt rows never poison the clean aggregate.  The dump is
    once per application; the query is one schema-bound CSV scan + one
    hash agg."""
    dm = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 10 == 3,
            F.concat(F.lit("corrupt<"), F.col("n_chars").cast("string")),
        )
        .otherwise(F.col("n_chars").cast("string"))
        .alias("n_chars"),
    )
    d = _dump_dir(
        spark, sf, "csv_bad",
        lambda p: dm.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(p),
    )
    src = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _bad string"
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(d)
    )
    return src.groupBy("lang").agg(
        F.sum(F.when(F.col("_bad").isNull(), 1).otherwise(0)).alias("n_clean"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0)).alias(
            "n_quarantined"
        ),
        F.sum(
            F.when(F.col("_bad").isNull(), F.col("n_chars")).otherwise(0)
        ).alias("sum_chars_clean"),
    )


@query(
    "scan_binary_source",
    oracle="""
    SELECT source,
           CAST(1 AS BIGINT) AS n_files,
           -- strlen = BYTE length (ADVICE r6: len() is characters; file
           -- sizes are bytes, parity must not ride on ASCII-only fixtures)
           CAST(sum(strlen(text)) + count(*) AS BIGINT) AS n_bytes,
           sha256(string_agg(text || chr(10), '' ORDER BY doc_id))
             AS content_sha
    FROM documents
    -- a NULL text has no payload and a NULL source no directory (Spark
    -- would file it under the hive default partition; string_agg would
    -- silently skip the row) - excluded explicitly on both sides
    -- (NULL-input sweep, round 8)
    WHERE text IS NOT NULL AND source IS NOT NULL
    GROUP BY source
    """,
)
def scan_binary_source(spark: SparkSession, sf: str) -> DataFrame:
    """binaryFile source connector - the ingestion surface for the
    multimodal path (images/audio/video arrive as FILES; this reader is
    how they become a binary column with typed metadata, the posture
    pipeline/multimodal.py's decode plumbing consumes).  The corpus is
    laid out once per application as one newline-delimited text file per
    source directory (repartition(source) + partitionBy + in-partition
    sort = exactly one deterministic file per source, written by
    executors - no driver-side collect), then read back with
    format('binaryFile'): (path, length, content) columns, the partition
    value recovered from the path.  The per-source report proves
    BYTE-exact round-trip fidelity: file length equals text bytes +
    newlines, and sha256(content) equals the oracle's sha256 over the
    same concatenation computed straight from the table - an
    end-to-end checksum across write, filesystem, and the binary
    reader.  At 100 TB binaryFile scans parallelize per file with
    pushed path filters; the length column comes from the file status,
    so audits that only need sizes never read payload bytes."""
    dm = (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", "text")
    )
    d = _dump_dir(
        spark, sf, "binsrc",
        lambda p: dm.repartition("source")
        .sortWithinPartitions("source", "doc_id")
        .select("source", "text")
        .write.mode("overwrite")
        .partitionBy("source")
        .text(p),
    )
    src = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "false")
        .load(d)
    )
    return (
        src.select(
            F.regexp_extract(F.col("path"), "source=([^/]+)", 1).alias("source"),
            "length",
            F.lower(F.sha2("content", 256)).alias("sha"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("length").alias("n_bytes"),
            F.min("sha").alias("content_sha"),
        )
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy,
           CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 ELSE 0 END)
                AS BIGINT) AS quality_sum
    FROM documents
    GROUP BY lang
    """,
)
def scan_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution scan (mergeSchema): the corpus lands in two
    generations of parquet - a legacy batch written BEFORE the `quality`
    column existed (even doc_ids: doc_id, lang, n_chars) and a current
    batch carrying the added column (odd doc_ids: + quality = n_chars %
    100) - and one mergeSchema read reconciles them: the unified schema
    is the union, legacy rows surface NULL quality, and no rewrite of
    old files ever happens.  That contract is how a 100 TB lakehouse
    adds columns (rewriting history is off the table); the report
    proves it - legacy-row counts come from `quality IS NULL`, the
    quality sum only from evolved rows, both matching the oracle's
    derivation from the source of truth.  mergeSchema costs a footer
    read per file at planning (not a data scan); once table formats pin
    the schema in metadata even that goes away - the read path here is
    the raw-parquet worst case.  Dump once per application; the query
    itself is one merged scan + a hash agg."""
    dm = load(spark, sf, "documents").select("doc_id", "lang", "n_chars")

    def build(p: str) -> None:
        legacy = dm.filter(F.col("doc_id") % 2 == 0)
        evolved = (
            dm.filter(F.col("doc_id") % 2 == 1)
            .withColumn("quality", (F.col("n_chars") % 100).cast("long"))
        )
        legacy.coalesce(1).write.mode("overwrite").parquet(f"{p}/batch=legacy")
        evolved.coalesce(1).write.mode("overwrite").parquet(f"{p}/batch=evolved")

    d = _dump_dir(spark, sf, "schema_evo", build)
    src = spark.read.option("mergeSchema", True).option(
        "recursiveFileLookup", True
    ).parquet(d)
    return src.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0)).alias("n_legacy"),
        F.sum(F.coalesce(F.col("quality"), F.lit(0))).alias("quality_sum"),
    )


# ---------------------------------------------------------------------------
# community detection (round 9)
# ---------------------------------------------------------------------------

# packing base for the deterministic LPA mode: labels are node ids
# (< ~1.2e6 incl. the part offset), so cnt * 4e6 + (4e6-1 - lbl) orders by
# count first, then by SMALLEST label - one integer max() agg instead of
# engine-specific argmax/struct-ordering semantics (the
# sim_kmeans_lloyd_step packing discipline, inverted for a max)
_LPA_PACK = 4_000_000


def _lpa_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT node,
             CAST({_LPA_PACK - 1}
                  - (max(cnt * {_LPA_PACK} + ({_LPA_PACK - 1} - lbl))
                     % {_LPA_PACK}) AS BIGINT) AS lbl
      FROM (
        SELECT v.node, v.lbl, CAST(count(*) AS BIGINT) AS cnt
        FROM (
          SELECT e.dst AS node, p.lbl FROM edges e
          JOIN {prev} p ON e.src = p.node
          UNION ALL
          SELECT node, lbl FROM {prev}
        ) v GROUP BY v.node, v.lbl) c
      GROUP BY node)"""


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH e0 AS ({_GRAPH_EDGES_SQL}),
    edges AS (SELECT s AS src, p AS dst FROM e0
              UNION ALL SELECT p, s FROM e0),
    l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl
           FROM edges),
    {_lpa_iter_sql("l0", "l1")},
    {_lpa_iter_sql("l1", "l2")},
    {_lpa_iter_sql("l2", "l3")}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN node >= 1000000 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_suppliers,
           CAST(sum(CASE WHEN node >= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parts
    FROM l3 GROUP BY lbl
    ORDER BY n_nodes DESC, community
    LIMIT 20
    """,
)
def graph_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Three synchronous label-propagation rounds (LPA, Raghavan et al.
    2007) over the bidirected link graph - the linear-time community
    detector (vs dedup_cluster_components' exact connected components,
    which ignores edge density; LPA's mode vote follows the DENSE
    regions).  Every node starts as its own label; each round it adopts
    the most frequent label among its neighbors PLUS itself (the
    self-vote damps the label oscillation synchronous LPA exhibits on
    bipartite graphs), ties to the smallest label.

    Determinism: the mode is one integer max() over packed
    cnt * {_LPA_PACK} + ({_LPA_PACK - 1} - lbl) keys - count-desc then
    label-asc, no struct ordering, no RNG, bit-identical cross-engine.
    Plan shape: per round, one hash join of labels onto the
    lineage-truncated adjacency index (_edge_index - built once per
    app, shared with PageRank) + two combinable aggs ((node, lbl)
    counts, then the packed max per node).  All shuffles are keyed on
    node ids; at 100x the edge set each round scales linearly and the
    final community rollup is a tiny hash agg.  Hot hub nodes are an
    input-side skew (AQE splits the join); the vote agg is map-side
    combinable so no single task ever owns a hub's full message list.

    The 3-round unroll exists for static-CTE oracle parity; the
    production fixpoint spelling is graph.label_propagation_converged
    (loops until zero labels change or max_iter, same packed-key vote)
    - pytest-pinned bit-equal to this query at the same iteration count
    (tests/test_pipeline_components.py, TestConvergenceGatedTwins)."""
    ed, _deg = _edge_index(spark, sf)
    # label init: the distinct() over the persisted edge rows LOOKS
    # redundant next to the one-row-per-node deg table, but its closing
    # exchange is what ReuseExchange collapses when the 3-round unroll
    # embeds this subtree 2^k times across the rounds - an r15 attempt to
    # init from the deg checkpoint instead measured 1.86 -> 4.46 s.
    nodes = ed.select(F.col("src").alias("node")).distinct()
    lbl = nodes.select("node", F.col("node").cast("long").alias("lbl"))
    for _ in range(3):
        msgs = (
            ed.join(lbl, ed["src"] == lbl["node"])
            .select(F.col("dst").alias("node"), "lbl")
            .unionAll(lbl.select("node", "lbl"))
        )
        c = msgs.groupBy("node", "lbl").agg(F.count("*").alias("cnt"))
        lbl = (
            c.groupBy("node")
            .agg(
                F.max(
                    F.col("cnt") * _LPA_PACK
                    + (F.lit(_LPA_PACK - 1) - F.col("lbl"))
                ).alias("pk")
            )
            .select(
                "node",
                (F.lit(_LPA_PACK - 1) - F.col("pk") % _LPA_PACK)
                .cast("long")
                .alias("lbl"),
            )
        )
    return (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(
                F.when(F.col("node") >= _PART_NODE_OFFSET, 0).otherwise(1)
            ).alias("n_suppliers"),
            F.sum(
                F.when(F.col("node") >= _PART_NODE_OFFSET, 1).otherwise(0)
            ).alias("n_parts"),
        )
        .orderBy(F.desc("n_nodes"), F.asc("community"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# convergence-gated twins as driver-visible queries (round 13)
# ---------------------------------------------------------------------------


@query("graph_pagerank_converged")
def graph_pagerank_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-visible spelling of graph.pagerank_converged (VERDICT r12
    item 5): the PRODUCTION iteration path - `while delta > eps` with a
    max-iter bound - over the same micro-rank integer arithmetic and
    once-materialized adjacency as the unrolled graph_pagerank_iter,
    surfacing (n_iter, converged) in every output row so the driver's
    rows-only check exercises the convergence gate itself.  rows-only BY
    DECLARATION: a data-dependent iteration count cannot be spelled as a
    static DuckDB CTE chain (the fixed 3-round unroll next door is the
    hash-oracled sibling; the twin is pytest-pinned bit-equal to it at
    the same iteration count).

    eps is ONE initial-rank unit (1e6 micro): damped integer PageRank
    contracts the max per-node delta by exactly alpha = 0.85 per round
    (measured sf0.01: 17.7M -> 15.0M -> 12.6M ...), so the iteration
    budget is log(delta0/eps)/log(1/alpha) ~ 18 rounds here, and a
    micro-scale eps under the quantization noise floor would spin to
    max_iter (the r12 limit-cycle lesson).  Per round: one hash join on
    the partitioned-persisted adjacency + one combinable sum shuffle +
    one bounded scalar delta action - the early exit saves whole rounds
    of shuffle at 100x."""
    from .. import graph

    ed, deg = _edge_index(spark, sf)
    ranks, n_iter, conv = graph.pagerank_converged(
        ed, deg, eps_micro=1_000_000, max_iter=25
    )
    return (
        ranks.select(
            "node",
            F.when(F.col("node") >= _PART_NODE_OFFSET, "part")
            .otherwise("supplier")
            .alias("kind"),
            F.col("rank").alias("rank_micro"),
            F.lit(n_iter).cast("int").alias("n_iter"),
            F.lit(conv).alias("converged"),
        )
        .orderBy(F.desc("rank_micro"), F.asc("node"))
        .limit(20)
    )


@query("graph_lpa_converged")
def graph_lpa_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-visible spelling of graph.label_propagation_converged
    (VERDICT r12 item 5): synchronous LPA looped to its natural fixpoint
    - zero labels changed - instead of the oracle-parity 3-round unroll
    (graph_label_propagation), with (n_iter, converged) carried in the
    community rollup.  rows-only BY DECLARATION, same reason as the
    PageRank twin: the iteration count is data-dependent (measured: 4
    rounds at sf0.001, 5 at sf0.01).  Label counts are integers so the
    gate needs no epsilon; the max_iter bound is the oscillation
    diagnostic for bipartite structure (converged=False at the bound).
    Per round: one hash join on the persisted adjacency + two combinable
    aggs + one bounded count action."""
    from .. import graph

    ed, _deg = _edge_index(spark, sf)
    labels, n_iter, conv = graph.label_propagation_converged(ed, max_iter=25)
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(
                F.when(F.col("node") >= _PART_NODE_OFFSET, 0).otherwise(1)
            ).alias("n_suppliers"),
            F.sum(
                F.when(F.col("node") >= _PART_NODE_OFFSET, 1).otherwise(0)
            ).alias("n_parts"),
        )
        .select(
            "community",
            "n_nodes",
            "n_suppliers",
            "n_parts",
            F.lit(n_iter).cast("int").alias("n_iter"),
            F.lit(conv).alias("converged"),
        )
        .orderBy(F.desc("n_nodes"), F.asc("community"))
        .limit(20)
    )
