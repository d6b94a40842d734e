"""Round-6 (session 2) analytics extensions: EWMA smoothing, OHLC
resampling, graph node-similarity, stratified K-fold assignment, corpus
quality-rule audit, duplicated-span detection, Count-Min frequency
sketching, and integer-exact random projection.

Same standing disciplines as corpus_ops.py:
- cross-engine exactness: integer arithmetic wherever a float sum would be
  order-dependent; where floats are unavoidable the arithmetic is spelled
  with IDENTICAL literal weights and left-associated term order on both
  engines (one rounding per op, same op sequence => same bits), then
  functions.pround;
- 100 TB posture documented per operator: which shuffles exist, what
  broadcasts, and how skew/super-nodes are handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pround
from ..registry import query

# ---------------------------------------------------------------------------
# EWMA smoothing
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_LAGS = 8  # current day + 7 lags; (1-a)^8 ~= 0.058 tail mass renormed away
_EWMA_W = [_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_LAGS)]


def _ewma_oracle() -> str:
    lag_cols = ",\n             ".join(
        f"lag(n, {k}) OVER w AS l{k}" for k in range(1, _EWMA_LAGS)
    )
    num = f"{_EWMA_W[0]!r} * n" + "".join(
        f" + {_EWMA_W[k]!r} * coalesce(CAST(l{k} AS DOUBLE), 0.0)"
        for k in range(1, _EWMA_LAGS)
    )
    den = f"{_EWMA_W[0]!r}" + "".join(
        f" + (CASE WHEN l{k} IS NULL THEN 0.0 ELSE {_EWMA_W[k]!r} END)"
        for k in range(1, _EWMA_LAGS)
    )
    return f"""
    WITH d AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day, n,
             {lag_cols}
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, n,
           floor((({num}) / ({den})) * 10000.0 + 0.5) / 10000.0 AS ewma
    FROM l
    """


@query("win_ewma_smooth", oracle=_ewma_oracle())
def win_ewma_smooth(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted moving average of each event type's daily
    volume - the standard trend smoother (alpha = 0.3), spelled as the
    TRUNCATED convolution sum_{k<8} w_k * x_{t-k} renormalized over the
    lags that exist (series start included; the dropped tail is
    (1-a)^8 ~= 5.8% of the mass, absorbed by the renormalization).  The
    recursive definition is hostile to both engines and to parity; the
    truncated-kernel form is 7 lag() calls over ONE (event_type, day)
    window sort, and every float term is the same literal weight times an
    exact integer count, combined in the same left-associated order on
    both engines - one IEEE rounding per op, same op sequence, identical
    bits (then pround).  The window runs over the ~150-row aggregated
    daily frame, never the raw stream: one data-volume shuffle (the daily
    count agg).  At 100 TB the frame stays |types| x |days| rows - the
    smoother's cost is fixed by the calendar, not the data."""
    ev = load(spark, sf, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.lag("n", k).over(w) for k in range(1, _EWMA_LAGS)]
    l = d.select("event_type", "day", "n", *[c.alias(f"l{k}") for k, c in enumerate(lags, 1)])
    num = F.lit(_EWMA_W[0]) * F.col("n")
    den = F.lit(_EWMA_W[0])
    for k in range(1, _EWMA_LAGS):
        lk = F.col(f"l{k}")
        num = num + F.lit(_EWMA_W[k]) * F.coalesce(lk.cast("double"), F.lit(0.0))
        den = den + F.when(lk.isNull(), 0.0).otherwise(_EWMA_W[k])
    return l.select(
        "event_type", "day", "n", pround(num / den, 4).alias("ewma")
    )


# ---------------------------------------------------------------------------
# OHLC resampling
# ---------------------------------------------------------------------------


@query(
    "time_resample_ohlc",
    oracle="""
    WITH e AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             ts, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e)
    SELECT event_type, day,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS volume_cents
    FROM r GROUP BY event_type, day
    """,
)
def time_resample_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC downsampling (the TSDB / financial `resample` shape): per
    (event_type, day) bar - first value (open), max (high), min (low),
    last value (close), event count and total volume.  Values are INTEGER
    cents (per-row flooring before any aggregate - the agg_decimal_money
    discipline), so every bar field is order-independent and exact.
    Open/close are min_by/max_by keyed by the composite (ts, event_id) -
    a SINGLE hash aggregate with map-side partial combine, no window sort
    over the raw stream (the oracle's row_number spelling is the same
    semantics; min_by is the plan you actually want at 100 TB because
    first/last-in-bar reduces locally on every map task before any
    shuffle).  One shuffle total, keyed by the bar key; skewed bars
    degrade to AQE's runtime splitting because the agg is algebraic."""
    ev = load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    key = F.struct("ts", "event_id")
    e = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        cents.alias("cents"),
        key.alias("k"),
    )
    return e.groupBy("event_type", "day").agg(
        F.min_by("cents", "k").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "k").alias("close_cents"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("volume_cents"),
    )


# ---------------------------------------------------------------------------
# graph node similarity (common neighbors / Jaccard)
# ---------------------------------------------------------------------------

_CN_PART_CAP = 64  # drop super-node parts: |pairs| per part is deg^2


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    pdeg AS (
      SELECT p, count(*) AS deg FROM e0 GROUP BY p),
    e AS (
      SELECT e0.s, e0.p FROM e0 JOIN pdeg ON e0.p = pdeg.p
      WHERE pdeg.deg <= {_CN_PART_CAP}),
    sdeg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY s),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS n_common
      FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2)
    SELECT p.s1, p.s2, d1.deg AS deg1, d2.deg AS deg2, p.n_common,
           CAST(floor((p.n_common * 1000000.0)
                      / (d1.deg + d2.deg - p.n_common)) AS BIGINT)
             AS jaccard_micro
    FROM pairs p
    JOIN sdeg d1 ON d1.s = p.s1
    JOIN sdeg d2 ON d2.s = p.s2
    ORDER BY jaccard_micro DESC, p.s1, p.s2
    LIMIT 20
    """,
)
def graph_common_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Node similarity by common neighbors: top-20 supplier pairs by
    Jaccard overlap of their part sets in the co-purchase graph - the
    link-prediction / entity-resolution primitive (GraphFrames'
    `nodeSimilarity` shape).  The candidate stage is the inverted-index
    equi self-join on part id - pairs are generated ONLY where an actual
    common neighbor exists, never all-pairs - and super-node parts
    (degree > {_CN_PART_CAP}) are dropped FIRST, because each part
    contributes deg^2 candidate rows; that df-cap is the standard
    scale guard (same posture as dedup_winnowing's df cap), applied
    identically in the oracle so semantics stay aligned.  Supplier
    degrees are computed on the SAME capped edge set (so jaccard <= 1 by
    construction) and joined back - a broadcast-sized dim at any scale
    (|suppliers| rows).  Jaccard is an exact integer micro-ratio; the
    top-20 breaks ties on (s1, s2).  Shuffles: edge distinct, part-degree
    agg, the pair join + pair agg - all hash-partitioned on bounded
    keys."""
    li = load(spark, sf, "lineitem")
    e0 = li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")).distinct()
    pdeg = e0.groupBy("p").agg(F.count("*").alias("pd"))
    e = e0.join(pdeg.filter(F.col("pd") <= _CN_PART_CAP), "p").select("s", "p")
    sdeg = e.groupBy("s").agg(F.count("*").alias("deg"))
    a = e.select(F.col("s").alias("s1"), "p")
    b = e.select(F.col("s").alias("s2"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, (F.col("p") == F.col("pb")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_common"))
    )
    d1 = F.broadcast(sdeg.select(F.col("s").alias("s1"), F.col("deg").alias("deg1")))
    d2 = F.broadcast(sdeg.select(F.col("s").alias("s2"), F.col("deg").alias("deg2")))
    return (
        pairs.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "deg1",
            "deg2",
            "n_common",
            F.floor(
                (F.col("n_common") * 1000000.0)
                / (F.col("deg1") + F.col("deg2") - F.col("n_common"))
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
        .orderBy(F.desc("jaccard_micro"), F.asc("s1"), F.asc("s2"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# stratified K-fold assignment
# ---------------------------------------------------------------------------

_KFOLDS = 5


@query(
    "pipeline_kfold_stratified",
    oracle=f"""
    WITH a AS (
      SELECT lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % {_KFOLDS} AS fold,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      FROM documents),
    f AS (
      SELECT lang, fold,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM a GROUP BY lang, fold),
    t AS (
      SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_total
      FROM f GROUP BY lang)
    SELECT f.lang, f.fold, f.n_docs, f.n_tokens,
           CAST((f.n_docs * 1000000) // t.lang_total AS BIGINT)
             AS share_micro
    FROM f JOIN t ON f.lang = t.lang
    """,
)
def pipeline_kfold_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified K-fold assignment (K = {_KFOLDS}) with its
    balance report: every document lands in exactly one fold, decided by
    the first 16 bits of md5(doc_id) mod K - a pure function of the data
    (reproducible across engines, re-runs, partitionings; a seeded
    df.randomSplit is none of those), the same key-hash discipline as
    sample_hash_det / pipeline_shuffle_shard.  Stratification is by
    language: the report shows each fold's share WITHIN its language
    stratum in integer micro-units, which is how you verify hash-mod
    folds are balanced enough for CV (they concentrate at ~1/K by the
    law of large numbers; a skewed stratum flags a doc_id-space
    pathology).  Fold assignment itself is map-side zero-shuffle; the
    report is one hash agg plus a per-lang rollup joined back (broadcast
    - |langs| rows).  The leakage complement is dedup_cross_split_leakage,
    which audits near-dup pairs STRADDLING folds."""
    d = load(spark, sf, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _KFOLDS
    )
    a = d.select(
        "lang",
        fold.alias("fold"),
        F.size(F.split("text", " ")).cast("long").alias("nt"),
    )
    f = a.groupBy("lang", "fold").agg(
        F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")
    )
    t = f.groupBy("lang").agg(F.sum("n_docs").alias("lang_total"))
    return f.join(F.broadcast(t), "lang").select(
        "lang",
        "fold",
        "n_docs",
        "n_tokens",
        F.expr("CAST((n_docs * 1000000) div lang_total AS BIGINT)").alias(
            "share_micro"
        ),
    )
