"""Query registry - the driver-contract surface.

Every operator from SURVEY.md section 2 registers here as a named query
builder `(spark, sf_dir) -> DataFrame`, optionally paired with an ANSI-SQL
oracle string DuckDB runs on the same parquet tables.  `__spark_entry__.py`
exposes this registry to the driver.

Oracle-parity conventions (SURVEY.md section 7.4):
- every computed float aggregate is `round(x, 2)` (or finer, consistently)
  on BOTH sides before hashing;
- no `current_timestamp` / `rand` in declared queries;
- every LIMIT / top-K orders by a unique key suffix;
- array outputs are deterministically sorted and rendered as strings;
- timestamps leave the plan as epoch integers or formatted strings;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; `oracle=None` marks a rows-only query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Registration order = the order a budget-limited driver visits queries
# (it records the first ~50 per round).  Rounds 1+2 covered 100/119; the
# tail below is everything VERDICT r2 lists as never-driver-checked, plus
# the two queries whose r2 pass was vacuous (0 rows vs 0 oracle rows) and
# any query added in round 3.  Cheap oracled queries first, the expensive
# stream_* family last-but-within-50.
_R3_PRIORITY = [
    # 10 oracled queries with no driver signal after r1+r2 (VERDICT r2 #1)
    "agg_histogram",
    "agg_partial_reagg",
    "dedup_cluster_components",
    "text_ngram_topk",
    "text_cooccurrence",
    "multimodal_features",
    "multimodal_frame_sample",
    "time_funcs",
    "udf_scalar_parse",
    "udtf_normalize",
    # 3 cheap rows-only queries with no driver signal
    "agg_hll_sketch_merge",
    "agg_approx_quantile",
    "multimodal_decode",
    # r2 passes were vacuous (0 rows) - re-sample after threshold fixes
    "sim_knn_join",
    "dedup_embed_cosine",
    # new in round 3
    "merge_upsert",
    "dedup_winnowing",
    "pipeline_seq_pack",
    "stream_stream_join_outer",
    # 6 expensive streaming queries with no driver signal (1.5-4.7 s each)
    "stream_ingest_pipeline",
    "stream_dedup",
    "stream_late_drop",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_stream_join",
]


def load_all() -> None:
    """Import every query module, then pin driver-visit order.

    After the imports run, QUERIES/ORACLES are rebuilt so `_R3_PRIORITY`
    (queries still lacking driver-side correctness signal, see VERDICT r2)
    comes first and the already-double-validated families fill the tail."""
    from .queries import (  # noqa: F401
        refsem,
        windows,
        llm,
        advanced,
        multimodal_queries,
        streaming_queries,
        relational,
        scalars,
    )

    order = [n for n in _R3_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _R3_PRIORITY
    ]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update({n: snapshot[n] for n in order if n in snapshot})
