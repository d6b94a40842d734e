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
# (it records the first ~50 per round).  Cumulative coverage closed in r03
# (119/119 with signal); the r4 window leads with this round's semantic
# changes (session-window boundary fix, de-vacuized join_anti/set_except,
# the four queries added this round), then deliberately refreshes the
# families whose only signal is the round-1 sample (scalars, relational
# joins, aggs) so no hash goes three rounds stale.
_R4_PRIORITY = [
    # semantics changed this round - MUST re-sample
    "win_session_gap",
    "join_anti",
    "set_except",
    # new in round 4
    "merge_upsert",
    "dedup_winnowing",
    "pipeline_seq_pack",
    "stream_stream_join_outer",
    # stale-signal refresh: r1-only relational joins
    "join_inner_equi",
    "join_skew_salted",
    "join_null_keys",
    "join_multiway",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_theta_range",
    "join_cross",
    "join_asof_lastsignup",
    "join_interval_overlap",
    # r1-only scalar-function surface
    "str_funcs",
    "str_like",
    "date_funcs",
    "math_funcs",
    "cond_case",
    "null_funcs",
    "cast_funcs",
    "json_extract",
    "json_roundtrip",
    "array_funcs",
    "array_hof",
    "map_funcs",
    "str_distance",
    "bit_funcs",
    "date_series",
    # r1-only aggregations
    "agg_global",
    "agg_groupby_hash",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_maxby",
    "agg_percentile",
    "agg_stats",
    "agg_pivot",
    "agg_unpivot",
    "agg_boolean",
    # r1-only scans + ordering + set ops (tail; spills to r5 if budget ends)
    "scan_project",
    "scan_filter_pred",
    "explode_unnest",
    "topk_orderby_limit",
    "order_nulls",
    "set_union_all",
    "set_intersect",
    "set_union_byname",
]


def load_all() -> None:
    """Import every query module, then pin driver-visit order.

    After the imports run, QUERIES/ORACLES are rebuilt so `_R4_PRIORITY`
    (this round's semantic changes + the stalest prior signal) comes first
    and the recently-revalidated families fill the tail."""
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

    order = [n for n in _R4_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _R4_PRIORITY
    ]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update({n: snapshot[n] for n in order if n in snapshot})
