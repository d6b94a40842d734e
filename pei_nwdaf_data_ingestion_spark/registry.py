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


def load_all() -> None:
    """Import every query module so registrations run.

    Registration order = the order a budget-limited driver visits queries,
    so the families that got no driver-side correctness signal in round 1
    (everything except relational/scalars, per VERDICT.md) register FIRST;
    the already-validated relational/scalars families come last."""
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
