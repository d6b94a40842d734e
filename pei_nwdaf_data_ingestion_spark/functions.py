"""Cross-engine-deterministic helpers used by every declared query.

pround: Spark's round() decimal-expands the exact double (BigDecimal
HALF_UP) while DuckDB's round() scales then std::round's - at boundary
values (e.g. products whose *100 lands within an ulp of .5) they disagree.
Both engines evaluate `floor(x * 10^n + 0.5) / 10^n` bit-identically on
IEEE doubles, so every declared query uses this formula on BOTH sides
(convention: half-values round toward +inf).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column | str, n: int = 2) -> Column:
    """Parity-stable round to n decimal places; null-propagating."""
    if isinstance(c, str):
        c = F.col(c)
    f = float(10**n)
    return F.floor(c * f + 0.5) / f


def sql_round(expr: str, n: int = 2) -> str:
    """The DuckDB/ANSI spelling of the same formula (for oracle strings)."""
    f = float(10**n)
    return f"floor(({expr}) * {f} + 0.5) / {f}"


def salted_join(
    skewed,
    dim,
    on: list[str],
    salt_from: Column | str,
    n_salt: int = 16,
    how: str = "inner",
):
    """Skew-safe equi join: salt the skewed side, replicate the dim side.

    A hot key (one subscriber producing most of the traffic, one dominant
    dnn) lands an entire shuffle partition on one task; salting splits each
    key's rows across `n_salt` sub-partitions (salt derived by hashing a
    row-local column, NOT the join key), while the small side is replicated
    n_salt times so every sub-partition still finds its match.  Result is
    row-identical to the plain join - only the shuffle layout changes.
    AQE's OptimizeSkewedJoin does this adaptively for sort-merge joins;
    this explicit form also covers broadcast-ineligible skewed hash joins
    and is the pattern to reach for when AQE's split thresholds don't fire.
    """
    if isinstance(salt_from, str):
        salt_from = F.col(salt_from)
    salted = skewed.withColumn("_salt", F.pmod(F.xxhash64(salt_from), n_salt))
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return salted.join(replicated, [*on, "_salt"], how).drop("_salt")
