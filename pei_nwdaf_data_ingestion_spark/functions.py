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
