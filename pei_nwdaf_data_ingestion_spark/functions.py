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


def band_join(
    probe,
    build,
    probe_key: Column | str,
    build_key: Column | str,
    band: int,
    how: str = "inner",
):
    """No-equi-key range join |probe_key - build_key| <= band as an EQUI
    join - the second rewrite Catalyst cannot derive (salted_join is the
    first).  Spark plans a band predicate alone as broadcast-nested-loop /
    cartesian, which dies at fact x fact scale; bucketing both sides by
    floor(key / band) and fanning the probe to its 3 adjacent buckets
    makes it a plain hash join on the bucket key plus a residual band
    filter.  Each qualifying pair meets EXACTLY once (at the build row's
    unique bucket), so no post-join dedup is needed - property-tested
    against the naive all-pairs filter in tests/test_properties.py.

    Scale posture: shuffle on the bucket key like any equi join; the 3x
    fan-out is probe-side only.  Keys must be integral (e.g. epoch micros
    via unix_micros - whole-second truncation would admit out-of-band
    pairs); the two inputs must not share column names.  `how` supports
    'inner' and 'left' (left rows with no in-band partner survive with
    nulls, fan-out duplicates of unmatched rows carry only null build
    columns, so count(build_col)-style aggs are unaffected; callers
    needing bare left rows should dedup on the probe key).
    """
    if isinstance(probe_key, str):
        probe_key = F.col(probe_key)
    if isinstance(build_key, str):
        build_key = F.col(build_key)
    base = F.floor(probe_key / band)
    fan = probe.withColumn(
        "_bucket", F.explode(F.array(base - 1, base, base + 1))
    )
    built = build.withColumn("_bucket", F.floor(build_key / band))
    joined = fan.join(
        built,
        (fan["_bucket"] == built["_bucket"])
        & (build_key >= probe_key - band)
        & (build_key <= probe_key + band),
        how,
    )
    return joined.drop(fan["_bucket"]).drop(built["_bucket"])
