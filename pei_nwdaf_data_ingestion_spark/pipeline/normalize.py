"""Reference-semantics transforms as reusable pure-column expressions.

Mirrors the normalizer kernel of the reference (receiver.py:66-203) with
DataFrame column expressions - no Python in the hot path, so the whole
pipeline stays inside whole-stage codegen (the reference's interpreted
kernel does ~144k rec/s/core; these expressions are vectorized JVM).

Functions here are used by both the batch queries (queries/refsem.py) and
the Structured Streaming ingest path (streaming/ingest.py), so batch/stream
semantics are identical by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import pround

# Unit multipliers to Mbps - reference receiver.py:66-67.
BITRATE_UNITS = {"bps": 1e-6, "Kbps": 1e-3, "Mbps": 1.0, "Gbps": 1e3, "Tbps": 1e6}

# Identity/dimension columns - reference _KNOWN_TAG_FIELDS, receiver.py:39-43.
KNOWN_TAG_FIELDS = [
    "snssai_sst",
    "snssai_sd",
    "dnn",
    "ueIpv4Addr",
    "ueIpv6Addr",
    "appId",
    "supi",
    "gpsi",
    "interGroupId",
]

_BITRATE_RE = r"^\s*([0-9]+(?:\.[0-9]+)?)\s*(bps|Kbps|Mbps|Gbps|Tbps)\s*$"


def parse_bitrate_mbps(s: Column) -> Column:
    """'48.57 Mbps' -> 48.57 (Mbps, rounded 6dp); null when unparseable.

    Reference: regex receiver.py:66-67, conversion receiver.py:70-75.
    regexp_extract + a literal unit->multiplier map; constant-folded by
    Catalyst, fully codegen'd.
    """
    num = F.regexp_extract(s, _BITRATE_RE, 1)
    unit = F.regexp_extract(s, _BITRATE_RE, 2)
    mult_entries = []
    for u, m in BITRATE_UNITS.items():
        mult_entries += [F.lit(u), F.lit(m)]
    mult = F.element_at(F.create_map(*mult_entries), unit)
    return F.when(
        num != "", pround(num.cast("double") * mult, 6)
    ).otherwise(F.lit(None).cast("double"))


def parse_iso8601_unix_seconds(s: Column) -> Column:
    """ISO-8601 string (Z or +HH:MM offset) -> unix epoch seconds (long);
    null on failure.  Reference: receiver.py:78-84 ('Z'->'+00:00', then
    fromisoformat -> int seconds).  to_timestamp is null-on-failure, matching
    the reference's try/except-None."""
    normalized = F.regexp_replace(s, "Z$", "+00:00")
    # try_to_timestamp: Spark 4 defaults to ANSI mode where to_timestamp
    # THROWS on bad input; the reference returns None (receiver.py:83-84)
    ts = F.try_to_timestamp(normalized, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
    return F.unix_timestamp(ts)


def nz(s: Column) -> Column:
    """Truthiness for string tags: the reference guards every tag insert
    with `if info.get(field)` (receiver.py:92-98,141-146,171-176), so an
    empty string is ABSENT - normalize it to null before presence checks."""
    return F.nullif(s, F.lit(""))


def any_tag_present(*tags: Column) -> Column:
    """Record-validity predicate: at least one identity tag non-null.
    Reference drop rule: receiver.py:100-101,145-146,177-178,386-389.
    Callers must pass tag columns already truthiness-normalized (nz)."""
    pred = F.lit(False)
    for t in tags:
        pred = pred | t.isNotNull()
    return pred


def tag_ip_precedence(ipv4: Column, ipv6: Column) -> tuple[Column, Column]:
    """The reference's IP-tag rule (receiver.py:92-96): a TRUTHY ipv4 wins
    and suppresses ipv6; ipv6 is tagged only when ipv4 is absent/empty AND
    ipv6 itself is truthy.  Returns the (ueIpv4Addr, ueIpv6Addr) column
    pair; empty strings count as absent on both sides."""
    v4, v6 = nz(ipv4), nz(ipv6)
    return F.when(v4.isNotNull(), v4), F.when(v4.isNull(), v6)
