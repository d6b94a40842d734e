"""Property-based tests (hypothesis) for the parsing/rounding kernels -
stronger than the reference's fixed golden values (tests/test_receiver.py:
61-102): any generated input must satisfy the kernel's contract, and the
cross-engine rounding formula must agree with DuckDB on arbitrary doubles.

Strategy: hypothesis generates BATCHES (lists) per example and each example
runs one Spark job over the whole batch, keeping job count (the expensive
part) independent of case count.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pei_nwdaf_data_ingestion_spark.functions import pround, sql_round
from pei_nwdaf_data_ingestion_spark.pipeline.normalize import (
    BITRATE_UNITS,
    parse_bitrate_mbps,
)
from pyspark.sql import functions as F

# bounded magnitude: the floor(x*10^n + 0.5) formula needs x*10^n to stay
# well inside 2^53 for exactness on BOTH engines (same bound either side)
sane_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


class TestProundCrossEngine:
    @settings(max_examples=10, deadline=None)
    @given(st.lists(sane_doubles, min_size=1, max_size=200))
    def test_pround_matches_duckdb(self, spark, xs):
        """floor-based half-up rounding is bit-identical across engines."""
        sdf = spark.createDataFrame([(x,) for x in xs], "x double")
        got = [
            r["r"]
            for r in sdf.select(pround("x", 2).alias("r")).orderBy("x").collect()
        ]
        ddb = duckdb.connect()
        want = [
            row[0]
            for x in sorted(xs)
            for row in ddb.execute(
                f"SELECT {sql_round(f'CAST({x!r} AS DOUBLE)', 2)}"
            ).fetchall()
        ]
        assert got == want


def _ref_parse(s: str) -> float | None:
    """The reference's parse contract (receiver.py:66-75), restated."""
    import re

    m = re.match(r"^\s*([0-9]+(?:\.[0-9]+)?)\s*(bps|Kbps|Mbps|Gbps|Tbps)\s*$", s)
    if not m:
        return None
    v = float(m.group(1)) * BITRATE_UNITS[m.group(2)]
    return math.floor(v * 1e6 + 0.5) / 1e6


valid_bitrates = st.builds(
    lambda v, unit, pre, mid, post: f"{pre}{v:.4f}{mid}{unit}{post}",
    st.floats(min_value=0, max_value=1e6, allow_nan=False),
    st.sampled_from(sorted(BITRATE_UNITS)),
    st.sampled_from(["", " ", "  "]),
    st.sampled_from([" ", "  "]),
    st.sampled_from(["", " "]),
)
junk_strings = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
)


class TestBitrateParseProperty:
    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.one_of(valid_bitrates, junk_strings), min_size=1, max_size=100))
    def test_parse_matches_reference_contract(self, spark, raws):
        rows = [(i, s) for i, s in enumerate(raws)]
        sdf = spark.createDataFrame(rows, "i long, raw string")
        got = {
            r["i"]: r["mbps"]
            for r in sdf.select("i", parse_bitrate_mbps(F.col("raw")).alias("mbps")).collect()
        }
        for i, s in rows:
            assert got[i] == _ref_parse(s), repr(s)




class TestBandBucketingProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=100_000),  # probe epoch us
                st.integers(min_value=0, max_value=100_000),  # build epoch us
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=1, max_value=7_000),  # band width, us
    )
    def test_bucketed_range_join_equals_naive(self, spark, pairs, band):
        """functions.band_join (the rewrite join_range_bucketed is built
        on): bucketing both sides by floor(t/band) and fanning the probe to
        3 adjacent buckets finds EXACTLY the pairs |p - b| <= band that a
        naive all-pairs filter finds - for arbitrary timestamps and band
        widths (each qualifying pair must meet in exactly one bucket: the
        build row's)."""
        from pei_nwdaf_data_ingestion_spark.functions import band_join

        probes = sorted({p for p, _ in pairs})
        builds = sorted({b for _, b in pairs})
        pdf = spark.createDataFrame([(i, t) for i, t in enumerate(probes)], "pid long, pt long")
        bdf = spark.createDataFrame([(i, t) for i, t in enumerate(builds)], "bid long, bt long")

        naive = {
            (pi, bi)
            for pi, pt in enumerate(probes)
            for bi, bt in enumerate(builds)
            if abs(pt - bt) <= band
        }

        got_rows = (
            band_join(pdf, bdf, "pt", "bt", band).select("pid", "bid").collect()
        )
        got = [(r["pid"], r["bid"]) for r in got_rows]
        # exactness AND no duplicates (each pair meets in one bucket only)
        assert len(got) == len(set(got))
        assert set(got) == naive


class TestGlobalOrderHelpers:
    def test_ntile_expr_matches_sql_ntile_all_sizes(self, spark):
        """functions.ntile_expr must reproduce SQL ntile(t) exactly for
        every (n, t) - including the first-m-tiles-get-one-extra rule -
        checked exhaustively for n up to 40 against Spark's own ntile."""
        import pandas as pd
        from pyspark.sql import Window, functions as F

        from pei_nwdaf_data_ingestion_spark.functions import ntile_expr

        for n in (1, 2, 3, 4, 5, 7, 8, 11, 16, 23, 40):
            for t in (2, 3, 4, 5):
                df = spark.createDataFrame(
                    pd.DataFrame({"rn": range(1, n + 1)})
                ).withColumn("n_total", F.lit(n).cast("long"))
                got = (
                    df.withColumn("tile", ntile_expr("rn", "n_total", t))
                    .orderBy("rn")
                    .select("tile")
                    .toPandas()["tile"]
                    .tolist()
                )
                want = (
                    spark.createDataFrame(pd.DataFrame({"rn": range(1, n + 1)}))
                    .withColumn("tile", F.ntile(t).over(Window.orderBy("rn")))
                    .orderBy("rn")
                    .select("tile")
                    .toPandas()["tile"]
                    .tolist()
                )
                assert got == want, (n, t, got, want)

    def test_global_running_sum_matches_window_spelling(self, spark):
        """global_running_sum must equal the (banned-in-declared-queries)
        unpartitioned-window cumsum row-for-row."""
        from pyspark.sql import Window, functions as F

        from pei_nwdaf_data_ingestion_spark.catalog import load
        from pei_nwdaf_data_ingestion_spark.functions import global_running_sum

        d = load(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", F.col("n_chars").cast("long").alias("v")
        )
        got = {
            r["doc_id"]: r["cum"]
            for r in global_running_sum(d, "v", ["doc_id"], out="cum").collect()
        }
        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["doc_id"]: r["cum"]
            for r in d.withColumn("cum", F.sum("v").over(w)).collect()
        }
        assert got == want

    def test_phash_banding_guarantee_is_hamming_le_1(self, spark):
        """Pigeonhole guarantee of 2 bands: every doc pair within Hamming
        distance b-1 = 1 on the 16-bit pHash MUST share a byte band -
        checked exhaustively against the all-pairs truth on the fixture.
        (Distance 2-3 pairs may legitimately be missed when the flips
        split across bands - the documented LSH-banding recall
        trade-off; the fixture indeed contains such pairs, which is what
        keeps this assertion honest at <= 1 and not <= 3.)"""
        from itertools import combinations

        from pyspark.sql import functions as F

        from pei_nwdaf_data_ingestion_spark.catalog import load
        from pei_nwdaf_data_ingestion_spark.queries.corpus_ops import _phash16

        d = load(spark, "/root/testdata/sf0.001", "documents")
        rows = d.select("doc_id", _phash16(F.col("text")).alias("ph")).collect()
        hashes = {r["doc_id"]: r["ph"] for r in rows}
        checked = 0
        for a, b in combinations(sorted(hashes), 2):
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 1:
                checked += 1
                shares = (hashes[a] // 256 == hashes[b] // 256) or (
                    hashes[a] % 256 == hashes[b] % 256
                )
                assert shares, (a, b, ham)
        assert checked > 0  # the guarantee was actually exercised


class TestMinhashRecallProperty:
    def test_identical_token_sets_always_collide(self, spark):
        """LSH recall at Jaccard 1.0 is exactly 1: duplicate token sets
        produce identical minhash signatures in EVERY band, so the pair
        is always a candidate - the pigeonhole end of the S-curve.
        Built synthetically so the property holds regardless of fixture
        content."""
        from pyspark.sql import functions as F

        from pei_nwdaf_data_ingestion_spark.queries.llm import minhash_band_cols

        rows = [
            (1, ["alpha", "beta", "gamma", "delta"]),
            (2, ["delta", "alpha", "gamma", "beta"]),  # same set, any order
            (3, ["alpha", "beta", "gamma", "epsilon"]),
        ]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
        banded = df.select("doc_id", *minhash_band_cols()).collect()
        by_id = {r["doc_id"]: [r[f"band{b}"] for b in range(4)] for r in banded}
        assert by_id[1] == by_id[2], "equal sets must share every band"
        assert by_id[1] != by_id[3], "distinct sets should split somewhere"


class TestLowestBandDedupEquivalence:
    """Round-7 invariant behind the fast LSH spelling: emitting a candidate
    pair ONLY in its lowest matching band (inequality predicates on the
    earlier bands) must equal union-all-bands + distinct, for ANY corpus.
    Checked structurally on random synthetic band signatures - no Spark
    job needed, the predicate logic is engine-free."""

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(*[st.integers(min_value=0, max_value=3)] * 4),
            min_size=2,
            max_size=30,
        )
    )
    def test_predicate_dedup_equals_union_distinct(self, sigs):
        n_bands = 4
        docs = list(enumerate(sigs))  # (doc_id, (band0..band3))
        union_distinct = {
            (a, b)
            for i, (a, sa) in enumerate(docs)
            for b, sb in docs[i + 1 :]
            if any(sa[k] == sb[k] for k in range(n_bands))
        }
        lowest_band = set()
        for i, (a, sa) in enumerate(docs):
            for b_, sb in docs[i + 1 :]:
                for bnd in range(n_bands):
                    if sa[bnd] == sb[bnd] and all(
                        sa[p] != sb[p] for p in range(bnd)
                    ):
                        lowest_band.add((a, b_))
                        break  # emitted exactly once
        assert lowest_band == union_distinct
