"""Rows-only result digest (VERDICT r13 item 5).

The driver's rows-only check records only row counts, so a value
regression in the 22 rows-only ids (streaming duals, engine-specific
sketches, convergence-gated twins) never reached the artifact.  Every
rows-only query now registers wrapped in registry.append_result_digest:
a constant `result_digest` column carrying one order-insensitive
fingerprint of the whole result, so two driver rounds over unchanged
code must print identical digests.  These tests pin the digest's
algebra (order-insensitive, multiplicity-sensitive, partition-layout
independent) and the wrap itself (every rows-only id and ONLY rows-only
ids carry the column; the underlying values are untouched)."""

from __future__ import annotations

import pytest

from pei_nwdaf_data_ingestion_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


class TestDigestAlgebra:
    def test_row_order_and_layout_invariant(self, spark):
        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        rows = [(i, f"s{i % 3}", float(i) / 7) for i in range(50)]
        a = spark.createDataFrame(rows, "k long, s string, v double")
        b = spark.createDataFrame(list(reversed(rows)),
                                  "k long, s string, v double").repartition(7)
        da = append_result_digest(a).select("result_digest").first()[0]
        db = append_result_digest(b).select("result_digest").first()[0]
        assert da == db

    def test_multiplicity_sensitive(self, spark):
        """bit_xor alone cancels even-multiplicity duplicates; the decimal
        sum in the combine must break that - a row appearing twice is a
        DIFFERENT result from the row appearing zero (or one) times."""
        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        base = [(1, "a"), (2, "b")]
        once = spark.createDataFrame(base, "k long, s string")
        twice = spark.createDataFrame(base + [(1, "a"), (1, "a")],
                                      "k long, s string")
        gone = spark.createDataFrame([(2, "b")], "k long, s string")
        d_once = append_result_digest(once).select("result_digest").first()[0]
        d_twice = append_result_digest(twice).select("result_digest").first()[0]
        d_gone = append_result_digest(gone).select("result_digest").first()[0]
        assert len({d_once, d_twice, d_gone}) == 3

    def test_value_change_changes_digest(self, spark):
        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
        b = spark.createDataFrame([(1, 10.0), (2, 20.01)], "k long, v double")
        da = append_result_digest(a).select("result_digest").first()[0]
        db = append_result_digest(b).select("result_digest").first()[0]
        assert da != db

    def test_null_position_changes_digest(self, spark):
        """ADVICE r14: xxhash64 passes the seed through NULL inputs, so
        without per-column isnull indicators (NULL, x) and (x, NULL)
        would hash identically - the digest must distinguish WHICH
        column holds the NULL."""
        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        a = spark.createDataFrame([(None, "x")], "a string, b string")
        b = spark.createDataFrame([("x", None)], "a string, b string")
        da = append_result_digest(a).select("result_digest").first()[0]
        db = append_result_digest(b).select("result_digest").first()[0]
        assert da != db

    def test_map_columns_ride_as_json(self, spark):
        """Spark refuses xxhash64 over MapType; the digest serializes map
        columns through to_json instead of erroring."""
        from pyspark.sql import functions as F

        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        df = spark.range(3).select(
            "id", F.create_map(F.lit("k"), F.col("id")).alias("m")
        )
        out = append_result_digest(df)
        vals = out.select("result_digest").distinct().collect()
        assert len(vals) == 1 and vals[0][0]

    def test_empty_input_yields_empty_output(self, spark):
        from pei_nwdaf_data_ingestion_spark.registry import (
            append_result_digest,
        )

        df = spark.createDataFrame([], "k long, s string")
        assert append_result_digest(df).count() == 0


class TestRowsOnlyWrap:
    def test_exactly_rows_only_ids_are_wrapped(self):
        """The wrap targets oracle-less ids only: an oracled query gaining
        a digest column would hash-mismatch its own oracle."""
        rows_only = {n for n in registry.QUERIES if n not in registry.ORACLES}
        assert len(rows_only) == 22
        for n in registry.QUERIES:
            raw = registry.RAW_QUERIES[n]
            reg = registry.QUERIES[n]
            if n in rows_only:
                assert reg is not raw, f"{n} not digest-wrapped"
            else:
                assert reg is raw, f"oracled {n} must register unwrapped"

    @pytest.mark.parametrize(
        "name",
        ["agg_approx_distinct", "agg_hll_sketch_merge",
         "graph_pagerank_converged"],
    )
    def test_digest_is_constant_stable_and_value_preserving(
        self, spark, name
    ):
        """Cheap-subset end-to-end pin (the full 22 run in their own
        suites): the registered output equals the raw output plus one
        constant digest column, and a re-run under a DIFFERENT shuffle
        width reproduces the digest bit-for-bit (the sketch merges and
        the iterative gate are partition-order-independent)."""
        out = registry.QUERIES[name](spark, SF)
        assert out.columns[-1] == "result_digest"
        pdf = out.toPandas()
        assert pdf["result_digest"].nunique() == 1
        digest = pdf["result_digest"].iloc[0]

        raw = registry.RAW_QUERIES[name](spark, SF).toPandas()
        assert list(raw.columns) == list(pdf.columns[:-1])
        assert len(raw) == len(pdf)

        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        try:
            again = (
                registry.QUERIES[name](spark, SF)
                .select("result_digest")
                .first()[0]
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert again == digest


class TestDigestPins:
    """tools/rows_only_digests.json is the committed cross-round record
    (regenerated by tools/pin_digests.py at the driver's sf0.01 scale):
    two rounds over unchanged code must produce the identical file.
    The suite re-checks a cheap subset on every run so an accidental
    rows-only value change is caught before the round ends, not by the
    next round's diff."""

    @pytest.mark.parametrize(
        "name",
        ["agg_approx_distinct", "agg_hll_sketch_merge",
         "graph_pagerank_converged"],
    )
    def test_pinned_digest_reproduces(self, spark, name):
        import json
        import os

        pin_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "rows_only_digests.json",
        )
        if not os.path.exists(pin_path):
            pytest.skip("digest pin file not generated yet")
        pins = json.load(open(pin_path))
        if name not in pins:
            pytest.skip(f"{name} not pinned")
        df = registry.QUERIES[name](spark, pins["_sf_dir"])
        first = df.select("result_digest").limit(1).collect()
        got = {"result_digest": first[0][0] if first else None,
               "rows": df.count()}
        assert got == pins[name], (
            f"{name}: rows-only result drifted from the committed pin - "
            "if intentional, regenerate tools/rows_only_digests.json via "
            "tools/pin_digests.py and commit it with the change"
        )
