"""Semantics tests for the advanced module's rows-only queries - the
assertions their docstrings promise (sketch accuracy, streaming/batch
equivalence, connected-component fixpoint).  Oracle-backed queries in the
same module are covered by test_parity.py automatically."""

from __future__ import annotations

from pyspark.sql import functions as F

from pei_nwdaf_data_ingestion_spark import registry
from pei_nwdaf_data_ingestion_spark.catalog import load
from tests.conftest import SF_DIR

registry.load_all()


class TestHllSketchMerge:
    def test_estimates_match_exact_and_merge_is_lossless(self, spark):
        """Per-type HLL estimates must land within 3 standard errors of the
        exact distinct counts, and the ALL row - produced by MERGING the
        per-type sketches, never rescanning raw rows - must estimate the
        exact GLOBAL distinct count (users appear under several types, so a
        sum of per-type counts would overcount; the union must not)."""
        out = {
            r["event_type"]: r["approx_users"]
            for r in registry.QUERIES["agg_hll_sketch_merge"](spark, SF_DIR).collect()
        }
        ev = load(spark, SF_DIR, "events")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        exact["ALL"] = ev.select("user_id").distinct().count()
        assert set(out) == set(exact)
        for k, e in exact.items():
            # default lgK=12 -> rsd ~ 1.04/sqrt(2^12) ~ 1.6%; 3 sigma + 1
            assert abs(out[k] - e) <= max(1.0, 3 * 0.017 * e), (k, out[k], e)
        assert sum(v for k, v in exact.items() if k != "ALL") > exact["ALL"]


class TestApproxQuantile:
    def test_within_rank_error_of_exact(self, spark):
        """percentile_approx at accuracy=10000 over ~1000-row groups has
        rank error < 1, so each estimate must fall inside the exact
        [p-0.05, p+0.05] quantile band of its group."""
        approx = registry.QUERIES["agg_approx_quantile"](spark, SF_DIR).collect()
        ev = load(spark, SF_DIR, "events")
        bands = {
            r["event_type"]: r["b"]
            for r in ev.groupBy("event_type")
            .agg(
                F.expr(
                    "percentile(value, array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))"
                ).alias("b")
            )
            .collect()
        }
        for r in approx:
            b = bands[r["event_type"]]
            assert b[0] <= r["p25"] <= b[1], r
            assert b[2] <= r["p50"] <= b[3], r
            assert b[4] <= r["p75"] <= b[5], r


class TestStreamStreamJoin:
    def test_matches_static_dual(self, spark):
        """The watermarked stream-stream join must produce exactly the rows
        of the same join run statically (batch) over the same fixture -
        availableNow processes everything, and no row is near the stream
        tail enough to be watermark-dropped in this bounded replay."""
        stream_rows = set(
            map(
                tuple,
                registry.QUERIES["stream_stream_join"](spark, SF_DIR).collect(),
            )
        )
        ev = load(spark, SF_DIR, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        static_rows = set(
            map(
                tuple,
                clicks.join(
                    purchases,
                    (F.col("c_user") == F.col("p_user"))
                    & (F.col("purchase_ts") >= F.col("click_ts"))
                    & (
                        F.col("purchase_ts")
                        <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
                    ),
                    "inner",
                )
                .select(
                    F.col("c_user").alias("user_id"),
                    "click_id",
                    "purchase_id",
                    F.unix_timestamp("click_ts").alias("click_epoch"),
                    F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
                )
                .collect(),
            )
        )
        assert stream_rows == static_rows
        assert len(stream_rows) > 0


class TestConnectedComponents:
    def test_chain_converges_in_log_rounds(self, spark):
        """A 64-node chain has diameter 63: min-label propagation would
        need ~63 rounds; large-star/small-star must finish in O(log n)
        and label every node with the chain head."""
        from pei_nwdaf_data_ingestion_spark.graph import connected_components

        n = 64
        edges = spark.createDataFrame(
            [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
            ["src", "dst"],
        )
        labels, rounds = connected_components(edges)
        rows = labels.collect()
        assert len(rows) == n
        assert {r["component_id"] for r in rows} == {"d000"}
        assert rounds <= 12, f"expected O(log n) rounds, got {rounds}"

    def test_matches_union_find_on_random_graph(self, spark):
        """Cross-check against a driver-side union-find on a deterministic
        pseudo-random graph with several components and isolated pairs."""
        import random

        from pei_nwdaf_data_ingestion_spark.graph import connected_components

        rng = random.Random(7)
        nodes = [f"n{i:02d}" for i in range(40)]
        pairs = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(35)
            }
        )
        parent = {x: x for x in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in pairs:
            parent[find(u)] = find(v)
        touched = {x for uv in pairs for x in uv}
        expected = {
            x: min(y for y in touched if find(y) == find(x)) for x in touched
        }
        edges = spark.createDataFrame(pairs, ["src", "dst"])
        labels, _ = connected_components(edges)
        got = {r["node"]: r["component_id"] for r in labels.collect()}
        assert got == expected


class TestClusterComponents:
    def test_labels_are_a_fixpoint(self, spark):
        """Connected-component output invariants: every label is <= its
        node (min-propagation), every label is itself a clustered doc whose
        own label is itself (component representatives are fixpoints), and
        at least one component has size > 2 (transitivity actually fired -
        pairwise output alone cannot produce that).  Cross-engine equality
        with the recursive-CTE oracle is asserted by test_parity."""
        rows = registry.QUERIES["dedup_cluster_components"](spark, SF_DIR).collect()
        assert rows, "fixture must contain near-dup clusters"
        label = {r["doc_id"]: r["component_id"] for r in rows}
        assert all(lbl <= doc for doc, lbl in label.items())
        for lbl in set(label.values()):
            assert label.get(lbl) == lbl, f"representative {lbl} not a fixpoint"
        from collections import Counter

        sizes = Counter(label.values())
        assert max(sizes.values()) > 2
