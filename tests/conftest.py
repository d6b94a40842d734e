"""Shared fixtures: one SparkSession per test session + the DuckDB oracle
comparator that mirrors the driver's check (row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pei_nwdaf_data_ingestion_spark.catalog import TABLES
from pei_nwdaf_data_ingestion_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows - the driver's
    order-insensitive comparison, locally reproduced."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype("string")
    norm = pd.DataFrame(out)
    norm = norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(drop=True)
    return norm


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa):
            ok = (
                (sa.isna() & sb.isna())
                | ((sa - sb).abs() <= 1e-9 + 1e-9 * sb.abs().fillna(0))
            )
        else:
            ok = (sa.isna() & sb.isna()) | (sa == sb)
        if not ok.all():
            bad = (~ok.fillna(False)).idxmax()
            raise AssertionError(
                f"{name}: column {c!r} differs at sorted row {bad}: "
                f"spark={sa.iloc[bad]!r} oracle={sb.iloc[bad]!r}"
            )


# ---------------------------------------------------------------------------
# slow-marker split (VERDICT r15 item 2): the driver's verify window cannot
# hold the full ~21-35 min suite, so the nodeids below - long-running
# SECONDARY assertions, each >= 2 s on an idle box (measured r16, full log
# in the session notes) - carry the `slow` marker and are deselected by
# pytest.ini's `addopts = -m "not slow"`.  Selection rules, so coverage
# survives in the default run:
#   * every test_parity / test_null_input / test_empty_input test stays
#     (the per-query driver-mirror correctness surface);
#   * fuzz families keep their [0] seed block; only repeat seeds are slow;
#   * streaming shapes keep batch-dual coverage via test_parity's
#     rows-only runs plus at least one non-slow test per rig.
# Full suite: python -m pytest tests/ -m "slow or not slow"
_SLOW_NODEIDS = {
    "tests/test_advanced.py::TestApproxVsDuckDBExact::test_approx_distinct_within_band_of_duckdb",
    "tests/test_advanced.py::TestBasketAndBinarySource::test_binary_source_roundtrip_is_byte_exact",
    "tests/test_advanced.py::TestClusterComponents::test_labels_are_a_fixpoint",
    "tests/test_advanced.py::TestConnectedComponents::test_chain_converges_in_log_rounds",
    "tests/test_advanced.py::TestConnectedComponents::test_matches_union_find_on_random_graph",
    "tests/test_advanced.py::TestContractionPrePass::test_local_solve_equals_distributed_residue_path",
    "tests/test_advanced.py::TestContractionPrePass::test_pre_contract_labels_equal_plain_cc",
    "tests/test_advanced.py::TestDedupWinnowing::test_matches_pure_python_winnowing",
    "tests/test_advanced.py::TestDegenerateCorpusParity::test_degenerate_corpus_matches_oracle[dedup_canonical_select]",
    "tests/test_advanced.py::TestDegenerateCorpusParity::test_degenerate_corpus_matches_oracle[dedup_two_stage]",
    "tests/test_advanced.py::TestDegenerateEmbeddingsParity::test_degenerate_embeddings_match_oracle[dedup_semdedup]",
    "tests/test_advanced.py::TestDegenerateEmbeddingsParity::test_degenerate_embeddings_match_oracle[sim_ivf_nprobe_curve]",
    "tests/test_advanced.py::TestDegenerateEmbeddingsParity::test_degenerate_embeddings_match_oracle[sim_knn_join]",
    "tests/test_advanced.py::TestDegenerateEmbeddingsParity::test_degenerate_embeddings_match_oracle[sim_pq_encode]",
    "tests/test_advanced.py::TestHllSketchMerge::test_estimates_match_exact_and_merge_is_lossless",
    "tests/test_advanced.py::TestHotBucketCap::test_cap_drops_clique_keeps_cold_pairs",
    "tests/test_advanced.py::TestHotBucketCap::test_capped_clique_stays_one_component",
    "tests/test_advanced.py::TestHotBucketCap::test_capped_oracle_fixes_same_pairs",
    "tests/test_advanced.py::TestHotBucketCap::test_recall_audit_measures_cap_cost",
    "tests/test_advanced.py::TestHotBucketCap::test_two_stage_hot_branch_unit_scale",
    "tests/test_advanced.py::TestMultibyteCorpusParity::test_multibyte_corpus_matches_oracle[dedup_canonical_select]",
    "tests/test_advanced.py::TestMultibyteCorpusParity::test_multibyte_corpus_matches_oracle[dedup_two_stage]",
    "tests/test_advanced.py::TestRound6NonVacuous::test_triangle_projection_cached_per_app",
    "tests/test_advanced.py::TestStreamStreamJoin::test_matches_static_dual",
    "tests/test_advanced.py::TestStreamStreamJoinOuter::test_inner_rows_preserved_and_nulls_click_unique",
    "tests/test_advanced.py::TestTwoStageAndSchemaEvolution::test_two_stage_pairs_subset_with_copy_counts",
    "tests/test_audit_ops.py::TestRRFFusion::test_matches_python_fusion",
    "tests/test_fuzz_differential.py::test_fuzz_decimal_grouping_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_differential_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_differential_block[2]",
    "tests/test_fuzz_differential.py::test_fuzz_differential_block[3]",
    "tests/test_fuzz_differential.py::test_fuzz_hof_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_nullkey_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_ojwin_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_pivot_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_scalar_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_setops_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_subquery_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_time_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_unionbyname_block[1]",
    "tests/test_fuzz_differential.py::test_fuzz_window_block[1]",
    "tests/test_http_shim.py::test_http_post_status_contract_and_stream",
    "tests/test_infostats.py::TestMarkovConvergenceTwin::test_matches_unrolled_at_12",
    "tests/test_infostats.py::TestMarkovConvergenceTwin::test_reaches_quantization_floor_fixpoint",
    "tests/test_infostats.py::TestMarkovStationary::test_near_fixed_point_of_real_chain",
    "tests/test_infostats.py::TestMarkovStationary::test_power_iteration_fixed_point",
    "tests/test_infostats.py::TestMatryoshkaRecall::test_matches_sequential_fold_recompute",
    "tests/test_pipeline_components.py::TestConvergedTwinQueries::test_pagerank_converged_query_runs_and_converges",
    "tests/test_pipeline_components.py::TestConvergenceGatedTwins::test_lpa_converged_matches_unrolled_at_3",
    "tests/test_pipeline_components.py::TestConvergenceGatedTwins::test_lpa_converged_one_job_per_round",
    "tests/test_pipeline_components.py::TestConvergenceGatedTwins::test_pagerank_converged_one_job_per_round",
    "tests/test_pipeline_components.py::TestConvergenceGatedTwins::test_pagerank_converged_reaches_eps_fixpoint",
    "tests/test_pipeline_components.py::TestLabelPropagation::test_two_components_converge_to_min_labels",
    "tests/test_pipeline_components.py::TestSemDedup::test_survivor_rule_invariants",
    "tests/test_pipeline_components.py::TestSubscriptionStore::test_compact_preserves_state",
    "tests/test_pipeline_components.py::TestSubscriptionStore::test_persistence_across_instances",
    "tests/test_plan_quality.py::TestMinhashPairRegimes::test_salted_regime_plan_and_equality",
    "tests/test_plan_quality.py::TestMinhashPairRegimes::test_two_stage_salted_regime_equality",
    "tests/test_plan_quality.py::TestNoGlobalWindow::test_no_unpartitioned_window_in_any_declared_query",
    "tests/test_properties.py::TestBandBucketingProperty::test_bucketed_range_join_equals_naive",
    "tests/test_properties.py::TestBitrateParseProperty::test_parse_matches_reference_contract",
    "tests/test_properties.py::TestGlobalOrderHelpers::test_ntile_expr_matches_sql_ntile_all_sizes",
    "tests/test_properties.py::TestProundCrossEngine::test_pround_matches_duckdb",
    "tests/test_reference_fidelity.py::test_empty_string_tags_are_absent",
    "tests/test_reference_fidelity.py::test_mobility_intergroup_is_not_an_identity_tag",
    "tests/test_reference_fidelity.py::test_perf_data_golden",
    "tests/test_reference_fidelity.py::test_perf_data_supi_is_not_an_identity_tag",
    "tests/test_reference_fidelity.py::test_ue_comm_golden",
    "tests/test_reference_fidelity.py::test_ue_mobility_golden",
    "tests/test_result_digest.py::TestDigestPins::test_pinned_digest_reproduces[graph_pagerank_converged]",
    "tests/test_result_digest.py::TestRowsOnlyWrap::test_digest_is_constant_stable_and_value_preserving[agg_approx_distinct]",
    "tests/test_result_digest.py::TestRowsOnlyWrap::test_digest_is_constant_stable_and_value_preserving[graph_pagerank_converged]",
    "tests/test_streaming.py::test_cdc_upsert_recovers_from_checkpoint_restart",
    "tests/test_streaming.py::test_inactivity_flush_recovers_from_checkpoint_restart",
    "tests/test_streaming.py::test_stream_attribution_invariant_under_batch_boundaries[cuts0.25-0.75]",
    "tests/test_streaming.py::test_stream_attribution_invariant_under_batch_boundaries[cuts0.25]",
    "tests/test_streaming.py::test_stream_attribution_invariant_under_batch_boundaries[cuts0.75]",
    "tests/test_streaming.py::test_stream_attribution_state_matches_batch_window",
    "tests/test_streaming.py::test_stream_cdc_upsert_invariant_under_batch_boundaries[cuts0.25-0.75]",
    "tests/test_streaming.py::test_stream_cdc_upsert_invariant_under_batch_boundaries[cuts0.25]",
    "tests/test_streaming.py::test_stream_cdc_upsert_invariant_under_batch_boundaries[cuts0.75]",
    "tests/test_streaming.py::test_stream_inactivity_flush_exactly_once_accounting[cuts0.25-0.75]",
    "tests/test_streaming.py::test_stream_inactivity_flush_exactly_once_accounting[cuts0.25]",
    "tests/test_streaming.py::test_stream_inactivity_flush_exactly_once_accounting[cuts0.75]",
    "tests/test_streaming.py::test_stream_inactivity_flush_matches_watermark_rule",
    "tests/test_streaming.py::test_stream_matches_batch",
    "tests/test_streaming.py::test_stream_minhash_dedup_matches_batch_dual",
    "tests/test_streaming.py::test_stream_stateful_counts_accumulates_across_batches",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_NODEIDS:
            item.add_marker(pytest.mark.slow)
