import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("polars-order-book-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


def rows_by_seq(df, seq="seq"):
    """Collect to {seq: row-dict} for order-insensitive assertions."""
    return {r[seq]: r.asDict() for r in df.collect()}


# ---------------------------------------------------------------------------
# Slow-test marking (r11, VERDICT r10 item 2): the full suite outgrew the
# driver's verify window (2,579 s measured with --durations on this box; the
# r10 driver run was cut off mid-suite at ~52%). The 59 slowest tests —
# every call over ~7 s in that measured run, about 1,550 s of the total —
# are marked `slow` here centrally (auditable in one place, nodeid-exact)
# and excluded by the default `-m "not slow"` in pytest.ini. They are NOT
# dead weight: run the FULL suite with `python -m pytest tests/ -m ""`
# (the round-close gate does); the default run keeps every file's fast
# tests, so each operator family retains coverage in the default pass.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_plans.py::test_registry_no_cartesian_no_unwhitelisted_bnlj",
    "test_dedup.py::test_fuzzy_segments_strategy_matches_buckets_exactly",
    "test_property_differential.py::test_property_modify_a_equals_b",
    "test_nbbo.py::test_nbbo_matches_bruteforce",
    "test_property_differential.py::test_property_updates_a_equals_b",
    "test_nbbo.py::test_nbbo_chunked_equals_global",
    "test_order_book_relational.py::test_differential_updates[7-1]",
    "test_property_differential.py::test_property_semdedup_matches_python_reference",
    "test_property_differential.py::test_property_nbbo_chunked_equals_global",
    "test_pipeline_ops.py::test_components_auto_falls_over_to_star_above_cap",
    "test_property_differential.py::test_property_dup_span_cuts_matches_python_reference",
    "test_registry.py::test_query_analyzes[orders_rollup_stream]",
    "test_frequency.py::test_property_keyed_exact_vs_bruteforce",
    "test_frequency.py::test_property_exact_vs_bruteforce",
    "test_order_book_relational.py::test_differential_updates[42-1]",
    "test_order_book_relational.py::test_differential_tiny_bucket_counts[updates-7]",
    "test_order_book_relational.py::test_differential_updates[7-3]",
    "test_order_book_relational.py::test_modify_zero_delta_events_keep_snapshot_rows",
    "test_bpe.py::test_distributed_trainer_matches_driver_on_toy_corpus",
    "test_property_differential.py::test_property_fuzzy_pairs_complete_within_block",
    "test_property_differential.py::test_property_triangle_count_matches_bruteforce",
    "test_dedup.py::test_fuzzy_pairs_candidate_budget_fails_fast_and_is_inert_when_under",
    "test_bpe.py::test_distributed_trainer_adversarial_overlaps",
    "test_order_book_relational.py::test_modify_to_mutations_explode",
    "test_order_book_relational.py::test_construction_triggers_zero_jobs",
    "test_classifier.py::test_separable_concept_reaches_perfect_accuracy",
    "test_classifier.py::test_step_matches_numpy_reference",
    "test_agg_stream.py::test_fold_batches_converge_to_full_recompute",
    "test_dedup.py::test_star_components_match_label_propagation_random",
    "test_order_book_streaming.py::test_stream_reorder_buffer_matches_sorted_batch_golden",
    "test_similarity.py::test_ivf_trained_centroids_improve_recall_on_clustered_data",
    "test_registry.py::test_query_analyzes[orders_merge_stream]",
    "test_dedup.py::test_star_components_long_chain",
    "test_property_differential.py::test_property_mutations_a_equals_b",
    "test_order_book_relational.py::test_differential_updates[42-3]",
    "test_property_differential.py::test_property_gap_fill_monotone_between_neighbors",
    "test_streaming_recovery.py::test_windowed_agg_restart_equals_single_shot",
    "test_order_book_streaming.py::test_stream_matches_batch_across_microbatches[1]",
    "test_registry.py::test_query_analyzes[ann_recall_lsh]",
    "test_registry.py::test_query_analyzes[part_snapshot_diff]",
    "test_asof.py::test_asof_differential_vs_pandas_merge_asof",
    "test_order_book_chunked.py::test_property_chunked_equals_unchunked_mutations",
    "test_dedup_streaming.py::test_drop_duplicates_within_watermark_dedups_and_evicts",
    "test_similarity_stream.py::test_topk_stream_replay_overwrites_instead_of_duplicating",
    "test_pipeline_ops.py::test_domain_mix_proportions_property",
    "test_graph.py::test_pagerank_matches_python_model",
    "test_registry.py::test_query_analyzes[sink_compaction]",
    "test_dedup.py::test_ngram_jaccard_guards_do_not_change_results",
    "test_order_book_streaming.py::test_stream_matches_batch_across_microbatches[2]",
    "test_incremental.py::test_join_delta_distributivity_any_split",
    "test_pipeline_ops.py::test_components_long_chain_converges",
    "test_registry.py::test_query_analyzes[q20_concentrated_suppliers]",
    "test_state_store.py::test_interval_join_rocksdb_matches_default",
    "test_registry.py::test_query_analyzes[ann_recall_pq]",
    "test_order_book_streaming.py::test_stream_reorder_horizon_zero_equals_in_order_contract",
    "test_order_book_chunked.py::test_property_chunked_equals_unchunked_modify",
    "test_registry.py::test_query_analyzes[part_triangle_counts]",
    "test_order_book_streaming.py::test_stream_reorder_duplicate_pending_seq_fails_loudly",
    "test_order_book_relational.py::test_relational_narrow_seq_bounds_clamp_exact",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid.startswith("tests/"):
            nodeid = nodeid[len("tests/"):]
        if nodeid in SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
