"""Case tables for the pooled scenario runner (test_pooled_scenarios).

Plain data module (not a test file) so both conftest's collection hook
and the runner import ONE source of truth for which tests are pooled.

A test belongs here only if it is audited pool-safe:
- no ``monkeypatch`` of module/process globals (the three txnlog
  CHECKPOINT_EVERY / os.rename tests stay serial),
- no ``spark.conf.set`` on the shared session (the TWS state-store
  test stays serial),
- no shared temp-view / memory-sink names (every pooled streaming test
  uses a distinct ``queryName`` and its own tmp dir),
- fixtures limited to spark / sf_small / sf_oracle / tmp_path /
  tmp_path_factory or module fixtures that are pure builders
  (``base``, ``domain_tables``, ``kv_table_factory``).
"""

from __future__ import annotations

# (module name, test function name) — run concurrently on a thread
# pool against the shared Spark session, exactly like the oracle
# parity suite pools its 270+ cases.
POOLED_CASES = [
    ("test_txnlog", "test_mutation_parity_with_full_rewrite_backend"),
    ("test_txnlog", "test_keyed_write_rewrites_only_overlapping_files"),
    ("test_txnlog", "test_clustered_compaction_tightens_pruning"),
    ("test_txnlog", "test_write_of_tombstoned_key_resurrects_it_exactly_once"),
    ("test_txnlog", "test_rewrites_never_rematerialize_tombstoned_rows"),
    ("test_txnlog", "test_deferred_delete_parity_with_cow_delete"),
    ("test_txnlog", "test_direct_revive_of_tombstoned_key_never_duplicates"),
    ("test_txnlog", "test_intervening_commit_raises_instead_of_lost_update"),
    ("test_txnlog", "test_concurrent_writers_serialize_through_cas"),
    ("test_txnlog", "test_composite_key_stats_prune_on_second_column"),
    ("test_txnlog", "test_decimal_key_stats_stay_prunable"),
    ("test_graph_range_chunk", "test_banded_range_join_matches_naive"),
    ("test_graph_range_chunk", "test_cc_long_chain_converges"),
    ("test_cascade_delete", "test_user_delete_cascades_transitively"),
    ("test_cascade_delete", "test_cascade_noop_when_condition_matches_nothing"),
    ("test_advanced_ops", "test_recursive_hierarchy_depth_closed_form"),
    ("test_advanced_ops", "test_ngram_topk_bounded_and_ranked"),
    ("test_advanced_ops", "test_containment_dominates_jaccard"),
    ("test_streaming", "test_stream_stream_interval_join"),
    ("test_streaming", "test_mv_maintenance_merges_across_micro_batches"),
    ("test_streaming", "test_cdc_apply_out_of_order_batches"),
    ("test_streaming", "test_cdc_apply_checkpoint_resume"),
    ("test_streaming", "test_tumbling_file_sink_checkpoint_restart"),
    ("test_streaming", "test_stream_ingest_into_txnlog_table"),
    ("test_streaming", "test_stream_stream_join_checkpoint_restart"),
    ("test_streaming", "test_stateful_totals_checkpoint_restart"),
    ("test_kmeans", "test_kmeans_recovers_planted_clusters"),
    ("test_kmeans", "test_kmeans_inertia_improves_over_seed_assignment"),
    ("test_kmeans", "test_kmeans_seed_determinism"),
    ("test_ann_paths", "test_lsh_near_dups_match_brute_force_on_planted_dups"),
    ("test_ann_paths", "test_ivf_recall_tracks_coverage"),
    ("test_watermark_late_data", "test_late_rows_beyond_watermark_are_dropped"),
    ("test_watermark_late_data", "test_outer_join_emits_null_match_after_watermark"),
    ("test_mutation", "test_stats_cache_probe_or_compute"),
    ("test_mutation", "test_closed_form_matches_fold_on_path_independent_batch"),
    ("test_mutation", "test_closed_form_matches_fold_on_u2_derived_batch"),
    ("test_round3_ops", "test_leakage_safe_split_keeps_clusters_together"),
    ("test_skew_bucketing", "test_lsh_bucket_cap_bounds_degenerate_corpus"),
    ("test_retrieval_ops", "test_er_planted_variants_resolve_to_source"),
    # round-5 session additions (audited: tmp_path/spark/sf_small
    # fixtures only, no monkeypatch — the bloom checkpoint-replay test
    # monkeypatches CHECKPOINT_EVERY and stays serial)
    ("test_txnlog", "test_bloom_lookup_never_misses_and_prunes"),
    ("test_txnlog", "test_bloom_lookup_respects_deletion_vectors"),
    ("test_txnlog", "test_bloom_prunes_point_upsert_rewrites"),
    ("test_txnlog", "test_append_once_txn_marker_idempotent"),
    ("test_txnlog", "test_read_where_prunes_on_nonkey_column"),
    ("test_streaming", "test_exactly_once_ingest_survives_checkpoint_loss"),
    ("test_sketches", "test_theta_intersect_estimates_track_truth"),
    ("test_sketches", "test_theta_full_sketch_pairs_are_exact"),
    ("test_sketches", "test_theta_zero_overlap_pair_survives_with_zero"),
    ("test_txnlog", "test_restore_is_metadata_only_and_preserves_history"),
    ("test_txnlog", "test_restore_reinstates_pre_evolution_schema"),
    ("test_txnlog", "test_check_constraints_gate_writes"),
    ("test_txnlog", "test_shallow_clone_is_zero_copy_and_diverges"),
    ("test_txnlog", "test_losing_restore_race_deletes_no_data"),
    # round-6 additions (audited: spark/tmp_path/base only; the
    # rebase_falls_back tests patch an INSTANCE attribute on their own
    # table handle, not a module global; blind_append's internal
    # ThreadPool nests fine under the pool)
    ("test_txnlog", "test_legacy_list_stats_stay_readable_and_mutable"),
    ("test_txnlog", "test_append_once_retry_cap_surfaces_conflict"),
    ("test_txnlog", "test_restore_restores_constraint_set"),
    ("test_txnlog", "test_bloom_mask_sized_from_file_key_count"),
    ("test_txnlog", "test_partitioned_layout_prunes_exactly_and_reads_flat"),
    ("test_txnlog", "test_table_changes_net_diff_and_dv_delta"),
    ("test_txnlog", "test_blind_append_rebases_without_restaging"),
    ("test_txnlog", "test_append_rebase_falls_back_on_overlapping_dv"),
    ("test_txnlog", "test_append_rebase_falls_back_on_new_constraint"),
    ("test_txnlog", "test_timestamp_time_travel"),
    (
        "test_txnlog",
        "test_objectstore_append_once_exactly_once_under_lost_response",
    ),
    ("test_txnlog", "test_vacuum_retain_hours_and_dry_run"),
    ("test_txnlog", "test_cas_conflict_and_retry"),
    ("test_txnlog", "test_zorder_nd_bounds_every_dimension"),
    ("test_txnlog", "test_disjoint_keyed_writes_rebase_without_conflict"),
    ("test_txnlog", "test_partition_values_with_special_chars_round_trip"),
    # round-7 additions (audited: spark/tmp_path only; the DV-shrink
    # race test patches an INSTANCE attribute on its own table handle,
    # same precedent as the rebase_falls_back pair; the streaming
    # source/sink contract tests stay serial like their round-6
    # siblings — they re-register the txnlog data source)
    ("test_txnlog", "test_rewrite_rebase_blocks_on_shared_dv_shrink"),
    ("test_txnlog", "test_timestamp_travel_monotonic_under_clock_skew"),
    ("test_txnlog", "test_bloom_masks_live_in_sidecars_not_the_log"),
    ("test_txnlog", "test_vacuum_removes_fully_dead_write_dirs"),
]

# Hypothesis-driven cases: run on the MAIN thread, one engine at a
# time (hypothesis's engine is not documented thread-safe), WHILE the
# pool above drains — concurrency comes from overlap, not from
# threading hypothesis itself.
MAIN_THREAD_CASES = [
    ("test_graph_range_chunk", "test_range_join_matches_naive_property"),
    ("test_graph_range_chunk", "test_cc_matches_union_find"),
    ("test_txnlog", "test_random_mutation_sequence_parity"),
    ("test_properties", "test_upsert_idempotent_and_new_rows_win"),
]

ALL_CASES = POOLED_CASES + MAIN_THREAD_CASES
