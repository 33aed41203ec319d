"""Registry-window hygiene (VERDICT r6 item #1).

The round driver oracle-adjudicates only the FIRST-50 prefix of the
``QUERIES`` registry. Rounds 5–6 appended new entries at the tail, so
10 operators shipped for two rounds without a driver correctness
record. This test makes the mistake impossible to repeat: every entry
that has not yet accumulated a cross-round driver green (i.e. is not
in the frozen ledger below) MUST sit inside the first-50 window.

When a round's CORRECTNESS lands green for a promoted entry, move its
name into ``_DRIVER_GREEN_LEDGER`` so the window slot frees up for the
next round's additions.
"""

from __future__ import annotations

from datacamp_etl_spark.queries import _PROMOTE_TO_WINDOW, ORACLE, QUERIES

WINDOW = 50

# Entries with a driver-green CORRECTNESS record in some round r1–r6
# (cross-round union, per COVERAGE.md adjudication ledger). These may
# live anywhere in the registry. `hll_incremental_distinct` is
# rows-only by design (no oracle entry) and counts as adjudicated.
_DRIVER_GREEN_LEDGER = {
    "mapped_append", "update_join", "finalize_dataset",
    "identity_projection", "md5_digest", "table_diff", "incremental_load",
    "kmv_distinct_users_by_type", "temperature_mix",
    "streaming_upsert_latest", "scd2_customer_segment",
    "pq_encode_embeddings", "streaming_dedup_watermark",
    "streaming_rocksdb_window_counts", "histogram_order_totals",
    "hll_incremental_distinct", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "topk_orders_per_customer", "text_stats", "language_id",
    "rolling_fingerprint", "dedup_exact", "minhash_signatures",
    "lsh_candidate_pairs", "ngram_jaccard_pairs", "simhash_signatures",
    "embedding_topk", "knn_join", "events_window_agg",
    "q4_order_priority", "q6_revenue_forecast", "q10_returned_items",
    "q14_promo_effect", "q18_large_volume", "rollup_returns",
    "set_ops_repeat_buyers", "asof_join_last_click", "events_sessionize",
    "cosine_near_dup", "cosine_near_dup_lsh", "lsh_topk", "ivf_topk",
    "simhash_near_pairs", "multimodal_decode", "q7_nation_volume",
    "q11_top_value_parts", "q13_order_count_distribution",
    "q16_supplier_variety", "q17_small_quantity_revenue",
    "q19_disjunctive_pred", "q22_dormant_customers", "window_suite",
    "pivot_priority_status", "cube_status_flag", "percentiles_quantity",
    "streaming_window_counts", "streaming_dim_join_counts",
    "streaming_session_window", "streaming_stream_join",
    "streaming_dedup", "multimodal_features", "frame_sample",
    "dedup_clusters", "near_dup_apply", "stateful_user_totals",
    "redact_pii", "hash_sample", "train_val_test_split",
    "curation_pipeline", "vocab_topk", "json_props_agg",
    "q2_cheapest_supplier", "q15_top_supplier", "fk_integrity",
    "null_and_domain_audit", "salted_join_revenue",
    "sliding_window_counts", "chunk_documents", "stats_summary",
    "grouped_topk_pandas", "q21_sole_late_supplier",
    "rolling_7day_revenue", "q8_market_share", "q9_product_profit",
    "q12_priority_shipping", "q20_top_quantity_suppliers",
    "window_suite2", "grouping_sets_flags", "near_dup_verified",
    "contamination_check", "repetition_profile", "tfidf_topk_terms",
    "bm25_search", "kmeans_embeddings", "semantic_dedup",
    "streaming_chained_agg", "kmv_distinct_custkey", "cm_heavy_hitters",
    "span_dedup", "contamination_apply", "mixture_sample",
    "interval_join_click_after_error", "gapfill_hourly_events",
    "funnel_signup_click_purchase", "cohort_retention_weekly",
    "domain_cap", "percentile_trim_chars", "quantize_embeddings",
    "bloom_semi_join_urgent", "pq_topk_embeddings",
    "incremental_dedup_against_corpus", "posting_lists",
    "pydatasource_scan", "udtf_char_chunks",
    "incremental_agg_maintenance", "variant_props_stats",
    "assign_contiguous_ids", "training_shuffle",
    "column_profile_orders", "selective_window_refresh",
    "scd2_point_in_time_join", "dedup_clusters_star",
    "hybrid_search_rrf", "window_locf_last_value", "fuzzy_name_pairs",
    "equidepth_histogram_totals", "pack_sequences",
    "winsorize_order_totals", "token_entropy_scores", "oov_rate_top100",
    "boilerplate_shingle_ratio", "standardize_embeddings",
    "trim_by_source", "leakage_safe_split", "containment_pairs",
    "pack_concat", "ann_recall_eval", "median_chars_by_source",
}


def test_unadjudicated_entries_are_in_window():
    names = list(QUERIES)
    window = set(names[:WINDOW])
    outside = [
        n for n in names[WINDOW:] if n not in _DRIVER_GREEN_LEDGER
    ]
    assert not outside, (
        f"entries without a driver-green record sit outside the first-"
        f"{WINDOW} adjudication window: {outside} — add them to "
        f"_PROMOTE_TO_WINDOW in queries.py"
    )
    # and the promoted list actually landed at the front
    assert names[: len(_PROMOTE_TO_WINDOW)] == _PROMOTE_TO_WINDOW
    assert set(_PROMOTE_TO_WINDOW) <= window


def test_ledger_names_exist():
    unknown = _DRIVER_GREEN_LEDGER - set(QUERIES)
    assert not unknown, f"ledger references unknown entries: {unknown}"


def test_every_query_has_oracle_or_is_pinned_rows_only():
    rows_only = {n for n in QUERIES if n not in ORACLE}
    assert rows_only == {"hll_incremental_distinct"}, (
        f"unexpected rows-only entries (no oracle_sql): {rows_only}"
    )
