#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query executes to completion via the noop sink (full plan runs,
no driver-side materialization skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datacamp_etl_spark.queries import QUERIES  # noqa: E402
from datacamp_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # TPC-H-shaped relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_disjunctive_pred",
    # Loading / CDC operator family (reference parity)
    "mapped_append",
    "update_join",
    "table_diff",
    "incremental_load",
    "md5_digest",
    # analytic windows / top-k
    "topk_orders_per_customer",
    "window_suite",
    "rollup_returns",
    # [EXT] LLM-data-pipeline operators
    "dedup_exact",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "chunk_documents",
    "simhash_near_pairs",
    "embedding_topk",
    "asof_join_last_click",
    "events_sessionize",
    "events_window_agg",
    # [EXT] round-2 additions: curation / retrieval / clustering
    "near_dup_verified",
    "contamination_check",
    "repetition_profile",
    "tfidf_topk_terms",
    "bm25_search",
    "kmeans_embeddings",
    "curation_pipeline",
    # [EXT] round-2 additions: sketches / mixing / range join / rollup
    "kmv_distinct_custkey",
    "cm_heavy_hitters",
    "span_dedup",
    "contamination_apply",
    "temperature_mix",
    "interval_join_click_after_error",
    "gapfill_hourly_events",
    "funnel_signup_click_purchase",
    "cohort_retention_weekly",
    "domain_cap",
    "quantize_embeddings",
    "scd2_customer_segment",
    "bloom_semi_join_urgent",
    "pq_topk_embeddings",
    # [EXT] round-3 additions
    "incremental_dedup_against_corpus",
    "posting_lists",
    "incremental_agg_maintenance",
    "variant_props_stats",
    "assign_contiguous_ids",
    "selective_window_refresh",
    "scd2_point_in_time_join",
    "hybrid_search_rrf",
    # [EXT] round-4 additions: exact order statistics without global
    # sorts, tokenizer-true packing, entropy/OOV quality signals
    "equidepth_histogram_totals",
    "percentile_trim_chars",
    "winsorize_order_totals",
    "pack_sequences",
    "token_entropy_scores",
    "oov_rate_top100",
    "boilerplate_shingle_ratio",
    "standardize_embeddings",
    "trim_by_source",
    "leakage_safe_split",
    "median_chars_by_source",
    "containment_pairs",
    "pack_concat",
    "ann_recall_eval",
    "semantic_dedup",
    # round-5 additions: rule-based curation + PII kernels + LM filter
    "gopher_quality",
    "pii_redact",
    "lm_perplexity_scores",
    "dedup_recall_eval",
    # round-6 additions: layout + sentence/sampling primitives
    "zorder_layout",
    "sentence_stats",
    "stratified_sample_docs",
    "pii_scan",
    "dedup_recall_planned",
    "audio_features",
    "dedup_recall_sampled",
    "bpe_encode",
    "pack_sequences_bpe",
    # round-8 additions: exact substring dedup (Lee et al. 2022) +
    # derived quality signal, PSI drift monitor
    "substring_dedup",
    "duplicate_text_fraction",
    "psi_drift_events",
    "dsir_weights",
    "c4_quality",
    "perplexity_buckets",
    "source_overlap_minhash",
    "weighted_sample_wor",
    "approx_quantile_contract",
    "mad_outliers",
    # round-9 additions: the round-8 staged operators (now oracle-
    # gated), intra-doc repetition, unigram-LM tokenizer. Streaming
    # entries stay out of the bench by convention (AvailableNow drains
    # measure sink plumbing, not operator compute).
    "pagerank",
    "negative_pairs",
    "ivfpq_rerank",
    "wordpiece_encode",
    "unigram_encode",
    "rolling_distinct",
    "robust_scale",
    "length_bucket_batches",
    "token_budget_cap",
    "row_band_signatures",
    "intra_doc_repeats",
    "intra_doc_repeat_fraction",
    "substring_dedup_apply",
    "ks_drift_events",
    "anomaly_zscore_events",
    "kmv_users_set_ops",
    "event_transitions",
    "image_dhash_near_pairs",
    "pmi_collocations",
    "trend_slope_events",
    "luhn_card_scan",
    "cluster_balanced_sample",
    "pack_sequences_unigram",
    "redact_valid_cards",
    "key_skew_events_users",
    "label_propagation",
    "cusum_changepoint_events",
    "session_paths",
    "quantile_normalize_orders",
    "funnel_latency_signup_purchase",
    # round-10 additions: persisted ANN index lifecycle. The demo
    # index is built+appended once per session (cold pass pays the
    # build+save; warm measures the steady-state probe — the
    # recurring operation a persisted index exists to make cheap).
    "ann_index_query",
    "ann_index_recall",
    "ann_index_staleness",
    # round-10: URL canonicalization + host curation
    "canonical_urls",
    "url_host_stats",
    "host_cap",
    "logistic_quality_scores",
    "mixture_epoch_plan",
    "training_shard_plan",
    "mmr_rerank",
    "attribution_last_touch",
    "quality_calibration",
    "triangle_counts",
    "clustering_coefficient",
    "common_neighbor_pairs",
    "fs_linkage_scores",
    "seasonal_decompose_daily",
    "phrase_search_positional",
    "readability_scores",
    "lagged_cross_correlation",
    "attribution_position_based",
    "kwic_concordance",
    "ngram_novelty_scores",
    "vocab_growth_curve",
    "interarrival_burstiness",
    "gini_doc_length_by_source",
    "rfm_segments",
    "basket_pair_lift",
    "image_dedup_clusters",
    "seasonal_naive_backtest_daily",
    "language_confusion_matrix",
    "dedup_cluster_stats",
    "shard_uniformity_chi2",
    "personalized_pagerank",
    "degree_distribution",
    "ab_test_conversion",
    "session_duration_histogram",
    "lang_source_association",
    "churn_label_rates",
    "event_cooccurrence_lift",
    "bm25_mrr_eval",
    "band_index_staleness",
    "streaming_image_near_dup",
    "theil_sen_slope_events",
    "user_survival_hazard",
    "correlation_matrix_lineitem",
    "kcore_membership",
    "prf_expansion_terms",
    "effective_corpus_size",
    "hard_negative_mining",
    "basket_triple_lift",
    "hard_negative_mining_lsh",
    "html_extract",
    "image_index_staleness",
    "html_outlinks",
    "outlink_host_pagerank",
    "url_template_traps",
    "robots_gate",
    "hits_user_event",
    "tokenizer_fertility",
    "crawl_budget_plan",
]

# Pinned machine-factor sentinels (VERDICT r7 item #3): three cheap
# queries UNTOUCHED since round 1 (`git log --follow` on their
# operators shows no change), re-measured standalone every run. Their
# drift round-over-round measures the box, not the code — divide the
# in-sequence numbers by the sentinel ratio before calling anything a
# regression. Do not edit this list; its value is that it never moves.
SENTINELS = [
    "q1_pricing_summary",
    "mapped_append",
    "kmv_distinct_custkey",
]


def _execute(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    # --smoke: one cheap pass at sf0.001, no warm-up — a crash gate,
    # not a timing run. Invoked from the test suite so a bench-breaking
    # change can never ship unnoticed (round 2 shipped rc=1 exactly
    # because bench.py was never re-run after a fixture change).
    smoke = "--smoke" in sys.argv[1:]
    default_sf = "/root/testdata/sf0.001" if smoke else "/root/testdata/sf0.1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", default_sf)
    # SPARK_GRAFT_ONLY="a,b,c": restrict to a HEADLINE subset — used by
    # scripts/scale_evidence.py to CONFIRM a budget breach with an
    # isolated re-measurement (single-query times late in an 80-query
    # sequence carry up to ~3x ambient noise; a breach must reproduce
    # standalone before the gate fails on it).
    only = os.environ.get("SPARK_GRAFT_ONLY")
    headline = (
        [n for n in HEADLINE if n in set(only.split(","))] if only
        else HEADLINE
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("datacamp-etl-spark-bench")

    from datacamp_etl_spark.operators.spread import release_engine_caches

    # Two passes, BOTH reported (methodology-stable round-over-round):
    #   cold = pass 1, after a JVM warm-up spin — first-execution time
    #          including codegen/JIT and parquet page faults;
    #   warm = pass 2, run AFTER release_engine_caches() — JIT and OS
    #          page cache stay warm, but every operator-scoped cached
    #          relation is rebuilt inside the measured pass, so warm
    #          measures steady-state COMPUTE, not cached-read time.
    # The headline "value" is the warm total (a number one real run
    # can achieve); "value_cold"/"queries_cold" carry the first-run
    # series. Smoke mode stays single-pass — a crash gate, not a
    # timing run.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    if not smoke:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
    for series in ([cold] if smoke else [cold, warm]):
        if series is warm:
            # drop materialized intermediates so pass 2 re-runs the
            # operators' compute (JIT/page-cache warmth is retained)
            release_engine_caches()
        for name in headline:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            start = time.perf_counter()
            _execute(fn(spark, sf_dir))
            series[name] = round(time.perf_counter() - start, 3)
            # Release operator-scoped caches / localCheckpoint blocks
            # AFTER each query's timer (round 11, closing VERDICT r10
            # item #8): left to accumulate across a ~170-query pass
            # they fill the storage pool, the unified memory manager
            # squeezes execution memory, and cache-heavy queries late
            # in the sequence spill — the measured in-sequence
            # inflation (dsir_weights 38.6 s in-seq vs 4.0 s
            # standalone in r10; basket_pair_lift 65 vs 10.1 at sf1).
            # The standalone/sentinel series always released per
            # query; this makes the in-sequence methodology match.
            if not smoke:
                release_engine_caches()
    release_engine_caches()

    # Standalone re-measure of the worst N warm queries: single-query
    # times late in an 80-query sequence carry up to ~3x ambient noise
    # (scheduler/GC/page-cache interference from the 79 neighbors), so
    # every past round's "regression" on this box turned out to be
    # in-sequence noise once re-run in isolation. Emitting the isolated
    # numbers in the payload ends that archaeology: same warm
    # methodology (operator caches released, JIT/page cache retained),
    # but each query measured back-to-back with nothing else in flight.
    standalone: dict[str, float] = {}
    sentinel: dict[str, float] = {}
    # A single-query invocation (SPARK_GRAFT_ONLY=<one name>) IS the
    # isolated measurement — its warm number is what the caller reads
    # (capture_bench standalone extension). Re-measuring it a third
    # time and re-running the 3 sentinels adds ~40% wall per spawn
    # and produces data nothing consumes; gates always use the full
    # pass's sentinels.
    single = only is not None and len(headline) == 1
    if not smoke and not single:
        n_worst = int(os.environ.get("SPARK_GRAFT_STANDALONE_N", "10"))
        for name in sorted(warm, key=warm.get, reverse=True)[:n_worst]:
            release_engine_caches()
            start = time.perf_counter()
            _execute(QUERIES[name](spark, sf_dir))
            standalone[name] = round(time.perf_counter() - start, 3)
        for name in SENTINELS:
            if name not in QUERIES:
                continue
            release_engine_caches()
            start = time.perf_counter()
            _execute(QUERIES[name](spark, sf_dir))
            sentinel[name] = round(time.perf_counter() - start, 3)
        release_engine_caches()

    timings = cold if smoke else warm
    total = round(sum(timings.values()), 3)
    # stdout line stays COMPACT (2-decimal times, no bulky side
    # series) so a tail-capturing harness can still parse it; the
    # full-precision payload with the cold/standalone/sentinel series
    # and the methodology stamp goes to BENCH_DETAILS.json next to
    # this script (driver VERDICTs r1–r9 recorded "parsed: null" on
    # the long line every round).
    payload = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if not smoke:
        payload["value_cold"] = round(sum(cold.values()), 3)
        payload["series"] = "warm"
        details = {
            **payload,
            "queries": timings,
            "queries_cold": cold,
            # Methodology stamp so round-over-round comparisons never
            # need archaeology: the headline series is WARM pass 2 —
            # JIT and OS page cache retained, operator-scoped caches
            # RELEASED and rebuilt inside the measured pass
            # (steady-state compute, not cached-read time);
            # "queries_cold" is first-execution pass 1.
            "queries_standalone": standalone,
            "queries_sentinel": sentinel,
            "methodology": (
                "value/queries = pass 2, operator-scoped caches "
                "released AFTER EVERY query's timer (r11: in-sequence "
                "now matches the standalone methodology — cross-query "
                "cache accumulation no longer inflates late queries); "
                "(JIT+page-cache warm, operator caches rebuilt in-pass); "
                "value_cold/queries_cold = pass 1 first-execution; "
                "queries_standalone = worst-10 warm queries re-measured "
                "in isolation (noise confirmation — trust these over "
                "the in-sequence numbers when they disagree); "
                "queries_sentinel = pinned r1-era queries re-measured "
                "standalone every run — their round-over-round drift is "
                "the machine-speed factor, divide before comparing"
            ),
        }
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_DETAILS.json",
                ),
                "w",
            ) as fh:
                json.dump(details, fh, indent=1)
        except OSError:
            pass  # read-only checkout: the stdout line still stands
        # the compact line carries the sentinels too — they are 3
        # numbers and the machine-factor story depends on them
        payload["queries_sentinel"] = sentinel
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
