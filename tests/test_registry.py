"""Registry shape guards: the driver's correctness gate hashes the FIRST
50 entries of ``queries()`` in iteration order, so the window contents are
load-bearing — an accidental re-declaration or import-order change must
not silently rotate a query out of (or into) the checked set.
"""

from __future__ import annotations

from ssp_spark.queries import _CHECK_FIRST, ORACLE, QUERIES

# Round 4 group (a): the canary plus queries changed or added this round.
_R4_CHANGED = {
    "ann_lsh_topk",
    "dedup_simhash64_pairs",
    "doc_chunk_overlap",
    "vocab_coverage",
    "scd1_customer_merge",
    "leakage_safe_split",
    "bucketed_join_order_revenue",
    "cluster_dedup_keeper",
    "domain_mixture_weights",
    "bigram_lm_score",
    "sink_partitioned_scan",
    "dedup_incremental_batch",
    "contrastive_pairs_mining",
    "bloom_prefilter_join",
    "profile_table",
    "source_schema_evolution",
    "dedup_embedding_lsh",
    "pipeline_curation_v2",
    "quality_zscore_by_source",
    "fuzzy_name_pairs",
    "entity_resolution_parts",
    "embedding_covariance",
    "range_shard_manifest",
    "event_cooccurrence",
    "mixture_resample",
    "interval_overlap_orders",
    "funnel_conversion",
    "zorder_cells",
    "incremental_agg_maintenance",
    "attribution_last_touch",
    "embedding_standardize",
    "groupwise_regression",
    "dq_audit_orders",
    "daily_spine_fill",
    "snapshot_diff_customers",
}

# Round 4 group (b): the round-3 additions that had local parity at both
# scales but no driver CORRECTNESS row through round 3.
_R3_UNCHECKED = {
    "quality_repetition_filter", "dedup_ngram_corpus", "kmeans_embeddings",
    "cluster_balanced_sample", "pagerank_customer_supplier",
    "tfidf_top_terms", "source_orc_scan", "contamination_check",
    "sequence_packing", "embedding_quantize_int8", "skew_key_stats",
    "approx_percentile_value", "null_safe_join_props", "value_histogram",
}

# Round 4 group (c): queries whose latest driver row is round 2, rotated
# back in so no green row is more than two rounds stale. (lang_id,
# token_count, doc_fingerprint, stats_numeric_exact,
# array_funcs_embeddings, q10_top_customers_by_revenue,
# running_user_spend, sliding_window_counts, tumbling_hourly_stats were
# bumped late in round 4 for the new curation queries — see the ROUND-5
# TODO in queries.py.)
_R2_STALE_ROTATED = {
    "session_windows",
    # (dedup_simhash bumped for incremental_agg_maintenance — r2-green;
    # fingerprint kernel replayed in-window by dedup_simhash64_pairs.)
    # (dedup_events_keeper, quality_score bumped for funnel_conversion /
    # zorder_cells — r2-green; quality_score's tokenizer+score replays
    # inside cluster_dedup_keeper, the keeper shape inside
    # cluster_dedup_keeper's row_number-per-cluster.)
    # (top_customers_per_nation bumped for interval_overlap_orders —
    # r2-green and re-exercised every bench run via WindowGroupLimit.)
    # (streaming_wordcount_replay, anti_join_inactive_customers,
    # range_join_value_bands, asof_join_purchase_signup,
    # multimodal_features, multimodal_frame_sampling were bumped late in
    # round 4 for the six newest queries — all r2-green twice and
    # untouched; never-checked additions outrank a third confirmation.)
}


def test_driver_window_is_the_round4_target_set():
    window = list(QUERIES)[:50]
    assert window == _CHECK_FIRST
    assert set(window) == _R4_CHANGED | _R3_UNCHECKED | _R2_STALE_ROTATED


def test_registry_is_complete_and_fully_oracled():
    # 109 through round 3, +14 round-4 additions (production-width 60-bit
    # simhash bands; sliding-window document chunking; tokenizer
    # vocabulary-coverage table; batch SCD-1 merge; dedup-aware
    # leakage-safe split; bucketed co-located join; quality-ranked
    # cluster keeper; temperature-scaled domain mixing; bigram-LM
    # perplexity scoring; partitioned sink + pruned scan; incremental
    # batch-vs-corpus dedup; contrastive hard-negative pair mining;
    # Bloom-prefiltered join reduction; one-pass column profiler;
    # mergeSchema evolution read; LSH-blocked embedding near-dup;
    # the pipeline_curation_v2 flagship composition; per-domain quality
    # z-score calibration), +16 late-round-4 additions (q-gram-blocked
    # fuzzy join; fuzzy entity resolution; one-pass quantized covariance;
    # total-order range sharding; event co-occurrence mining;
    # mixture-targeted deterministic resampler; bucket-blocked interval
    # overlap join; time-windowed ordered-sequence funnel; z-order
    # locality cells; algebraic MV maintenance; as-of last-touch attribution; exact
    # z-score standardization; per-group OLS on exact moments; data-quality audit; date-spine
    # gap filling; snapshot diff; the Arrow/numpy covariance kernel twin,
    # which shares embedding_covariance's oracle verbatim; cohort
    # retention; triangle counting — the last two outside the saturated
    # 50-slot window, first in the ROUND-5 rotation queue; Markov transition matrix;
    # HLL register-table distinct sketch with max-merge '__all__' row),
    # +1 round-5 addition (contrastive_pairs_lsh — the LSH-blocked
    # candidate generator for contrastive mining, the scale path
    # VERDICT r4 asked to exist in code).
    assert len(QUERIES) == 149
    # Since round 3: every declared query has an exact DuckDB oracle.
    assert set(ORACLE) == set(QUERIES)


def test_every_query_name_is_unique_and_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
