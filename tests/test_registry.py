"""Registry shape guards: the driver's correctness gate hashes the FIRST
50 entries of ``queries()`` in iteration order, so the window contents are
load-bearing — an accidental re-declaration or import-order change must
not silently rotate a query out of (or into) the checked set.
"""

from __future__ import annotations

from ssp_spark.queries import _CHECK_FIRST, ORACLE, QUERIES

# Queries changed (or first made oracle-checkable) in round 3 — they need a
# fresh driver row regardless of earlier green records.
_R3_CHANGED = {
    "word_count",
    "map_funcs_roundtrip",
    "approx_distinct_users",
    "stats_numeric",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
}

# The 44 queries that had no driver CORRECTNESS row in rounds 1-2
# (they sat at registry positions 51-94).
_R2_UNCHECKED = {
    "regexp_funcs", "q6_forecast_revenue", "q4_priority_exists",
    "q17_small_qty_revenue", "q18_large_orders", "q22_idle_rich_customers",
    "ann_ivf_topk", "q7_nation_volume", "q14_promo_revenue",
    "q19_disjunctive_revenue", "dedup_minhash_clusters", "sample_split_hash",
    "text_normalize_redact", "rolling_30d_spend", "window_frame_funcs",
    "event_type_pivot_api", "dedup_simhash_pairs", "lineitem_unpivot",
    "source_csv_scan", "source_json_scan", "q2_min_cost_supplier",
    "q8_market_share", "q9_product_profit", "q11_important_parts",
    "q12_ship_priority_class", "q13_custdist", "q15_top_supplier",
    "q16_supplier_cnt", "q20_qty_suppliers", "q21_waiting_supplier",
    "cms_user_counts", "bloom_customer_names", "stratified_sample_events",
    "window_rank_stats", "udtf_sentence_split", "udaf_user_spend",
    "time_rollup_multigrain", "salted_join_event_spend",
    "asof_join_forward_tolerance", "pipeline_train_manifest",
    "right_join_order_priority_mix", "multimodal_resize",
    "array_lateral_explode", "literal_source_wordcount",
}


def test_driver_window_is_the_round3_target_set():
    window = list(QUERIES)[:50]
    assert window == _CHECK_FIRST
    assert set(window) == _R3_CHANGED | _R2_UNCHECKED


def test_registry_is_complete_and_fully_oracled():
    # 94 through round 2, +7 early round-3 additions (repetition filter,
    # corpus n-grams, tfidf, kmeans, cluster sample, pagerank, orc source),
    # +8 late round-3 additions (contamination check, sequence packing,
    # int8 quantization, skew diagnostics, bounded-error approx percentile,
    # text source round-trip, null-safe join, width_bucket histogram)
    assert len(QUERIES) == 109
    # Round 3: every declared query has an exact DuckDB oracle (the two
    # r2 rows-only queries were rewritten as bounded-error booleans).
    assert set(ORACLE) == set(QUERIES)


def test_every_query_name_is_unique_and_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
