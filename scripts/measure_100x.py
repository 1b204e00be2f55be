#!/usr/bin/env python
"""Measure the sf0.1 -> 100x wall-clock ratio for the flagship operator
families (the direct "survives 100x" evidence recorded in SCALE.md).

Build the ~1.5 GB fixture first:

    SCALEFIX_FACTOR=100 python scripts/make_scale_fixture.py

then run each scale in ITS OWN process so the session carries the
input-sized config (shuffle partitions from bytes, AQE gated on >= 1 GiB
— the deployment contract, not a benchmarking trick):

    python scripts/measure_100x.py /root/testdata/sf0.1     /tmp/m_sf01.json
    python scripts/measure_100x.py .scalefix/sf10           /tmp/m_sf100.json

exp100 = log10(t_100x / t_sf0.1) / 2 — 1.0 means time grew 100x
(linear in input), 0.5 means it grew 10x.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssp_spark.queries import QUERIES  # noqa: E402
from ssp_spark.session import (  # noqa: E402
    adaptive_enabled_for,
    get_spark,
    sized_shuffle_partitions,
)

NAMES = [
    "word_count", "q1_pricing_summary", "running_user_spend", "dedup_exact",
    "dedup_jaccard_pairs", "dedup_minhash_lsh", "dedup_simhash",
    "ann_lsh_topk", "ann_lsh_topk_gemm", "bigram_lm_score",
    "triangle_count_users",
    "contrastive_pairs_lsh", "token_budget_selection", "corpus_shuffle_order",
    "embedding_covariance_blas", "scd2_user_state_history",
    "outlier_mad_orders",
    # round-6 additions
    "bm25_topk_docs", "weighted_sample_per_source",
    "graph_reachability_bfs", "key_skew_report_events", "dedup_span_pairs",
    "bpe_token_stats", "pit_enrich_events", "kcore_user_graph",
    "mmr_diverse_topk", "mmr_diverse_topk_arrow",
    "multimodal_resize_decoded", "k_anonymity_events",
    "ema_daily_user_spend", "cusum_user_activity",
    "label_propagation_communities", "winsorized_stats_events",
    "char_entropy_docs", "embedding_random_projection",
    "inverted_index_postings", "time_decayed_user_spend",
    "embedding_correlation", "compaction_plan_docs",
    "psi_drift_orders", "welch_ttest_segments", "gini_spend_concentration",
    "kmv_user_overlap", "running_distinct_users", "event_trigram_topk",
    # round-7 additions
    "skyline_pareto_parts", "anomaly_dow_events", "assoc_rules_events",
    "stratified_kfold_embeddings", "holt_trend_user_spend",
    "time_split_embargo_events", "containment_dedup_pairs",
    "token_freq_spectrum_docs", "ks_test_segments",
    "rfm_customer_segments", "seasonal_decompose_daily",
    "copurchase_similar_customers",
    "chisq_type_dow_events", "user_event_entropy",
    "interarrival_stats_users", "pmi_collocations_docs",
    "rolling_corr_view_purchase", "roc_auc_embedding_norm",
    # round-7 batch 6
    "acf_daily_orders", "theil_sen_trend_orders",
    "mann_kendall_trend_orders", "benford_order_totals",
    "cuped_adjusted_spend", "km_user_conversion",
    # round-7 batch 7
    "bootstrap_ci_spend", "spearman_customer_value",
    "calibration_bins_embeddings", "lift_gain_deciles",
    "streaks_user_activity",
    "isotonic_calibration_embeddings", "quantile_normalize_quality",
    "attribution_position_based",
    # round-8 additions
    "multimodal_decode_png",
]

# Re-measure a subset without paying for the whole table:
#   SCALE100_NAMES=ann_lsh_topk,ann_lsh_topk_gemm python scripts/measure_100x.py ...
if os.environ.get("SCALE100_NAMES"):
    NAMES = [n.strip() for n in os.environ["SCALE100_NAMES"].split(",") if n.strip()]


def main() -> None:
    sf, out = sys.argv[1], sys.argv[2]
    spark = get_spark(
        "scale100",
        shuffle_partitions=sized_shuffle_partitions(sf),
        adaptive=adaptive_enabled_for(sf),
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["word_count"](spark, sf).count()  # warmup
    res = {}
    for n in NAMES:
        best, rows = None, 0
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            rows = QUERIES[n](spark, sf).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[n] = (round(best, 2), rows)
        print(n, res[n], flush=True)
    json.dump(res, open(out, "w"))
    spark.stop()


if __name__ == "__main__":
    main()
