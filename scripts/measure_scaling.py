#!/usr/bin/env python
"""Measure the sf0.1 -> 10x scaling exponent for the headline operator
families (the empirical leg of SCALE.md's "survives 100x" argument).

Runs each query at /root/testdata/sf0.1 and at the replicated 10x fixture
(scripts/make_scale_fixture.py), best-of-2 noop-write wall clock, and
prints rows_ratio / time_ratio / exponent (log10(time_ratio) when
rows_ratio == 10: 1.0 = linear, 2.0 = quadratic). Sub-linear exponents
mean the sf0.1 time is still fixed-overhead-dominated.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

from ssp_spark.queries import QUERIES
from ssp_spark.session import get_spark

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scalefix", "sf1")

NAMES = [
    "word_count",
    "q1_pricing_summary",
    "running_user_spend",
    "sliding_window_counts",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    # round-4 additions
    "ann_lsh_topk",
    "dedup_simhash64_pairs",
    "doc_chunk_overlap",
    "vocab_coverage",
    "scd1_customer_merge",
    "leakage_safe_split",
    # late round-4 additions
    "bigram_lm_score",
    "cluster_dedup_keeper",
    "domain_mixture_weights",
    "dedup_incremental_batch",
    "contrastive_pairs_mining",
    "bloom_prefilter_join",
    "profile_table",
    # latest round-4 additions
    "fuzzy_name_pairs",
    "entity_resolution_parts",
    "embedding_covariance",
    "range_shard_manifest",
    "event_cooccurrence",
    "mixture_resample",
    "interval_overlap_orders",
    "funnel_conversion",
    "zorder_cells",
    "attribution_last_touch",
    "embedding_standardize",
    "groupwise_regression",
    "incremental_agg_maintenance",
    # round-5 additions
    "triangle_count_users",
    "contrastive_pairs_lsh",
    "token_budget_selection",
    "corpus_shuffle_order",
    "scd2_user_state_history",
    "outlier_mad_orders",
]


def run(spark, name: str, sf_dir: str) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(2):
        gc.collect()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        rows = df.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> None:
    if not os.path.isdir(BIG):
        sys.exit(f"missing {BIG}: run scripts/make_scale_fixture.py first")
    spark = get_spark("ssp-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "word_count", SMALL)  # warmup

    print(f"{'query':28s} {'t_sf0.1':>8s} {'t_10x':>8s} {'rows_r':>7s} {'time_r':>7s} {'exp':>5s}")
    for name in NAMES:
        t1, r1 = run(spark, name, SMALL)
        t10, r10 = run(spark, name, BIG)
        rr = r10 / max(r1, 1)
        tr = t10 / t1
        exp = math.log10(tr) / math.log10(10) if tr > 0 else float("nan")
        print(f"{name:28s} {t1:8.2f} {t10:8.2f} {rr:7.2f} {tr:7.2f} {exp:5.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
