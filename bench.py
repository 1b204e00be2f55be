#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (foreach-noop action — full compute,
no driver-side result transfer). Protocol: one cold pass (JVM + codegen +
file listing; reported as ``cold_total_sec``), then two full steady-state
passes over the suite; the headline metric is the sum of per-query BEST
steady times. The steady passes are INTERLEAVED (whole-suite sweeps, not
back-to-back repeats): this host shows bursty CPU steal from neighbors
(0 -> 25%+ for tens of seconds), and back-to-back repeats land both
samples inside the same burst, while sweeps separated by minutes give
each query two independent draws. ``host_steal_pct`` reports the
steal share measured across the whole bench so a noisy run is visible in
the record. The DuckDB numbers in BASELINE.md were measured under the
same best-of protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ssp_spark.queries import QUERIES  # noqa: E402
from ssp_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "word_count",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "sliding_window_counts",
    "session_windows",
    "running_user_spend",
    "user_activity_pivot",
    "top_customers_per_nation",
    "asof_join_purchase_signup",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "q6_forecast_revenue",
    "q18_large_orders",
    "ann_ivf_topk",
    "stats_numeric_exact",
]


def cpu_jiffies() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat — cheap host-noise probe."""
    try:
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0, 0


def run_once(spark, name: str, sf_dir: str) -> float:
    # Release prior queries' pinned blocks (localCheckpoint RDDs are freed
    # by py4j finalizers only after Python GC runs) so each measurement
    # sees a clean block manager.
    import gc

    gc.collect()
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    from ssp_spark.session import adaptive_enabled_for, sized_shuffle_partitions

    # Both scale knobs sized from the input volume (see ssp_spark.session):
    # shuffle partitions ~ input bytes (clamped to [8, 3x cores]) and AQE
    # gated on >= 1 GiB — at megabyte scale reduce-task scheduling and
    # AQE's per-exchange re-planning ARE the wall clock, with nothing for
    # either to win back. Env overrides (SPARK_GRAFT_SHUFFLE_PARTITIONS /
    # SPARK_GRAFT_AQE_MIN_BYTES) still apply.
    sp = (
        None
        if "SPARK_GRAFT_SHUFFLE_PARTITIONS" in os.environ
        else sized_shuffle_partitions(sf_dir)
    )
    spark = get_spark(
        "ssp-spark-bench",
        shuffle_partitions=sp,
        adaptive=adaptive_enabled_for(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_all, s_all = cpu_jiffies()
    run_once(spark, "word_count", sf_dir)  # warmup: JVM + codegen + file listing

    cold: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run_once(spark, name, sf_dir), 3)

    # Two interleaved steady-state sweeps (see module docstring): each
    # query gets two samples separated by a full suite pass, so a steal
    # burst can't poison both.
    timings: dict[str, float] = dict(cold)
    for _sweep in range(2):
        for name in HEADLINE:
            timings[name] = round(min(timings[name], run_once(spark, name, sf_dir)), 3)

    total = round(sum(timings.values()), 3)

    # Production hash profile: the md5-based portable_hash64 exists ONLY so
    # DuckDB oracles can replay hashes bit-for-bit; a deployment would use
    # the xxhash64 profile (SSP_PORTABLE_HASH=off — same 60-bit domain, no
    # cross-engine replay). Measure the hash-bound queries under it to
    # record the md5-parity tax; the headline stays the oracle-checkable
    # config. Same best-of-2 protocol.
    HASH_BOUND = ["dedup_minhash_lsh", "dedup_simhash", "doc_fingerprint"]
    os.environ["SSP_PORTABLE_HASH"] = "off"
    prod: dict[str, float] = {}
    try:
        for _sweep in range(2):
            for name in HASH_BOUND:
                t = round(run_once(spark, name, sf_dir), 3)
                prod[name] = min(prod.get(name, t), t)
    finally:
        del os.environ["SSP_PORTABLE_HASH"]

    t_end, s_end = cpu_jiffies()
    steal_pct = (
        round(100.0 * (s_end - s_all) / max(t_end - t_all, 1), 1) if t_end else None
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 3),
                "production_hash_profile": prod,
                "host_steal_pct": steal_pct,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
