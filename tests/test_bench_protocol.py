"""Unit tests for bench.py's round-11 noise-detection helpers — the
protocol that must catch what BENCH_r10 shipped (8 rows inflated 5-30x
at 3% steal from same-VM contention the hypervisor steal counter
cannot see)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def test_load_bands_is_min_over_prior_artifacts_at_matching_sf():
    bands = bench.load_bands(0.1)
    # the artifacts exist in-repo; every headline staple must have a band
    for name in ("word_count", "q1_pricing_summary", "ema_daily_user_spend"):
        assert name in bands and bands[name] > 0
    # min semantics: no artifact at this sf may read below the band
    root = os.path.join(os.path.dirname(__file__), "..")
    import glob

    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        parsed = json.load(open(p)).get("parsed") or {}
        if not isinstance(parsed, dict) or parsed.get("sf") != 0.1:
            continue
        for k, v in (parsed.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                assert bands[k] <= v + 1e-9
    # other sf: no artifacts -> empty (band gate self-disables)
    assert bench.load_bands(123.0) == {}


def test_bands_would_have_caught_the_r10_contamination():
    """The acceptance criterion for VERDICT r10 #1(a): the eight rows
    the judge identified as 5-30x inflated in BENCH_r10 all exceed
    3x their multi-round band + 0.25 s, so the new gate retries (and,
    failing that, NAMES) every one of them."""
    bands = bench.load_bands(0.1)
    r10 = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "BENCH_r10.json")))["parsed"]["queries"]
    inflated = [
        "ema_daily_user_spend", "containment_dedup_pairs",
        "bigram_lm_score", "cusum_user_activity", "holt_trend_user_spend",
        "dedup_embedding_cosine", "bootstrap_ci_spend",
        "mmr_diverse_topk_arrow",
    ]
    for name in inflated:
        assert r10[name] > 3 * bands[name] + 0.25, name
    # ...and a sanity floor: in-band rows must NOT trip the gate
    # (band values come from minima, so equality is in-band)
    for name in ("word_count", "q1_pricing_summary"):
        assert bands[name] <= 3 * bands[name] + 0.25


def test_tree_jiffies_counts_self_and_is_fast():
    import time

    t0 = time.monotonic()
    a = bench.tree_jiffies()
    dt = time.monotonic() - t0
    assert a >= 0
    assert dt < 0.5  # per-sample probe: must be negligible vs queries
    # burning CPU in THIS process must advance the subtree counter
    x = 0
    target = time.process_time() + 0.3
    while time.process_time() < target:
        x += 1
    b = bench.tree_jiffies()
    assert b > a


def test_tree_jiffies_keeps_reaped_children():
    """A child that burns CPU and EXITS mid-window must not vanish from
    the tree sum (ADVICE r11): its jiffies roll into our cutime/cstime
    on reap, so the t1-t0 delta still attributes them to our tree
    instead of misreporting them as foreign busy CPU."""
    import subprocess
    import time

    a = bench.tree_jiffies()
    subprocess.run(
        ["python", "-c",
         "import time\n"
         "t = time.process_time() + 0.5\n"
         "x = 0\n"
         "while time.process_time() < t:\n"
         "    x += 1\n"],
        check=True,
    )
    # subprocess.run has reaped the child: its ~0.5 s of CPU now lives
    # ONLY in our cutime/cstime (USER_HZ=100 -> ~50 jiffies; allow wide
    # margin for scheduler noise but demand clearly more than our own
    # bookkeeping cost)
    b = bench.tree_jiffies()
    assert b - a >= 20, f"reaped child CPU lost from tree sum: {b - a}"


def test_cpu_jiffies_shape_and_monotonicity():
    t1, s1, b1 = bench.cpu_jiffies()
    assert t1 >= b1 >= 0 and t1 >= s1 >= 0
    t2, s2, b2 = bench.cpu_jiffies()
    assert t2 >= t1 and s2 >= s1 and b2 >= b1


def test_release_session_artifacts_drops_blocks_and_rebuilds(spark):
    """The r13 section-boundary release (VERDICT r12 #4): after
    release_session_artifacts, (1) the session memo is empty, (2) zero
    RDDs stay pinned in the block manager, and (3) an artifact consumer
    still runs — the memo rebuild path, i.e. dropping a
    lineage-truncated checkpoint can never strand a later section."""
    from ssp_spark.queries import (
        _ARTIFACTS,
        _minhash_pairs_artifact,
        release_session_artifacts,
    )
    from tests.conftest import SF_SMOKE

    pairs = _minhash_pairs_artifact(spark, SF_SMOKE)
    n_before = pairs.count()
    assert _ARTIFACTS.get(spark), "artifact memo should be populated"
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(list(jmap.values())) >= 1, "checkpoint should pin blocks"

    released = release_session_artifacts(spark)
    assert released >= 1
    assert not _ARTIFACTS.get(spark)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(list(jmap.values())) == 0, "blocks must all be dropped"

    # consumer rebuilds transparently and agrees with the pre-release run
    rebuilt = _minhash_pairs_artifact(spark, SF_SMOKE)
    assert rebuilt.count() == n_before
    release_session_artifacts(spark)  # leave the shared session clean
