"""KMV signature / pair-estimate properties: exactness below k, the
coincidence estimator on constructed overlaps, and the bottom-k plan
shape (WindowGroupLimit = per-task partial top-k)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark import plans
from ssp_spark.operators import sketch


def _sigs(spark, groups, k=256):
    rows = [(g, x) for g, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, ["g", "item"])
    return sketch.kmv_signatures(df, "g", "item", k=k)


def test_kmv_exact_below_k(spark):
    """Sets smaller than k: the sketch IS the set — union and
    intersection estimates are exact, Jaccard exact."""
    groups = {
        "a": [f"u{i}" for i in range(40)],
        "b": [f"u{i}" for i in range(20, 60)],  # |union|=60, |inter|=20
    }
    sigs = _sigs(spark, groups, k=256)
    est = sketch.kmv_pair_estimates(sigs, "g", k=256).first()
    assert est.k_used == 60
    assert est.est_union == 60.0
    assert est.est_intersection == 20.0
    assert abs(est.est_jaccard - 20 / 60) < 1e-6


def test_kmv_estimator_in_range_when_full(spark):
    """Above k the estimates are approximate but must land within a
    plausible band (k=64, |union|=2000 -> rse ~ 1/sqrt(64) ~ 12.5%)."""
    groups = {
        "a": [f"u{i}" for i in range(1500)],
        "b": [f"u{i}" for i in range(1000, 3000)],
    }  # union 3000, inter 500, J = 1/6
    sigs = _sigs(spark, groups, k=64)
    est = sketch.kmv_pair_estimates(sigs, "g", k=64).first()
    assert est.k_used == 64
    assert 1500 < est.est_union < 6000
    assert 0.0 <= est.est_jaccard <= 0.5


def test_kmv_signature_dedups_items(spark):
    """Duplicate items hash identically and are deduped before the
    bottom-k: signature size == distinct count."""
    rows = [("a", "x")] * 100 + [("a", "y")] * 50
    df = spark.createDataFrame(rows, ["g", "item"])
    sigs = sketch.kmv_signatures(df, "g", "item", k=256).collect()
    assert len(sigs) == 2


def test_kmv_bottom_k_is_window_group_limit(spark):
    df = spark.createDataFrame(
        [("a", f"u{i}") for i in range(500)], ["g", "item"]
    )
    sig = sketch.kmv_signatures(df, "g", "item", k=16)
    s = plans.plan_string(sig, "simple")
    assert "WindowGroupLimit" in s  # local k smallest before the exchange
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
