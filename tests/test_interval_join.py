"""Bucket-blocked interval overlap join: emit-once semantics across
bucket spans, inclusive-boundary edges, and the no-nested-loop plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark import plans
from ssp_spark.operators import relational
from ssp_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _j(spark, a_rows, b_rows, width=10):
    a = spark.createDataFrame(a_rows, ["k", "aid", "s1", "e1"])
    b = spark.createDataFrame(b_rows, ["k", "bid", "s2", "e2"])
    out = relational.interval_overlap_join(
        a, b, ["k"], "s1", "e1", "s2", "e2", bucket_width=width
    )
    return {(r.aid, r.bid) for r in out.collect()}


def test_overlap_pair_spanning_many_buckets_emitted_once(spark):
    # both intervals span 4+ buckets and share 3 — exactly one output row
    got = _j(spark, [(1, "a", 5, 45)], [(1, "b", 12, 52)])
    assert got == {("a", "b")}


def test_touching_endpoints_inclusive(spark):
    # a ends exactly where b starts (inclusive contract: they match),
    # even when that touch point is the only shared bucket
    assert _j(spark, [(1, "a", 0, 20)], [(1, "b", 20, 30)]) == {("a", "b")}
    # disjoint by one: no match
    assert _j(spark, [(1, "a", 0, 19)], [(1, "b", 20, 30)]) == set()


def test_same_bucket_non_overlap_excluded(spark):
    assert _j(spark, [(1, "a", 0, 2)], [(1, "b", 5, 7)]) == set()


def test_key_mismatch_never_joins(spark):
    assert _j(spark, [(1, "a", 0, 50)], [(2, "b", 0, 50)]) == set()


def test_contained_interval(spark):
    assert _j(spark, [(1, "a", 0, 100)], [(1, "b", 40, 42)]) == {("a", "b")}


def test_interval_query_plan_is_equi_join(spark):
    """The overlap join must plan as a hash/sort-merge EQUI-join on
    (key, bucket) — never BroadcastNestedLoopJoin or a cartesian, and
    fully JVM-side."""
    df = QUERIES["interval_overlap_orders"](spark, SF_SMOKE)
    s = plans.plan_string(df, "simple")
    assert not plans.has_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_pit_enrich_tie_semantics(spark, tmp_path):
    """The PIT composition's two edge rules, pinned: (1) a fact AT a
    change instant sees the new state (<=, backward as-of); (2) two
    dimension changes at the SAME instant resolve to the max-event_id
    winner — both must match the oracle's (ts DESC, id DESC) probe."""
    import datetime as dt

    from ssp_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)

    def t(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (2, t(10), 1, "signup", 0.0, "{}"),     # dim: state signup @10
        (4, t(20), 1, "browse", 0.0, "{}"),     # dim: change @20
        (6, t(20), 1, "purchase", 0.0, "{}"),   # dim: SAME instant, higher id
        (1, t(5), 1, "x", 0.0, "{}"),           # fact before any state -> NULL
        (3, t(10), 1, "x", 0.0, "{}"),          # fact AT first change -> signup
        (5, t(20), 1, "x", 0.0, "{}"),          # fact AT the tied instant -> purchase (id 6 wins)
        (7, t(99), 1, "x", 0.0, "{}"),          # fact later -> purchase
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "events_pit")
    df.repartition(1).write.parquet(d)
    # queries load '<sf_dir>/events.parquet'
    import os, shutil

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    shutil.move(d, os.path.join(sf_dir, "events.parquet"))
    got = {
        r.event_id: r.state_asof
        for r in QUERIES["pit_enrich_events"](spark, sf_dir).collect()
    }
    assert got == {1: None, 3: "signup", 5: "purchase", 7: "purchase"}
