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
