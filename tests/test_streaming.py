"""Structured Streaming behavior tests: ssp's streaming semantics under
the SURVEY.md §4.3 decisions, on bounded replays (availableNow == ssp's
Close protocol, /root/reference/collect.go:11-18).
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from ssp_spark import streaming as ss


_mtime_seq = [1_700_000_000]


def _write_parquet(spark, rows, schema, path):
    """Append one file and give it a strictly increasing mtime: the file
    stream source orders batches by modification time, and sub-second
    back-to-back writes would otherwise tie (or merge into one batch)."""
    import glob

    before = set(glob.glob(os.path.join(path, "*.parquet")))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)
    _mtime_seq[0] += 10
    for f in set(glob.glob(os.path.join(path, "*.parquet"))) - before:
        os.utime(f, (_mtime_seq[0], _mtime_seq[0]))


@pytest.fixture
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


WORDS = ["hello", "this", "is", "ssp", "hello", "this", "is", "sparta", "sparta", "is", "leonida"]


def test_running_count_stream_update_emission(spark, tmpdir):
    """ssp TestParallelEngine golden (engine_test.go:157-222) on the REAL
    streaming path: applyInPandasWithState emits 'word: k' for every
    arrival, exactly ssp's update-on-every-record contract."""
    src = os.path.join(tmpdir, "words")
    _write_parquet(spark, [(i, w) for i, w in enumerate(WORDS)], "pos long, word string", src)
    sdf = spark.readStream.schema("pos long, word string").parquet(src)
    counted = ss.running_count_stream(sdf, "word")
    name = f"rc_{uuid.uuid4().hex[:8]}"
    q = counted.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = sorted(f"{r.word}: {r.cnt}" for r in spark.table(name).collect())
    want = sorted(
        ["hello: 1", "hello: 2", "is: 1", "is: 2", "is: 3", "leonida: 1",
         "sparta: 1", "sparta: 2", "ssp: 1", "this: 1", "this: 2"]
    )
    assert got == want


def test_running_count_state_carries_across_batches(spark, tmpdir):
    """Per-key state persists across micro-batches (ssp: state lives in
    the per-key node clone for the stream's lifetime, engine.go:239-244)."""
    src = os.path.join(tmpdir, "w2")
    _write_parquet(spark, [(0, "a"), (1, "a")], "pos long, word string", src)
    _write_parquet(spark, [(2, "a"), (3, "b")], "pos long, word string", src)
    sdf = (
        spark.readStream.schema("pos long, word string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counted = ss.running_count_stream(sdf, "word")
    name = f"rc2_{uuid.uuid4().hex[:8]}"
    q = counted.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = sorted((r.word, r.cnt) for r in spark.table(name).collect())
    # 'a' reaches 3 across two batches -> counts 1,2,3; 'b' -> 1
    assert got == [("a", 1), ("a", 2), ("a", 3), ("b", 1)]


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_windowed_stream_append_drops_late(spark, tmpdir):
    """§4.3 decision 2: append mode drops records later than the
    watermark (ssp would re-open an 'ad-hoc' window — window.go:84-85 —
    nondeterministically; we drop, deterministically).

    Batch 0: ts 10..40. Batch 1: ts 45 (the watermark lags one trigger:
    it becomes 40-10=30 for batch 2). Batch 2: ts 5 — now later than the
    active watermark, all its windows closed -> dropped.
    Tumbling 10s windows, append: window [0,10) must NOT appear.
    """
    src = os.path.join(tmpdir, "ev")
    schema = "ts timestamp, k string"
    _write_parquet(spark, [(_ts(s), "x") for s in [10, 15, 22, 40]], schema, src)
    _write_parquet(spark, [(_ts(45), "x")], schema, src)
    _write_parquet(spark, [(_ts(5), "x"), (_ts(50), "x")], schema, src)
    sdf = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    win = ss.windowed_count_stream(sdf, "ts", "k", "10 seconds", "10 seconds", "10 seconds")
    name = f"wl_{uuid.uuid4().hex[:8]}"
    q = win.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    base = 1704067200  # 2024-01-01 epoch
    got = {(r.ws - base, r.cnt) for r in spark.table(name).collect()}
    # [10,20): ts 10,15 -> 2; [20,30): ts 22 -> 1; [40,50) and [50,60)
    # may or may not emit depending on final watermark; [0,10) (the late
    # ts=5) must be absent.
    assert (0, 1) not in got
    assert (10, 2) in got and (20, 1) in got


def test_late_side_output(spark, tmpdir):
    """§4.3 late_policy='side_output': late rows are split to a side sink
    instead of silently dropped — preserves ssp's 'late data remains
    visible' capability without its nondeterminism."""
    src = os.path.join(tmpdir, "ev2")
    schema = "ts timestamp, k string"
    _write_parquet(spark, [(_ts(s), "x") for s in [100, 200]], schema, src)
    _write_parquet(spark, [(_ts(5), "late1"), (_ts(195), "ok")], schema, src)
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)

    captured = {"on_time": [], "late": []}

    def on_batch(on_time, late, batch_id):
        captured["on_time"] += [r.k for r in on_time.collect()]
        captured["late"] += [r.k for r in late.collect()]

    q = ss.with_late_side_output(sdf, "ts", "10 seconds", on_batch)
    q.awaitTermination(120)
    assert "late1" in captured["late"]
    assert "ok" in captured["on_time"]
    assert "late1" not in captured["on_time"]


def test_union_watermark_alignment(spark, tmpdir):
    """O17 watermarker (engine.go:123-171): with multiple inputs the
    effective watermark is the MIN across sources — Spark's default
    multipleWatermarkPolicy=min reproduces it. A window closed on the
    fast source alone must not fire while the slow source could still
    supply rows."""
    fast = os.path.join(tmpdir, "fast")
    slow = os.path.join(tmpdir, "slow")
    schema = "ts timestamp, k string"
    _write_parquet(spark, [(_ts(s), "f") for s in [100, 200]], schema, fast)
    _write_parquet(spark, [(_ts(s), "s") for s in [15]], schema, slow)
    # ssp assigns the watermark per source and aligns on the MIN
    # (engine.go:141-156); the Spark equivalent is withWatermark on EACH
    # input before the union — the downstream window op then takes
    # min(wm_a, wm_b) under multipleWatermarkPolicy=min (the default).
    a = spark.readStream.schema(schema).parquet(fast).withWatermark("ts", "5 seconds")
    b = spark.readStream.schema(schema).parquet(slow).withWatermark("ts", "5 seconds")
    merged = a.unionByName(b)
    win = (
        merged.groupBy(F.window("ts", "10 seconds").alias("w"), "k")
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_timestamp("w.start").alias("ws"), "k", "cnt")
    )
    name = f"uw_{uuid.uuid4().hex[:8]}"
    q = win.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    base = 1704067200
    got = {(r.ws - base, r.k, r.cnt) for r in spark.table(name).collect()}
    # min watermark = min(200, 15) - 5 = 10 -> only windows ending <= 10
    # fire: [0,10) is empty here, so nothing from the fast source's
    # [100,110)/[200,210) may appear.
    assert not {(100, "f", 1), (200, "f", 1)} & got
