"""Catalog must work on sessions it did not configure.

Round-1 regression: the external driver builds its own SparkSession, so
``load_table`` cannot rely on confs set by ``ssp_spark.session.get_spark``.
The events table (parquet TIMESTAMP(NANOS)) only reads when
``spark.sql.legacy.parquet.nanosAsLong`` is on — ``load_table`` must set
it at runtime.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from ssp_spark.catalog import load_table


def test_events_reads_on_unconfigured_session(spark):
    # Simulate a driver-owned session: the conf is absent/false.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        df = load_table(spark, "events", SF_SMOKE)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_events_ts_microsecond_truncation(spark):
    # The ns->us conversion must match DuckDB's TIMESTAMP(NANOS) read
    # (truncation, not rounding); spot-check the first row is truncated.
    import duckdb

    df = load_table(spark, "events", SF_SMOKE)
    first = df.orderBy("event_id").limit(1).collect()[0]
    con = duckdb.connect()
    oracle = con.sql(
        f"SELECT ts FROM '{SF_SMOKE}/events.parquet' ORDER BY event_id LIMIT 1"
    ).fetchone()[0]
    con.close()
    assert first["ts"] == oracle


def test_compact_dataset_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction: a many-tiny-files dataset rewrites into the computed
    file count with every row (and value) preserved — the O(files) ->
    O(bytes) scan-cost restoration."""
    import os

    from ssp_spark.catalog import compact_dataset, load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    src = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(src)  # 64 tiny files
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src == 64
    dst = str(tmp_path / "compacted")
    n_out = compact_dataset(spark, src, dst, target_bytes=1 << 20)
    assert n_out < n_src
    a = {tuple(r) for r in spark.read.parquet(src).collect()}
    b = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert a == b
