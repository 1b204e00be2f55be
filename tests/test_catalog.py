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
