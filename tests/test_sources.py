"""Source/sink connector coverage (SURVEY §2.3 scans/sources/sinks): the
reference has only in-memory sources and a log sink; our contract adds
csv/json/parquet batch readers, file/rate streaming sources, and
memory/noop sinks. Round-trip each format against the parquet fixtures.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ssp_spark import sources
from ssp_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def _checksum(df):
    """Order-insensitive content checksum over a customer-shaped frame."""
    return (
        df.select(
            F.sum(F.crc32(F.concat_ws("|", "c_custkey", "c_name", "c_nationkey", "c_mktsegment")))
        ).collect()[0][0],
        df.count(),
    )


def test_csv_roundtrip(spark, tmp_path):
    cust = load_table(spark, "customer", SF_SMOKE).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    path = str(tmp_path / "cust_csv")
    cust.write.option("header", True).csv(path)
    back = sources.read_batch(spark, "csv", path, header=True, inferSchema=True)
    assert _checksum(back) == _checksum(cust)


def test_json_roundtrip(spark, tmp_path):
    cust = load_table(spark, "customer", SF_SMOKE).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    path = str(tmp_path / "cust_json")
    cust.write.json(path)
    back = sources.read_batch(spark, "json", path, schema=None)
    assert _checksum(back) == _checksum(cust)


def test_json_file_stream_bounded_replay(spark, tmp_path):
    """File source -> availableNow -> memory sink sees every record once
    (the ssp Close-protocol equivalent for a bounded file stream)."""
    cust = load_table(spark, "customer", SF_SMOKE).select("c_custkey", "c_nationkey")
    path = str(tmp_path / "stream_json")
    cust.write.json(path)
    sdf = sources.read_stream(spark, "json", path, schema=cust.schema)
    assert sdf.isStreaming
    q = (
        sdf.groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("src_replay")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["c_nationkey"]: r["n"] for r in spark.table("src_replay").collect()}
    want = {
        r["c_nationkey"]: r["n"]
        for r in cust.groupBy("c_nationkey").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_rate_source_schema(spark):
    df = sources.rate_source(spark, rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}
