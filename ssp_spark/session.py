"""SparkSession factory tuned for this engine.

The reference engine (affo/ssp) hand-builds its runtime: one goroutine per
operator instance, bounded channels, FNV-64a hash partitioning
(/root/reference/engine.go:268-278, datastream.go:43-57, key.go:66-70).
We instead configure Spark once and let Catalyst/Tungsten own execution:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast conversion replace ssp's static ``par`` clone count
  (/root/reference/engine.go:297-330).
- Arrow on: every Python-side operator (pandas UDFs, applyInPandas) moves
  data in columnar batches, never row-at-a-time.
- Session timezone pinned to UTC so event-time semantics are stable and
  oracle-comparable.
- ``nanosAsLong``: the driver fixtures store ``events.ts`` as parquet
  TIMESTAMP(NANOS), which Spark 4 refuses to read natively; we read the
  raw int64 and convert to a microsecond timestamp in the catalog layer
  (same ns->us truncation DuckDB applies).

At 100 TB these remain the right knobs; only sizing differs, so every
scale-sensitive value is env-overridable instead of hard-coded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "ssp-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``shuffle_partitions`` defaults to the local core count: on local[n]
    one shuffle partition per core avoids tiny-task overhead, while AQE
    coalescing keeps post-filter stages from running 32 near-empty tasks.
    On a real cluster this would be ~2-3x total executor cores; callers
    pass it explicitly or set SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    return builder.getOrCreate()
