"""Physical-plan introspection helpers.

Used by tests to assert the plans we want at 100 TB actually got planned:
filters pushed to the parquet scan, small dims broadcast, no unexpected
cartesian products, codegen-covered stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def has_pushed_filters(df: DataFrame) -> bool:
    s = plan_string(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df).count("BroadcastHashJoin")


def has_cartesian(df: DataFrame) -> bool:
    s = plan_string(df)
    return "CartesianProduct" in s


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (pre-AQE).

    Uses simple mode, where exchanges render inline as
    'Exchange hashpartitioning(...)' / 'Exchange rangepartitioning(...)'.
    """
    s = plan_string(df, "simple")
    return s.count("Exchange hashpartitioning") + s.count("Exchange rangepartitioning")


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans ('*(n)' markers in simple mode).

    Under AQE the markers only appear in the FINAL plan, so this runs the
    query first (cheap at test scale) and reads the executed plan.
    """
    import re

    df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, "simple"))))
