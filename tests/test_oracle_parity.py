"""The correctness gate, run locally at sf0.001 (the driver runs the same
comparison at sf0.01): every declared query must hash-match its DuckDB
oracle — row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import pytest

from ssp_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, first_diff

ORACLE_QUERIES = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    res = compare(df, duck.sql(ORACLE[name]))
    assert res["hash_match"], f"{name}: {res}\n{first_diff(df, duck.sql(ORACLE[name]))}"


NO_ORACLE = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
