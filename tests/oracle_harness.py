"""Local replica of the driver's oracle comparison: run a Spark query and
its DuckDB oracle over the same parquet tables, compare row count, schema
arity, and an order-insensitive canonical value hash.

Canonicalization: sort columns by name, render every cell to a stable
string (floats via repr of round(x, 9), None -> 'NULL'), sort rows, hash.
This is intentionally stricter than needed — if this matches, any
reasonable driver-side hash matches too.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any


def _cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_cell(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, duck_rel) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_rows = [tuple(r) for r in duck_rel.fetchall()]
    d_cols = list(duck_rel.columns)
    res = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    res["hash_match"] = (
        res["rows_match"]
        and res["cols_match"]
        and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
    )
    return res


def first_diff(spark_df, duck_rel, n: int = 5) -> str:
    s = canonical_rows(list(spark_df.columns), [tuple(r) for r in spark_df.collect()])
    d = canonical_rows(list(duck_rel.columns), [tuple(r) for r in duck_rel.fetchall()])
    only_s = [x for x in s if x not in set(d)][:n]
    only_d = [x for x in d if x not in set(s)][:n]
    return f"spark-only: {only_s}\nduck-only: {only_d}"
