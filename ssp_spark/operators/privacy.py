"""Privacy risk audits for publishable datasets.

Before a corpus or telemetry extract ships, the standard screen is
k-anonymity (no quasi-identifier combination isolates fewer than k
rows — Sweeney 2002) and l-diversity (each quasi-identifier group
carries at least l distinct sensitive values — Machanavelli et al.
2007): groups failing either are re-identification / attribute-
disclosure risks that need suppression or generalization. This is the
structured-data sibling of the text-side PII redaction operator
(text_normalize_redact).

Scale design: ONE map-side-combined groupBy on the quasi-identifier
key computing (count, approx-free exact distinct of the sensitive
column via a two-level aggregate), then a deterministic
smallest-groups cut that compiles to TakeOrderedAndProject. Shuffle
volume = |distinct QI x sensitive| then |distinct QI| — never rows.
The report is top-N; the full violation set at 100 TB is itself data,
so the operator returns the worst offenders plus exact totals come
from the same pass upstream if needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
    top: int = 20,
) -> DataFrame:
    """Worst ``top`` quasi-identifier groups violating k-anonymity
    (cnt < k) or l-diversity (distinct sensitive values < l_div).

    Output: (qi_key, cnt, n_sensitive, k_violation, l_violation) —
    booleans per failure mode; ordering for the cut is (cnt asc,
    n_sensitive asc, qi_key asc), so the most isolating groups
    surface first and the cut is engine-deterministic.
    """
    qi = F.concat_ws(
        "|", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in quasi_cols]
    )
    grouped = (
        df.select(qi.alias("qi_key"), F.col(sensitive_col).alias("__s"))
        .groupBy("qi_key", "__s")
        .agg(F.count("*").alias("__c"))
        .groupBy("qi_key")
        .agg(
            F.sum("__c").cast("long").alias("cnt"),
            F.count("*").cast("long").alias("n_sensitive"),
        )
    )
    return (
        grouped.filter((F.col("cnt") < k) | (F.col("n_sensitive") < l_div))
        .select(
            "qi_key",
            "cnt",
            "n_sensitive",
            (F.col("cnt") < k).alias("k_violation"),
            (F.col("n_sensitive") < l_div).alias("l_violation"),
        )
        .orderBy("cnt", "n_sensitive", "qi_key")
        .limit(top)
    )
